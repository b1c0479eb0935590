"""The bench must cover the full registry: HEADLINE is derived from
QUERIES (minus the explicit exclusion list), so registering a query
automatically benches it — the r3 failure mode (56 queries silently
missing from a hand-maintained list) cannot recur."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_headline_covers_every_registered_query():
    import bench
    from financial_data_pipeline_spark.plans.driver_queries import QUERIES

    names = bench.headline()
    assert set(names) | bench.BENCH_EXCLUDE == set(QUERIES)
    assert not set(names) & bench.BENCH_EXCLUDE
    # every exclusion must name a real query (stale entries fail the
    # bench run loudly; keep the test in sync with that contract)
    assert bench.BENCH_EXCLUDE <= set(QUERIES)


def test_driver_entry_registry_is_the_bench_registry():
    """__spark_entry__.queries() and the bench sweep the same set —
    the driver's correctness gate and the perf gate cannot drift
    apart."""
    import __spark_entry__ as entry
    import bench

    assert set(entry.queries()) == set(bench.headline()) | bench.BENCH_EXCLUDE
