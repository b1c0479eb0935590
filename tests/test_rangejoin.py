"""Bucketized range join ≡ naive theta join (the plan differs — hash
join on bucket ids vs BroadcastNestedLoopJoin — the result must not)."""

import datetime as dt

import pyspark.sql.functions as F

from financial_data_pipeline_spark.operators.rangejoin import interval_join


def _ts(d, h=0):
    return dt.datetime(2025, 1, d, h)


def _frames(spark):
    points = spark.createDataFrame(
        [(i, _ts(1 + i % 20, i % 24)) for i in range(200)], ["pid", "ts"]
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(2), _ts(4)),
            (101, _ts(3, 12), _ts(5)),       # overlaps 100
            (102, _ts(10), _ts(10, 6)),      # sub-bucket interval
            (103, _ts(25), _ts(28)),         # sparse tail
        ],
        ["iid", "w_start", "w_end"],
    )
    return points, intervals


def test_interval_join_matches_theta_join(spark):
    points, intervals = _frames(spark)
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "ts", "w_start", "w_end", bucket_seconds=86_400
        ).collect()
    }
    want = {
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end")))
        .collect()
    }
    assert got == want and len(want) > 0
    # overlapping intervals: at least one point matched both
    by_pid = {}
    for pid, iid in want:
        by_pid.setdefault(pid, set()).add(iid)
    assert any({100, 101} <= s for s in by_pid.values())


def test_interval_join_left_keeps_unmatched(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, "ts", "w_start", "w_end",
        bucket_seconds=86_400, how="left",
    )
    got_pids = [r.pid for r in out.collect()]
    assert set(got_pids) == {r.pid for r in points.collect()}  # nothing lost
    unmatched = [r for r in out.collect() if r.iid is None]
    assert unmatched, "fixture has points outside every interval"
    # unmatched points appear exactly once
    from collections import Counter

    c = Counter(r.pid for r in out.collect() if r.iid is None)
    assert all(v == 1 for v in c.values())


def test_interval_join_with_keys_restricts_matches(spark):
    """Co-keyed variant: a point only joins intervals of its own key,
    even when time ranges overlap across keys."""
    points = spark.createDataFrame(
        [(1, "A", _ts(3)), (2, "B", _ts(3)), (3, "A", _ts(20))],
        ["pid", "sym", "ts"],
    )
    intervals = spark.createDataFrame(
        [(100, "A", _ts(2), _ts(4)), (200, "B", _ts(2), _ts(4))],
        ["iid", "sym", "w_start", "w_end"],
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "ts", "w_start", "w_end",
            bucket_seconds=86_400, keys=["sym"],
        ).collect()
    }
    assert got == {(1, 100), (2, 200)}


def test_interval_join_bucket_size_invariance(spark):
    """Result is independent of the bucket quantum (only the plan
    shape changes)."""
    points, intervals = _frames(spark)

    def run(bs):
        return {
            (r.pid, r.iid)
            for r in interval_join(
                points, intervals, "ts", "w_start", "w_end", bucket_seconds=bs
            ).collect()
        }

    assert run(3_600) == run(86_400) == run(7 * 86_400)
