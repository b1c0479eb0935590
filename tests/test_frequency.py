"""Frequency-sketch tests: Misra–Gries heavy hitters + count-min probe.

Pins (a) the candidate-superset guarantee with a planted heavy hitter
scattered across many partitions, (b) exact equality between the
two-pass sketch plan and the naive full groupBy, and (c) the count-min
one-sided error bound on Spark's built-in sketch.
"""

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators.frequency import (
    batch_top_m,
    cms_probe,
    heavy_hitters,
)


@pytest.fixture(scope="module")
def skewed_items(spark):
    """200k rows over ~10k distinct items; 'hot' (5%) plus 12 'top_j'
    items (~2.5% each) are genuine heavy hitters (freq ≫ N/m),
    scattered uniformly across 16 partitions so no single batch holds
    any of them contiguously; ~9973 tail items at freq ≈ 13 fill the
    long tail. The top-10 by count therefore sits strictly inside the
    MG guarantee region — the precondition for sketch ≡ naive."""
    base = spark.range(0, 200_000, 1, 16).select(
        F.when(F.col("id") % 20 == 0, F.lit("hot"))
        .when(
            F.col("id") % 3 == 0,
            F.concat(
                F.lit("top_"),
                ((F.col("id") / 3).cast("long") % 12).cast("string"),
            ),
        )
        .otherwise(F.concat(F.lit("item_"), (F.col("id") % 9973).cast("string")))
        .alias("item")
    )
    return base.cache()


def test_candidate_superset_contains_planted_hitter(skewed_items):
    cands = {
        r.item for r in batch_top_m(skewed_items, "item", m=64).collect()
    }
    # freq('hot') = 10k = 5% of N >> N/64 — the MG pigeonhole says it
    # MUST appear in at least one batch summary.
    assert "hot" in cands


def test_heavy_hitters_equals_naive_groupby(skewed_items):
    naive = (
        skewed_items.groupBy("item")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("item").asc())
        .limit(10)
        .collect()
    )
    sketched = heavy_hitters(skewed_items, "item", k=10, m=512).collect()
    assert [(r.item, r.freq) for r in sketched] == [
        (r.item, r.freq) for r in naive
    ]
    assert sketched[0].item == "hot" and sketched[0].freq == 10_000


def test_cms_probe_one_sided_bound(skewed_items):
    n = skewed_items.count()
    exact = {
        r.item: r.freq
        for r in skewed_items.groupBy("item")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("item").isin("hot", "item_1", "item_42"))
        .collect()
    }
    eps = 0.001
    est = cms_probe(
        skewed_items, "item", list(exact), eps=eps, confidence=0.99
    )
    for item, true_count in exact.items():
        assert est[item] >= true_count  # CMS never undercounts
        assert est[item] <= true_count + eps * n  # w.h.p. bound
