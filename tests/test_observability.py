"""Observed pipeline metrics: one action yields every stage's counters
(no extra jobs), values match ground truth, duplicate names rejected."""

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.observability import PipelineMetrics


def test_multi_stage_metrics_from_one_action(spark):
    pm = PipelineMetrics()
    raw = spark.range(1000).select(
        "id",
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id"))
        .alias("v"),
    )
    staged = pm.counters(raw, "ingest", ["v"])
    cleaned = pm.observe(staged.filter(F.col("v").isNotNull()), "cleaned")

    jobs_before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    cleaned.write.format("noop").mode("overwrite").save()

    assert pm.get("ingest") == {"rows": 1000, "v_nulls": 100}
    assert pm.get("cleaned") == {"rows": 900}
    # metrics delivery ran no additional Spark jobs beyond the action
    jobs_after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(jobs_after) - len(jobs_before) <= 1


def test_duplicate_point_name_rejected(spark):
    pm = PipelineMetrics()
    df = spark.range(5)
    pm.observe(df, "x")
    with pytest.raises(ValueError):
        pm.observe(df, "x")


def test_all_collects_every_point(spark):
    pm = PipelineMetrics()
    df = pm.observe(spark.range(50), "a")
    df = pm.observe(df.filter(F.col("id") < 10), "b")
    df.write.format("noop").mode("overwrite").save()
    got = pm.all()
    assert got["a"]["rows"] == 50 and got["b"]["rows"] == 10
