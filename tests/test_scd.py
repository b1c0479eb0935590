"""SCD2 merge invariants over successive update snapshots."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators.scd import scd2_init, scd2_merge


@pytest.fixture()
def dim(spark):
    rows = [
        (1, "ACME", "SMALL"),
        (2, "GLOBEX", "LARGE"),
        (3, "INITECH", "SMALL"),
    ]
    return spark.createDataFrame(rows, ["ckey", "name", "segment"])


def test_scd2_merge_versions_changed_keys(spark, dim):
    t0, t1, t2 = (dt.datetime(2025, 1, d) for d in (1, 10, 20))
    cur = scd2_init(dim, t0)

    # snapshot 1: key 2 changes segment, key 4 is brand new, 1/3 unchanged
    upd1 = spark.createDataFrame(
        [
            (1, "ACME", "SMALL"),
            (2, "GLOBEX", "MEGA"),
            (3, "INITECH", "SMALL"),
            (4, "HOOLI", "LARGE"),
        ],
        ["ckey", "name", "segment"],
    )
    m1 = scd2_merge(cur, upd1, ["ckey"], ["segment"], t1)
    assert m1.count() == 5  # 3 original + 1 closed-replacement + 1 new
    open1 = {r["ckey"]: r for r in m1.filter("is_current").collect()}
    assert set(open1) == {1, 2, 3, 4}
    assert open1[2]["segment"] == "MEGA" and open1[2]["valid_from"] == t1
    assert open1[1]["valid_from"] == t0  # untouched keys keep their row
    closed = m1.filter(~F.col("is_current")).collect()
    assert len(closed) == 1
    assert (closed[0]["ckey"], closed[0]["segment"]) == (2, "LARGE")
    assert closed[0]["valid_to"] == t1

    # snapshot 2: key 2 changes AGAIN -> three-version chain
    upd2 = spark.createDataFrame(
        [(2, "GLOBEX", "ULTRA")], ["ckey", "name", "segment"]
    )
    # partial snapshot: absent keys are simply not updated
    m2 = scd2_merge(m1, upd2, ["ckey"], ["segment"], t2)
    chain = sorted(
        m2.filter(F.col("ckey") == 2).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [r["segment"] for r in chain] == ["LARGE", "MEGA", "ULTRA"]
    # contiguous validity: each close matches the next open
    assert chain[0]["valid_to"] == chain[1]["valid_from"] == t1
    assert chain[1]["valid_to"] == chain[2]["valid_from"] == t2
    assert chain[2]["valid_to"] is None and chain[2]["is_current"]
    # exactly one open row per key, everywhere
    per_key = (
        m2.filter("is_current").groupBy("ckey").count().collect()
    )
    assert all(r["count"] == 1 for r in per_key)


def test_scd2_merge_noop_snapshot_is_identity(spark, dim):
    t0, t1 = dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 10)
    cur = scd2_init(dim, t0)
    m = scd2_merge(cur, dim, ["ckey"], ["segment"], t1)
    assert m.count() == 3
    assert m.filter(~F.col("is_current")).count() == 0
    assert {r["valid_from"] for r in m.collect()} == {t0}
