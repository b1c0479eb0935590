"""Incremental continuous-aggregate refresh (the TimescaleDB
continuous-aggregate analog, reference timeseries_db.py:172's
hypertable feature set): CDF-derived invalidation, dirty-bucket-only
recompute, one-commit upsert-with-deletes, atomic watermark.

The invariant checked after EVERY lifecycle step: the target equals a
from-scratch groupBy of the source head — while the file manifest
proves only dirty-range files were rewritten (incrementality is
asserted on file paths, not vibes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.sources.laketable import LakeTable
from financial_data_pipeline_spark.sources.rollup import (
    WATERMARK_KEY,
    refresh_rollup,
)


def _key_of(df):
    return df.withColumn("day", F.to_date("ts"))


def _agg(df):
    return df.groupBy("day", "symbol").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


def _rows(spark, day_lo, day_hi, symbol, base):
    n_days = day_hi - day_lo
    return (
        spark.range(n_days * 24)
        .select(
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(
                    days=F.lit(day_lo) + (F.col("id") / 24).cast("int"),
                    hours=(F.col("id") % 24).cast("int"),
                )
            ).alias("ts"),
            F.lit(symbol).alias("symbol"),
            (F.col("id") + base).cast("double").alias("value"),
        )
    )


def _assert_matches_recompute(spark, source, target):
    want = _agg(_key_of(source.read())).orderBy("day", "symbol").collect()
    got = target.read().orderBy("day", "symbol").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


@pytest.fixture()
def tables(spark, tmp_path):
    source = LakeTable(spark, str(tmp_path / "src"), stat_cols=["ts"])
    target = LakeTable(spark, str(tmp_path / "agg"), stat_cols=["day"])
    return source, target


def test_refresh_lifecycle_incremental_and_exact(spark, tables):
    source, target = tables

    # 1. initial refresh = full build
    source.commit(
        _rows(spark, 0, 8, "BTC", 0).unionByName(_rows(spark, 0, 8, "ETH", 1000))
        # range-cluster by day so per-file day stats are tight and the
        # dirty-key rewrite can actually prune files
        .repartitionByRange(4, "ts")
    )
    v1 = refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    assert target.app_meta()[WATERMARK_KEY] == source.head_version()
    _assert_matches_recompute(spark, source, target)

    # 2. refresh with no source commits = no-op (no new version)
    assert refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"]) == v1
    assert target.head_version() == v1

    # 3. append touching ONLY days 8-9: dirty-bucket recompute, and the
    # target files fully below day 8 are CARRIED (same paths)
    before = set(target.pruned_files())
    source.commit(_rows(spark, 8, 10, "BTC", 50).repartitionByRange(2, "ts"))
    refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    _assert_matches_recompute(spark, source, target)
    after = set(target.pruned_files())
    carried = before & after
    assert carried, "refresh rewrote every file — not incremental"
    # every carried file is provably outside the dirty range (manifest
    # stats store dates as ISO strings — compare in that domain)
    snap = {fs.path: fs for fs in target._load_snapshot(target.head_version()).files}
    for p in carried:
        mx = snap[p].stats["day"][1]
        assert mx < "2024-01-09"

    # 4. LATE data: a commit into old day 1 invalidates just that bucket
    source.commit(_rows(spark, 1, 2, "ETH", 9000))
    refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    _assert_matches_recompute(spark, source, target)

    # 5. deletes that empty a bucket: day-9 BTC rows all vanish and the
    # rollup row disappears (upsert-with-deletes, one commit)
    day9 = source.read().filter(F.to_date("ts") == F.lit("2024-01-09"))
    source.delete(day9.select("ts", "symbol"), ["ts", "symbol"])
    refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    _assert_matches_recompute(spark, source, target)
    assert (
        target.read().filter(F.col("day") == F.lit("2024-01-09")).count() == 0
    )

    # 6. watermark is ATOMIC with the data: it always names source HEAD
    assert target.app_meta()[WATERMARK_KEY] == source.head_version()


def test_refresh_survives_source_vacuum(spark, tables):
    """A source vacuum that expired the watermark snapshot degrades the
    next refresh to a full rebuild — correct result, never an error."""
    source, target = tables
    source.commit(_rows(spark, 0, 3, "BTC", 0))
    refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    source.commit(_rows(spark, 3, 5, "BTC", 100), mode="overwrite")
    source.commit(_rows(spark, 5, 6, "ETH", 200))
    source.expire_snapshots(keep_last=1)  # watermark version is gone
    refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    _assert_matches_recompute(spark, source, target)


def test_refresh_requires_stat_key(spark, tmp_path):
    source = LakeTable(spark, str(tmp_path / "s"), stat_cols=["ts"])
    target = LakeTable(spark, str(tmp_path / "t"), stat_cols=["symbol"])
    source.commit(_rows(spark, 0, 1, "BTC", 0))
    with pytest.raises(ValueError, match="stat_cols"):
        refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])


def test_refresh_handles_null_key_buckets(spark, tables):
    """A null bucket key (null ts -> null day) is a real rollup group:
    it must refresh and delete like any other — plain key equality in
    the dirty-key joins would strand it stale after the initial build."""
    source, target = tables
    rows = _rows(spark, 0, 2, "BTC", 0)
    with_null = rows.unionByName(
        spark.createDataFrame(
            [(None, "BTC", 7.0), (None, "BTC", 9.0)],
            "ts timestamp, symbol string, value double",
        )
    )
    source.commit(with_null)
    refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    _assert_matches_recompute(spark, source, target)
    null_row = target.read().filter(F.col("day").isNull()).collect()
    assert len(null_row) == 1 and null_row[0]["total"] == 16.0

    # a later commit adds more null-ts rows: the null bucket is dirty
    source.commit(
        spark.createDataFrame(
            [(None, "BTC", 4.0)], "ts timestamp, symbol string, value double"
        )
    )
    refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    _assert_matches_recompute(spark, source, target)
    assert (
        target.read().filter(F.col("day").isNull()).collect()[0]["total"]
        == 20.0
    )

    # deleting every null-ts row empties the bucket: the rollup row goes
    null_keys = source.read().filter(F.col("ts").isNull())
    source.delete(null_keys.select("ts", "symbol"), ["ts", "symbol"])
    refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    _assert_matches_recompute(spark, source, target)
    assert target.read().filter(F.col("day").isNull()).count() == 0


def test_refresh_zero_churn_bumps_watermark_metadata_only(spark, tables):
    """A source interval whose CDF nets to ZERO rows (a compaction
    rewrites files with identical content) must advance the watermark
    metadata-only: every target file carries byte-identical — never a
    silent full-table rewrite of the rollup."""
    from financial_data_pipeline_spark.sources.laketable import compact

    source, target = tables
    source.commit(
        _rows(spark, 0, 4, "BTC", 0).repartition(6)  # small files
    )
    refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    before_files = set(target.pruned_files())
    before_head = target.head_version()

    compact(source, small_file_rows=10_000)  # content-identical rewrite
    v = refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"])
    assert v == before_head + 1  # watermark advanced in a new version
    assert target.app_meta()[WATERMARK_KEY] == source.head_version()
    assert set(target.pruned_files()) == before_files  # zero rewrites
    _assert_matches_recompute(spark, source, target)
    # and the refresh after the no-op is a true no-op (same head)
    assert (
        refresh_rollup(source, target, _key_of, _agg, ["day", "symbol"]) == v
    )
