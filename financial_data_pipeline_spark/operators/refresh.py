"""Materialized-aggregate refresh over the archive lake (SURVEY.md §2.10).

The reference's continuous aggregate is refreshed by a TimescaleDB
policy: every hour, recompute the 1-hour buckets inside the
``[now()-start_offset, now()-end_offset]`` window and swap them into
the materialized view transactionally (``timescaledb_schema.sql:49-66``).
``streaming/continuous_aggregate.py`` is the event-driven rendering;
this module is the cron/batch rendering over the parquet lake:

1. read ONLY the archive partitions intersecting the refresh window
   (Catalyst partition pruning on ``year``/``month`` — the reader never
   lists, let alone scans, cold months);
2. recompute the bucket aggregates for that window with the exact
   batch resample expressions;
3. swap them in with **dynamic partition overwrite** — only the
   ``year=/month=`` output partitions the refresh actually produced
   are replaced; every other partition of the aggregate table is
   untouched. Re-running the same refresh is idempotent, the same
   contract the streaming path gets from its keyed upsert
   (``streaming/serving.py``).

At 100 TB this is the cheap path for late-data correction: a refresh
window of days touches a handful of partitions regardless of table
size, and the overwrite is a metadata swap per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators import resample


def _window_filter(start: str, end: str):
    start_c, end_c = (
        F.lit(start).cast("timestamp"),
        F.lit(end).cast("timestamp"),
    )
    ym = F.col("year") * 100 + F.col("month")
    return (
        (ym >= F.year(start_c) * 100 + F.month(start_c))
        & (ym <= F.year(end_c) * 100 + F.month(end_c))
        & F.col("timestamp").between(start_c, end_c)
    )


def refresh_aggregate(
    spark: SparkSession,
    archive_root: str,
    agg_root: str,
    timeframe: str = "1h",
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Recompute the ``timeframe`` OHLCV aggregate for the refresh
    window ``[start, end]`` from the raw archive and swap the affected
    partitions of ``agg_root``; returns the refreshed buckets.

    With ``start``/``end`` omitted the whole archive is (re)aggregated
    — the initial materialization. The year/month predicate prunes at
    the partition level; the timestamp predicate prunes row groups
    inside the boundary months (the archive files are time-sorted).
    """
    src = spark.read.parquet(archive_root)
    if start and end:
        src = src.filter(_window_filter(start, end))
    bars = resample.resample_ohlcv(
        src.select(
            "timestamp", "symbol", "open", "high", "low", "close", "volume"
        ),
        timeframe,
        fill_gaps=False,
    )
    out = bars.withColumns(
        {"year": F.year("bucket_ts"), "month": F.month("bucket_ts")}
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("year", "month")
        .parquet(agg_root)
    )
    return out


def incremental_window_refresh(
    base,
    since_version: int,
    compute,
    lookback,
    ts_col: str = "timestamp",
) -> DataFrame | None:
    """Recompute a window-derived table for ONLY the rows added to a
    :class:`~financial_data_pipeline_spark.sources.laketable.LakeTable`
    after ``since_version`` — the lake-side incremental view
    maintenance the manifest diff enables.

    ``compute`` is any plan adding window-derived columns whose frame
    never reaches further back than ``lookback`` (a
    ``datetime.timedelta``) — e.g. SMA(n)/ATR(n) with n·interval ≤
    lookback. The recipe:

    1. ``added_files(since_version)`` — the delta file set straight
       from the manifest diff (no listing, no scan);
    2. context read = delta's min timestamp − lookback, served through
       the table's stats-based FILE pruning — old history files are
       never opened;
    3. run ``compute`` over context + delta, keep only rows at/after
       the delta start.

    Output rows equal the same compute over the FULL table restricted
    to the delta rows (equality pinned in tests); cost scales with
    |delta| + |lookback window|, not table size. Returns ``None`` when
    nothing was added.
    """
    spark = base.spark
    delta_paths = base.added_files(since_version)
    if not delta_paths:
        return None
    delta = spark.read.parquet(*delta_paths)
    start = delta.agg(F.min(ts_col)).first()[0]
    if start is None:
        return None
    look_start = start - lookback
    ctx = base.read(
        pred_col=ts_col, lo=look_start.isoformat()
    ).filter(F.col(ts_col) >= F.lit(look_start))
    return compute(ctx).filter(F.col(ts_col) >= F.lit(start))
