"""Adapters mapping the driver testdata onto the engine's data model.

FIXTURES.md T6: the ``events`` table (event_id, ts, user_id, event_type,
value, props) is the timestamped fact standing in for the OHLCV stream —
``event_type`` plays the ``symbol`` role and ``value`` the price role.
``events_as_ohlcv`` derives an honest OHLCV bar table from it by
bucketing events per type (exactly how real trade ticks become candles),
so every downstream OHLCV operator (cleaning, indicators, resample,
splits) runs on driver-provided data rather than synthesized input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Timestamp columns per driver table (TESTDATA.md): stored as INT64
# TIMESTAMP(NANOS) parquet, surfaced as long under ``nanosAsLong`` and
# converted here to microsecond timestamps (matching DuckDB's read).
TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


# Schema memo (r9, guide §6.2 — declared schema beats re-inference):
# ``spark.read.parquet`` runs a one-task schema-inference job per call
# (~0.15-0.25 s warm); with 1-3 ``load_table`` calls in nearly every
# registered query, that fixed cost dominated the sub-second bench
# tail. The memo holds ONLY the inferred StructType — pure metadata,
# the stand-in for a real deployment's catalog/metastore entry; every
# query still builds a fresh plan and scans the parquet (no data, no
# results, nothing persisted across processes). Keyed by the file's
# (mtime, size) so a rewritten path (fuzz harnesses) re-infers.
_SCHEMA_MEMO: dict[tuple, "object"] = {}


def _parquet_with_schema(spark: SparkSession, path: str) -> DataFrame:
    import os

    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        # non-local / unstat-able path: fall back to plain inference
        return spark.read.parquet(path)
    sch = _SCHEMA_MEMO.get(key)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_MEMO[key] = sch
    return spark.read.schema(sch).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = _parquet_with_schema(spark, f"{sf_dir}/{name}.parquet")
    for c in TS_COLUMNS.get(name, []):
        if c not in df.columns:
            continue
        dtype = dict(df.dtypes)[c]
        if dtype == "bigint":
            # Integer `div`, not `/`: nanos ≈ 1.7e18 exceeds double's 2^53
            # mantissa, so float division would be off by ±1 µs.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtype == "timestamp_ntz":
            # µs-precision files read as NTZ; session TZ is UTC so the
            # cast is a wall-clock identity, and downstream unix_micros
            # (which rejects NTZ) works uniformly.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def events_as_ohlcv(
    spark: SparkSession, sf_dir: str, timeframe_minutes: int = 60
) -> DataFrame:
    """Bucket events into per-type OHLCV bars.

    open = value of the earliest event in the bucket (ties broken by
    event_id — deterministic), close = latest, high/low = max/min,
    volume = sum(value). Epoch-aligned fixed buckets; identical
    semantics are expressible in the DuckDB oracle with
    ``time_bucket`` + ``arg_min``/``arg_max`` on the same tiebreaker.
    """
    ev = load_table(spark, sf_dir, "events")
    secs = timeframe_minutes * 60
    bucket_us = F.floor(F.unix_micros("ts") / F.lit(secs * 1_000_000)) * F.lit(
        secs * 1_000_000
    )
    bucket = F.timestamp_micros(bucket_us)
    # Deterministic first/last: order by (offset-within-bucket, event_id)
    # encoded as one sortable int64 (offset < timeframe ≤ 2^42 µs, so
    # offset·2^20 + event_id fits with headroom).
    order_key = (F.unix_micros("ts") - bucket_us) * F.lit(1024 * 1024) + F.col(
        "event_id"
    )
    return (
        ev.groupBy(F.col("event_type").alias("symbol"), bucket.alias("timestamp"))
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.sum("value").alias("volume"),
        )
    )


EVENTS_AS_OHLCV_SQL = """
SELECT
  event_type AS symbol,
  make_timestamp((epoch_us(ts) // {secs_us}) * {secs_us}) AS timestamp,
  arg_min(value, (epoch_us(ts) - (epoch_us(ts) // {secs_us}) * {secs_us}) * 1048576 + event_id) AS open,
  max(value) AS high,
  min(value) AS low,
  arg_max(value, (epoch_us(ts) - (epoch_us(ts) // {secs_us}) * {secs_us}) * 1048576 + event_id) AS close,
  sum(value) AS volume
FROM events
GROUP BY 1, 2
"""


def events_as_ohlcv_sql(timeframe_minutes: int = 60) -> str:
    """DuckDB twin of :func:`events_as_ohlcv` (oracle building block)."""
    return EVENTS_AS_OHLCV_SQL.format(secs_us=timeframe_minutes * 60 * 1_000_000)
