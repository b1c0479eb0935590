"""Structured Streaming continuous-aggregate analog (SURVEY.md §2.10).

The reference's only streaming-shaped artifact is the TimescaleDB
continuous aggregate: a 1-hour OHLCV materialized view refreshed hourly
with a 3h→1h lag window (``timescaledb_schema.sql:49-66``). The Spark
rendering is a Structured Streaming job: file/kafka source → watermark
(the refresh-lag analog: how long to wait for late bars before a bucket
is final) → tumbling-window OHLCV aggregation → append-mode sink.

The aggregation expressions are IDENTICAL to the batch resample
(``operators/resample.py``) — same min_by/max_by/sum per (symbol,
window) — so batch and streaming produce the same bars for the same
input; the test drives ``Trigger.AvailableNow`` over a file directory
and diffs against the batch operator.

Scale notes: state is one row per open (symbol, bucket) window and is
dropped once the watermark passes — bounded by symbol-count ×
(watermark / timeframe). No custom stateful operator is needed. The
reference's semantics are tumbling-only; ``hopping_volume`` adds the
overlapping-window variant (beyond-reference, see its docstring),
and sessions live in ``operators/sessionize.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

OHLCV_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
    ]
)


def read_bar_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType = OHLCV_EVENT_SCHEMA,
) -> DataFrame:
    """File-source stream of OHLCV bars (new files = new micro-batch)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def continuous_ohlcv(
    stream: DataFrame,
    timeframe: str = "1 hour",
    watermark: str = "3 hours",
    ts: str = "timestamp",
) -> DataFrame:
    """Windowed OHLCV rollup with late-data watermark.

    ``watermark`` mirrors the continuous aggregate's ``start_offset``
    (3 h): buckets stay open for that long past max-seen event time,
    then finalize and emit (append mode) — the same "refresh with lag"
    contract, but event-driven instead of cron.
    """
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.col("symbol"), F.window(F.col(ts), timeframe))
        .agg(
            F.min_by("open", ts).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", ts).alias("close"),
            F.sum("volume").alias("volume"),
        )
        .select(
            "symbol",
            F.col("window.start").alias("bucket_ts"),
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


def run_available_now(
    result: DataFrame, query_name: str, checkpoint_dir: str
) -> None:
    """Drain everything currently in the source into the in-memory table
    ``query_name`` and stop — the batch-refresh analog, used by tests.

    Complete output mode: with AvailableNow the watermark never
    advances past the final micro-batch, so append mode would hold the
    tail buckets back; complete emits every bucket, which is exactly
    the materialized-view refresh semantics.
    """
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drain_to_parquet(
    result: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain the currently-available source into an append-mode parquet
    sink and stop — the restartable production shape.

    Restart with the SAME ``checkpoint_dir`` and the query resumes
    exactly where it left off: source offsets (files already ingested),
    the event-time watermark, and open-window aggregation state are all
    restored from the checkpoint, and the file sink's ``_spark_metadata``
    manifest makes output exactly-once (readers see only committed
    files). This is the fault-tolerance contract a 1000-executor ingest
    job relies on; ``tests/test_stream_recovery.py`` proves it across a
    stop/restart cycle.
    """
    q = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def session_window_events(
    stream: DataFrame,
    gap: str = "30 minutes",
    ts: str = "ts",
    key: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-key session windows via ``F.session_window`` — Spark's
    native streaming sessionization: consecutive events closer than
    ``gap`` merge into one session whose window is
    ``[first_event, last_event + gap)`` (end-exclusive: an event
    landing exactly at the current end starts a NEW session). State is
    the open sessions per key, merged as events arrive and closed at
    the watermark — the dynamic-window operator the fixed ``window()``
    buckets can't express.

    The same call works on a batch frame (watermark no-op), which is
    what the driver's ``session_window_stream_twin`` oracle-checks
    against a gaps-and-islands SQL twin.
    """
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def hopping_volume(
    stream: DataFrame,
    window: str = "2 hours",
    slide: str = "30 minutes",
    watermark: str = "3 hours",
    ts: str = "timestamp",
) -> DataFrame:
    """Hopping (sliding) window aggregate: every bar lands in
    ``window/slide`` overlapping buckets, giving a smoothed trailing
    volume/high/low series per symbol — the streaming twin of the
    batch ROW/RANGE-frame windows.

    State per symbol is (window/slide) × open-bucket rows and is
    evicted at the watermark like the tumbling case; Spark expands each
    event to its owning buckets before the shuffle, so the shuffle
    carries (window/slide)× rows — keep the ratio small (4 here) at
    100 TB, or pre-aggregate to coarse tumbling buckets first and hop
    over those.
    """
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.col("symbol"), F.window(F.col(ts), window, slide))
        .agg(
            F.sum("volume").alias("volume"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.count(F.lit(1)).alias("n_bars"),
        )
        .select(
            "symbol",
            F.col("window.start").alias("bucket_ts"),
            "volume",
            "high",
            "low",
            "n_bars",
        )
    )
