"""Checkpoint stop/restart recovery for the streaming operators.

The reference's continuous aggregate survives a TimescaleDB restart
because the refresh ledger is transactional; the Structured Streaming
twin must survive a query restart the same way. These tests run a
query, stop it, add source data, restart from the SAME checkpoint, and
assert the three recovery properties:

1. source offsets restored — batch-1 files are not re-ingested, so no
   finalized window is emitted twice (exactly-once sink);
2. aggregation state restored — a window that received rows in BOTH
   runs emits ONE row with the merged aggregate;
3. watermark restored — a row older than the restored watermark is
   dropped on arrival in run 2 (it cannot resurrect a closed window).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_pipeline_spark.streaming.continuous_aggregate import (
    OHLCV_EVENT_SCHEMA,
    continuous_ohlcv,
    drain_to_parquet,
    read_bar_stream,
)
from financial_data_pipeline_spark.streaming.dedup_stream import dedup_stream


def _bar(ts: dt.datetime, o: float, v: float) -> tuple:
    return (ts, "BTCUSDT", o, o + 1, o - 1, o + 0.5, v)


def test_windowed_agg_recovers_state_across_restart(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2025, 1, 1, 0, 0, 0)

    def h(hours: float) -> dt.datetime:
        return t + dt.timedelta(hours=hours)

    # run 1: window 00:00 gets two rows; window 04:00 gets one row and
    # stays OPEN in state (watermark only reaches 05:00 - 3h = 02:00)
    rows1 = [
        _bar(h(0.1), 100.0, 10.0),
        _bar(h(0.3), 101.0, 20.0),
        _bar(h(4.5), 300.0, 30.0),
        _bar(h(5.0), 400.0, 40.0),
    ]
    spark.createDataFrame(rows1, OHLCV_EVENT_SCHEMA).write.parquet(str(src / "b1"))
    stream = read_bar_stream(spark, str(src / "*"))
    result = continuous_ohlcv(stream, timeframe="1 hour", watermark="3 hours")
    drain_to_parquet(result, out, ckpt)

    # run 2 input: a second row for the still-open 04:00 window (must
    # merge with recovered state), a row advancing the watermark to
    # 09:00 (finalizes 04:00 and 05:00), and a duplicate-shaped row
    # behind the restored 02:00 watermark (must be dropped, NOT start
    # a fresh 00:00 window).
    rows2 = [
        _bar(h(4.75), 310.0, 15.0),
        _bar(h(0.1), 999.0, 999.0),  # late: behind restored watermark
        _bar(h(12.0), 500.0, 50.0),
    ]
    spark.createDataFrame(rows2, OHLCV_EVENT_SCHEMA).write.parquet(str(src / "b2"))
    stream2 = read_bar_stream(spark, str(src / "*"))
    result2 = continuous_ohlcv(stream2, timeframe="1 hour", watermark="3 hours")
    drain_to_parquet(result2, out, ckpt)

    got = {
        r["bucket_ts"]: r
        for r in spark.read.parquet(out).collect()
    }
    # exactly-once: each finalized bucket appears exactly once
    assert spark.read.parquet(out).count() == len(got)
    # 00:00 finalized with run-1 rows only; the late 999 row is dropped
    b0 = got[h(0)]
    assert (b0["open"], b0["volume"]) == (100.0, 30.0)
    # 04:00 merged run-1 + run-2 rows: open is the 04:30 row (min_by ts),
    # volume sums across the restart — state was recovered, not rebuilt
    b4 = got[h(4)]
    assert (b4["open"], b4["volume"]) == (300.0, 45.0)
    # 05:00 finalized from run-1 state after run-2's watermark advance
    b5 = got[h(5)]
    assert (b5["open"], b5["volume"]) == (400.0, 40.0)
    # 12:00 still open (watermark 09:00) — append mode withholds it
    assert h(12) not in got


def test_dedup_state_survives_restart(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("event_time", T.TimestampType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)
    src = tmp_path / "docs"
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "docs_ckpt")

    rows1 = [
        (t0, 1, "alpha beta"),
        (t0 + dt.timedelta(minutes=1), 2, "gamma delta"),
    ]
    spark.createDataFrame(rows1, schema).write.parquet(str(src / "b1"))
    s1 = spark.readStream.schema(schema).parquet(str(src / "*"))
    drain_to_parquet(dedup_stream(s1, watermark="30 minutes"), out, ckpt)

    # run 2: an exact duplicate of a run-1 doc inside the watermark
    # horizon plus one new doc; restart from the same checkpoint
    rows2 = [
        (t0 + dt.timedelta(minutes=2), 3, "alpha beta"),  # cross-restart dup
        (t0 + dt.timedelta(minutes=3), 4, "epsilon zeta"),
    ]
    spark.createDataFrame(rows2, schema).write.parquet(str(src / "b2"))
    s2 = spark.readStream.schema(schema).parquet(str(src / "*"))
    drain_to_parquet(dedup_stream(s2, watermark="30 minutes"), out, ckpt)

    got = spark.read.parquet(out)
    assert got.count() == 3  # dup dropped ACROSS the restart
    assert {r["doc_id"] for r in got.collect()} == {1, 2, 4}
    assert got.filter(F.col("text") == "alpha beta").count() == 1
