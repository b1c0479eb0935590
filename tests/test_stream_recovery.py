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


def test_hopping_window_stream_matches_batch(spark, tmp_path):
    """Streaming hopping-window aggregate == the identical batch
    groupBy(window(ts, size, slide)) — every bar contributes to
    window/slide overlapping buckets in both engines."""
    from financial_data_pipeline_spark.streaming.continuous_aggregate import (
        hopping_volume,
    )

    t = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        _bar(t + dt.timedelta(minutes=m), 100.0 + m, float(m + 1))
        for m in range(0, 300, 7)
    ]
    src = tmp_path / "hop_src"
    spark.createDataFrame(rows, OHLCV_EVENT_SCHEMA).write.parquet(str(src / "b1"))

    stream = read_bar_stream(spark, str(src / "*"))
    q = (
        hopping_volume(stream, window="2 hours", slide="30 minutes")
        .writeStream.format("memory")
        .queryName("hop_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "hop_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_df = spark.createDataFrame(rows, OHLCV_EVENT_SCHEMA)
    expect = (
        batch_df.groupBy("symbol", F.window("timestamp", "2 hours", "30 minutes"))
        .agg(
            F.sum("volume").alias("volume"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.count(F.lit(1)).alias("n_bars"),
        )
        .select(
            "symbol", F.col("window.start").alias("bucket_ts"),
            "volume", "high", "low", "n_bars",
        )
    )
    got = {tuple(r) for r in spark.table("hop_out").collect()}
    want = {tuple(r) for r in expect.collect()}
    assert got == want
    # each bar lands in window/slide = 4 buckets
    n_buckets = len({r[1] for r in want})
    assert n_buckets > 4


def test_stream_upsert_reemits_changed_windows(spark, tmp_path):
    """UPDATE-mode windowed agg → foreachBatch keyed upsert: a window
    that receives late rows in a second run is re-emitted and
    overwrites its serving-store row (idempotent re-delivery), instead
    of appending a duplicate."""
    from financial_data_pipeline_spark.streaming.serving import stream_upsert

    src = tmp_path / "serve_src"
    ckpt = str(tmp_path / "serve_ckpt")
    rec = tmp_path / "upserts.txt"

    def executor(dsn, sql, rows, page_size):
        with open(rec, "a") as f:
            for r in rows:
                f.write(repr(r) + "\n")
        assert "ON CONFLICT" in sql and "DO UPDATE" in sql

    t = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows1 = [_bar(t + dt.timedelta(minutes=10), 100.0, 10.0)]
    spark.createDataFrame(rows1, OHLCV_EVENT_SCHEMA).write.parquet(str(src / "b1"))
    agg = continuous_ohlcv(
        read_bar_stream(spark, str(src / "*")), "1 hour", "3 hours"
    )
    stream_upsert(agg, "dsn://x", "bars_1h", ["symbol", "bucket_ts"], ckpt,
                  executor=executor)

    # run 2: another row in the SAME window — update mode re-emits it
    rows2 = [_bar(t + dt.timedelta(minutes=40), 101.0, 5.0)]
    spark.createDataFrame(rows2, OHLCV_EVENT_SCHEMA).write.parquet(str(src / "b2"))
    agg2 = continuous_ohlcv(
        read_bar_stream(spark, str(src / "*")), "1 hour", "3 hours"
    )
    stream_upsert(agg2, "dsn://x", "bars_1h", ["symbol", "bucket_ts"], ckpt,
                  executor=executor)

    emitted = rec.read_text().strip().splitlines()
    assert len(emitted) == 2  # same window emitted once per run
    # final emission carries the merged aggregate (volume 10 + 5)
    assert "15.0" in emitted[-1]


def test_streaming_curation_pipeline_end_to_end(spark, tmp_path):
    """The batch curation operators compose unchanged onto a stream:
    ingest → exact dedup (stateful) → Gopher quality filter → PII
    redaction (both map-only) in ONE streaming query, checkpointed to
    a parquet sink. Ingest-time curation, not a post-hoc batch sweep."""
    from financial_data_pipeline_spark.operators.curation import (
        gopher_rules,
        pii_redact,
    )

    schema = T.StructType(
        [
            T.StructField("event_time", T.TimestampType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    good = (
        "The quarterly report shows steady growth across regions. "
        "Management expects the trend to continue through next year. "
    ) * 4
    t0 = dt.datetime(2025, 1, 1, 9, 0, 0)
    rows = [
        (t0, 1, good + "Contact: alice@example.com"),
        (t0 + dt.timedelta(minutes=1), 2, good + "Contact: alice@example.com"),  # dup
        (t0 + dt.timedelta(minutes=2), 3, "too short"),  # fails Gopher min_words
        (t0 + dt.timedelta(minutes=3), 4, good + "Server 10.0.0.1 responded."),
    ]
    src = tmp_path / "cur_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    deduped = dedup_stream(stream, watermark="30 minutes")
    curated = pii_redact(
        gopher_rules(deduped).filter(F.col("keep")).drop("keep")
    )
    out = str(tmp_path / "cur_out")
    drain_to_parquet(curated, out, str(tmp_path / "cur_ckpt"))

    got = spark.read.parquet(out)
    ids = {r["doc_id"] for r in got.collect()}
    # exactly ONE of the identical docs survives (in-batch winner is
    # arbitrary for dropDuplicatesWithinWatermark), low-quality 3 drops
    assert len(ids & {1, 2}) == 1 and 3 not in ids and 4 in ids
    texts = {r["doc_id"]: r["text"] for r in got.collect()}
    dup_id = (ids & {1, 2}).pop()
    assert "<EMAIL>" in texts[dup_id]
    assert "alice@example.com" not in texts[dup_id]
    assert "<IP>" in texts[4] and "10.0.0.1" not in texts[4]


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Streaming session windows (F.session_window state merge) == the
    identical batch plan, across a restart that splits one session in
    half — the restored state must EXTEND the open session, not start a
    new one."""
    import datetime as dt

    from pyspark.sql import types as T

    from financial_data_pipeline_spark.streaming.continuous_aggregate import (
        session_window_events,
    )

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    t0 = dt.datetime(2025, 1, 1, 9, 0, 0)

    def ev(minute, uid):
        return (t0 + dt.timedelta(minutes=minute), uid)

    # user 1: one session 0-20' split across the restart at 10', then
    # a separate session at 60'; user 2: a single event
    part1 = [ev(0, 1), ev(10, 1), ev(5, 2)]
    part2 = [ev(20, 1), ev(60, 1), ev(200, 1)]  # 200' advances watermark
    src = tmp_path / "sess_src"
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    spark.createDataFrame(part1, schema).write.parquet(str(src / "b1"))

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        drain_to_parquet(
            session_window_events(stream, gap="30 minutes", watermark="1 hour"),
            out,
            ckpt,
        )

    drain()
    spark.createDataFrame(part2, schema).write.parquet(str(src / "b2"))
    drain()

    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    batch = session_window_events(
        spark.createDataFrame(part1 + part2, schema), gap="30 minutes"
    )
    want = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in batch.collect()
    }
    # append mode holds back sessions the final watermark hasn't passed
    # (the 200' sentinel); every emitted session must match batch
    assert got
    assert (1, t0, t0 + dt.timedelta(minutes=50)) in got  # merged across restart
    for k, n in got.items():
        assert want[k] == n, k
