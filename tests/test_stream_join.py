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
