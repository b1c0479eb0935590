"""Streaming per-window trending top-k (streaming/trending.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_pipeline_spark.streaming.trending import (
    rank_top_k,
    trending_to_parquet,
    window_token_counts,
)

SCHEMA = T.StructType(
    [T.StructField("ts", T.TimestampType()), T.StructField("token", T.StringType())]
)


def _rows(hour, tokens):
    t0 = dt.datetime(2025, 1, 1, hour)
    return [
        (t0 + dt.timedelta(seconds=i), tok) for i, tok in enumerate(tokens)
    ]


def test_trending_topk_per_closed_window(spark, tmp_path):
    # hour 0: a dominant, b second; hour 1: flipped; hour 9 sentinel
    # advances the watermark so both close
    data = (
        _rows(0, ["a"] * 5 + ["b"] * 3 + ["c"] * 1)
        + _rows(1, ["b"] * 4 + ["c"] * 2 + ["a"] * 1)
        + _rows(9, ["z"])
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(data, SCHEMA).write.parquet(src + "/b1")

    stream = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    counts = window_token_counts(stream, window="1 hour", watermark="1 hour")
    trending_to_parquet(counts, out, ckpt, k=2)

    got = spark.read.parquet(out)
    by_win = {
        (r.window_start.hour, r.rank): (r.token, r.n)
        for r in got.collect()
    }
    assert by_win[(0, 1)] == ("a", 5) and by_win[(0, 2)] == ("b", 3)
    assert by_win[(1, 1)] == ("b", 4) and by_win[(1, 2)] == ("c", 2)
    assert not any(h == 9 for h, _ in by_win)  # open window withheld

    # streaming result == batch rank over batch counts, per closed window
    batch_counts = (
        spark.createDataFrame(data, SCHEMA)
        .filter(F.hour("ts") < 9)
        .groupBy(F.window("ts", "1 hour").alias("w"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "token",
            "n",
        )
    )
    want = {
        (r.window_start.hour, r.rank): (r.token, r.n)
        for r in rank_top_k(batch_counts, 2).collect()
    }
    assert by_win == want


def test_trending_never_ranks_a_window_twice_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: hour 0 stays OPEN (watermark short of closing it)
    spark.createDataFrame(
        _rows(0, ["a", "a", "b"]), SCHEMA
    ).write.parquet(src + "/b1")
    stream = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    counts = window_token_counts(stream, window="1 hour", watermark="30 minutes")
    trending_to_parquet(counts, out, ckpt, k=2)
    assert spark.read.schema(
        "window_start timestamp, window_end timestamp, token string, n long, rank int"
    ).parquet(out).count() == 0

    # run 2: more hour-0 rows + a sentinel; the window closes ONCE with
    # the merged counts
    spark.createDataFrame(
        _rows(0, ["b", "b", "b"]) + _rows(5, ["z"]), SCHEMA
    ).write.parquet(src + "/b2")
    stream = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    counts = window_token_counts(stream, window="1 hour", watermark="30 minutes")
    trending_to_parquet(counts, out, ckpt, k=2)
    rows = spark.read.parquet(out).filter("window_start < '2025-01-01 05:00'")
    got = {(r.token, r.n, r.rank) for r in rows.collect()}
    assert got == {("b", 4, 1), ("a", 2, 2)}
