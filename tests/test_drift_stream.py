"""Streaming windowed PSI (streaming/drift_stream.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_pipeline_spark.operators.drift import psi
from financial_data_pipeline_spark.streaming.drift_stream import (
    freeze_reference,
    streaming_psi,
)

SCHEMA = T.StructType(
    [T.StructField("ts", T.TimestampType()), T.StructField("x", T.DoubleType())]
)


def _rows(hour, values):
    t0 = dt.datetime(2025, 1, 1, hour)
    return [
        (t0 + dt.timedelta(minutes=i % 60), float(v))
        for i, v in enumerate(values)
    ]


def _drain(spark, src, reference, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    res = streaming_psi(stream, reference, "x", window="1 hour",
                        watermark="30 minutes")
    (
        res.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def test_streaming_psi_matches_batch_psi_per_window(spark, tmp_path):
    ref = spark.createDataFrame(
        [(float(v),) for v in range(100)], ["x"]
    )
    reference = freeze_reference(ref, "x", bins=10)

    # window 0: same distribution; window 1: shifted; window 2 (late
    # sentinel) advances the watermark so 0 and 1 close
    w0 = _rows(0, range(0, 100, 2))
    w1 = _rows(1, [v * 0.2 for v in range(0, 100, 2)])
    w2 = _rows(4, [50.0])
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    spark.createDataFrame(w0 + w1 + w2, SCHEMA).write.parquet(src + "/b1")
    _drain(spark, src + "/*", reference, out, ckpt)

    got = {
        r.window_start.hour: (r.psi, r.n_new)
        for r in spark.read.parquet(out).collect()
    }
    assert 0 in got and 1 in got and 4 not in got  # open window withheld

    for hour, vals in ((0, w0), (1, w1)):
        batch = psi(
            ref, spark.createDataFrame(vals, SCHEMA).select("x"), "x", bins=10
        ).first()
        assert abs(got[hour][0] - batch["psi"]) < 1e-9, hour
        assert got[hour][1] == len(vals)
    # regimes: stable window low, shifted window high
    assert got[0][0] < 0.1 < 0.25 < got[1][0]


def test_streaming_psi_merges_late_rows_across_restart(spark, tmp_path):
    ref = spark.createDataFrame([(float(v),) for v in range(100)], ["x"])
    reference = freeze_reference(ref, "x", bins=10)
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))

    # run 1: half of window 0's rows; watermark stays inside window 0
    spark.createDataFrame(_rows(0, range(0, 50, 2)), SCHEMA).write.parquet(
        src + "/b1"
    )
    _drain(spark, src + "/*", reference, out, ckpt)
    assert spark.read.schema(
        T.StructType(
            [
                T.StructField("window_start", T.TimestampType()),
                T.StructField("window_end", T.TimestampType()),
                T.StructField("psi", T.DoubleType()),
                T.StructField("n_new", T.LongType()),
            ]
        )
    ).parquet(out).count() == 0

    # run 2: the rest of window 0 + a watermark-advancing sentinel;
    # restored state merges and ONE row emits with the full count
    spark.createDataFrame(
        _rows(0, range(50, 100, 2)) + _rows(5, [50.0]), SCHEMA
    ).write.parquet(src + "/b2")
    _drain(spark, src + "/*", reference, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].n_new == 50


def test_streaming_js_matches_batch_js_per_window(spark, tmp_path):
    from financial_data_pipeline_spark.operators.drift import js_divergence
    from financial_data_pipeline_spark.streaming.drift_stream import streaming_js

    ref = spark.createDataFrame([(float(v),) for v in range(100)], ["x"])
    reference = freeze_reference(ref, "x", bins=10)

    w0 = _rows(0, range(0, 100, 2))
    w1 = _rows(1, [v * 0.2 for v in range(0, 100, 2)])
    w2 = _rows(4, [50.0])
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    spark.createDataFrame(w0 + w1 + w2, SCHEMA).write.parquet(src + "/b1")
    stream = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    res = streaming_js(stream, reference, "x", window="1 hour",
                       watermark="30 minutes")
    (
        res.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r.window_start.hour: (r.js_divergence, r.n_new)
        for r in spark.read.parquet(out).collect()
    }
    assert 0 in got and 1 in got and 4 not in got
    import math

    for hour, vals in ((0, w0), (1, w1)):
        batch = js_divergence(
            ref, spark.createDataFrame(vals, SCHEMA).select("x"), "x", bins=10
        ).first()
        assert abs(got[hour][0] - batch["js_divergence"]) < 1e-9, hour
    # bounded + regime separation
    assert 0 <= got[0][0] < got[1][0] <= math.log(2) + 1e-12


def test_streaming_benford_matches_batch_per_window(spark, tmp_path):
    import numpy as np

    from financial_data_pipeline_spark.operators.stats import benford_digit_test
    from financial_data_pipeline_spark.streaming.drift_stream import (
        streaming_benford,
    )

    rng = np.random.default_rng(47)
    # window 0: Benford-conforming (log-uniform); window 1: uniform
    # first digits (the fraud regime); window 4: watermark sentinel
    w0 = _rows(0, 10 ** rng.uniform(0, 4, 500))
    w1 = _rows(1, rng.uniform(1, 10, 500) * 10 ** rng.integers(0, 4, 500))
    w2 = _rows(4, [50.0])
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    spark.createDataFrame(w0 + w1 + w2, SCHEMA).write.parquet(src + "/b1")
    stream = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    res = streaming_benford(stream, "x", window="1 hour",
                            watermark="30 minutes")
    (
        res.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r.window_start.hour: r for r in spark.read.parquet(out).collect()
    }
    assert 0 in got and 1 in got and 4 not in got
    for hour, vals in ((0, w0), (1, w1)):
        batch = benford_digit_test(
            spark.createDataFrame(vals, SCHEMA).select("x"), "x"
        ).first()
        # batch output is rounded to 6dp; compare at that grain
        assert abs(got[hour].chi2 - batch["chi2"]) < 1e-5, hour
        assert abs(got[hour].p_value - batch["p_value"]) < 1e-5, hour
    assert got[0].p_value > 0.001      # conforming window accepted
    assert got[1].p_value < 1e-6       # uniform-digit window rejected


def test_streaming_chi2_matches_batch_per_window(spark, tmp_path):
    """Per closed window, the streaming chi-square must equal the
    batch hist_chi2_drift of (reference frame, window rows) — same
    bins, same zero-bin dof treatment, same Wilson-Hilferty p —
    and a drifted window must reject while an in-distribution one
    accepts."""
    import numpy as np

    from financial_data_pipeline_spark.operators.drift import hist_chi2_drift
    from financial_data_pipeline_spark.streaming.drift_stream import (
        streaming_chi2,
    )

    rng = np.random.default_rng(21)
    ref_vals = rng.normal(100.0, 5.0, 2000).tolist()
    ref = spark.createDataFrame([(v,) for v in ref_vals], "x double")
    reference = freeze_reference(ref, "x", bins=10)

    same_vals = rng.normal(100.0, 5.0, 800).tolist()
    moved_vals = rng.normal(130.0, 5.0, 800).tolist()
    src = str(tmp_path / "src")
    # the hour-9 sentinel advances the watermark so hours 1 and 5 close
    spark.createDataFrame(
        _rows(1, same_vals) + _rows(5, moved_vals) + _rows(9, [100.0]),
        SCHEMA,
    ).write.parquet(src)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    res = streaming_chi2(
        stream, reference, "x", window="1 hour", watermark="30 minutes"
    )
    (
        res.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r["window_start"].hour: r
        for r in spark.read.parquet(out).collect()
    }
    assert got[1]["p_value"] > 0.01  # in-distribution window accepted
    assert got[5]["p_value"] < 1e-6  # drifted window rejected

    # exact per-window equivalence with the batch operator
    for hour, vals in ((1, same_vals), (5, moved_vals)):
        win_df = spark.createDataFrame([(v,) for v in vals], "x double")
        batch = hist_chi2_drift(ref, win_df, "x", bins=10).first()
        assert abs(got[hour]["chi2"] - batch["chi2"]) < 1e-9
        assert got[hour]["dof"] == batch["dof"]
        assert abs(got[hour]["p_value"] - batch["p_value"]) < 1e-12


def test_stream_twin_queries_match_real_stream(spark, tmp_path):
    """The driver-registered ``windowed_psi_stream_twin`` (the
    streaming builder run as a batch plan) must emit the SAME rows a
    real micro-batched, checkpointed, watermark-driven run of the same
    builder emits on the same driver testdata — split across two
    drains plus a late sentinel so state carry and window closing are
    actually exercised. This is the link the driver's DuckDB gate
    rides: twin ≡ stream, twin ≡ oracle ⇒ stream ≡ oracle."""
    from financial_data_pipeline_spark.plans.driver_queries import QUERIES
    from financial_data_pipeline_spark.sources.adapters import events_as_ohlcv

    sf_dir = "/root/testdata/sf0.001"
    twin = {
        r.window_start_us: (r.psi, r.n_new)
        for r in QUERIES["windowed_psi_stream_twin"](spark, sf_dir).collect()
    }

    bars = events_as_ohlcv(spark, sf_dir)
    reference = freeze_reference(
        bars.filter(F.col("timestamp") < "2024-01-16").select("close"),
        "close",
        bins=10,
    )
    new = bars.filter(F.col("timestamp") >= "2024-01-16").select(
        "timestamp", "close"
    )
    # two interrupted drains split mid-stream: restart recovery with
    # state carry (the cut day's window spans both drains); arriving
    # in time order keeps every row inside the watermark
    cut = "2024-01-23 12:00:00"
    first = new.filter(F.col("timestamp") < cut)
    rest = new.filter(F.col("timestamp") >= cut)
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    first.write.parquet(src + "/b1")
    bar_schema = new.schema

    def drain():
        stream = spark.readStream.schema(bar_schema).parquet(src + "/*")
        res = streaming_psi(
            stream, reference, "close", ts="timestamp",
            window="1 day", watermark="2 hours",
        )
        (
            res.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    drain()
    rest.write.parquet(src + "/b2")
    drain()
    streamed = {
        int(r.window_start.timestamp() * 1_000_000): (r.psi, r.n_new)
        for r in spark.read.parquet(out).collect()
    }
    # append mode holds back windows the watermark never passed; every
    # window the stream DID close must match the twin exactly
    assert len(streamed) >= len(twin) - 2 and streamed
    for w, (psi_v, n) in streamed.items():
        assert w in twin
        assert twin[w][1] == n, w
        assert abs(twin[w][0] - round(psi_v, 6)) < 1e-9, w
