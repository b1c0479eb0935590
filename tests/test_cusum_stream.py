"""Streaming CUSUM ≡ batch closed form under arbitrary micro-batching,
with state carried across a query restart."""

from __future__ import annotations

import datetime as dt

import numpy as np

from financial_data_pipeline_spark.operators.drift import cusum_flags
from financial_data_pipeline_spark.streaming.cusum_stream import streaming_cusum

SCHEMA = "symbol string, timestamp timestamp, close double"


def _series(seed, n, shift_at=None):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1.0, n)
    if shift_at is not None:
        x[shift_at:] += 2.5
    t0 = dt.datetime(2025, 1, 1)
    return [
        (t0 + dt.timedelta(minutes=i), float(v)) for i, v in enumerate(x)
    ]


def _drain(spark, src, ref, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    res = streaming_cusum(stream, ref, drift=0.25, threshold=6.0)
    (
        res.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def test_streaming_cusum_equals_batch_across_restart(spark, tmp_path):
    a = _series(1, 240, shift_at=180)
    b = _series(2, 240)
    rows = [("A", t, v) for t, v in a] + [("B", t, v) for t, v in b]
    full = spark.createDataFrame(rows, SCHEMA)

    # frozen reference stats (deploy-time contract): here the full
    # sample's own mean/sd so batch and stream standardize identically
    from pyspark.sql import functions as F

    stats = {
        r.symbol: (r.mu, r.sd)
        for r in full.groupBy("symbol")
        .agg(
            F.avg("close").alias("mu"),
            F.stddev_samp("close").alias("sd"),
        )
        .collect()
    }

    # stream the same rows in two drops with a restart in between,
    # split mid-series so state must carry
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    cut = dt.datetime(2025, 1, 1, 1, 40)
    first = [r for r in rows if r[1] < cut]
    rest = [r for r in rows if r[1] >= cut]
    spark.createDataFrame(first, SCHEMA).write.parquet(src + "/b1")
    _drain(spark, src + "/*", stats, out, ckpt)
    spark.createDataFrame(rest, SCHEMA).write.parquet(src + "/b2")
    _drain(spark, src + "/*", stats, out, ckpt)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["symbol", "timestamp"])
        .reset_index(drop=True)
    )
    ref_df = spark.createDataFrame(
        [(s, float(m), float(sd)) for s, (m, sd) in stats.items()],
        "symbol string, mu double, sd double",
    )
    want = (
        cusum_flags(full, "close", drift=0.25, threshold=6.0, ref_stats=ref_df)
        .select("symbol", "timestamp", "cusum_up", "cusum_down", "changepoint")
        .toPandas()
        .sort_values(["symbol", "timestamp"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 480
    np.testing.assert_allclose(
        got.cusum_up.values, want.cusum_up.values, rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        got.cusum_down.values, want.cusum_down.values, rtol=0, atol=1e-9
    )
    assert (got.changepoint.values == want.changepoint.values).all()
    # the planted shift in A actually alarms; B stays quiet
    ga = got[got.symbol == "A"]
    assert ga.changepoint.any()
    assert not got[got.symbol == "B"].changepoint.any()


def test_streaming_cusum_drops_unknown_keys(spark, tmp_path):
    rows = [("Z", dt.datetime(2025, 1, 1), 1.0)]
    src, out, ckpt = (str(tmp_path / p) for p in ("srcu", "outu", "ckptu"))
    spark.createDataFrame(rows, SCHEMA).write.parquet(src + "/b1")
    _drain(spark, src + "/*", {"A": (0.0, 1.0)}, out, ckpt)
    assert spark.read.parquet(out).count() == 0
