"""Streaming Hampel ≡ batch windowed operator under arbitrary
micro-batching, with the window state carried across a restart."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from financial_data_pipeline_spark.operators.cleaning import hampel_flags
from financial_data_pipeline_spark.streaming.hampel_stream import streaming_hampel

SCHEMA = "symbol string, timestamp timestamp, close double"


def _series(seed, n, spikes=()):
    rng = np.random.default_rng(seed)
    x = 100 + rng.normal(0, 0.5, n)
    for i in spikes:
        x[i] += 12.0
    t0 = dt.datetime(2025, 1, 1)
    return [(t0 + dt.timedelta(minutes=i), float(v)) for i, v in enumerate(x)]


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    res = streaming_hampel(stream, n=11, k=5.0)
    (
        res.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def test_streaming_hampel_equals_batch_across_restart(spark, tmp_path):
    a = _series(1, 150, spikes=(40, 90))
    b = _series(2, 150, spikes=(75,))
    rows = [("A", t, v) for t, v in a] + [("B", t, v) for t, v in b]
    full = spark.createDataFrame(rows, SCHEMA)

    batch = (
        hampel_flags(full, "close", n=11, k=5.0)
        .orderBy("symbol", "timestamp")
        .toPandas()
    )

    # split mid-window so the restart carries a PARTIAL deque
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    cut = dt.datetime(2025, 1, 1) + dt.timedelta(minutes=67)
    early = [r for r in rows if r[1] < cut]
    late = [r for r in rows if r[1] >= cut]
    spark.createDataFrame(early, SCHEMA).write.parquet(src + "/b1")
    _drain(spark, src + "/*", out, ckpt)          # first run, then "restart"
    spark.createDataFrame(late, SCHEMA).write.parquet(src + "/b2")
    _drain(spark, src + "/*", out, ckpt)

    got = (
        spark.read.parquet(out)
        .orderBy("symbol", "timestamp")
        .toPandas()
    )
    assert len(got) == len(batch)
    assert np.allclose(
        got.rolling_median.values.astype(float),
        batch.close_rolling_median.values.astype(float),
        rtol=1e-12,
        equal_nan=True,
    )
    ga = got.hampel_outlier.astype("boolean")
    ba = batch.close_hampel_outlier.astype("boolean")
    assert (ga.isna() == ba.isna()).all()
    assert (ga.dropna().values == ba.dropna().values).all()
    # the planted spikes are flagged
    flagged = got[got.hampel_outlier.fillna(False).astype(bool)]
    mins = {
        (r.symbol, int((r.timestamp - dt.datetime(2025, 1, 1)).total_seconds() // 60))
        for r in flagged.itertuples()
    }
    assert {("A", 40), ("A", 90), ("B", 75)} <= mins
