"""Pandas-API-on-Spark front door.

The reference's whole user base writes pandas (`technical_indicators.py`,
`data_cleaner.py` are pandas end-to-end). `pyspark.pandas` lets those
users keep their idioms while executing on the distributed engine —
these tests pin that the idioms the reference leans on produce the
SAME numbers as (a) real pandas and (b) this repo's DataFrame
operators, so either surface is a valid entry point.

(`ewm(adjust=False)` is absent from pyspark.pandas 4.1 — the repo's
grouped-map kernel `indicators.with_ema` is the supported route for
exact EMA; pinned here by its existing pandas-differential tests.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.sources import synthetic


@pytest.fixture(scope="module")
def bars_pdf(spark):
    return (
        synthetic.synthetic_ohlcv(
            spark, ["BTCUSDT"], "2025-01-01", "2025-01-03", 60, seed=3
        )
        .select("timestamp", "close", "volume")
        .toPandas()
        .sort_values("timestamp")
        .reset_index(drop=True)
    )


def _ps(spark):
    import pyspark.pandas as ps

    return ps


def test_pct_change_matches_pandas_and_operator(spark, bars_pdf):
    ps = _ps(spark)
    psdf = ps.from_pandas(bars_pdf)
    got = psdf["close"].pct_change().to_pandas().reset_index(drop=True)
    want = bars_pdf["close"].pct_change()
    pd.testing.assert_series_equal(got, want, check_names=False)

    from financial_data_pipeline_spark.operators.indicators import pct_change
    from pyspark.sql import Window

    sdf = spark.createDataFrame(bars_pdf.assign(symbol="BTCUSDT"))
    op = (
        sdf.withColumn(
            "pc",
            pct_change("close", by=["symbol"], ts="timestamp"),
        )
        .orderBy("timestamp")
        .select("pc")
        .toPandas()["pc"]
    )
    np.testing.assert_allclose(
        op.to_numpy(), want.to_numpy(), rtol=1e-12, equal_nan=True
    )


def test_rolling_mean_std_match_pandas(spark, bars_pdf):
    ps = _ps(spark)
    psdf = ps.from_pandas(bars_pdf)
    got_m = psdf["close"].rolling(20).mean().to_pandas().reset_index(drop=True)
    got_s = psdf["close"].rolling(20).std().to_pandas().reset_index(drop=True)
    pd.testing.assert_series_equal(
        got_m, bars_pdf["close"].rolling(20).mean(), check_names=False
    )
    pd.testing.assert_series_equal(
        got_s, bars_pdf["close"].rolling(20).std(), check_names=False
    )


def test_ffill_and_resample_idioms(spark, bars_pdf):
    ps = _ps(spark)
    dirty = bars_pdf.copy()
    dirty.loc[5:7, "close"] = np.nan
    psdf = ps.from_pandas(dirty)
    got = psdf["close"].ffill().to_pandas().reset_index(drop=True)
    pd.testing.assert_series_equal(
        got, dirty["close"].ffill(), check_names=False
    )
