"""As-of join: differential oracle vs pandas merge_asof + edge cases."""

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F

from financial_data_pipeline_spark.operators.asof import asof_join


def _ts(minutes):
    return dt.datetime(2025, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minutes)


def _frames(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts(1), 100),
            ("A", _ts(5), 101),
            ("A", _ts(10), 102),
            ("B", _ts(2), 200),
            ("B", _ts(0), 201),  # before any quote -> null match
        ],
        ["symbol", "timestamp", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0), 10.0),
            ("A", _ts(5), 11.0),  # exact-ts tie: taken for the _ts(5) trade
            ("A", _ts(9), 12.0),
            ("B", _ts(1), 20.0),
        ],
        ["symbol", "timestamp", "quote_px"],
    )
    return trades, quotes


def test_asof_matches_pandas_merge_asof(spark):
    trades, quotes = _frames(spark)
    got = (
        asof_join(trades, quotes, on="timestamp", by="symbol")
        .orderBy("symbol", "timestamp")
        .toPandas()
    )
    tp = trades.toPandas().sort_values("timestamp")
    qp = quotes.toPandas().sort_values("timestamp")
    exp = (
        pd.merge_asof(tp, qp, on="timestamp", by="symbol", direction="backward")
        .sort_values(["symbol", "timestamp"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[exp.columns.tolist()], exp, check_dtype=False
    )


def test_asof_tolerance_and_matched_ts(spark):
    trades, quotes = _frames(spark)
    got = {
        (r.symbol, r.timestamp): (r.quote_px, r.qts)
        for r in asof_join(
            trades,
            quotes,
            on="timestamp",
            by="symbol",
            tolerance_seconds=90,
            matched_ts_col="qts",
        ).collect()
    }
    # A@10 matched A@9 (60s back, within 90s tolerance)
    assert got[("A", _ts(10))] == (12.0, _ts(9))
    # A@5 exact tie matched
    assert got[("A", _ts(5))] == (11.0, _ts(5))
    # B@2 quote is 60s back -> within; B@0 has no earlier quote -> nulls
    assert got[("B", _ts(2))] == (20.0, _ts(1))
    assert got[("B", _ts(0))] == (None, None)
    # A@1 matched A@0 at 60s; with a 30s tolerance it would be nulled
    tight = {
        (r.symbol, r.timestamp): r.quote_px
        for r in asof_join(
            trades, quotes, on="timestamp", by="symbol", tolerance_seconds=30
        ).collect()
    }
    assert tight[("A", _ts(1))] is None


def test_asof_single_shuffle_plan(spark):
    trades, quotes = _frames(spark)
    plan = (
        asof_join(trades, quotes, on="timestamp", by="symbol")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hash exchange on the by-key, no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
