"""As-of join: differential oracle vs pandas merge_asof + edge cases."""

import datetime as dt

import pytest

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


def _t(m):
    return dt.datetime(2025, 1, 1, 0, m)


def _dir_frames(spark):
    left = spark.createDataFrame(
        [("A", _t(5), 1), ("A", _t(10), 2), ("A", _t(20), 3)],
        ["symbol", "timestamp", "left_id"],
    )
    right = spark.createDataFrame(
        [("A", _t(4), 40.0), ("A", _t(10), 100.0), ("A", _t(12), 120.0)],
        ["symbol", "timestamp", "px"],
    )
    return left, right


def test_asof_forward_direction(spark):
    left, right = _dir_frames(spark)
    got = {
        r.left_id: r.px
        for r in asof_join(left, right, direction="forward").collect()
    }
    # t=5 → first at-or-after is t=10; t=10 exact; t=20 → none
    assert got == {1: 100.0, 2: 100.0, 3: None}


def test_asof_nearest_direction_tie_takes_backward(spark):
    left, right = _dir_frames(spark)
    got = {
        r.left_id: r.px
        for r in asof_join(left, right, direction="nearest").collect()
    }
    # t=5: back 4 (1min) vs fwd 10 (5min) → 40; t=10 exact; t=20 → 120
    assert got == {1: 40.0, 2: 100.0, 3: 120.0}
    # equidistant: t=11 between 10 and 12 → backward wins (pandas tie rule)
    probe = spark.createDataFrame(
        [("A", _t(11), 9)], ["symbol", "timestamp", "left_id"]
    )
    tie = asof_join(probe, right, direction="nearest").first()
    assert tie.px == 100.0


# ---------------------------------------------------------------------------
# point_in_time_features (feature-store multi-table PIT assembly)
# ---------------------------------------------------------------------------


def _t(s):
    import datetime as dt

    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def pit_frames(spark):
    from financial_data_pipeline_spark.operators.asof import FeatureTable

    spine = spark.createDataFrame(
        [(1, _t(100), "p1"), (1, _t(400), "p2"), (2, _t(50), "p3")],
        ["user_id", "ts", "label"],
    )
    views = spark.createDataFrame(
        [(1, _t(90), 5.0), (1, _t(100), 7.0), (1, _t(350), 9.0), (2, _t(60), 3.0)],
        ["user_id", "ts", "value"],
    )
    errs = spark.createDataFrame(
        [(1, _t(10), 1.0), (1, _t(395), 2.0)], ["user_id", "ts", "value"]
    )
    return spine, views, errs, FeatureTable


def test_pit_backward_inclusive_and_ttl(spark, pit_frames):
    from financial_data_pipeline_spark.operators.asof import (
        point_in_time_features,
    )

    spine, views, errs, FeatureTable = pit_frames
    out = point_in_time_features(
        spine,
        [
            FeatureTable("views", views, ["value"], prefix="view_"),
            FeatureTable("errors", errs, ["value"], ttl_seconds=60, prefix="err_"),
        ],
        on="ts",
        by="user_id",
    )
    rows = {r.label: r for r in out.collect()}
    assert rows["p1"].view_value == 7.0  # same-instant feature visible
    assert rows["p2"].view_value == 9.0
    assert rows["p3"].view_value is None  # only future feature rows
    assert rows["p1"].err_value is None  # match staler than TTL
    assert rows["p2"].err_value == 2.0  # within TTL
    assert set(out.columns) == {
        "user_id", "ts", "label", "view_value", "err_value"
    }


def test_pit_equals_chained_asof_joins(spark, pit_frames):
    """The one-shuffle union formulation must equal the semantic
    definition: independent backward as-of joins per feature table."""
    from financial_data_pipeline_spark.operators.asof import (
        asof_join,
        point_in_time_features,
    )

    spine, views, errs, FeatureTable = pit_frames
    got = point_in_time_features(
        spine,
        [
            FeatureTable("views", views, ["value"], prefix="view_"),
            FeatureTable("errors", errs, ["value"], prefix="err_"),
        ],
        on="ts",
        by="user_id",
    )
    want = asof_join(
        asof_join(
            spine,
            views.withColumnRenamed("value", "view_value"),
            on="ts",
            by="user_id",
            value_cols=["view_value"],
        ),
        errs.withColumnRenamed("value", "err_value"),
        on="ts",
        by="user_id",
        value_cols=["err_value"],
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.select(*got.columns).collect())
    )


def test_pit_collision_and_missing_key_raise(spark, pit_frames):
    from financial_data_pipeline_spark.operators.asof import (
        point_in_time_features,
    )

    spine, views, errs, FeatureTable = pit_frames
    with pytest.raises(ValueError, match="collision"):
        point_in_time_features(
            spine,
            [FeatureTable("v", views, ["value"], prefix="la"),
             FeatureTable("b", errs, ["l"], prefix="labe")],
            on="ts",
            by="user_id",
        )
    with pytest.raises(ValueError, match="lacks"):
        point_in_time_features(
            spine,
            [FeatureTable("v", views.drop("ts"), ["value"])],
            on="ts",
            by="user_id",
        )
