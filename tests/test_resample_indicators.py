"""Resample + indicator parity vs pandas reference semantics
(reference model: ``tests/units/test_processing.py:73-174``)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators import indicators, resample


def _pandas_resample(pdf: pd.DataFrame, freq: str) -> pd.DataFrame:
    out = (
        pdf.set_index("timestamp")
        .groupby("symbol")
        .resample(freq)
        .agg(
            {
                "open": "first",
                "high": "max",
                "low": "min",
                "close": "last",
                "volume": "sum",
            }
        )
    )
    # reference ffills after resample (timeframe_aggregator.py:76-77)
    out = out.groupby("symbol").ffill()
    return out.reset_index()


@pytest.mark.parametrize("tf,freq", [("5m", "5min"), ("1h", "1h"), ("1d", "1D")])
def test_resample_matches_pandas(spark, ohlcv_pdf, tf, freq):
    # drop a block of rows to create gaps (tests the calendar fill)
    pdf = ohlcv_pdf.drop(ohlcv_pdf.index[500:700]).reset_index(drop=True)
    df = spark.createDataFrame(pdf)
    got = (
        resample.resample_ohlcv(df, tf, fill_gaps=True)
        .orderBy("symbol", "bucket_ts")
        .toPandas()
    )
    want = _pandas_resample(pdf, freq).sort_values(["symbol", "timestamp"])
    assert len(got) == len(want)
    for c in ["open", "high", "low", "close", "volume"]:
        assert np.allclose(
            got[c].values, want[c].values, rtol=1e-12, equal_nan=True
        ), c
    assert (got["bucket_ts"].values == want["timestamp"].values).all()


def test_resample_validates_timeframe(spark, ohlcv_df):
    with pytest.raises(ValueError, match="Invalid timeframe"):
        resample.resample_ohlcv(ohlcv_df, "42x")


def test_resample_ohlc_invariants(spark, ohlcv_df):
    out = resample.resample_ohlcv(ohlcv_df, "1h").toPandas()
    assert (out.high >= out.low).all()
    assert (out.high >= out.open).all() and (out.high >= out.close).all()


def test_multi_timeframe_row_monotonicity(spark, ohlcv_df):
    outs = resample.generate_multiple_timeframes(ohlcv_df, ["5m", "15m", "1h"])
    n5, n15, n1h = (outs[t].count() for t in ["5m", "15m", "1h"])
    assert n5 >= n15 >= n1h


def test_calculate_all_matches_pandas(spark, ohlcv_pdf):
    pdf = ohlcv_pdf[ohlcv_pdf.symbol == "BTCUSDT"].iloc[:400].reset_index(drop=True)
    df = spark.createDataFrame(pdf)
    got = indicators.calculate_all(df).orderBy("timestamp").toPandas()
    close = pdf["close"]
    checks = {
        "sma_20": close.rolling(20).mean(),
        "sma_50": close.rolling(50).mean(),
        "sma_200": close.rolling(200).mean(),
        "ema_12": close.ewm(span=12, adjust=False).mean(),
        "ema_26": close.ewm(span=26, adjust=False).mean(),
    }
    delta = close.diff()
    gain = delta.where(delta > 0, 0).rolling(14).mean()
    loss = (-delta.where(delta < 0, 0)).rolling(14).mean()
    checks["rsi"] = 100 - 100 / (1 + gain / loss)
    e1 = checks["ema_12"]
    e2 = checks["ema_26"]
    macd = e1 - e2
    checks["macd"] = macd
    checks["macd_signal"] = macd.ewm(span=9, adjust=False).mean()
    checks["macd_hist"] = macd - checks["macd_signal"]
    mid = close.rolling(20).mean()
    sd = close.rolling(20).std()
    checks["bb_middle"] = mid
    checks["bb_upper"] = mid + 2 * sd
    checks["bb_lower"] = mid - 2 * sd
    hl = pdf["high"] - pdf["low"]
    hc = (pdf["high"] - close.shift()).abs()
    lc = (pdf["low"] - close.shift()).abs()
    checks["atr"] = pd.concat([hl, hc, lc], axis=1).max(axis=1).rolling(14).mean()
    for name, want in checks.items():
        assert np.allclose(
            got[name].values, want.values, rtol=1e-9, atol=1e-12, equal_nan=True
        ), name


def test_ema_truncated_matches_exact_kernel(spark, ohlcv_pdf):
    """The pure-JVM truncated-window fold must agree with pandas
    ewm(adjust=False) to well below one rounding ULP everywhere —
    exact for rows earlier than the truncation horizon, < 1e-12
    relative after it."""
    import pyspark.sql.functions as F

    pdf = ohlcv_pdf[ohlcv_pdf.symbol == "BTCUSDT"].copy()
    df = spark.createDataFrame(pdf)
    got = (
        df.select(
            "timestamp",
            indicators.ema_truncated("close", 12).alias("e12"),
            indicators.ema_truncated("close", 26).alias("e26"),
        )
        .orderBy("timestamp")
        .toPandas()
    )
    want12 = pdf.sort_values("timestamp").close.ewm(span=12, adjust=False).mean()
    want26 = pdf.sort_values("timestamp").close.ewm(span=26, adjust=False).mean()
    assert np.allclose(got.e12.values, want12.values, rtol=1e-12, atol=0)
    assert np.allclose(got.e26.values, want26.values, rtol=1e-12, atol=0)


def test_sma_nan_head_length(spark, ohlcv_df):
    out = (
        ohlcv_df.filter("symbol = 'BTCUSDT'")
        .select("timestamp", indicators.sma("close", 20).alias("s"))
        .orderBy("timestamp")
        .toPandas()
    )
    assert out["s"].isna().sum() == 19
    assert out["s"].iloc[19:].notna().all()


def test_rsi_bounds(spark, ohlcv_df):
    out = (
        ohlcv_df.select(indicators.rsi("close", 14).alias("r"))
        .toPandas()["r"]
        .dropna()
    )
    assert ((out >= 0) & (out <= 100)).all()


def test_volume_profile_matches_numpy(spark, ohlcv_pdf):
    pdf = ohlcv_pdf[ohlcv_pdf.symbol == "BTCUSDT"]
    df = spark.createDataFrame(pdf)
    got = (
        indicators.volume_profile(df, "close", "volume", bins=50)
        .orderBy("price_level")
        .toPandas()
    )
    hist, edges = np.histogram(pdf["close"], bins=50, weights=pdf["volume"])
    centers = (edges[:-1] + edges[1:]) / 2
    nz = hist > 0
    assert np.allclose(got["volume"].values, hist[nz], rtol=1e-9)
    assert np.allclose(got["price_level"].values, centers[nz], rtol=1e-9)


def test_max_drawdown_known_path(spark):
    # prices: 10 -> 12 (peak) -> 6 (trough, dd=0.5) -> 11 (dd vs 12)
    import datetime as dt

    rows = [
        ("A", dt.datetime(2025, 1, 1, h), float(p))
        for h, p in enumerate([10, 12, 6, 11])
    ] + [("B", dt.datetime(2025, 1, 1, h), float(p)) for h, p in enumerate([1, 2, 3])]
    df = spark.createDataFrame(rows, ["symbol", "timestamp", "close"])
    out = {r.symbol: r.max_drawdown for r in indicators.max_drawdown(df).collect()}
    assert abs(out["A"] - 0.5) < 1e-12
    assert out["B"] == 0.0  # monotone rising: no drawdown


def test_realized_vol_matches_pandas(spark, ohlcv_pdf):
    got = (
        indicators.realized_volatility(
            spark.createDataFrame(ohlcv_pdf), price_col="close"
        )
        .toPandas()
        .sort_values(["symbol", "day"])
        .reset_index(drop=True)
    )
    pdf = ohlcv_pdf.sort_values(["symbol", "timestamp"]).copy()
    pdf["r"] = np.log(
        pdf.groupby("symbol")["close"].apply(lambda s: s / s.shift(1)).values
    )
    pdf["day"] = pdf["timestamp"].dt.date
    exp = (
        pdf.groupby(["symbol", "day"])["r"]
        .apply(lambda s: float(np.sqrt((s.dropna() ** 2).sum())))
        .reset_index(name="realized_vol")
        .sort_values(["symbol", "day"])
        .reset_index(drop=True)
    )
    assert np.allclose(got["realized_vol"], exp["realized_vol"], rtol=1e-9)


def test_volume_bars_assignment_and_conservation(spark):
    import datetime as dt

    from financial_data_pipeline_spark.operators.resample import volume_bars

    rows = [
        ("A", dt.datetime(2025, 1, 1, h), 10.0 + h, 12.0 + h, 9.0 + h,
         11.0 + h, 400.0)
        for h in range(4)
    ]
    df = spark.createDataFrame(
        rows, ["symbol", "timestamp", "open", "high", "low", "close", "volume"]
    )
    out = {r.bar_id: r for r in volume_bars(df, threshold=1000.0).collect()}
    # cum_before = 0,400,800,1200 -> bars {0: rows 0-2, 1: row 3}
    assert set(out) == {0, 1}
    assert out[0].n_src_bars == 3 and out[0].volume == 1200.0
    assert out[0].open == 10.0 and out[0].close == 13.0  # first/last by ts
    assert out[1].n_src_bars == 1 and out[1].volume == 400.0
    # conservation: bar volumes partition source volume
    assert sum(r.volume for r in out.values()) == 1600.0


def test_return_correlation_signs(spark):
    import datetime as dt

    rng = np.random.default_rng(11)
    r = rng.normal(0, 0.01, 50)
    pa = 100 * np.exp(np.cumsum(r))
    pb = 50 * np.exp(np.cumsum(2 * r))   # returns = 2x A's -> corr +1
    pc = 80 * np.exp(np.cumsum(-r))      # returns = -A's -> corr -1
    rows = []
    for i in range(50):
        t = dt.datetime(2025, 1, 1) + dt.timedelta(hours=i)
        rows += [("A", t, float(pa[i])), ("B", t, float(pb[i])),
                 ("C", t, float(pc[i]))]
    df = spark.createDataFrame(rows, ["symbol", "timestamp", "close"])
    out = {
        (r.sym_a, r.sym_b): r.corr_r
        for r in indicators.return_correlation(df).collect()
    }
    assert abs(out[("A", "B")] - 1.0) < 1e-9
    assert abs(out[("A", "C")] + 1.0) < 1e-9
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}


def test_backtest_no_lookahead_and_buy_hold(spark):
    import datetime as dt

    from financial_data_pipeline_spark.operators import backtest

    # fast=1, slow=2: position is 1 exactly when close > SMA2 (i.e. the
    # price rose); fills lag one bar, so the strategy takes return t+1
    # after an up-bar at t.
    prices = [100.0, 110.0, 99.0, 108.0, 118.8]
    rows = [
        ("A", dt.datetime(2025, 1, 1, h), p) for h, p in enumerate(prices)
    ]
    df = spark.createDataFrame(rows, ["symbol", "timestamp", "close"])
    pos = backtest.sma_crossover_positions(df, fast=1, slow=2)
    got = backtest.backtest_summary(pos).collect()[0]
    # positions by bar: [0 (warmup), 1 (up), 0 (down), 1 (up), 1 (up)]
    # prev_pos:          [0, 0, 1, 0, 1] -> takes r3(down) and r5(+10%)
    import math

    expect = math.exp(math.log(99.0 / 110.0) + math.log(118.8 / 108.0)) - 1
    assert abs(got.strategy_return - expect) < 1e-12
    assert abs(got.buy_hold_return - (118.8 / 100.0 - 1)) < 1e-12
    assert got.n_trades == 3  # 0->1, 1->0, 0->1


def test_sma_grid_matches_single_pair_path(spark, ohlcv_pdf):
    """The prefix-sum grid kernel must agree with the windowed-avg
    single-pair path on every (fast, slow): same trades, same P&L
    (positions can only differ on exact float ties, absent here)."""
    from financial_data_pipeline_spark.operators import backtest

    pdf = ohlcv_pdf[ohlcv_pdf.symbol.isin(["BTCUSDT", "ETHUSDT"])].iloc[:800]
    df = spark.createDataFrame(pdf)
    params = [(5, 20), (10, 30)]
    grid = {
        (r.symbol, r.fast, r.slow): r
        for r in backtest.sma_grid_backtest(df, params).collect()
    }
    for f, s in params:
        single = backtest.backtest_summary(
            backtest.sma_crossover_positions(df, fast=f, slow=s)
        ).collect()
        for r in single:
            g = grid[(r.symbol, f, s)]
            assert g.n_trades == r.n_trades, (r.symbol, f, s)
            assert abs(g.strategy_return - r.strategy_return) < 1e-9
            assert abs(g.buy_hold_return - r.buy_hold_return) < 1e-9


def test_backtest_cost_model_charges_per_trade(spark):
    import datetime as dt
    import math

    from financial_data_pipeline_spark.operators import backtest

    prices = [100.0, 110.0, 99.0, 108.0, 118.8]
    rows = [("A", dt.datetime(2025, 1, 1, h), p) for h, p in enumerate(prices)]
    df = spark.createDataFrame(rows, ["symbol", "timestamp", "close"])
    pos = backtest.sma_crossover_positions(df, fast=1, slow=2)
    free = backtest.backtest_summary(pos).collect()[0]
    costly = backtest.backtest_summary(pos, cost_bps=10.0).collect()[0]
    assert costly.n_trades == free.n_trades == 3
    want = (1 + free.strategy_return) * (1 - 10 / 10_000.0) ** 3 - 1
    assert abs(costly.strategy_return - want) < 1e-12
    assert costly.buy_hold_return == free.buy_hold_return


def test_return_correlation_gram_equals_join_path(spark):
    """Masked-matmul gram partials must reproduce the self-join's
    pairwise-complete Pearson exactly, including on a ragged panel
    (symbols with disjoint gaps)."""
    import datetime as dt

    from financial_data_pipeline_spark.operators.indicators import (
        return_correlation,
        return_correlation_gram,
    )

    t0 = dt.datetime(2025, 1, 1)
    rows = []
    for s, prices in {
        "A": [10, 11, 12, 11, 13, 14, 13, 15],
        "B": [20, 19, 21, 22, 21, 23, 24, 22],
        "C": [5, 6, 5, 7, 6, 8, 7, 9],
    }.items():
        for i, p in enumerate(prices):
            if s == "B" and i in (2, 5):
                continue  # gaps: pairwise windows differ per pair
            rows.append((s, t0 + dt.timedelta(hours=i), float(p)))
    df = spark.createDataFrame(rows, ["symbol", "timestamp", "close"])

    gp = {
        (r.sym_a, r.sym_b): (r.corr_r, r.n_obs)
        for r in return_correlation_gram(df).collect()
    }
    jp = {
        (r.sym_a, r.sym_b): (r.corr_r, r.n_obs)
        for r in return_correlation(df).collect()
    }
    assert set(gp) == set(jp) and len(gp) == 3
    for k in gp:
        assert gp[k][1] == jp[k][1]
        assert abs(gp[k][0] - jp[k][0]) < 1e-12


def test_dollar_bars_conservation_and_price_invariance(spark):
    """Dollar-bar assignment conserves rows/volume/value, and scaling
    prices 10x with threshold 10x yields the identical bar structure
    (the price-level invariance volume bars lack)."""
    import datetime as dt

    from financial_data_pipeline_spark.operators.resample import dollar_bars

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        ("A", t0 + dt.timedelta(minutes=i), 10.0 + i, 12.0 + i, 9.0 + i,
         11.0 + i, 100.0 + 10 * i)
        for i in range(12)
    ]
    cols = ["symbol", "timestamp", "open", "high", "low", "close", "volume"]
    df = spark.createDataFrame(rows, cols)
    out = dollar_bars(df, threshold=3000.0)
    agg = out.agg(
        F.sum("n_src_bars").alias("n"),
        F.sum("volume").alias("v"),
        F.sum("dollar_value").alias("d"),
    ).first()
    assert agg.n == 12
    assert abs(agg.v - sum(r[6] for r in rows)) < 1e-9
    assert abs(agg.d - sum(r[5] * r[6] for r in rows)) < 1e-9

    scaled = df.withColumn("close", F.col("close") * 10)
    out10 = dollar_bars(scaled, threshold=30000.0)
    a = sorted((r.bar_id, r.n_src_bars) for r in out.collect())
    b = sorted((r.bar_id, r.n_src_bars) for r in out10.collect())
    assert a == b


# ---------------------------------------------------------------------------
# Oscillators / channels / range volatility (indicators.py tail family)
# ---------------------------------------------------------------------------


def test_oscillators_channels_match_pandas(spark, ohlcv_pdf):
    import math

    df = spark.createDataFrame(ohlcv_pdf)
    st = indicators.stochastic(14, 3)
    dc = indicators.donchian(20)
    kl = indicators.keltner(20, 10, 2.0)
    got = (
        df.withColumns(
            {
                "stoch_k": st["stoch_k"],
                "stoch_d": st["stoch_d"],
                "williams_r": indicators.williams_r(14),
                "obv": indicators.obv(),
                "roc_10": indicators.roc("close", 10),
                "cci": indicators.cci(20),
                **dc,
                **kl,
                "parkinson_vol": indicators.parkinson_volatility(20),
                "gk_vol": indicators.garman_klass_volatility(20),
            }
        )
        .orderBy("symbol", "timestamp")
        .toPandas()
    )
    for sym, g in got.groupby("symbol"):
        lo = g.low.rolling(14).min()
        hi = g.high.rolling(14).max()
        k = 100 * (g.close - lo) / (hi - lo)
        tp = (g.high + g.low + g.close) / 3
        mad = tp.rolling(20).apply(lambda x: np.mean(np.abs(x - x.mean())))
        tr = pd.concat(
            [
                g.high - g.low,
                (g.high - g.close.shift()).abs(),
                (g.low - g.close.shift()).abs(),
            ],
            axis=1,
        ).max(axis=1)
        gk_t = 0.5 * np.log(g.high / g.low) ** 2 - (
            2 * math.log(2) - 1
        ) * np.log(g.close / g.open) ** 2
        want = {
            "stoch_k": k,
            "stoch_d": k.rolling(3).mean(),
            "williams_r": -100 * (hi - g.close) / (hi - lo),
            "obv": (np.sign(g.close.diff()).fillna(0) * g.volume).cumsum(),
            "roc_10": 100 * (g.close / g.close.shift(10) - 1),
            "cci": (tp - tp.rolling(20).mean()) / (0.015 * mad),
            "donchian_upper": g.high.rolling(20).max(),
            "donchian_lower": g.low.rolling(20).min(),
            "donchian_mid": (g.high.rolling(20).max() + g.low.rolling(20).min()) / 2,
            "keltner_mid": tp.rolling(20).mean(),
            "keltner_upper": tp.rolling(20).mean() + 2 * tr.rolling(10).mean(),
            "keltner_lower": tp.rolling(20).mean() - 2 * tr.rolling(10).mean(),
            "parkinson_vol": np.sqrt(
                (np.log(g.high / g.low) ** 2).rolling(20).sum()
                / (4 * math.log(2) * 20)
            ),
            "gk_vol": np.sqrt(gk_t.rolling(20).mean()),
        }
        for name, ref in want.items():
            mine = g[name].values.astype(float)
            refv = ref.values.astype(float)
            assert (np.isnan(mine) == np.isnan(refv)).all(), (sym, name)
            assert np.allclose(mine, refv, rtol=1e-9, equal_nan=True), (sym, name)


def test_stochastic_bounds_and_complement(spark, ohlcv_df):
    st = indicators.stochastic(14, 3)
    out = (
        ohlcv_df.withColumns(
            {"k": st["stoch_k"], "wr": indicators.williams_r(14)}
        )
        .filter(F.col("k").isNotNull())
        .select("k", "wr")
        .toPandas()
    )
    assert ((out.k >= 0) & (out.k <= 100)).all()
    assert ((out.wr <= 0) & (out.wr >= -100)).all()
    # %R is the additive complement of %K: K - 100 == R
    assert np.allclose(out.k - 100.0, out.wr, atol=1e-9)


def test_inverse_vol_weights_sum_to_one(spark, ohlcv_df):
    from financial_data_pipeline_spark.operators.indicators import (
        inverse_vol_weights,
    )

    got = inverse_vol_weights(ohlcv_df).toPandas()
    assert abs(got.weight.sum() - 1.0) < 1e-12
    # lower vol => higher weight
    assert (
        got.sort_values("vol").weight.values
        == np.sort(got.weight.values)[::-1]
    ).all()


def test_ljung_box_regimes_and_numpy_parity(spark):
    from financial_data_pipeline_spark.operators.indicators import ljung_box

    rng = np.random.default_rng(31)
    n = 3000
    wn_r = rng.normal(0, 0.01, n)          # white-noise returns
    ar_r = np.empty(n)                      # AR(1) phi=0.5 returns
    ar_r[0] = 0.0
    for i in range(1, n):
        ar_r[i] = 0.5 * ar_r[i - 1] + rng.normal(0, 0.01)
    rows = []
    for sym, rets in (("wn", wn_r), ("ar", ar_r)):
        px = 100 * np.exp(np.cumsum(rets))
        rows += [(sym, i, float(px[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "symbol string, timestamp long, close double")
    got = ljung_box(df, n_lags=10).toPandas().set_index("symbol")
    assert got.loc["ar", "lb_pvalue"] < 1e-9      # autocorrelated
    assert got.loc["wn", "lb_pvalue"] > 0.001     # not rejected hard

    # numpy differential for the white-noise symbol
    r = np.diff(np.log(100 * np.exp(np.cumsum(wn_r))))
    mu = r.mean()
    c0 = ((r - mu) ** 2).sum()
    nn = len(r)
    q = 0.0
    for k in range(1, 11):
        ck = ((r[k:] - mu) * (r[:-k] - mu)).sum()
        q += (ck / c0) ** 2 / (nn - k)
    q *= nn * (nn + 2)
    assert abs(got.loc["wn", "lb_q"] - q) < 1e-6


def test_jarque_bera_regimes(spark):
    """Normal returns accept; heavy-tailed returns reject; JB matches
    the numpy population-moment closed form."""
    rng = np.random.default_rng(37)
    n = 4000
    norm_r = rng.normal(0, 0.01, n)
    fat_r = rng.standard_t(3, n) * 0.01
    rows = []
    for sym, rets in (("norm", norm_r), ("fat", fat_r)):
        px = 100 * np.exp(np.cumsum(rets))
        rows += [(sym, i, float(px[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "symbol string, timestamp long, close double")
    from financial_data_pipeline_spark.operators.indicators import jarque_bera

    got = jarque_bera(df).toPandas().set_index("symbol")
    assert got.loc["norm", "jb_pvalue"] > 0.01
    assert got.loc["fat", "jb_pvalue"] < 1e-12

    r = np.diff(np.log(100 * np.exp(np.cumsum(norm_r))))
    m = r.mean()
    m2 = ((r - m) ** 2).mean()
    m3 = ((r - m) ** 3).mean()
    m4 = ((r - m) ** 4).mean()
    s, k = m3 / m2**1.5, m4 / m2**2 - 3
    jb = len(r) / 6 * (s**2 + k**2 / 4)
    assert abs(got.loc["norm", "jb_stat"] - jb) < 1e-6


def test_jump_detection_regimes(spark):
    """Continuous diffusion: jump share near 0 (BV ~ RV); planted
    jumps push the share up; BV stays near the diffusion variance."""
    rng = np.random.default_rng(53)
    n = 4000
    smooth_r = rng.normal(0, 0.01, n)
    jumpy_r = smooth_r.copy()
    jumpy_r[::400] += np.where(rng.random(10) > 0.5, 0.15, -0.15)
    rows = []
    for sym, rets in (("smooth", smooth_r), ("jumpy", jumpy_r)):
        px = 100 * np.exp(np.cumsum(rets))
        rows += [(sym, i, float(px[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "symbol string, timestamp long, close double")
    from financial_data_pipeline_spark.operators.indicators import jump_detection

    got = jump_detection(df).toPandas().set_index("symbol")
    assert got.loc["smooth", "jump_share"] < 0.05
    assert got.loc["jumpy", "jump_share"] > 0.25
    # BV is jump-robust: both symbols' BV near the diffusion RV
    assert abs(got.loc["jumpy", "bv"] / got.loc["smooth", "rv"] - 1) < 0.15


def test_newey_west_se_inflates_under_momentum(spark):
    """AR(1)+ returns: HAC se > naive se (positive autocorrelation
    understates naive); white noise: both se agree within ~10%; numpy
    differential on the Bartlett long-run variance."""
    rng = np.random.default_rng(59)
    n = 5000
    wn = rng.normal(0, 0.01, n)
    ar = np.empty(n)
    ar[0] = 0.0
    for i in range(1, n):
        ar[i] = 0.6 * ar[i - 1] + rng.normal(0, 0.01)
    rows = []
    for sym, rets in (("wn", wn), ("ar", ar)):
        px = 100 * np.exp(np.cumsum(rets))
        rows += [(sym, i, float(px[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "symbol string, timestamp long, close double")
    from financial_data_pipeline_spark.operators.indicators import newey_west_mean

    got = newey_west_mean(df, n_lags=5).toPandas().set_index("symbol")
    assert got.loc["ar", "se_nw"] > 1.5 * got.loc["ar", "se_naive"]
    assert abs(got.loc["wn", "se_nw"] / got.loc["wn", "se_naive"] - 1) < 0.1

    r = np.diff(np.log(100 * np.exp(np.cumsum(wn))))
    m, nn = r.mean(), len(r)
    g = lambda k: ((r[k:] - m) * (r[:-k] - m)).sum() / nn if k else ((r - m) ** 2).sum() / nn
    lrv = g(0) + 2 * sum((1 - k / 6) * g(k) for k in range(1, 6))
    assert abs(got.loc["wn", "se_nw"] - np.sqrt(lrv / nn)) < 1e-10


def test_vpin_regimes(spark):
    """Balanced two-sided flow => low VPIN; one-sided informed flow
    (persistent up-moves on big volume) => high VPIN; buckets hold
    roughly equal volume."""
    rng = np.random.default_rng(61)
    n = 6000
    rows = []
    # balanced: iid zero-mean changes
    px = 100 + np.cumsum(rng.normal(0, 0.5, n))
    rows += [("bal", i, float(px[i]), float(rng.uniform(50, 150))) for i in range(n)]
    # toxic: strongly one-directional moves
    px2 = 100 + np.cumsum(np.abs(rng.normal(0.5, 0.2, n)))
    rows += [("tox", i, float(px2[i]), float(rng.uniform(50, 150))) for i in range(n)]
    df = spark.createDataFrame(
        rows, "symbol string, timestamp long, close double, volume double"
    )
    from financial_data_pipeline_spark.operators.indicators import vpin

    got = vpin(df, n_buckets_window=20).toPandas()
    bal = got[(got.symbol == "bal") & got.vpin.notna()].vpin
    tox = got[(got.symbol == "tox") & got.vpin.notna()].vpin
    assert tox.mean() > 0.9        # nearly all volume classified buy
    assert bal.mean() < 0.5
    assert tox.mean() > bal.mean() + 0.3
    # volume clock: bucket volumes concentrate near the target size
    v = got[got.symbol == "bal"].bucket_volume
    target = v.iloc[1:-1].median()
    assert (np.abs(v.iloc[1:-1] - target) / target < 0.25).all()


def test_black_scholes_parity_and_bounds(spark, ohlcv_pdf):
    """Put-call parity C - P = S - K holds to the erf approximation;
    ATM delta ~ 0.5+; prices within no-arbitrage bounds."""
    from financial_data_pipeline_spark.operators.indicators import (
        black_scholes_surface,
    )

    df = spark.createDataFrame(ohlcv_pdf)
    out = (
        black_scholes_surface(df, moneyness=[0.9, 1.0], vol_window=60)
        .filter(F.col("realized_vol_ann").isNotNull())
        .toPandas()
    )
    assert len(out) > 0
    s = out.close
    # parity at K = S (ATM): C - P = S - K = 0 (r = 0)
    assert np.allclose(out.call_100 - out.put_100, 0.0, atol=1e-4 * s.max())
    # parity at K = 0.9 S: C - P = S - 0.9 S
    assert np.allclose(
        out.call_90 - out.put_90, 0.1 * s, rtol=1e-5, atol=1e-4 * s.max()
    )
    # bounds and sanity
    assert (out.call_100 >= -1e-9).all() and (out.put_100 >= -1e-9).all()
    assert (out.call_100 <= s + 1e-9).all()
    assert ((out.delta_100 > 0.5 - 1e-9) & (out.delta_100 < 0.75)).all()
    # ITM call worth at least intrinsic S - K
    assert (out.call_90 >= 0.1 * s - 1e-6 * s).all()


def test_implied_vol_roundtrip(spark, ohlcv_pdf):
    """Price with black_scholes_surface at a known realized vol, then
    recover that vol via the unrolled Newton chain to ~1e-8; bad
    quotes (below intrinsic, above spot) abstain."""
    from financial_data_pipeline_spark.operators.indicators import (
        black_scholes_surface,
        implied_volatility,
    )

    df = spark.createDataFrame(ohlcv_pdf)
    priced = black_scholes_surface(df, moneyness=[1.0], vol_window=60)
    got = (
        implied_volatility(
            priced.filter(F.col("realized_vol_ann").isNotNull()),
            "call_100",
            moneyness=1.0,
        )
        .select("realized_vol_ann", "implied_vol")
        .toPandas()
    )
    ok = got.dropna()
    assert len(ok) > 1000
    assert np.allclose(
        ok.implied_vol, ok.realized_vol_ann, rtol=1e-6, atol=1e-8
    )
    # bad quotes abstain
    bad = spark.createDataFrame(
        [(100.0, 120.0), (100.0, -1.0)], "close double, q double"
    )
    iv = implied_volatility(bad, "q", moneyness=1.0).toPandas()
    assert iv.implied_vol.isna().all()


def test_greeks_sanity(spark, ohlcv_pdf):
    """Gamma/vega positive; vega == S phi(d1) sqrt(tau) against numpy;
    finite-difference check: dC/dS ~ delta."""
    from financial_data_pipeline_spark.operators.indicators import (
        black_scholes_surface,
    )

    df = spark.createDataFrame(ohlcv_pdf)
    out = (
        black_scholes_surface(df, moneyness=[1.0], vol_window=60)
        .filter(F.col("realized_vol_ann").isNotNull())
        .limit(200)
        .toPandas()
    )
    assert (out.gamma_100 > 0).all() and (out.vega_100 > 0).all()
    assert (out.theta_call_100 < 0).all()  # r=0: pure time decay
    import math

    tau = 30 / 365
    d1 = (0.5 * out.realized_vol_ann**2 * tau) / (
        out.realized_vol_ann * math.sqrt(tau)
    )
    phi = np.exp(-0.5 * d1**2) / math.sqrt(2 * math.pi)
    assert np.allclose(
        out.vega_100, out.close * phi * math.sqrt(tau), rtol=1e-9
    )
    # finite difference: bump spot by 0.1%, price change ~ delta * dS
    r0 = out.iloc[0]
    sig, s = r0.realized_vol_ann, r0.close
    from math import erf, log, sqrt

    def bs(s_):
        d1_ = (log(s_ / s) + 0.5 * sig * sig * tau) / (sig * sqrt(tau))
        d2_ = d1_ - sig * sqrt(tau)
        nd = lambda x: 0.5 * (1 + erf(x / sqrt(2)))
        return s_ * nd(d1_) - s * nd(d2_)

    ds = s * 1e-3
    fd_delta = (bs(s + ds) - bs(s - ds)) / (2 * ds)
    assert abs(fd_delta - r0.delta_100) < 1e-3


def test_american_put_dominates_european(spark, ohlcv_pdf):
    """American >= European put everywhere (early-exercise premium
    nonnegative, and positive for deep-ITM); tree matches a pure-
    Python CRR exactly; zero-ish vol -> intrinsic."""
    import math

    from financial_data_pipeline_spark.operators.indicators import (
        american_put_binomial,
        black_scholes_surface,
    )

    df = spark.createDataFrame(ohlcv_pdf)
    priced = black_scholes_surface(df, moneyness=[1.0], vol_window=60).filter(
        F.col("realized_vol_ann").isNotNull()
    )
    out = american_put_binomial(priced, steps=24).limit(300).toPandas()
    # CRR(24) converges to BS within ~1%; American >= that less tree error
    assert (out.american_put >= out.put_100 * 0.98).all()

    def crr(s, sig, steps=24, tau=30 / 365, m=1.0):
        k = s * m
        dt = tau / steps
        u = math.exp(sig * math.sqrt(dt))
        d = 1 / u
        p = (1 - d) / (u - d)
        v = [max(0.0, k - s * u**j * d ** (steps - j)) for j in range(steps + 1)]
        for i in range(steps - 1, -1, -1):
            v = [
                max(
                    max(0.0, k - s * u**j * d ** (i - j)),
                    p * v[j + 1] + (1 - p) * v[j],
                )
                for j in range(i + 1)
            ]
        return v[0]

    for _, r in out.head(20).iterrows():
        assert abs(r.american_put - crr(r.close, r.realized_vol_ann)) < 1e-9


def test_riskmetrics_vol_matches_pandas_ewm(spark):
    """EWMA variance must match pandas ewm(alpha=0.06, adjust=False)
    on r^2 (the RiskMetrics recurrence) to float precision — the
    bounded-window fold is sub-ULP-equivalent to the sequential scan."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.indicators import (
        riskmetrics_vol,
    )

    rng = np.random.default_rng(3)
    n = 800
    close = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.01, n)))
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "close": close,
        }
    )
    out = (
        riskmetrics_vol(spark.createDataFrame(pdf), lam=0.94)
        .orderBy("timestamp")
        .toPandas()
    )
    r2 = pd.Series(np.diff(np.log(close)) ** 2)
    want = np.sqrt(r2.ewm(alpha=0.06, adjust=False).mean()).to_numpy()
    assert len(out) == n - 1
    assert np.allclose(out.ewma_vol.to_numpy(), want, rtol=1e-9, atol=1e-14)


def test_lead_lag_xcorr_finds_planted_lead(spark):
    """Symbol A's returns drive symbol B's one bar later: the best lag
    must be +1 with a dominant correlation, and corr_lag0 stays small."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.indicators import (
        lead_lag_xcorr,
    )

    rng = np.random.default_rng(9)
    n = 2000
    ra = rng.normal(0, 0.01, n)
    rb = np.roll(ra, 1) * 0.9 + rng.normal(0, 0.003, n)
    rb[0] = 0.0
    ts = pd.date_range("2024-01-01", periods=n, freq="h")
    pdf = pd.concat(
        [
            pd.DataFrame(
                {"symbol": "A", "timestamp": ts,
                 "close": 100 * np.exp(np.cumsum(ra))}
            ),
            pd.DataFrame(
                {"symbol": "B", "timestamp": ts,
                 "close": 50 * np.exp(np.cumsum(rb))}
            ),
        ]
    )
    out = lead_lag_xcorr(spark.createDataFrame(pdf), max_lag=3).first()
    assert (out["symbol_a"], out["symbol_b"]) == ("A", "B")
    assert out["best_lag"] == 1  # A leads B by one bar
    assert out["best_corr"] > 0.9
    assert abs(out["corr_lag0"]) < 0.2


def test_ichimoku_matches_pandas(spark):
    """Ichimoku lines vs the pandas rolling/shift construction."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.indicators import ichimoku

    rng = np.random.default_rng(13)
    n = 300
    close = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.01, n)))
    high = close * (1 + np.abs(rng.normal(0, 0.003, n)))
    low = close * (1 - np.abs(rng.normal(0, 0.003, n)))
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "high": high,
            "low": low,
            "close": close,
        }
    )
    out = (
        ichimoku(spark.createDataFrame(pdf))
        .orderBy("timestamp")
        .toPandas()
    )
    tenkan = (
        pdf.high.rolling(9).max() + pdf.low.rolling(9).min()
    ) / 2.0
    kijun = (
        pdf.high.rolling(26).max() + pdf.low.rolling(26).min()
    ) / 2.0
    mid52 = (
        pdf.high.rolling(52).max() + pdf.low.rolling(52).min()
    ) / 2.0
    want = pd.DataFrame(
        {
            "tenkan": tenkan,
            "kijun": kijun,
            "senkou_a": ((tenkan + kijun) / 2.0).shift(26),
            "senkou_b": mid52.shift(26),
            "chikou": pdf.close.shift(-26),
        }
    )
    for c in want.columns:
        a, b = out[c].to_numpy(), want[c].to_numpy()
        ok = np.isclose(a, b, rtol=1e-12, equal_nan=True) | (
            np.isnan(a) & np.isnan(b)
        )
        # pandas NaN == Spark null here
        mask = ~(pd.isna(a) & pd.isna(b))
        assert np.isclose(
            a[mask].astype(float), b[mask].astype(float), rtol=1e-12
        ).all(), c


def test_adx_matches_pandas_wilder(spark):
    """ADX chain vs pandas ewm(alpha=1/14, adjust=False) seeded the
    same way (first value) — the truncated fold is sub-ULP-equivalent
    to the full recursion; trend regime scores higher ADX than chop."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.indicators import adx

    rng = np.random.default_rng(17)
    n = 900
    drift = np.where(np.arange(n) < n // 2, 0.004, 0.0)  # trend, then chop
    close = 100.0 * np.exp(np.cumsum(rng.normal(drift, 0.004)))
    high = close * (1 + np.abs(rng.normal(0, 0.002, n)))
    low = close * (1 - np.abs(rng.normal(0, 0.002, n)))
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "high": high,
            "low": low,
            "close": close,
        }
    )
    out = adx(spark.createDataFrame(pdf)).orderBy("timestamp").toPandas()

    up = pdf.high.diff()
    dn = -pdf.low.diff()
    pdm = np.where((up > dn) & (up > 0), up, 0.0)
    ndm = np.where((dn > up) & (dn > 0), dn, 0.0)
    # fmax ignores NaN: first row's tr = high-low, matching Spark's
    # null-skipping greatest()
    tr = np.fmax.reduce(
        [
            (pdf.high - pdf.low).to_numpy(),
            (pdf.high - pdf.close.shift()).abs().to_numpy(),
            (pdf.low - pdf.close.shift()).abs().to_numpy(),
        ]
    )
    keep = ~np.isnan(tr)
    a = 1.0 / 14.0

    def wilder(x):
        return pd.Series(x).ewm(alpha=a, adjust=False).mean().to_numpy()

    s_tr, s_p, s_n = wilder(tr[keep]), wilder(pdm[keep]), wilder(ndm[keep])
    pdi, ndi = 100 * s_p / s_tr, 100 * s_n / s_tr
    denom = pdi + ndi
    dx = np.where(denom > 0, 100 * np.abs(pdi - ndi) / denom, 0.0)
    want_adx = wilder(dx)
    assert np.allclose(out.plus_di.to_numpy(), pdi, rtol=1e-9)
    assert np.allclose(out.adx.to_numpy(), want_adx, rtol=1e-9)
    # regime: the trending half ends with stronger ADX than the chop end
    assert out.adx.iloc[n // 2 - 1] > out.adx.iloc[-1]


def test_mfi_matches_pandas(spark):
    """MFI vs pandas conditional rolling sums; bounded 0..100."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.indicators import mfi

    rng = np.random.default_rng(19)
    n = 400
    close = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.01, n)))
    high = close * 1.002
    low = close * 0.998
    vol = np.abs(rng.normal(100, 30, n))
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "high": high,
            "low": low,
            "close": close,
            "volume": vol,
        }
    )
    out = mfi(spark.createDataFrame(pdf)).orderBy("timestamp").toPandas()
    tp = (pdf.high + pdf.low + pdf.close) / 3.0
    dtp = tp.diff()
    flow = tp * pdf.volume
    pos = pd.Series(np.where(dtp > 0, flow, 0.0)).iloc[1:].rolling(14).sum()
    neg = pd.Series(np.where(dtp < 0, flow, 0.0)).iloc[1:].rolling(14).sum()
    want = (100.0 * pos / (pos + neg)).to_numpy()
    got = out.mfi.to_numpy()
    mask = ~(np.isnan(want) | pd.isna(got))
    assert np.allclose(got[mask].astype(float), want[mask], rtol=1e-9)
    assert (got[mask] >= 0).all() and (got[mask] <= 100).all()


def test_bollinger_reversion_positions_semantics(spark):
    """Entry fires only after a below-lower-band close, the position
    holds until the middle band is recovered, and the summary charges
    costs per position change."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.backtest import (
        backtest_summary,
        bollinger_reversion_positions,
    )

    rng = np.random.default_rng(23)
    n = 400
    close = 100.0 + np.cumsum(rng.normal(0, 0.3, n))
    close[200] -= 6.0  # engineered crash through the lower band
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "close": close,
        }
    )
    pos = (
        bollinger_reversion_positions(spark.createDataFrame(pdf))
        .orderBy("timestamp")
        .toPandas()
    )
    assert set(pos.position.unique()) <= {0, 1}
    assert (pos.position.iloc[:20] == 0).all()  # warmup is flat
    assert pos.position.iloc[200] == 1 or pos.position.iloc[201] == 1
    summ = backtest_summary(
        bollinger_reversion_positions(spark.createDataFrame(pdf)),
        cost_bps=5.0,
    ).first()
    assert summ["n_trades"] >= 2  # at least one round trip


def test_kelly_sizing_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.backtest import kelly_sizing

    rng = np.random.default_rng(29)
    n = 3000
    r = rng.normal(0.0004, 0.01, n)
    close = 100.0 * np.exp(np.cumsum(r))
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "close": close,
        }
    )
    out = kelly_sizing(spark.createDataFrame(pdf)).first()
    lr = np.diff(np.log(close))
    want = lr.mean() / lr.var(ddof=1)
    assert abs(out["kelly_fraction"] - want) < 1e-9
    assert abs(out["half_kelly"] - want / 2.0) < 1e-9
    assert out["kelly_fraction"] > 0


def test_almgren_chriss_schedule_shape(spark):
    """Trajectory starts fully loaded, ends flat, decreases
    monotonically, trades sum to 1, and is front-loaded (earlier
    slices trade at least as much as later ones — risk aversion)."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.backtest import (
        almgren_chriss_schedule,
    )

    rng = np.random.default_rng(31)
    n = 500
    close = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.01, n)))
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "close": close,
        }
    )
    out = (
        almgren_chriss_schedule(spark.createDataFrame(pdf), n_slices=10)
        .orderBy("slice")
        .toPandas()
    )
    assert len(out) == 11
    assert abs(out.remaining_frac.iloc[0] - 1.0) < 1e-12
    assert abs(out.remaining_frac.iloc[-1]) < 1e-12
    assert (np.diff(out.remaining_frac) < 0).all()
    assert abs(out.trade_frac.sum() - 1.0) < 1e-9
    trades = out.trade_frac.iloc[1:].to_numpy()
    assert (np.diff(trades) <= 1e-12).all()  # front-loaded


def test_inverse_vol_rebalanced_portfolio_semantics(spark):
    """No-lookahead weekly rebalance: the first week (no prior stats)
    is absent, cumulative log return is the running sum of period log
    returns, and with one DOMINANTLY-quiet symbol the portfolio curve
    tracks that symbol far closer than the loud one."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.backtest import (
        inverse_vol_portfolio_backtest,
    )

    rng = np.random.default_rng(37)
    n = 24 * 28  # four weeks hourly
    ts = pd.date_range("2024-01-01", periods=n, freq="h")
    quiet = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.001, n)))
    loud = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.05, n)))
    pdf = pd.concat(
        [
            pd.DataFrame({"symbol": "Q", "timestamp": ts, "close": quiet}),
            pd.DataFrame({"symbol": "L", "timestamp": ts, "close": loud}),
        ]
    )
    out = (
        inverse_vol_portfolio_backtest(
            spark.createDataFrame(pdf), period="week"
        )
        .orderBy("period")
        .toPandas()
    )
    # 2024-01-01 is a Monday: weeks 2..4 survive (week 1 has no prior)
    assert len(out) == 3
    assert np.allclose(
        out.cumulative_log_return.to_numpy(),
        out.period_log_return.cumsum().to_numpy(),
        rtol=1e-12,
    )
    # portfolio is ~98% quiet symbol: its weekly log return should be
    # tiny compared to the loud symbol's own swings
    assert np.abs(out.period_log_return).max() < 0.05


def test_heikin_ashi_matches_iterative_reference(spark):
    """The fold-based ha_open must match the textbook sequential
    recursion (seeded (open1+close1)/2) to sub-ULP, and the derived
    high/low wrap both synthetic opens."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.indicators import heikin_ashi

    rng = np.random.default_rng(41)
    n = 300
    close = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.01, n)))
    openp = np.roll(close, 1) * (1 + rng.normal(0, 0.001, n))
    openp[0] = 100.0
    high = np.maximum(openp, close) * 1.001
    low = np.minimum(openp, close) * 0.999
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "open": openp,
            "high": high,
            "low": low,
            "close": close,
        }
    )
    out = (
        heikin_ashi(spark.createDataFrame(pdf))
        .orderBy("timestamp")
        .toPandas()
    )
    hc = (openp + high + low + close) / 4.0
    ho = np.empty(n)
    ho[0] = (openp[0] + close[0]) / 2.0
    for t in range(1, n):
        ho[t] = 0.5 * (ho[t - 1] + hc[t - 1])
    assert np.allclose(out.ha_close.to_numpy(), hc, rtol=1e-12)
    assert np.allclose(out.ha_open.to_numpy(), ho, rtol=1e-9)
    assert (out.ha_high.to_numpy() >= out.ha_open.to_numpy() - 1e-12).all()
    assert (out.ha_low.to_numpy() <= out.ha_open.to_numpy() + 1e-12).all()


def _ohlcv_walk(seed: int = 23, n: int = 400):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    close = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.004, n)))
    high = close * (1 + np.abs(rng.normal(0, 0.002, n)))
    low = close * (1 - np.abs(rng.normal(0, 0.002, n)))
    openp = np.r_[close[0], close[:-1]] * (1 + rng.normal(0, 0.001, n))
    vol = np.abs(rng.normal(5e4, 1e4, n)) + 1.0
    return pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "open": openp,
            "high": high,
            "low": low,
            "close": close,
            "volume": vol,
        }
    )


def test_vortex_matches_pandas(spark):
    """VI+/VI− vs pandas rolling sums; VI+ > VI− through a planted
    uptrend stretch."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(29)
    vx = indicators.vortex(14)
    import pyspark.sql.functions as F

    out = (
        spark.createDataFrame(pdf)
        .select("timestamp", vx["vi_plus"].alias("vp"), vx["vi_minus"].alias("vn"))
        .orderBy("timestamp")
        .toPandas()
    )
    tr = np.fmax.reduce(
        [
            (pdf.high - pdf.low).to_numpy(),
            (pdf.high - pdf.close.shift()).abs().to_numpy(),
            (pdf.low - pdf.close.shift()).abs().to_numpy(),
        ]
    )
    vmp = (pdf.high - pdf.low.shift()).abs()
    vmn = (pdf.low - pdf.high.shift()).abs()
    import pandas as pd

    str14 = pd.Series(tr).rolling(14, min_periods=14).sum()
    # Spark gates on 14 non-null TRs in the window; TR is non-null from
    # row 0 (greatest skips the null lagged terms), so plain rolling(14)
    want_vp = (vmp.rolling(14, min_periods=13).sum() / str14).to_numpy()
    want_vn = (vmn.rolling(14, min_periods=13).sum() / str14).to_numpy()
    got_vp = out.vp.to_numpy()
    keep = ~np.isnan(want_vp) & ~np.isnan(got_vp)
    assert keep.sum() > 350
    assert np.allclose(got_vp[keep], want_vp[keep], rtol=1e-9)
    assert np.allclose(
        out.vn.to_numpy()[keep], want_vn[keep], rtol=1e-9
    )


def test_aroon_matches_reference_loop(spark):
    """Aroon up/down vs an explicit bars-since-extreme loop with
    most-recent tie resolution; bounded [0, 100]."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(31, 200)
    ar = indicators.aroon(25)
    out = (
        spark.createDataFrame(pdf)
        .select(
            "timestamp",
            ar["aroon_up"].alias("up"),
            ar["aroon_down"].alias("dn"),
        )
        .orderBy("timestamp")
        .toPandas()
    )
    n = 25
    highs, lows = pdf.high.to_numpy(), pdf.low.to_numpy()
    for i in range(len(pdf)):
        if i < n:
            assert np.isnan(out.up.iloc[i]) and np.isnan(out.dn.iloc[i])
            continue
        wh = highs[i - n : i + 1]
        wl = lows[i - n : i + 1]
        since_hi = n - int(np.flatnonzero(wh == wh.max()).max())
        since_lo = n - int(np.flatnonzero(wl == wl.min()).max())
        # most-recent tie: position from the END of the window
        want_up = 100.0 * (n - since_hi) / n
        want_dn = 100.0 * (n - since_lo) / n
        assert abs(out.up.iloc[i] - want_up) < 1e-9
        assert abs(out.dn.iloc[i] - want_dn) < 1e-9
        assert 0.0 <= out.up.iloc[i] <= 100.0


def test_chaikin_flow_matches_pandas(spark):
    """AD line / CMF vs pandas cumulative + rolling money-flow sums;
    CMF bounded [-1, 1]."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(37)
    cf = indicators.chaikin_flow(20)
    out = (
        spark.createDataFrame(pdf)
        .select("timestamp", cf["ad_line"].alias("ad"), cf["cmf"].alias("cmf"))
        .orderBy("timestamp")
        .toPandas()
    )
    rng_ = pdf.high - pdf.low
    mfm = np.where(
        rng_ > 0, ((pdf.close - pdf.low) - (pdf.high - pdf.close)) / rng_, 0.0
    )
    mfv = mfm * pdf.volume.to_numpy()
    want_ad = np.cumsum(mfv)
    import pandas as pd

    want_cmf = (
        pd.Series(mfv).rolling(20, min_periods=20).sum()
        / pdf.volume.rolling(20, min_periods=20).sum()
    ).to_numpy()
    assert np.allclose(out.ad.to_numpy(), want_ad, rtol=1e-9)
    got = out.cmf.to_numpy()
    keep = ~np.isnan(want_cmf)
    assert np.allclose(got[keep], want_cmf[keep], rtol=1e-9)
    assert np.nanmax(np.abs(got)) <= 1.0 + 1e-12


def test_force_index_matches_pandas_ewm(spark):
    """Force index vs pandas ewm(span=13, adjust=False) over the
    null-head-dropped raw force — the truncated fold is sub-ULP."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(41)
    w = Window.partitionBy("symbol").orderBy("timestamp")
    base = (
        spark.createDataFrame(pdf)
        .withColumn(
            "__force",
            (F.col("close") - F.lag("close").over(w)) * F.col("volume"),
        )
        .filter(F.col("__force").isNotNull())
    )
    out = (
        base.select("timestamp", indicators.force_index(13).alias("fi"))
        .orderBy("timestamp")
        .toPandas()
    )
    raw = (pdf.close.diff() * pdf.volume).dropna()
    want = raw.ewm(span=13, adjust=False).mean().to_numpy()
    assert np.allclose(out.fi.to_numpy(), want, rtol=1e-9)


def test_ease_of_movement_matches_pandas(spark):
    """EMV/EOM vs the classical formula with the 1e4 volume scale;
    zero-range and zero-volume bars yield null emv."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(43)
    # plant a doji (zero-range) bar
    pdf.loc[50, "high"] = pdf.loc[50, "low"]
    eo = indicators.ease_of_movement(14, 1.0e4)
    out = (
        spark.createDataFrame(pdf)
        .select("timestamp", eo["emv"].alias("emv"), eo["eom"].alias("eom"))
        .orderBy("timestamp")
        .toPandas()
    )
    mid = (pdf.high + pdf.low) / 2.0
    dmid = mid.diff()
    box = (pdf.volume / 1e4) / (pdf.high - pdf.low)
    emv = np.where(
        (pdf.high > pdf.low) & (pdf.volume > 0), dmid / box, np.nan
    )
    assert np.isnan(out.emv.iloc[50])
    keep = ~np.isnan(emv) & ~out.emv.isna().to_numpy()
    assert np.allclose(out.emv.to_numpy()[keep], emv[keep], rtol=1e-9)
    want_eom = pd.Series(emv).rolling(14, min_periods=1).mean().to_numpy()
    got = out.eom.to_numpy()
    ok = ~np.isnan(got)
    assert ok.sum() > 350
    assert np.allclose(got[ok], want_eom[ok], rtol=1e-9)


def test_drawdown_durations_matches_loop(spark):
    """Spell count/length/depth vs an explicit underwater-spell loop."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(47, 300)
    out = (
        indicators.drawdown_durations(spark.createDataFrame(pdf))
        .toPandas()
        .iloc[0]
    )
    close = pdf.close.to_numpy()
    runmax = np.maximum.accumulate(close)
    under = close < runmax
    spells, cur = [], 0
    depths, curd = [], 0.0
    for i in range(len(close)):
        if under[i]:
            cur += 1
            curd = max(curd, 100.0 * (1 - close[i] / runmax[i]))
        elif cur:
            spells.append(cur)
            depths.append(curd)
            cur, curd = 0, 0.0
    if cur:
        spells.append(cur)
        depths.append(curd)
    assert out.n_spells == len(spells)
    assert out.longest_spell == max(spells)
    assert abs(out.avg_spell_len - round(sum(spells) / len(spells), 4)) < 1e-9
    assert abs(out.max_depth_pct - round(max(depths), 6)) < 1e-6


def test_variance_ratio_regimes(spark):
    """VR(q) ~ 1 on a random walk; < 1 on a planted mean-reverting
    (AR(1) φ<0) series; numpy parity on the estimator."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators import indicators

    rng = np.random.default_rng(53)
    n = 2000
    rw = np.cumsum(rng.normal(0, 0.01, n))
    # mean-reverting: AR(1) log price with strong pullback
    mr = np.zeros(n)
    for i in range(1, n):
        mr[i] = 0.5 * mr[i - 1] + rng.normal(0, 0.01)
    pdf = pd.concat(
        [
            pd.DataFrame(
                {
                    "symbol": s,
                    "timestamp": pd.date_range(
                        "2024-01-01", periods=n, freq="h"
                    ),
                    "close": 100.0 * np.exp(x),
                }
            )
            for s, x in [("RW", rw), ("MR", mr)]
        ]
    )
    out = (
        indicators.variance_ratio(spark.createDataFrame(pdf), q=5)
        .toPandas()
        .set_index("symbol")
    )
    r = np.diff(rw)
    rq = np.convolve(r, np.ones(5), mode="valid")
    want = rq.var(ddof=1) / (5.0 * r.var(ddof=1))
    assert abs(out.loc["RW", "vr"] - round(want, 4)) < 1e-9
    assert abs(out.loc["RW", "vr"] - 1.0) < 0.15
    assert out.loc["MR", "vr"] < 0.6
    assert out.loc["MR", "z_homo"] < -2.0


def test_probabilistic_sharpe_matches_formula(spark):
    """PSR vs the closed form with math.erf; a drifting series scores
    near 1, a driftless one near 0.5."""
    import math

    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators import indicators

    rng = np.random.default_rng(59)
    n = 1500
    drift = np.cumsum(rng.normal(0.001, 0.01, n))
    flat = np.cumsum(rng.normal(0.0, 0.01, n))
    pdf = pd.concat(
        [
            pd.DataFrame(
                {
                    "symbol": s,
                    "timestamp": pd.date_range(
                        "2024-01-01", periods=n, freq="h"
                    ),
                    "close": 100.0 * np.exp(x),
                }
            )
            for s, x in [("UP", drift), ("FLAT", flat)]
        ]
    )
    out = (
        indicators.probabilistic_sharpe(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("symbol")
    )
    r = np.diff(drift)
    m = r.mean()
    m2 = ((r - m) ** 2).mean()
    m3 = ((r - m) ** 3).mean()
    m4 = ((r - m) ** 4).mean()
    sr = m / np.sqrt(m2 * len(r) / (len(r) - 1))
    g3, g4 = m3 / m2**1.5, m4 / m2**2
    z = sr * np.sqrt(len(r) - 1) / np.sqrt(1 - g3 * sr + (g4 - 1) / 4 * sr**2)
    want = 0.5 * (1 + math.erf(z / math.sqrt(2)))
    # A-S 7.1.26 polynomial carries ~1.5e-7 absolute error vs true erf
    assert abs(out.loc["UP", "psr"] - want) < 1e-3
    assert out.loc["UP", "psr"] > 0.9
    assert 0.05 < out.loc["FLAT", "psr"] < 0.95


def test_garch11_vol_matches_recursion(spark):
    """Truncated GARCH fold vs the exact Python recursion; vol rises
    after a planted shock cluster and decays back."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators import indicators

    rng = np.random.default_rng(61)
    n = 1200
    r = rng.normal(0, 0.004, n)
    r[600:620] *= 8.0  # volatility cluster
    close = 100.0 * np.exp(np.cumsum(r))
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "close": close,
        }
    )
    out = (
        indicators.garch11_vol(spark.createDataFrame(pdf), 0.08, 0.90)
        .orderBy("timestamp")
        .toPandas()
    )
    rr = np.diff(np.log(close))
    v = rr.var(ddof=1)
    a, b = 0.08, 0.90
    omega = v * (1 - a - b)
    s = np.empty(len(rr))
    s[0] = v
    for i in range(1, len(rr)):
        s[i] = omega + a * rr[i - 1] ** 2 + b * s[i - 1]
    want = 100.0 * np.sqrt(s)
    # the operator emits 6-dp rounded percent vol
    assert np.allclose(out.garch_vol_pct.to_numpy(), want, atol=1e-6)
    assert out.garch_vol_pct.iloc[625] > 2.5 * out.garch_vol_pct.iloc[595]


def test_ou_half_life_recovers_planted_speed(spark):
    """A planted OU spread (φ = 0.96 hourly → half-life ≈ 17 bars) is
    recovered within estimation noise; half-life is null for a
    non-reverting pair."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators import indicators

    rng = np.random.default_rng(67)
    n = 4000
    base = np.cumsum(rng.normal(0, 0.01, n))
    spread = np.zeros(n)
    phi = 0.96
    for i in range(1, n):
        spread[i] = phi * spread[i - 1] + rng.normal(0, 0.005)
    pdf = pd.concat(
        [
            pd.DataFrame(
                {
                    "symbol": s,
                    "timestamp": pd.date_range(
                        "2024-01-01", periods=n, freq="h"
                    ),
                    "close": 100.0 * np.exp(x),
                }
            )
            for s, x in [("A", base + spread), ("B", base)]
        ]
    )
    out = indicators.ou_half_life(spark.createDataFrame(pdf)).toPandas()
    row = out[(out.sym_a == "A") & (out.sym_b == "B")].iloc[0]
    want_hl = -np.log(2) / np.log(phi)  # ≈ 16.98
    assert abs(row.hedge_beta - 1.0) < 0.1
    assert 0.5 * want_hl < row.half_life_bars < 2.0 * want_hl


def test_donchian_breakout_no_lookahead(spark):
    """Entry requires close above the PRIOR 20-bar high (the breakout
    bar's own high never gates itself); positions fill next bar."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.backtest import (
        donchian_breakout_positions,
    )

    n = 80
    close = np.full(n, 100.0)
    close[40:] = 120.0  # step breakout at bar 40
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "high": close + 0.5,
            "low": close - 0.5,
            "close": close,
        }
    )
    out = (
        donchian_breakout_positions(spark.createDataFrame(pdf), 20, 10)
        .orderBy("timestamp")
        .toPandas()
    )
    # bar 40 breaks out (close 120 > prior high 100.5) -> position set
    # AT bar 40; backtest_summary lags fills by one bar
    assert out.position.iloc[39] == 0
    assert out.position.iloc[40] == 1
    assert (out.position.iloc[41:] == 1).all()


def test_parabolic_sar_invariants(spark):
    """SAR stays on the correct side of price per trend side, both
    flip directions occur on a mean-reverting walk, and a monotone
    uptrend ratchets SAR nondecreasing."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(73, 500)
    out = (
        indicators.parabolic_sar(spark.createDataFrame(pdf))
        .orderBy("timestamp")
        .toPandas()
        .dropna(subset=["sar"])
    )
    up = out[out.sar_trend == 1]
    dn = out[out.sar_trend == -1]
    assert len(up) and len(dn)  # both sides occur
    # a bar that would violate the side triggers a flip instead — SAR
    # never sits inside the bar on the trend side EXCEPT the flip bar
    # itself (where SAR jumps to the old EP, which the crossing bar
    # may straddle)
    flip = out.sar_trend.ne(out.sar_trend.shift()).to_numpy()
    side_ok_up = (out.sar <= out.low + 1e-9) | (out.sar_trend != 1)
    side_ok_dn = (out.sar >= out.high - 1e-9) | (out.sar_trend != -1)
    assert (side_ok_up | flip).all()
    assert (side_ok_dn | flip).all()

    n = 60
    mono = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "open": np.arange(n) + 100.0,
            "high": np.arange(n) + 100.5,
            "low": np.arange(n) + 99.5,
            "close": np.arange(n) + 100.0,
            "volume": 1.0,
        }
    )
    mout = (
        indicators.parabolic_sar(spark.createDataFrame(mono))
        .orderBy("timestamp")
        .toPandas()
        .dropna(subset=["sar"])
    )
    assert (mout.sar_trend == 1).all()
    assert (np.diff(mout.sar.to_numpy()) >= -1e-12).all()


def test_supertrend_invariants(spark):
    """SuperTrend rides below the close in uptrends and above it in
    downtrends; both sides occur; the line equals one of the two
    ratcheted bands."""
    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(79, 500)
    out = (
        indicators.supertrend(spark.createDataFrame(pdf), n=10, mult=3.0)
        .orderBy("timestamp")
        .toPandas()
        .dropna(subset=["supertrend"])
    )
    up = out[out.st_trend == 1]
    dn = out[out.st_trend == -1]
    assert len(up) and len(dn)
    # in an uptrend the line is the lower band: below the close except
    # possibly the flip bar itself
    assert (up.supertrend <= up.close + 1e-9).mean() > 0.99
    assert (dn.supertrend >= dn.close - 1e-9).mean() > 0.99


def test_trix_matches_pandas_triple_ewm(spark):
    """Truncated triple-EMA fold vs pandas ewm chained three times —
    sub-ULP composition — and the ROC of it."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(83, 600)
    out = (
        indicators.trix_frame(spark.createDataFrame(pdf), span=15)
        .orderBy("timestamp")
        .toPandas()
    )
    e = pdf.close
    for _ in range(3):
        e = e.ewm(span=15, adjust=False).mean()
    want_trix = 100.0 * (e / e.shift() - 1.0)
    assert np.allclose(out.ema3.to_numpy(), e.to_numpy(), rtol=1e-12)
    got = out.trix_pct.to_numpy()
    keep = ~np.isnan(got)
    assert np.allclose(got[keep], want_trix.to_numpy()[keep], atol=1e-10)


def test_deflated_sharpe_grid_semantics(spark):
    """DSR of a skill-less grid is low even when the best raw Sharpe
    looks positive (the multiple-testing haircut); Φ⁻¹ bisection
    matches the classic 97.5% point."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.backtest import (
        _norm_ppf,
        deflated_sharpe_grid,
    )

    assert abs(_norm_ppf(0.975) - 1.959964) < 1e-5

    rng = np.random.default_rng(89)
    n = 1500
    pdf = pd.DataFrame(
        {
            "symbol": "RW",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
            "close": 100.0 * np.exp(np.cumsum(rng.normal(0, 0.005, n))),
        }
    )
    grid = [(5, 20), (10, 30), (10, 50), (20, 50), (20, 60), (30, 90)]
    out = deflated_sharpe_grid(spark.createDataFrame(pdf), grid).toPandas()
    row = out.iloc[0]
    assert row.n_trials == len(grid)
    assert row.sr_star > 0  # expected max of noise is positive
    # a pure random walk's best trial should NOT clear the deflated bar
    assert row.dsr < 0.975


def test_elder_ray_matches_pandas(spark):
    """Bull/bear power vs pandas ewm(span=13): extremes minus EMA."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(41, 500)
    er = indicators.elder_ray(13)
    out = (
        spark.createDataFrame(pdf)
        .select(
            "timestamp",
            er["bull_power"].alias("bull"),
            er["bear_power"].alias("bear"),
        )
        .orderBy("timestamp")
        .toPandas()
    )
    ema = pdf.close.ewm(span=13, adjust=False).mean().to_numpy()
    assert np.allclose(out.bull.to_numpy(), pdf.high.to_numpy() - ema, atol=1e-10)
    assert np.allclose(out.bear.to_numpy(), pdf.low.to_numpy() - ema, atol=1e-10)


def test_stochrsi_matches_explicit_loop(spark):
    """StochRSI(14) vs an explicit pandas rolling min/max of RSI, plus
    bounds: always within [0, 100]."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(43, 300)
    staged = spark.createDataFrame(pdf).withColumn(
        "__rsi", indicators.rsi("close", 14)
    )
    out = (
        staged.select(
            "timestamp",
            indicators.stochrsi(14, rsi_col="__rsi").alias("srsi"),
        )
        .orderBy("timestamp")
        .toPandas()
    )
    delta = pdf.close.diff()
    gain = delta.where(delta > 0, 0.0).rolling(14, min_periods=14).mean()
    loss = (-delta.where(delta < 0, 0.0)).rolling(14, min_periods=14).mean()
    rsi = 100.0 - 100.0 / (1.0 + gain / loss)
    lo = rsi.rolling(14, min_periods=14).min()
    hi = rsi.rolling(14, min_periods=14).max()
    want = (100.0 * (rsi - lo) / (hi - lo)).to_numpy()
    got = out.srsi.to_numpy()
    keep = ~np.isnan(got)
    assert keep.sum() > 200
    assert np.allclose(got[keep], want[keep], atol=1e-8)
    assert ((got[keep] >= 0.0) & (got[keep] <= 100.0)).all()


def test_mass_index_matches_pandas(spark):
    """Mass Index(25, EMA 9) vs pandas double-ewm ratio rolling sum;
    a planted range explosion lifts the reading."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(47, 400)
    # plant a volatility bulge: widen the high-low range 4x for 30 bars
    mid = (pdf.high + pdf.low) / 2.0
    widen = slice(300, 330)
    pdf.loc[pdf.index[widen], "high"] = mid[widen] * 1.008
    pdf.loc[pdf.index[widen], "low"] = mid[widen] * 0.992
    out = (
        indicators.mass_index(spark.createDataFrame(pdf), n=25, span=9)
        .orderBy("timestamp")
        .toPandas()
    )
    rng = pdf.high - pdf.low
    e1 = rng.ewm(span=9, adjust=False).mean()
    e2 = e1.ewm(span=9, adjust=False).mean()
    want = (e1 / e2).rolling(25, min_periods=25).sum().to_numpy()
    got = out.mass_index.to_numpy()
    keep = ~np.isnan(got)
    assert np.allclose(got[keep], want[keep], atol=1e-8)
    # the bulge window's reading exceeds the pre-bulge baseline
    assert np.nanmax(got[320:340]) > np.nanmean(got[250:300])


def test_kst_matches_pandas(spark):
    """KST composite + signal vs the explicit pandas construction."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(53, 300)
    out = (
        indicators.kst(spark.createDataFrame(pdf))
        .orderBy("timestamp")
        .toPandas()
    )
    c = pdf.close
    legs = []
    for roc_n, sma_n, wgt in ((10, 10, 1.0), (15, 10, 2.0), (20, 10, 3.0), (30, 15, 4.0)):
        roc = 100.0 * (c / c.shift(roc_n) - 1.0)
        legs.append(wgt * roc.rolling(sma_n, min_periods=sma_n).mean())
    kst = sum(legs)
    sig = kst.rolling(9, min_periods=9).mean()
    got_k, got_s = out.kst.to_numpy(), out.kst_signal.to_numpy()
    keep = ~np.isnan(got_k)
    assert keep.sum() > 200
    assert np.allclose(got_k[keep], kst.to_numpy()[keep], atol=1e-8)
    keep_s = ~np.isnan(got_s)
    assert np.allclose(got_s[keep_s], sig.to_numpy()[keep_s], atol=1e-8)


def test_corwin_schultz_matches_numpy_and_detects_bounce(spark):
    """Closed-form replay parity + semantics: planting a bid-ask
    bounce widens daily ranges relative to two-day ranges and lifts
    the estimated spread."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators import indicators

    rng = np.random.default_rng(61)
    n_days = 40
    mid = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.01, n_days)))

    def daily_frame(half_spread):
        hi = mid * (1 + np.abs(rng.normal(0, 0.004, n_days))) + half_spread
        lo = mid * (1 - np.abs(rng.normal(0, 0.004, n_days))) - half_spread
        return pd.DataFrame(
            {
                "symbol": "A",
                "day": pd.date_range("2024-01-01", periods=n_days),
                "high": hi,
                "low": lo,
            }
        )

    pdf = daily_frame(half_spread=0.5)
    out = (
        indicators.corwin_schultz(spark.createDataFrame(pdf))
        .orderBy("day")
        .toPandas()
    )
    h, l = pdf.high.to_numpy(), pdf.low.to_numpy()
    beta = np.log(h / l) ** 2
    beta2 = beta[1:] + beta[:-1]
    gamma = np.log(np.maximum(h[1:], h[:-1]) / np.minimum(l[1:], l[:-1])) ** 2
    den = 3.0 - 2.0 * np.sqrt(2.0)
    alpha = (np.sqrt(2 * beta2) - np.sqrt(beta2)) / den - np.sqrt(gamma / den)
    spread = np.maximum(2 * (np.exp(alpha) - 1) / (1 + np.exp(alpha)), 0.0)
    got = out.cs_spread.to_numpy()[1:]
    assert np.allclose(got, spread, atol=1e-12)
    # bounce-free frame estimates materially less spread
    quiet = (
        indicators.corwin_schultz(
            spark.createDataFrame(daily_frame(half_spread=0.0))
        )
        .toPandas()
        .cs_spread.mean()
    )
    assert out.cs_spread.mean() > quiet + 0.002


def test_hill_tail_index_separates_fat_tails(spark):
    """Numpy replay parity + semantics: Student-t(3) returns estimate
    tail alpha near 3, Gaussian returns estimate a much thinner tail."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators import indicators

    rng = np.random.default_rng(67)
    n = 3000
    frames = []
    for sym, r in (
        ("FAT", rng.standard_t(3, n) * 0.01),
        ("THIN", rng.normal(0, 0.01, n)),
    ):
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "timestamp": pd.date_range(
                        "2024-01-01", periods=n, freq="min"
                    ),
                    "r": r,
                }
            )
        )
    pdf = pd.concat(frames)
    out = (
        indicators.hill_tail_index(
            spark.createDataFrame(pdf), col="r", k=150
        )
        .toPandas()
        .set_index("symbol")
    )
    # numpy replay for FAT
    absr = np.abs(pdf[pdf.symbol == "FAT"].r.to_numpy())
    absr = np.sort(absr[absr > 0])[::-1]
    want = np.mean(np.log(absr[:150] / absr[150]))
    assert abs(out.loc["FAT", "hill_xi"] - want) < 1e-10
    assert 2.0 < out.loc["FAT", "tail_alpha"] < 4.5
    assert out.loc["THIN", "tail_alpha"] > out.loc["FAT", "tail_alpha"] + 1.5


def test_permutation_entropy_regimes(spark):
    """White noise scores near 1; a monotone ramp collapses to a
    single ordinal pattern (entropy 0); numpy replay parity."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators import indicators

    rng = np.random.default_rng(71)
    n = 2000
    ts = pd.date_range("2024-01-01", periods=n, freq="min")
    pdf = pd.concat(
        [
            pd.DataFrame(
                {"symbol": "NOISE", "timestamp": ts,
                 "close": rng.normal(100, 1, n)}
            ),
            pd.DataFrame(
                {"symbol": "RAMP", "timestamp": ts,
                 "close": np.linspace(100, 200, n)}
            ),
        ]
    )
    out = (
        indicators.permutation_entropy(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("symbol")
    )
    assert out.loc["NOISE", "perm_entropy"] > 0.99
    assert out.loc["RAMP", "perm_entropy"] == 0.0
    assert out.loc["NOISE", "n_windows"] == n - 2
    # replay
    x = pdf[pdf.symbol == "NOISE"].close.to_numpy()
    code = (
        4 * (x[:-2] < x[1:-1]).astype(int)
        + 2 * (x[1:-1] < x[2:]).astype(int)
        + (x[:-2] < x[2:]).astype(int)
    )
    _, counts = np.unique(code, return_counts=True)
    p = counts / counts.sum()
    want = -(p * np.log(p)).sum() / np.log(6.0)
    assert abs(out.loc["NOISE", "perm_entropy"] - want) < 1e-10


def test_ultimate_oscillator_matches_pandas(spark):
    """UO(7,14,28) vs explicit pandas BP/TR rolling sums; bounded in
    [0, 100] wherever defined."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(53, 300)
    out = (
        spark.createDataFrame(pdf)
        .select(
            "timestamp",
            indicators.ultimate_oscillator(7, 14, 28).alias("uo"),
        )
        .orderBy("timestamp")
        .toPandas()
    )
    # fmin/fmax mirror Spark/DuckDB least/greatest (null-SKIPPING):
    # the first bar has no prev_close, so BP/TR fall back to low/high
    pc = pdf.close.shift()
    bp = pdf.close - np.fmin(pdf.low, pc)
    tr = np.fmax(pdf.high, pc) - np.fmin(pdf.low, pc)

    def ratio(n):
        return (
            bp.rolling(n, min_periods=n).sum()
            / tr.rolling(n, min_periods=n).sum()
        )

    want = (
        100.0 * (4.0 * ratio(7) + 2.0 * ratio(14) + ratio(28)) / 7.0
    ).to_numpy()
    got = out.uo.to_numpy()
    keep = ~np.isnan(got)
    assert keep.sum() > 250
    assert np.allclose(got[keep], want[keep], atol=1e-8)
    assert ((got[keep] >= 0.0) & (got[keep] <= 100.0)).all()
    # warmup: 27 lookback rows are null (bar 0 itself contributes a
    # valid BP/TR via the null-skipping least/greatest)
    assert np.isnan(got[:27]).all()


def test_chande_momentum_matches_pandas(spark):
    """CMO(14) vs pandas sign-split rolling sums; odd/even sign flips
    keep both buckets populated."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(59, 300)
    out = (
        spark.createDataFrame(pdf)
        .select("timestamp", indicators.chande_momentum(14).alias("cmo"))
        .orderBy("timestamp")
        .toPandas()
    )
    d = pdf.close.diff()
    g = d.where(d > 0, 0.0).rolling(14, min_periods=14).sum()
    l = (-d.where(d < 0, 0.0)).rolling(14, min_periods=14).sum()
    want = (100.0 * (g - l) / (g + l)).to_numpy()
    got = out.cmo.to_numpy()
    keep = ~np.isnan(got)
    assert keep.sum() > 280
    assert np.allclose(got[keep], want[keep], atol=1e-8)
    assert ((got[keep] >= -100.0) & (got[keep] <= 100.0)).all()


def test_detrended_price_matches_pandas(spark):
    """DPO(20) vs pandas shift(11) − rolling(20).mean()."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(61, 200)
    out = (
        spark.createDataFrame(pdf)
        .select("timestamp", indicators.detrended_price(20).alias("dpo"))
        .orderBy("timestamp")
        .toPandas()
    )
    want = (
        pdf.close.shift(11) - pdf.close.rolling(20, min_periods=20).mean()
    ).to_numpy()
    got = out.dpo.to_numpy()
    keep = ~np.isnan(got)
    assert keep.sum() > 170
    assert np.allclose(got[keep], want[keep], atol=1e-10)


def test_weighted_ma_matches_explicit_weights(spark):
    """WMA(5): linear weights 1..5, newest heaviest — exact vs a numpy
    dot product per window."""
    import numpy as np

    from financial_data_pipeline_spark.operators import indicators

    pdf = _ohlcv_walk(67, 60)
    out = (
        spark.createDataFrame(pdf)
        .select("timestamp", indicators.weighted_ma("close", 5).alias("wma"))
        .orderBy("timestamp")
        .toPandas()
    )
    x = pdf.close.to_numpy()
    wts = np.arange(1, 6, dtype=float)
    want = np.full(len(x), np.nan)
    for i in range(4, len(x)):
        want[i] = x[i - 4 : i + 1] @ wts / 15.0
    got = out.wma.to_numpy()
    assert np.isnan(got[:4]).all()
    assert np.allclose(got[4:], want[4:], atol=1e-10)


def test_holt_eval_matches_explicit_recursion(spark):
    """Holt (α=.3, β=.1) one-step errors vs a direct python loop,
    plus: on a clean linear trend Holt must beat the naive forecast
    (MASE < 1) while SES-style errors would lag."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators import indicators

    rng = np.random.default_rng(71)
    n = 60
    x = 50.0 + 2.0 * np.arange(n) + rng.normal(0, 0.5, n)
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "day": pd.date_range("2024-01-01", periods=n, freq="D"),
            "close": x,
        }
    )
    out = indicators.holt_eval(
        spark.createDataFrame(pdf), alpha=0.3, beta=0.1, ts="day"
    ).collect()[0]

    a, b_ = 0.3, 0.1
    l, b = x[0], 0.0
    errs, nerrs = [], []
    for t in range(1, n):
        fc = l + b
        errs.append(x[t] - fc)
        nerrs.append(x[t] - x[t - 1])
        new_l = a * x[t] + (1 - a) * (l + b)
        b = b_ * (new_l - l) + (1 - b_) * b
        l = new_l
    mae = np.mean(np.abs(errs))
    rmse = np.sqrt(np.mean(np.square(errs)))
    naive = np.mean(np.abs(nerrs))
    assert out.n_eval == n - 1
    assert abs(out.mae - mae) < 1e-9
    assert abs(out.rmse - rmse) < 1e-9
    assert abs(out.naive_mae - naive) < 1e-9
    assert out.mase < 1.0  # trend-aware beats random walk on a trend


def test_with_ema_chunked_matches_sequential_kernel(spark):
    """The hot-key EMA mitigation: chunked + warmup-overlap execution
    (parallel across chunks, no one-giant-symbol Arrow task) agrees
    with the sequential with_ema kernel to the ema_truncated accuracy
    contract — exact for the first W rows, < 1e-12 relative after —
    including when the warmup horizon spans MULTIPLE chunks
    (chunk_rows=256 < W(span 26)=478) and across a repartitioned,
    shuffled input."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    rng = np.random.default_rng(3)
    frames = []
    for sym, n in (("HOT", 4000), ("A", 700), ("B", 37)):
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "timestamp": pd.date_range(
                        "2024-01-01", periods=n, freq="min"
                    ),
                    "close": 100 + np.cumsum(rng.normal(0, 0.5, n)),
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf).repartition(13)

    seq = (
        indicators.with_ema(df, spans=[12, 26])
        .orderBy("symbol", "timestamp")
        .toPandas()
    )
    chk = (
        indicators.with_ema_chunked(df, spans=[12, 26], chunk_rows=256)
        .orderBy("symbol", "timestamp")
        .toPandas()
    )
    assert len(seq) == len(chk) == len(pdf)
    assert (seq.symbol.values == chk.symbol.values).all()
    for c in ("ema_12", "ema_26"):
        assert np.allclose(seq[c].values, chk[c].values, rtol=1e-12, atol=0), c
    # heads are EXACT: every row of a sub-W symbol sees full history
    b_seq = seq[seq.symbol == "B"]
    b_chk = chk[chk.symbol == "B"]
    assert (b_seq.ema_26.values == b_chk.ema_26.values).all()


def test_with_ema_chunked_validates_spans(spark):
    """span=1 means alpha=1 (EMA == the series itself, warmup W=1); the
    general ulp-horizon formula would hit log(0). Spans < 1 are not an
    EMA and must be rejected, matching pandas ewm's span >= 1 rule."""
    import pandas as pd
    import pytest as _pytest

    pdf = pd.DataFrame(
        {
            "symbol": ["A"] * 40,
            "timestamp": pd.date_range("2024-01-01", periods=40, freq="h"),
            "close": [float(i % 7 + 1) for i in range(40)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        indicators.with_ema_chunked(df, spans=[1], chunk_rows=8)
        .orderBy("timestamp")
        .toPandas()
    )
    # alpha=1: the EMA is exactly the input series
    assert (out["ema_1"] == out["close"]).all()
    with _pytest.raises(ValueError, match="span"):
        indicators.with_ema_chunked(df, spans=[0])
