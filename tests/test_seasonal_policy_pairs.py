"""Round-2 additions: seasonal decomposition/anomalies, source policy
filter, pairwise cointegration."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators.curation import (
    source_policy_filter,
    source_policy_flags,
)
from financial_data_pipeline_spark.operators.indicators import pairwise_cointegration
from financial_data_pipeline_spark.operators.seasonal import (
    seasonal_anomalies,
    seasonal_decompose,
)

PERIOD = 8


@pytest.fixture(scope="module")
def seasonal_pdf():
    """Two keys, known additive structure: linear trend + fixed seasonal
    pattern + one planted spike per key."""
    rng = np.random.default_rng(11)
    pattern = np.array([0.0, 4.0, -2.0, 6.0, -6.0, 2.0, -4.0, 0.0])
    frames = []
    for sym, slope in [("A", 0.5), ("B", -0.25)]:
        n = PERIOD * 30
        t = np.arange(n)
        value = 100 + slope * t + np.tile(pattern, n // PERIOD)
        # realistic noise floor: the spike's leakage into trend
        # (spike/period) and phase means (spike/n_cycles) must stay
        # below 3*1.4826*MAD(noise) or the naive estimator flags
        # everything -- that regime is documented, not tested here
        value = value + rng.normal(0, 0.5, n)
        value[137] += 15.0  # planted anomaly
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "timestamp": pd.date_range("2025-01-01", periods=n, freq="1h"),
                    "close": value,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def test_seasonal_decompose_recovers_structure(spark, seasonal_pdf):
    df = spark.createDataFrame(seasonal_pdf)
    out = seasonal_decompose(df, PERIOD).toPandas()
    a = out[out.symbol == "A"].sort_values("timestamp").reset_index(drop=True)
    # trend null exactly at the incomplete-window edges
    assert a.trend.isna().sum() == PERIOD - 1
    # interior trend tracks the linear component (seasonal pattern sums
    # to 0 over a period, so the centered MA sees only trend + noise;
    # even-period window is off-center by half a step -> slope/2 bias)
    interior = a.iloc[PERIOD : len(a) - PERIOD]
    interior = interior[interior.index != 137]
    expect = 100 + 0.5 * interior.index.values - 0.5 / 2
    resid_trend = np.abs(interior.trend.values - expect)
    assert np.nanmedian(resid_trend) < 0.5
    # seasonal component is phase-constant and matches the pattern shape
    ph = a.dropna(subset=["seasonal"]).groupby("phase").seasonal.nunique()
    assert (ph == 1).all()
    # decomposition identity where all parts exist
    full = a.dropna(subset=["trend", "seasonal", "resid"])
    np.testing.assert_allclose(
        full.close.values,
        (full.trend + full.seasonal + full.resid).values,
        rtol=0,
        atol=1e-9,
    )


def test_seasonal_anomaly_flags_planted_spike(spark, seasonal_pdf):
    df = spark.createDataFrame(seasonal_pdf)
    # k=4: at k=3 a ~N(0, 0.5) noise row crosses the threshold every
    # ~370 rows, which is within this fixture's size
    out = seasonal_anomalies(df, PERIOD, k=4.0).toPandas()
    for sym in ["A", "B"]:
        s = out[out.symbol == sym].sort_values("timestamp").reset_index(drop=True)
        flagged = set(s.index[s.anomaly.fillna(False)])
        # the spike itself must flag; collateral flags are legitimate
        # only (a) near the spike (it bends trend for its window) or
        # (b) at the spike's phase (it shifts that phase's mean, so the
        # whole phase drifts off by spike/n_cycles -- far above the
        # tiny-noise MAD threshold)
        assert 137 in flagged
        assert all(
            abs(i - 137) <= PERIOD or i % PERIOD == 137 % PERIOD for i in flagged
        )


def test_source_policy_first_rule_wins(spark):
    rows = [
        (1, "x" * 200, "bad_src"),  # blocked source even though long+clean
        (2, "contains a vector inside " + "x" * 200, "ok"),  # badword
        (3, "short", "ok"),  # too short
        (4, "clean document " + "y" * 200, "ok"),  # kept
        (5, "short and vector", "bad_src"),  # blocked wins over both
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = source_policy_flags(
        df, blocked_sources=["bad_src"], badwords=["vector"], min_chars=50
    ).toPandas().set_index("doc_id")
    assert out.loc[1, "drop_reason"] == "blocked_source"
    assert out.loc[2, "drop_reason"] == "badword"
    assert out.loc[3, "drop_reason"] == "too_short"
    assert out.loc[4, "drop_reason"] is None
    assert out.loc[5, "drop_reason"] == "blocked_source"
    kept = source_policy_filter(
        df, blocked_sources=["bad_src"], badwords=["vector"], min_chars=50
    )
    assert [r.doc_id for r in kept.collect()] == [4]
    assert "drop_reason" not in kept.columns


def test_badword_is_word_boundary(spark):
    df = spark.createDataFrame(
        [(1, "the vectors are plural"), (2, "a vector here")],
        "doc_id long, text string",
    )
    out = source_policy_flags(df, badwords=["vector"]).toPandas().set_index("doc_id")
    assert out.loc[1, "drop_reason"] is None  # 'vectors' != \bvector\b
    assert out.loc[2, "drop_reason"] == "badword"


def test_pairwise_cointegration_recovers_relation(spark):
    """pb = alpha + beta*pa + OU spread with known pull -> the closed
    forms recover beta, a negative mean-reversion rate, and a half-life
    near -ln2/ln(1+lambda_true)."""
    rng = np.random.default_rng(3)
    n = 4000
    pa = np.cumsum(rng.normal(0, 0.01, n)) + 5.0
    lam_true = -0.05  # AR(1) phi = 0.95
    e = np.zeros(n)
    for i in range(1, n):
        e[i] = (1 + lam_true) * e[i - 1] + rng.normal(0, 0.02)
    beta_true, alpha_true = 1.8, 0.7
    pb = alpha_true + beta_true * pa + e
    ts = pd.date_range("2025-01-01", periods=n, freq="1min")
    pdf = pd.concat(
        [
            pd.DataFrame({"symbol": "AAA", "timestamp": ts, "close": np.exp(pa)}),
            pd.DataFrame({"symbol": "BBB", "timestamp": ts, "close": np.exp(pb)}),
        ],
        ignore_index=True,
    )
    out = pairwise_cointegration(spark.createDataFrame(pdf)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.sym_a == "AAA" and r.sym_b == "BBB" and r.n_obs == n
    assert abs(r.beta - beta_true) < 0.1
    assert abs(r.alpha - alpha_true) < 0.6  # alpha trades off against beta drift
    assert r["lambda"] < 0
    hl_true = -math.log(2) / math.log(1 + lam_true)
    assert r.half_life == pytest.approx(hl_true, rel=0.35)


def test_cointegration_no_half_life_when_not_reverting(spark):
    """Two independent random walks: spread is ~unit-root, lambda ~ 0;
    half-life must be null rather than a huge misleading number when
    phi >= 1."""
    rng = np.random.default_rng(9)
    n = 1500
    ts = pd.date_range("2025-01-01", periods=n, freq="1min")
    pdf = pd.concat(
        [
            pd.DataFrame(
                {
                    "symbol": s,
                    "timestamp": ts,
                    "close": np.exp(np.cumsum(rng.normal(0, 0.01, n))),
                }
            )
            for s in ["AAA", "BBB"]
        ],
        ignore_index=True,
    )
    r = pairwise_cointegration(spark.createDataFrame(pdf)).collect()[0]
    assert abs(r["lambda"]) < 0.05
    phi = 1 + r["lambda"]
    if not (0 < phi < 1):
        assert r.half_life is None


def test_cusum_matches_sequential_recursion_and_flags_shift(spark):
    """Closed form (prefix sum - running min) == the textbook recursion
    s_t = max(0, s_{t-1} + y_t), and a planted mean shift alarms after
    (never before) the shift point."""
    from financial_data_pipeline_spark.operators.drift import cusum_flags

    rng = np.random.default_rng(5)
    n, shift_at = 400, 250
    x = rng.normal(0, 1.0, n)
    x[shift_at:] += 3.0
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": pd.date_range("2025-01-01", periods=n, freq="1min"),
            "close": x,
        }
    )
    drift, thr = 0.5, 8.0
    out = (
        cusum_flags(spark.createDataFrame(pdf), "close", drift=drift, threshold=thr)
        .toPandas()
        .sort_values("timestamp")
        .reset_index(drop=True)
    )
    mu, sd = x.mean(), x.std(ddof=1)
    z = (x - mu) / sd
    su = sd_ = 0.0
    for i in range(n):
        su = max(0.0, su + z[i] - drift)
        sd_ = max(0.0, sd_ - z[i] - drift)
        assert out.cusum_up[i] == pytest.approx(su, abs=1e-9)
        assert out.cusum_down[i] == pytest.approx(sd_, abs=1e-9)
    # full-sample standardization puts the pre-shift segment below the
    # overall mean, so the DOWNWARD detector legitimately fires early;
    # the upward detector is the one that must localize the shift
    first_up = out.index[out.cusum_up > thr].min()
    assert shift_at <= first_up <= shift_at + 20


def test_target_encode_loo_formula_and_singleton(spark):
    from financial_data_pipeline_spark.operators.encoding import target_encode_loo

    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 100.0)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = {r.id: r.te for r in target_encode_loo(df, "cat", "y", prior_weight=2.0).collect()}
    gm = (10 + 20 + 30 + 100) / 4.0
    # row 1: ((60-10) + 2*gm) / (2 + 2)
    assert out[1] == pytest.approx((50 + 2 * gm) / 4)
    assert out[2] == pytest.approx((40 + 2 * gm) / 4)
    # singleton category: numerator/denominator collapse to the prior
    assert out[4] == pytest.approx(gm)


def test_target_encode_oof_excludes_own_fold(spark):
    from financial_data_pipeline_spark.operators.encoding import target_encode_oof

    rows = [
        (1, "a", 10.0, 0),
        (2, "a", 20.0, 0),
        (3, "a", 40.0, 1),
        (4, "a", 80.0, 1),
    ]
    df = spark.createDataFrame(rows, "id long, cat string, y double, fold int")
    out = {
        r.id: r.te
        for r in target_encode_oof(df, "cat", "y", "fold", prior_weight=0.0).collect()
    }
    # fold-0 rows see only fold-1 labels and vice versa
    assert out[1] == pytest.approx((40 + 80) / 2) == out[2]
    assert out[3] == pytest.approx((10 + 20) / 2) == out[4]
    # leakage check: perturbing a fold-0 label moves only fold-1 encodings
    rows2 = [(1, "a", 1000.0, 0)] + rows[1:]
    df2 = spark.createDataFrame(rows2, "id long, cat string, y double, fold int")
    out2 = {
        r.id: r.te
        for r in target_encode_oof(df2, "cat", "y", "fold", prior_weight=0.0).collect()
    }
    assert out2[3] != out[3] and out2[1] == out[1]


def test_welch_t_matches_scipy_free_closed_form(spark):
    from financial_data_pipeline_spark.operators.stats import welch_t_test

    rng = np.random.default_rng(2)
    a = rng.normal(10.0, 2.0, 500)
    b = rng.normal(10.5, 3.0, 300)
    rows = [("A", float(x)) for x in a] + [("B", float(x)) for x in b]
    df = spark.createDataFrame(rows, "g string, y double")
    r = welch_t_test(df, "g", "y", "A", "B").collect()[0]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    sa, sb = va / len(a), vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(sa + sb)
    dof = (sa + sb) ** 2 / (sa**2 / (len(a) - 1) + sb**2 / (len(b) - 1))
    assert r.t_stat == pytest.approx(t, rel=1e-9)
    assert r.welch_df == pytest.approx(dof, rel=1e-9)
    assert r.n_a == 500 and r.n_b == 300
    assert abs(r.t_stat) > 1.96  # a planted +0.5 sigma-ish shift detects
