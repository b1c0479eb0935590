"""Vectorized signal backtesting as one lazy plan.

The reference computes indicators and hands them to downstream ML; the
natural next question a quant user asks — "what would trading this
signal have returned?" — is answerable inside the engine with pure
window algebra, no event loop: signal → next-bar position → position ×
log-return → exp(sum). Everything is per-symbol windows (bounded state,
no global order) and one final aggregate, so a 100 TB sweep over
thousands of symbols × parameter grids is embarrassingly parallel.

Semantics pinned here (and mirrored in the DuckDB oracle):
- SMA is null until ``n`` observations exist (the indicator family's
  NaN-head contract).
- position_t ∈ {0, 1}: long 1 while fast SMA > slow SMA, flat
  otherwise; null SMAs ⇒ flat (no position on warmup).
- Fills lag one bar: bar t's return accrues to position_{t-1} — the
  standard no-lookahead correction; same-bar fills are the classic
  backtest bug.
- Returns are log returns, so the total is exp(Σ pos·r) − 1 and
  buy-and-hold is exp(Σ r) − 1 over the same rows.
- A "trade" is any position change (entry or exit).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators.indicators import log_return, sma


def sma_crossover_positions(
    df: DataFrame,
    fast: int = 20,
    slow: int = 50,
    price_col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Per-bar {0,1} long/flat position from a fast/slow SMA cross,
    plus the per-bar log return — the per-row frame parameter sweeps
    and the summary aggregate both build on."""
    by = list(by)
    f_sma = sma(price_col, fast, by=by, ts=ts)
    s_sma = sma(price_col, slow, by=by, ts=ts)
    pos = F.when(f_sma > s_sma, F.lit(1)).otherwise(F.lit(0))
    return df.withColumn("position", pos).withColumn(
        "log_ret", log_return(price_col, by=by, ts=ts)
    )


def backtest_summary(
    positions: DataFrame,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
    cost_bps: float = 0.0,
) -> DataFrame:
    """Collapse a position frame to per-symbol performance: trade
    count, strategy return (next-bar fills), buy-and-hold benchmark.

    ``cost_bps`` charges each position change (entry or exit) a
    proportional transaction cost of ``cost_bps`` basis points, applied
    in log space (ln(1 − c) per trade) so costs compound exactly like
    returns; 0 keeps the frictionless number.
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    prev_pos = F.coalesce(F.lag("position").over(w), F.lit(0))
    cost_log = math.log1p(-cost_bps / 10_000.0) if cost_bps else 0.0
    with_fills = positions.withColumn(
        "__ret_taken", F.coalesce(prev_pos * F.col("log_ret"), F.lit(0.0))
    ).withColumn("__trade", F.abs(F.col("position") - prev_pos))
    return with_fills.groupBy(*by).agg(
        F.sum("__trade").cast("long").alias("n_trades"),
        (
            F.exp(F.sum("__ret_taken") + F.lit(cost_log) * F.sum("__trade"))
            - 1
        ).alias("strategy_return"),
        (F.exp(F.sum("log_ret")) - 1).alias("buy_hold_return"),
    )


def _sma_grid_staged(
    df: DataFrame,
    params: list[tuple[int, int]],
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Shared stage for the grid family: per-(symbol, fast, slow) rows
    with __pos/__taken/__trade/__r — see :func:`sma_grid_backtest` for
    the prefix-sum join device."""
    w = Window.partitionBy(by).orderBy(ts)
    base = (
        df.select(by, ts, F.col(price_col).alias("__p"))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__cs", F.sum("__p").over(w))
        .withColumn("__r", F.log(F.col("__p") / F.lag("__p").over(w)))
    )
    grid = F.array(
        *[
            F.struct(F.lit(f).alias("fast"), F.lit(s).alias("slow"))
            for f, s in params
        ]
    )
    e = base.withColumn("__g", F.explode(grid)).select(
        by, ts, "__rn", "__cs", "__r",
        F.col("__g.fast").alias("fast"), F.col("__g.slow").alias("slow"),
    )
    lagged = base.select(
        F.col(by).alias("__lb"), F.col("__rn").alias("__lrn"),
        F.col("__cs").alias("__lcs"),
    )
    fjoin = e.join(
        lagged,
        (F.col(by) == F.col("__lb")) & (F.col("__lrn") == F.col("__rn") - F.col("fast")),
        "left",
    ).withColumnRenamed("__lcs", "__cs_f").drop("__lb", "__lrn")
    sjoin = fjoin.join(
        lagged,
        (F.col(by) == F.col("__lb")) & (F.col("__lrn") == F.col("__rn") - F.col("slow")),
        "left",
    ).withColumnRenamed("__lcs", "__cs_s").drop("__lb", "__lrn")
    sma_f = F.when(
        F.col("__rn") >= F.col("fast"),
        (F.col("__cs") - F.coalesce("__cs_f", F.lit(0.0))) / F.col("fast"),
    )
    sma_s = F.when(
        F.col("__rn") >= F.col("slow"),
        (F.col("__cs") - F.coalesce("__cs_s", F.lit(0.0))) / F.col("slow"),
    )
    pos = F.when(sma_f > sma_s, F.lit(1)).otherwise(F.lit(0))
    wp = Window.partitionBy(by, "fast", "slow").orderBy(ts)
    prev_pos = F.coalesce(F.lag(pos).over(wp), F.lit(0))
    staged = (
        sjoin.withColumn("__pos", pos)
        .withColumn("__taken", F.coalesce(prev_pos * F.col("__r"), F.lit(0.0)))
        .withColumn("__trade", F.abs(F.col("__pos") - prev_pos))
    )
    return staged


def sma_grid_backtest(
    df: DataFrame,
    params: list[tuple[int, int]],
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Evaluate a whole (fast, slow) SMA-crossover grid in ONE plan.

    Rolling-window SMAs can't vary their length per row, so a naive
    grid sweep re-windows the corpus once per parameter pair. Instead:
    compute the per-symbol prefix sum ONCE, then recover any-length
    SMA at row t as (cs_t − cs_{t−n}) / n via an equi-join on the
    computed key (symbol, rn − n) — n comes from the exploded parameter
    table, so every pair shares the same two hash joins and the single
    base scan. At 100 TB this turns |grid| full window passes into one
    pass + two shuffles keyed on (symbol, rn).

    Precision note: prefix-sum SMA differs from windowed-avg SMA by
    float cancellation that grows with series length; per-symbol series
    here are bounded (re-center in chunks if a series exceeds ~1e9
    rows). Fill/trade semantics match :func:`backtest_summary`.
    """
    staged = _sma_grid_staged(df, params, price_col, by, ts)
    return staged.groupBy(by, "fast", "slow").agg(
        F.sum("__trade").cast("long").alias("n_trades"),
        (F.exp(F.sum("__taken")) - 1).alias("strategy_return"),
        (F.exp(F.sum("__r")) - 1).alias("buy_hold_return"),
    )


def bollinger_reversion_positions(
    df: DataFrame,
    n: int = 20,
    k: float = 2.0,
    price_col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Mean-reversion position frame: enter long when the close drops
    BELOW the lower Bollinger band, exit when it recovers to the
    middle band (SMA) — the classic band-reversion rule, complementing
    the trend-following SMA crossover.

    The hold-until-exit state is gaps-and-islands, not a per-row
    signal: position_t = the most recent of {entry→1, exit→0}. That is
    exactly ``last(signal) IGNORE NULLS`` over the unbounded preceding
    window — window-expressible, deterministic, and mirrored verbatim
    by SQL ``last_value(... IGNORE NULLS)``. Null bands (warmup) emit
    no signal; position starts flat. Output matches
    :func:`backtest_summary`'s contract (position, log_ret)."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    win = w.rowsBetween(-(n - 1), 0)
    p = F.col(price_col)
    mid = F.when(F.count(p).over(win) >= n, F.avg(p).over(win))
    sd = F.when(F.count(p).over(win) >= n, F.stddev_samp(p).over(win))
    lower = mid - k * sd
    signal = (
        F.when(p < lower, F.lit(1))
        .when(p >= mid, F.lit(0))
        .otherwise(F.lit(None).cast("int"))
    )
    return (
        df.withColumn("__sig", signal)
        .withColumn(
            "position",
            F.coalesce(
                F.last("__sig", ignorenulls=True).over(w), F.lit(0)
            ),
        )
        .withColumn("log_ret", F.coalesce(log_return(price_col, by=by, ts=ts), F.lit(0.0)))
        .select(*by, ts, "position", "log_ret")
    )


def kelly_sizing(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
    bars_per_year: float = 24.0 * 365,
) -> DataFrame:
    """Kelly-optimal position size per symbol from the log-return
    moments: f* = μ/σ² (the continuous-time Kelly fraction), the
    half-Kelly the desks actually run, and the expected growth rate at
    full Kelly g = μ²/2σ² (annualized). One window pass + one
    aggregate; closed-form, oracle-mirrored."""
    r = log_return(price_col, by=[by], ts=ts)
    base = df.withColumn("__r", r).filter(F.col("__r").isNotNull())
    agg = base.groupBy(by).agg(
        F.count("__r").alias("n_obs"),
        F.avg("__r").alias("__mu"),
        F.var_samp("__r").alias("__var"),
    )
    f = F.col("__mu") / F.col("__var")
    return agg.select(
        by,
        "n_obs",
        f.alias("kelly_fraction"),
        (f / 2.0).alias("half_kelly"),
        (
            F.col("__mu") * F.col("__mu") / (2.0 * F.col("__var"))
            * F.lit(bars_per_year)
        ).alias("growth_rate_ann"),
    )


def almgren_chriss_schedule(
    df: DataFrame,
    n_slices: int = 10,
    risk_lambda: float = 1e-6,
    temp_impact_eta: float = 2.5e-6,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
    bars_per_day: float = 24.0,
) -> DataFrame:
    """Almgren–Chriss optimal liquidation trajectory per symbol over
    one trading day in ``n_slices`` slices: the closed-form schedule
    x(t)/X = sinh(κ(T−t))/sinh(κT) with urgency κ = √(λσ²/η) from the
    symbol's OWN realized daily variance — risk-averse front-loading
    that degrades to straight-line TWAP as λ→0. The execution-algo
    counterpart of the VPIN/Kyle microstructure readouts.

    Plan: one aggregate for per-symbol daily σ², then the slice grid
    is an exploded literal ``sequence`` — |symbols|·(n+1) rows of pure
    expression algebra (sinh via (eˣ−e⁻ˣ)/2, mirrored verbatim in the
    oracle). No shuffle after the aggregate."""
    w = Window.partitionBy(by).orderBy(ts)
    r = F.log(F.col(price_col) / F.lag(price_col).over(w))
    vol = (
        df.withColumn("__r", r)
        .filter(F.col("__r").isNotNull())
        .groupBy(by)
        .agg((F.var_samp("__r") * F.lit(bars_per_day)).alias("__dvar"))
    )
    kappa = F.sqrt(F.lit(risk_lambda) * F.col("__dvar") / F.lit(temp_impact_eta))

    def sinh(x):
        return (F.exp(x) - F.exp(-x)) / 2.0

    sliced = vol.withColumn(
        "slice", F.explode(F.sequence(F.lit(0), F.lit(n_slices)))
    )
    t_frac = F.col("slice").cast("double") / F.lit(float(n_slices))
    remaining = sinh(kappa * (1.0 - t_frac)) / sinh(kappa)
    out = sliced.select(
        by,
        "slice",
        F.sqrt("__dvar").alias("daily_vol"),
        kappa.alias("kappa"),
        remaining.alias("remaining_frac"),
    )
    wnext = Window.partitionBy(by).orderBy("slice")
    return out.withColumn(
        "trade_frac",
        F.coalesce(F.lag("remaining_frac").over(wnext) - F.col("remaining_frac"), F.lit(0.0)),
    )


def inverse_vol_portfolio_backtest(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
    period: str = "week",
) -> DataFrame:
    """Periodically-rebalanced inverse-volatility portfolio: each
    period (default weekly) holds weights w_i ∝ 1/σ_i computed from
    the PRIOR period's per-symbol return volatility (no lookahead —
    the weight a real rebalance could have known), fixed within the
    period (standard periodic-rebalance approximation). Connects the
    static ``inverse_vol_portfolio`` weights to realized performance:
    per-period portfolio return and the cumulative compounded curve.

    Plan: per-(symbol, period) vol aggregate → shifted one period via
    a per-symbol lag window (periods are tiny rows) → broadcast-joined
    onto bar returns → one per-timestamp weighted sum → one per-period
    aggregate of ln(1+r) → ordered cumulative window over periods
    (runs on the period frame, a handful of rows, never facts)."""
    w = Window.partitionBy(by).orderBy(ts)
    r = F.log(F.col(price_col) / F.lag(price_col).over(w))
    bars = (
        df.withColumn("__lr", r)
        .filter(F.col("__lr").isNotNull())
        .withColumn("__month", F.date_trunc(period, F.col(ts)))
    )
    mvol = bars.groupBy(by, "__month").agg(
        F.stddev_samp("__lr").alias("__vol")
    )
    wlag = Window.partitionBy(by).orderBy("__month")
    prior = mvol.select(
        by,
        F.lead("__month").over(wlag).alias("__month"),
        F.col("__vol").alias("__pvol"),
    ).filter(F.col("__month").isNotNull() & (F.col("__pvol") > 0))
    wsum = Window.partitionBy("__month")
    weights = prior.withColumn(
        "__w",
        (1.0 / F.col("__pvol")) / F.sum(1.0 / F.col("__pvol")).over(wsum),
    )
    per_ts = (
        bars.join(F.broadcast(weights), [by, "__month"])
        .groupBy("__month", ts)
        .agg(
            F.sum(F.col("__w") * (F.exp("__lr") - 1.0)).alias("__pr")
        )
    )
    monthly = per_ts.groupBy("__month").agg(
        F.count(F.lit(1)).alias("n_bars"),
        F.sum(F.log(F.lit(1.0) + F.col("__pr"))).alias("__mlog"),
    )
    wcum = Window.orderBy("__month").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # LOG returns, deliberately: exp() of a long compounded path
    # overflows double range on volatile inputs and magnifies ULP
    # noise past any rounding; the log curve is bounded and exact.
    return monthly.select(
        F.col("__month").alias("period"),
        "n_bars",
        F.col("__mlog").alias("period_log_return"),
        F.sum("__mlog").over(wcum).alias("cumulative_log_return"),
    )


def donchian_breakout_positions(
    df: DataFrame,
    entry_n: int = 20,
    exit_n: int = 10,
    price_col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Turtle-style channel breakout position frame: enter long when
    the close breaks ABOVE the prior ``entry_n``-bar high, exit when
    it breaks BELOW the prior ``exit_n``-bar low — the trend-following
    complement to :func:`bollinger_reversion_positions` (same
    last-IGNORE-NULLS hold-state device, same (position, log_ret)
    contract for :func:`backtest_summary`).

    The channels use PRIOR bars only (frame ends at 1 PRECEDING) — the
    breakout must exceed a level known before the bar, else the rule
    trades on its own bar's extreme (lookahead). Warmup (fewer than n
    prior bars) emits no signal; position starts flat."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    went = w.rowsBetween(-entry_n, -1)
    wexit = w.rowsBetween(-exit_n, -1)
    p = F.col(price_col)
    hi = F.when(F.count("high").over(went) >= entry_n, F.max("high").over(went))
    lo = F.when(F.count("low").over(wexit) >= exit_n, F.min("low").over(wexit))
    signal = (
        F.when(p > hi, F.lit(1))
        .when(p < lo, F.lit(0))
        .otherwise(F.lit(None).cast("int"))
    )
    return (
        df.withColumn("__sig", signal)
        .withColumn(
            "position",
            F.coalesce(
                F.last("__sig", ignorenulls=True).over(w), F.lit(0)
            ),
        )
        .withColumn(
            "log_ret",
            F.coalesce(log_return(price_col, by=by, ts=ts), F.lit(0.0)),
        )
        .select(*by, ts, "position", "log_ret")
    )


# Φ⁻¹ by bisection over the A-S 7.1.26 Φ polynomial the engine's oracles
# share — evaluated in PYTHON at plan-build time (the argument depends
# only on the static grid size N), so both engines consume the same
# double literal and no inverse-CDF function is needed at run time.
def _norm_ppf(p: float) -> float:
    import math

    def phi(z: float) -> float:
        return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))

    lo, hi = -10.0, 10.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if phi(mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


_EULER_GAMMA = 0.5772156649015329


def deflated_sharpe_grid(
    df: DataFrame,
    params: list[tuple[int, int]],
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Deflated Sharpe ratio (Bailey & López de Prado) of the BEST
    strategy in an SMA-crossover grid: the multiple-testing correction
    the plain grid sweep invites you to ignore. The expected max SR of
    N zero-skill trials, SR* = sqrt(V[SR])·((1−γ)·Φ⁻¹(1−1/N) +
    γ·Φ⁻¹(1−1/(N·e))), becomes the PSR benchmark for the winner —
    DSR = Φ((SR_best − SR*)·sqrt(n−1)/sqrt(1 − g3·SR + (g4−1)/4·SR²)).

    Φ⁻¹ is resolved at plan-build time (N is the static grid size), so
    the run-time plan is: the shared grid stage →  one aggregate per
    (symbol, trial) for SR + moments → one per-symbol rollup for V[SR]
    → the deterministic best-trial pick (rank over (sr, fast, slow))
    → closed-form DSR. No iteration, no Python at run time."""
    import math

    from financial_data_pipeline_spark.operators.indicators import _norm_cdf

    n_trials = len(params)
    z1 = _norm_ppf(1.0 - 1.0 / n_trials)
    z2 = _norm_ppf(1.0 - 1.0 / (n_trials * math.e))
    emax_mult = (1.0 - _EULER_GAMMA) * z1 + _EULER_GAMMA * z2

    staged = _sma_grid_staged(df, params, price_col, by, ts)
    t = staged.groupBy(by, "fast", "slow").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.avg("__taken").alias("__a1"),
        F.avg(F.pow("__taken", 2)).alias("__a2"),
        F.avg(F.pow("__taken", 3)).alias("__a3"),
        F.avg(F.pow("__taken", 4)).alias("__a4"),
    )
    a1, a2, a3, a4 = (F.col(c) for c in ("__a1", "__a2", "__a3", "__a4"))
    m2 = a2 - a1 * a1
    m3 = a3 - 3 * a1 * a2 + 2 * a1 * a1 * a1
    m4 = a4 - 4 * a1 * a3 + 6 * a1 * a1 * a2 - 3 * F.pow(a1, 4)
    t = t.select(
        by,
        "fast",
        "slow",
        "n_obs",
        F.when(m2 > 0, a1 / F.sqrt(m2 * F.col("n_obs") / (F.col("n_obs") - 1))).alias("__sr"),
        F.when(m2 > 0, m3 / F.pow(m2, 1.5)).alias("__g3"),
        F.when(m2 > 0, m4 / (m2 * m2)).alias("__g4"),
    )
    # NOTE (r9): a localCheckpoint pin on `t` (two consumers: V[SR]
    # rollup + best-trial window) was tried and REVERTED — the full
    # bench showed 0.89→1.09 s (the materialization loses AQE), the
    # same lesson as the recall_at_k pin. The double-planned grid
    # subtree deduplicates well enough under AQE locally; a 100 TB
    # caller re-running many grids should persist() `t` explicitly.
    per_sym = t.groupBy(by).agg(
        F.var_samp("__sr").alias("__vsr"),
        F.count("__sr").alias("n_trials_eff"),
    )
    wbest = Window.partitionBy(by).orderBy(
        F.desc_nulls_last("__sr"), F.desc("fast"), F.desc("slow")
    )
    best = (
        t.withColumn("__rk", F.row_number().over(wbest))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    j = best.join(F.broadcast(per_sym), on=by)
    sr = F.col("__sr")
    sr_star = F.sqrt(F.col("__vsr")) * F.lit(emax_mult)
    denom = F.sqrt(
        1.0 - F.col("__g3") * sr + (F.col("__g4") - 1.0) / 4.0 * sr * sr
    )
    dsr = _norm_cdf((sr - sr_star) * F.sqrt(F.col("n_obs") - 1.0) / denom)
    return j.select(
        by,
        "fast",
        "slow",
        F.lit(n_trials).alias("n_trials"),
        "n_obs",
        F.round(sr, 6).alias("sharpe_best"),
        F.round(sr_star, 6).alias("sr_star"),
        F.round(dsr, 6).alias("dsr"),
    )
