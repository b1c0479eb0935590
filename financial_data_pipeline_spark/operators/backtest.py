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
    return staged.groupBy(by, "fast", "slow").agg(
        F.sum("__trade").cast("long").alias("n_trades"),
        (F.exp(F.sum("__taken")) - 1).alias("strategy_return"),
        (F.exp(F.sum("__r")) - 1).alias("buy_hold_return"),
    )
