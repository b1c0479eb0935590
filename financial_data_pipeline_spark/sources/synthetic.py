"""Synthetic OHLCV generator (SURVEY.md §2.1 S4).

The reference's ``_get_test_data`` (``binance_provider.py:135-191``)
builds a gaussian random-walk OHLCV frame in numpy on one machine. This
version is fully distributed: ``spark.range`` over the bar index, seeded
``randn`` per row, and the random-walk cumsum as a window running sum
partitioned by symbol — so a 10-year 1-minute multi-symbol fixture
generates in parallel with no driver materialization.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_pipeline_spark.functions.timefeatures import (
    with_time_features,
)

BASE_PRICES = {"BTCUSDT": 30_000.0, "ETHUSDT": 2_000.0}
DEFAULT_BASE_PRICE = 100.0


def _to_utc(d: str | datetime) -> datetime:
    if isinstance(d, str):
        d = datetime.strptime(d, "%Y-%m-%d")
    return d.replace(tzinfo=d.tzinfo or timezone.utc)


def synthetic_ohlcv(
    spark: SparkSession,
    symbols: list[str],
    start: str | datetime,
    end: str | datetime,
    interval_minutes: int = 60,
    seed: int = 42,
    base_prices: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic random-walk OHLCV bars for symbols × [start, end].

    Mirrors the reference's construction: close = base·(1 + cumsum of
    N(0, 0.001)); open/high/low are noise bands around close; volume
    |N(100, 30)|; plus the four time-feature columns. Inclusive end,
    like ``pd.date_range``. One narrow ``range`` per symbol — the
    cumsum window shuffles once on (symbol), the only wide stage.
    """
    prices = {**BASE_PRICES, **(base_prices or {})}
    s_us = int(_to_utc(start).timestamp() * 1_000_000)
    e_us = int(_to_utc(end).timestamp() * 1_000_000)
    step_us = interval_minutes * 60 * 1_000_000
    n = (e_us - s_us) // step_us + 1

    per_symbol = []
    for i, sym in enumerate(symbols):
        base = prices.get(sym, DEFAULT_BASE_PRICE)
        # Distinct seeds per symbol and per noise stream: randn(seed)
        # is deterministic per (seed, partition, row) — reusing one
        # seed across columns would correlate the streams.
        sym_seed = seed + 1000 * i
        per_symbol.append(
            spark.range(n)
            .select(
                F.lit(sym).alias("symbol"),
                F.timestamp_micros(
                    F.lit(s_us) + F.col("id") * F.lit(step_us)
                ).alias("timestamp"),
                F.col("id").alias("_i"),
                (F.randn(sym_seed) * 0.001).alias("_chg"),
                (F.randn(sym_seed + 1) * 0.0002).alias("_o_noise"),
                F.abs(F.randn(sym_seed + 2) * 0.0005).alias("_h_noise"),
                F.abs(F.randn(sym_seed + 3) * 0.0005).alias("_l_noise"),
                F.abs(F.randn(sym_seed + 4) * 30 + 100).alias("volume"),
                F.lit(base).alias("_base"),
            )
        )
    raw = per_symbol[0]
    for extra in per_symbol[1:]:
        raw = raw.unionByName(extra)

    w = (
        Window.partitionBy("symbol")
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walk = raw.withColumn("_cum", F.sum("_chg").over(w))
    close = F.col("_base") * (1 + F.col("_cum"))
    bars = walk.select(
        "symbol",
        "timestamp",
        (close * (1 + F.col("_o_noise"))).alias("open"),
        (close * (1 + F.col("_h_noise"))).alias("high"),
        (close * (1 - F.col("_l_noise"))).alias("low"),
        close.alias("close"),
        "volume",
    )
    return with_time_features(bars)
