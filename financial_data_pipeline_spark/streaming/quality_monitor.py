"""Streaming data-quality monitor (beyond-reference §2.10 extension).

The reference validates eagerly at ingest (``data_cleaner.py:82-167``)
and reports once per run. A continuously-ingesting deployment wants the
same counters as a LIVE per-window metric stream: this module rolls the
window-expressible subset of the validation report (null cells, zero
prices, zero volume, negative values, OHLC violations, row counts) into
per-(symbol, window) quality rows.

Only counters that are PURE per-row flags are computed here — exactly
the ones that survive a streaming aggregation without extra state.
Order-dependent counters (time gaps, extreme close-to-close moves,
interval mode) need previous-row context; they live in the batch
report (``plans/report.py``) and, for streams, in the stateful EMA-style
kernel path (``streaming/stateful.py``) — not silently approximated
here.

The aggregation expressions are shared with the batch path by
construction (same flag definitions as ``plans/report.py`` /
``operators/stats.py``), so stream ≡ batch on identical input — pinned
in ``tests/test_sessionize.py``-style equivalence tests. State: one row
per open (symbol, window), evicted at the watermark.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financial_data_pipeline_spark.schema import OHLCV_COLUMNS, PRICE_COLUMNS


def _quality_aggs(tolerance: float = 0.0) -> list[Column]:
    nan_cells = reduce(
        lambda a, b: a + b,
        [F.sum(F.col(c).isNull().cast("long")) for c in OHLCV_COLUMNS],
    )
    zero_price = reduce(
        lambda a, b: a | b, [(F.col(c) == 0) for c in PRICE_COLUMNS]
    )
    any_neg = reduce(
        lambda a, b: a | b, [(F.col(c) < 0) for c in OHLCV_COLUMNS]
    )
    h, l, o, c = (F.col(x) for x in ("high", "low", "open", "close"))
    hi, lo = h * (1.0 + tolerance), l * (1.0 - tolerance)
    consistent = (hi >= l) & (hi >= o) & (hi >= c) & (lo <= o) & (lo <= c)
    return [
        F.count(F.lit(1)).alias("rows"),
        nan_cells.alias("nan_cells"),
        F.sum(zero_price.cast("long")).alias("zero_price_rows"),
        F.sum((F.col("volume") == 0).cast("long")).alias("zero_volume_rows"),
        F.sum(any_neg.cast("long")).alias("negative_rows"),
        F.sum((~consistent).cast("long")).alias("invalid_ohlc"),
    ]


def quality_counters_batch(
    df: DataFrame,
    timeframe: str = "1 hour",
    ts: str = "timestamp",
    tolerance: float = 0.0,
) -> DataFrame:
    """Batch twin: identical grouping + aggregate expressions, used by
    the stream≡batch equivalence test and as the backfill path."""
    return (
        df.groupBy(F.col("symbol"), F.window(F.col(ts), timeframe))
        .agg(*_quality_aggs(tolerance))
        .select(
            "symbol",
            F.col("window.start").alias("bucket_ts"),
            "rows",
            "nan_cells",
            "zero_price_rows",
            "zero_volume_rows",
            "negative_rows",
            "invalid_ohlc",
        )
    )


def quality_monitor(
    stream: DataFrame,
    timeframe: str = "1 hour",
    watermark: str = "3 hours",
    ts: str = "timestamp",
    tolerance: float = 0.0,
) -> DataFrame:
    """Watermarked per-(symbol, window) quality-counter stream."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.col("symbol"), F.window(F.col(ts), timeframe))
        .agg(*_quality_aggs(tolerance))
        .select(
            "symbol",
            F.col("window.start").alias("bucket_ts"),
            "rows",
            "nan_cells",
            "zero_price_rows",
            "zero_volume_rows",
            "negative_rows",
            "invalid_ohlc",
        )
    )
