"""Seasonal decomposition + robust anomaly flags.

Classic additive decomposition (the ``statsmodels.seasonal_decompose``
shape a reference user would reach for after the indicator family,
``src/data_etl/processing/technical_analysis.py``-adjacent):
``value = trend + seasonal + resid`` with

- ``trend``   — centered moving average over one full season (only
  where the window is complete, NaN head/tail like statsmodels),
- ``seasonal`` — per-phase mean of the detrended series, centered so
  the seasonal component sums to ~0 over a season,
- ``resid``   — the remainder,

then Iglewicz–Hoaglin robust anomaly flags on the residual
(|resid| > k · 1.4826 · MAD, the same recipe as
``cleaning.mad_outlier_flags`` but applied to the deseasonalized
remainder, so a value that is "large but expected for this hour" is
NOT flagged while a small absolute move at a quiet phase is).

Scale design: everything partitions by the series key — the moving
average and row-number are per-key ordered windows (parallel across
keys, no global sort), the phase means are one groupBy on
(key, phase) whose result is |keys|·period rows (broadcast back), and
the median/MAD pass is two tiny per-key aggregates broadcast back.
One hash shuffle of the facts total (the per-key sort), reused by
both windows; everything else moves aggregate-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAD_K = 1.4826  # consistency constant: MAD → sigma under normality


def seasonal_decompose(
    df: DataFrame,
    period: int,
    value_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Add ``phase``, ``trend``, ``seasonal``, ``resid`` columns.

    ``phase`` is the 0-based position within the season (row rank mod
    ``period`` per key — position-clocked, so irregular gaps shift
    phase rather than silently misaligning wall-clock hours; resample
    first if wall-clock phase is wanted).
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    w = Window.partitionBy(by).orderBy(ts)
    lo = -(period // 2)
    hi = period - 1 + lo  # symmetric for odd period, left-heavy for even
    frame = w.rowsBetween(lo, hi)
    v = F.col(value_col)
    trend = F.when(
        F.count(value_col).over(frame) == period, F.avg(value_col).over(frame)
    )
    base = (
        df.withColumn("phase", ((F.row_number().over(w) - 1) % period).cast("int"))
        .withColumn("trend", trend)
        .withColumn("__detr", v - F.col("trend"))
    )
    phase_means = (
        base.filter(F.col("__detr").isNotNull())
        .groupBy(by, "phase")
        .agg(F.avg("__detr").alias("__s_raw"))
    )
    # Center so the seasonal component carries no level: subtract the
    # mean of the per-phase means (NOT the row-weighted mean — phases
    # near the series edges have fewer complete-trend rows).
    phase_means = phase_means.withColumn(
        "seasonal", F.col("__s_raw") - F.avg("__s_raw").over(Window.partitionBy(by))
    ).drop("__s_raw")
    out = base.join(F.broadcast(phase_means), [by, "phase"], "left")
    return out.withColumn("resid", F.col("__detr") - F.col("seasonal")).drop("__detr")


def seasonal_anomalies(
    df: DataFrame,
    period: int,
    k: float = 3.0,
    value_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
    round_dp: int | None = None,
) -> DataFrame:
    """Decompose, then flag residual anomalies per key.

    ``anomaly`` = |resid| > k · 1.4826 · median(|resid − median(resid)|).
    Medians are exact interpolated percentiles (two tiny per-key
    aggregates — the MAD needs the median first, so the dependency is
    inherent); at 100 TB swap ``F.median`` for ``approx_percentile``.

    ``round_dp`` rounds resid and threshold to a fixed decimal BEFORE
    the comparison — flags then depend only on values an external
    engine can reproduce exactly (the oracle-parity mode).
    """
    dec = seasonal_decompose(df, period, value_col, by, ts)
    med = dec.filter(F.col("resid").isNotNull()).groupBy(by).agg(
        F.median("resid").alias("__med")
    )
    with_med = dec.join(F.broadcast(med), by, "left")
    mad = (
        with_med.filter(F.col("resid").isNotNull())
        .groupBy(by)
        .agg(F.median(F.abs(F.col("resid") - F.col("__med"))).alias("__mad"))
    )
    out = with_med.join(F.broadcast(mad), by, "left").withColumn(
        "threshold", F.lit(k) * F.lit(MAD_K) * F.col("__mad")
    )
    resid, thr = F.col("resid"), F.col("threshold")
    if round_dp is not None:
        resid, thr = F.round(resid, round_dp), F.round(thr, round_dp)
    return out.withColumn(
        "anomaly",
        F.when(resid.isNotNull(), F.abs(resid) > thr),
    ).drop("__med", "__mad")
