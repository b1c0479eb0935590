"""Dataset drift metrics (beyond-reference scope).

Population Stability Index between a reference dataset (e.g. the
training split) and a comparison dataset (e.g. the serving window):
``PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)``. The standard gate for
"did the feature distribution move" in ML pipelines — <0.1 stable,
0.1–0.25 drifting, >0.25 retrain.

Spark design: equal-width bins derived from the REFERENCE side's
(min, max) — a one-row aggregate broadcast to both sides (the same
two-pass histogram shape as ``indicators.volume_profile``, and unlike
quantile bins it is bit-reproducible in any engine). Each side then
bucket-counts with one groupBy; the tiny per-bin frames join on bin id.
Laplace-style smoothing (+0.5 per bin) keeps empty bins finite and is
applied identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin_counts(
    df: DataFrame, col: str, lo, hi, bins: int
) -> DataFrame:
    width = (F.lit(hi) - F.lit(lo)) / F.lit(bins)
    bucket = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(col) - F.lit(lo)) / width).cast("int")
        ),
    )
    return df.select(bucket.alias("bin")).groupBy("bin").count()


def psi(
    ref: DataFrame,
    new: DataFrame,
    col: str,
    bins: int = 10,
) -> DataFrame:
    """One-row frame: ``(feature, psi, n_ref, n_new)`` for ``col``.

    Values outside the reference range clamp into the edge bins
    (standard practice — out-of-range mass counts as extreme-bin
    drift rather than vanishing).
    """
    lo, hi = ref.agg(F.min(col), F.max(col)).first()
    bin_ids = ref.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    rc = _bin_counts(ref, col, lo, hi, bins).withColumnRenamed("count", "n_ref")
    nc = _bin_counts(new, col, lo, hi, bins).withColumnRenamed("count", "n_new")
    grid = (
        bin_ids.join(rc, on="bin", how="left")
        .join(nc, on="bin", how="left")
        .na.fill({"n_ref": 0, "n_new": 0})
    )
    tr = grid.agg(F.sum("n_ref"), F.sum("n_new")).first()
    t_ref, t_new = float(tr[0]), float(tr[1])
    p = (F.col("n_ref") + 0.5) / F.lit(t_ref + 0.5 * bins)
    q = (F.col("n_new") + 0.5) / F.lit(t_new + 0.5 * bins)
    return grid.agg(
        F.lit(col).alias("feature"),
        F.sum((p - q) * F.log(p / q)).alias("psi"),
        F.lit(int(t_ref)).alias("n_ref"),
        F.lit(int(t_new)).alias("n_new"),
    )


def psi_features(
    ref: DataFrame, new: DataFrame, cols: list[str], bins: int = 10
) -> DataFrame:
    """PSI per feature, one output row per column (unioned one-row
    aggregates — each is a two-pass histogram over pruned single-column
    scans; at scale, cache the two inputs before calling)."""
    out = None
    for c in cols:
        row = psi(ref, new, c, bins)
        out = row if out is None else out.unionByName(row)
    return out
