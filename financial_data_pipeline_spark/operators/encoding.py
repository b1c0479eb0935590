"""Leakage-free categorical target encoding for training-set prep.

Target (mean) encoding replaces a categorical with the mean of the
label within that category — but the naive version leaks each row's
own label into its feature. The standard fixes, both here:

- **Leave-one-out** (:func:`target_encode_loo`): each row's encoding
  excludes its own label, ``(sum_cat − y) / (n_cat − 1)``, smoothed
  toward the global mean with a pseudo-count prior (Micci-Barreca
  2001), so rare categories shrink to the prior instead of memorizing
  one label.
- **Out-of-fold** (:func:`target_encode_oof`): encodings for fold f
  are computed from all OTHER folds (the cross-fit used with
  :func:`financial_data_pipeline_spark.operators.splitter.kfold_split`),
  ``(sum_cat − sum_cat_fold) / (n_cat − n_cat_fold)`` — exact from ONE
  (category, fold) aggregate, no per-fold re-scans.

Scale design: one groupBy on the category (plus fold) — aggregate
frames are |categories|(×k) rows, broadcast back onto the facts; the
facts shuffle zero times (map-side join). Skewed categories are
irrelevant: the aggregate is associative and the join side is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "te",
    prior_weight: float = 10.0,
) -> DataFrame:
    """Smoothed leave-one-out target encoding.

    ``te = ((sum_cat − y) + w·global_mean) / ((n_cat − 1) + w)``;
    singleton categories (n_cat = 1) collapse to the global mean
    exactly (the LOO numerator/denominator vanish).
    """
    agg = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("__s"), F.count(target_col).alias("__n")
    )
    glob = df.select(F.avg(target_col).alias("__gm"))
    w = F.lit(prior_weight)
    y = F.col(target_col)
    te = (F.col("__s") - y + w * F.col("__gm")) / (F.col("__n") - 1 + w)
    return (
        df.join(F.broadcast(agg), cat_col)
        .crossJoin(F.broadcast(glob))
        .withColumn(out_col, te)
        .drop("__s", "__n", "__gm")
    )


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    fold_col: str,
    out_col: str = "te",
    prior_weight: float = 10.0,
) -> DataFrame:
    """Out-of-fold target encoding: row in fold f gets the smoothed
    category mean computed WITHOUT fold f. One (category, fold)
    aggregate; per-category totals come from summing it (a second tiny
    aggregate), never from re-scanning the facts."""
    per_cf = df.groupBy(cat_col, fold_col).agg(
        F.sum(target_col).alias("__sf"), F.count(target_col).alias("__nf")
    )
    per_c = per_cf.groupBy(cat_col).agg(
        F.sum("__sf").alias("__s"), F.sum("__nf").alias("__n")
    )
    glob = df.select(F.avg(target_col).alias("__gm"))
    w = F.lit(prior_weight)
    te = (
        F.col("__s") - F.col("__sf") + w * F.col("__gm")
    ) / (F.col("__n") - F.col("__nf") + w)
    return (
        df.join(F.broadcast(per_cf), [cat_col, fold_col])
        .join(F.broadcast(per_c), cat_col)
        .crossJoin(F.broadcast(glob))
        .withColumn(out_col, te)
        .drop("__sf", "__nf", "__s", "__n", "__gm")
    )
