"""Validation report (SURVEY.md §1.3) — the reference's most
user-visible output, re-expressed as lazy aggregates.

``EnhancedDataValidator.validate_and_clean``
(``src/data_etl/processing/data_cleaner.py:82-167``) interleaves
cleaning with counter collection and returns ``(cleaned_df, report)``.
Here cleaning stays the pure lazy plan built by
:func:`financial_data_pipeline_spark.operators.cleaning.clean_ohlcv`;
the report is a SECOND plan — one-row aggregates over the same staged
lineage — so the counters never force eager materialization between
stages the way the reference's pandas passes do.

Counter → stage map (mirrors ``clean_ohlcv``'s frozen order):

- ``total_records`` / ``invalid_timestamps`` — post ts-normalize
  (``data_cleaner.py:89,663-688``)
- ``duplicates_removed`` — keep-first dedup delta
  (``data_cleaner.py:104-112``)
- ``initial_nans`` — OHLCV nulls after numeric coercion
  (``data_cleaner.py:120``)
- ``negative_rows`` — rows dropped by the negative filter
  (``data_cleaner.py:207-216``)
- ``outliers_<col>`` / ``outliers_fixed`` — IQR-bound violations per
  column before winsorization (``data_cleaner.py:218-236``)
- ``invalid_ohlc`` — tolerance-predicate violations after the clip,
  before repair (``data_cleaner.py:238-269``)
- ``time_gaps`` (> 6 × median interval), ``most_common_interval_seconds``
  / ``irregular_intervals``, ``zero_price_rows``,
  ``extreme_price_changes``, ``zero_volume_rows``, ``final_rows`` /
  ``nans_after`` / ``valid_records`` / ``is_valid`` — final frame
  (``data_cleaner.py:271-285,294-398,161-166``)

Scale note: the branches share one lineage and the heavy ones reuse the
same ``symbol``-hash shuffle (dedup window, impute windows, lag
windows). Catalyst does not share subplans across crossJoin branches,
so :func:`validation_report` (the eager dict collector) caches the
coerced base once; :func:`report_counters` stays pure-lazy for the
driver's oracle comparison, which materializes it exactly once anyway.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators import cleaning
from financial_data_pipeline_spark.schema import (
    OHLCV_COLUMNS,
    PRICE_COLUMNS,
)

REPORT_COLUMNS = [
    "total_records",
    "invalid_timestamps",
    "duplicates_removed",
    "initial_nans",
    "negative_rows",
    *[f"outliers_{c}" for c in OHLCV_COLUMNS],
    "outliers_fixed",
    "invalid_ohlc",
    "zero_price_rows",
    "zero_volume_rows",
    "extreme_price_changes",
    "time_gaps",
    "most_common_interval_seconds",
    "irregular_intervals",
    "final_rows",
    "nans_after",
    "valid_records",
    "is_valid",
    "time_features_added",
]


def _staged(
    df: DataFrame,
    mode: str,
    epoch_unit: str,
    iqr_factor: float,
    price_tolerance: float,
) -> dict[str, DataFrame]:
    """The ``clean_ohlcv`` stage frames, kept addressable so counters
    can aggregate the exact lineage the cleaning plan executes."""
    df = cleaning.lowercase_columns(df)
    df = cleaning.require_columns(df)
    if "symbol" not in df.columns:
        df = df.withColumn("symbol", F.lit("UNKNOWN"))
    ts_f = cleaning.normalize_timestamp(df, epoch_unit=epoch_unit)
    valid = cleaning.drop_invalid_timestamps(ts_f)
    deduped = cleaning.dedup_keep_first(
        valid, keys=["symbol", "timestamp"], order_by=["timestamp"]
    )
    coerced = cleaning.coerce_numeric(deduped)
    imputed = cleaning.impute_ffill_bfill(coerced)
    nonneg = cleaning.drop_negative_rows(imputed)
    if mode == "repair":
        pre_repair = cleaning.iqr_clip(nonneg, factor=iqr_factor)
        final = cleaning.repair_ohlc(pre_repair, tolerance=price_tolerance)
    else:
        pre_repair = cleaning.filter_positive_prices(nonneg)
        final = cleaning.filter_valid_ohlc(pre_repair, tolerance=price_tolerance)
        final = final.na.drop(subset=OHLCV_COLUMNS)
    return {
        "ts": ts_f,
        "valid": valid,
        "coerced": coerced,
        "imputed": imputed,
        "nonneg": nonneg,
        "pre_repair": pre_repair,
        "final": final,
    }


def _outlier_counts(nonneg: DataFrame, factor: float) -> DataFrame:
    """Per-column IQR-violation counts (pre-clip), one row.

    Bounds are the same exact percentiles ``iqr_clip`` uses, computed
    per symbol and broadcast back — counts sum across symbols (the
    reference is single-symbol; per-symbol bounds are this engine's
    documented multi-asset generalization, SURVEY.md §4.2).
    """
    cols = [c for c in OHLCV_COLUMNS if c in nonneg.columns]
    aggs = []
    for c in cols:
        aggs += [
            F.percentile(F.col(c), F.lit(0.25)).alias(f"__q1_{c}"),
            F.percentile(F.col(c), F.lit(0.75)).alias(f"__q3_{c}"),
        ]
    bounds = nonneg.groupBy("symbol").agg(*aggs)
    joined = nonneg.join(F.broadcast(bounds), on="symbol", how="left")
    outs = []
    for c in cols:
        q1, q3 = F.col(f"__q1_{c}"), F.col(f"__q3_{c}")
        iqr = q3 - q1
        out_of_bounds = (F.col(c) < q1 - factor * iqr) | (
            F.col(c) > q3 + factor * iqr
        )
        outs.append(
            F.sum(out_of_bounds.cast("long")).alias(f"outliers_{c}")
        )
    row = joined.agg(*outs)
    total = reduce(
        lambda a, b: a + b, [F.coalesce(F.col(f"outliers_{c}"), F.lit(0)) for c in cols]
    )
    return row.withColumn("outliers_fixed", total)


def _final_counters(
    final: DataFrame, extreme_change_threshold: float
) -> DataFrame:
    """Post-clean counters in one grouped pass + a tiny broadcast of
    per-symbol median intervals (``data_cleaner.py:271-285,343-398``)."""
    w = Window.partitionBy("symbol").orderBy("timestamp")
    iv = (
        F.unix_micros(F.col("timestamp")) - F.unix_micros(F.lag("timestamp").over(w))
    ) / 1e6
    chg = F.abs(F.col("close") / F.lag("close").over(w) - 1.0)
    base = final.withColumns({"__iv": iv, "__chg": chg})
    med = base.groupBy("symbol").agg(F.median("__iv").alias("__med_iv"))
    base = base.join(F.broadcast(med), on="symbol", how="left")
    zero_price = reduce(
        lambda a, b: a | b, [(F.col(c) == 0) for c in PRICE_COLUMNS]
    )
    nan_cells = reduce(
        lambda a, b: a + b,
        [F.sum(F.col(c).isNull().cast("long")) for c in OHLCV_COLUMNS],
    )
    return base.agg(
        F.sum(zero_price.cast("long")).alias("zero_price_rows"),
        F.sum((F.col("volume") == 0).cast("long")).alias("zero_volume_rows"),
        F.sum((F.col("__chg") > extreme_change_threshold).cast("long")).alias(
            "extreme_price_changes"
        ),
        F.sum((F.col("__iv") > 6 * F.col("__med_iv")).cast("long")).alias(
            "time_gaps"
        ),
        F.count(F.lit(1)).alias("final_rows"),
        nan_cells.alias("nans_after"),
    )


def _interval_mode_global(final: DataFrame) -> DataFrame:
    """Global most-common interval + irregular count
    (``data_cleaner.py:323-337`` — the reference is single-symbol, so
    "global" and "per-symbol" coincide there; intervals here are still
    computed within symbol, then pooled)."""
    w = Window.partitionBy("symbol").orderBy("timestamp")
    iv = (
        final.withColumn(
            "__iv",
            (
                F.unix_micros(F.col("timestamp"))
                - F.unix_micros(F.lag("timestamp").over(w))
            )
            / 1e6,
        )
        .filter(F.col("__iv").isNotNull())
        .select("__iv")
    )
    counts = iv.groupBy("__iv").count()
    wmode = Window.orderBy(F.desc("count"), F.asc("__iv"))
    return (
        counts.withColumn("__rn", F.row_number().over(wmode))
        .withColumn("__tot", F.sum("count").over(Window.partitionBy()))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__iv").alias("most_common_interval_seconds"),
            (F.col("__tot") - F.col("count")).alias("irregular_intervals"),
        )
    )


def report_counters(
    df: DataFrame,
    mode: str = "repair",
    epoch_unit: str = "s",
    iqr_factor: float = 1.5,
    price_tolerance: float = 0.0,
    extreme_change_threshold: float = 0.2,
    add_time_features: bool = True,
) -> DataFrame:
    """The full validation report as ONE one-row DataFrame.

    Pure-lazy twin of ``validate_and_clean``'s report dict
    (``data_cleaner.py:82-167``): every counter is an aggregate over
    the corresponding ``clean_ohlcv`` stage frame, cross-joined into a
    single row (each branch is itself a one-row aggregate, so the
    crossJoins are trivial)."""
    if mode not in ("repair", "strict"):
        raise ValueError(f"mode must be 'repair' or 'strict', got {mode!r}")
    s = _staged(df, mode, epoch_unit, iqr_factor, price_tolerance)

    a_ts = s["ts"].agg(
        F.count(F.lit(1)).alias("total_records"),
        (F.count(F.lit(1)) - F.count("timestamp")).alias("invalid_timestamps"),
    )
    a_dup = s["valid"].agg(
        (
            F.count(F.lit(1)) - F.countDistinct("symbol", "timestamp")
        ).alias("duplicates_removed")
    )
    nan_cells = reduce(
        lambda a, b: a + b,
        [F.sum(F.col(c).isNull().cast("long")) for c in OHLCV_COLUMNS],
    )
    a_nan = s["coerced"].agg(nan_cells.alias("initial_nans"))
    any_neg = reduce(
        lambda a, b: a | b, [(F.col(c) < 0) for c in OHLCV_COLUMNS]
    )
    a_neg = s["imputed"].agg(
        F.sum(any_neg.cast("long")).alias("negative_rows")
    )
    a_out = _outlier_counts(s["nonneg"], iqr_factor)
    a_ohlc = s["pre_repair"].agg(
        F.sum(
            (~cleaning.ohlc_consistent(price_tolerance)).cast("long")
        ).alias("invalid_ohlc")
    )
    a_fin = _final_counters(s["final"], extreme_change_threshold)
    a_mode = _interval_mode_global(s["final"])

    row = reduce(
        lambda a, b: a.crossJoin(b),
        [a_ts, a_dup, a_nan, a_neg, a_out, a_ohlc, a_fin, a_mode],
    )
    return row.select(
        *[
            c
            for c in REPORT_COLUMNS
            if c not in ("valid_records", "is_valid", "time_features_added")
        ],
        F.col("final_rows").alias("valid_records"),
        (F.col("final_rows") > 0).alias("is_valid"),
        F.lit(bool(add_time_features)).alias("time_features_added"),
    )


def validation_report(
    df: DataFrame,
    mode: str = "repair",
    epoch_unit: str = "s",
    iqr_factor: float = 1.5,
    price_tolerance: float = 0.0,
    extreme_change_threshold: float = 0.2,
    add_time_features: bool = True,
    cache: bool = True,
) -> dict:
    """Eager collector returning the reference's report-dict shape
    (``data_cleaner.py:82-167``, consumed at
    ``crypto_pipeline.py:480-489``): nested ``outliers_detected``
    per-column map, top-level counters, ``is_valid`` flag.

    ``cache=True`` persists the raw input for the duration of the
    multi-branch aggregate (8 branches share the scan + symbol
    shuffle); callers holding an already-cached frame pass False.
    """
    if cache:
        df = df.cache()
    try:
        row = report_counters(
            df,
            mode=mode,
            epoch_unit=epoch_unit,
            iqr_factor=iqr_factor,
            price_tolerance=price_tolerance,
            extreme_change_threshold=extreme_change_threshold,
            add_time_features=add_time_features,
        ).first()
    finally:
        if cache:
            df.unpersist()
    d = row.asDict()
    outliers = {c: int(d[f"outliers_{c}"] or 0) for c in OHLCV_COLUMNS}
    report = {
        "missing_cols": [],
        "total_records": int(d["total_records"]),
        "invalid_timestamps": int(d["invalid_timestamps"]),
        "duplicates_removed": int(d["duplicates_removed"]),
        "initial_nans": int(d["initial_nans"] or 0),
        "negative_rows": int(d["negative_rows"] or 0),
        "outliers_detected": {c: n for c, n in outliers.items() if n > 0},
        "outliers_fixed": int(d["outliers_fixed"] or 0),
        "invalid_ohlc": int(d["invalid_ohlc"] or 0),
        "time_gaps": int(d["time_gaps"] or 0),
        "time_features_added": bool(d["time_features_added"]),
        "duplicated_timestamps": 0,  # post-dedup frame, by construction
        "most_common_interval_seconds": (
            float(d["most_common_interval_seconds"])
            if d["most_common_interval_seconds"] is not None
            else None
        ),
        "irregular_intervals": int(d["irregular_intervals"] or 0),
        "zero_price_rows": int(d["zero_price_rows"] or 0),
        "extreme_price_changes": int(d["extreme_price_changes"] or 0),
        "zero_volume_rows": int(d["zero_volume_rows"] or 0),
        "final_rows": int(d["final_rows"]),
        "nans_after": int(d["nans_after"] or 0),
        "valid_records": int(d["valid_records"]),
        "is_valid": bool(d["is_valid"]),
    }
    return report
