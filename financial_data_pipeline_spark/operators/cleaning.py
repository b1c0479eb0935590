"""Cleaning / validation transforms (SURVEY.md §2.2–§2.4).

Re-expresses the reference's fixed 13-step ``validate_and_clean``
sequence (``src/data_etl/processing/data_cleaner.py:56-173``) and the
three validator variants (``validation/{simple_validator,
data_validator,data_processor}.py``) as one composable transform suite
with a strictness knob:

- ``mode="strict"``  → invalid rows are dropped (simple_validator
  semantics, ``simple_validator.py:74-91``)
- ``mode="repair"``  → invalid rows are repaired/clipped
  (EnhancedDataValidator semantics, ``data_cleaner.py:218-269``)

Every transform is ``DataFrame -> DataFrame``, lazy, and partitions all
window work by ``symbol`` so the plan scales horizontally: no global
shuffles except where the reference's semantics genuinely demand global
state (none do — every cleaning rule is per-symbol or per-row).

Stage ORDER IS SEMANTICALLY SIGNIFICANT (SURVEY.md §4.2): dedup →
ts-convert → coerce → impute → drop-negatives → IQR-clip → OHLC-repair;
e.g. quantiles are computed after negative-row removal. ``clean_ohlcv``
freezes that order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from financial_data_pipeline_spark.functions.timefeatures import (
    epoch_to_timestamp,
    with_time_features,
)
from financial_data_pipeline_spark.schema import (
    OHLCV_COLUMNS,
    PRICE_COLUMNS,
    REQUIRED_COLUMNS,
)

# ---------------------------------------------------------------------------
# Projections / renames (P1, P2)
# ---------------------------------------------------------------------------


def lowercase_columns(df: DataFrame) -> DataFrame:
    """Case-normalize column names at ingest (``data_cleaner.py:92``)."""
    return df.toDF(*[c.lower() for c in df.columns])


def require_columns(df: DataFrame, required: list[str] | None = None) -> DataFrame:
    """Raise on missing required columns (``data_cleaner.py:95-102``)."""
    required = required or REQUIRED_COLUMNS
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"missing required columns: {missing}")
    return df


# ---------------------------------------------------------------------------
# Deterministic keep-first dedup (P10) — custom component #2 (SURVEY §4.3)
# ---------------------------------------------------------------------------


def dedup_keep_first(
    df: DataFrame,
    keys: list[str] | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Drop duplicate keys keeping the FIRST row in ``order_by`` order.

    The reference relies on pandas ``drop_duplicates(keep="first")``
    after a sort (``data_cleaner.py:104-112,313-322``); Spark's
    ``dropDuplicates`` keeps an *arbitrary* row, so determinism needs an
    explicit ``row_number`` window. Scales: the window shuffles once on
    the dedup keys — the same shuffle an aggregation would need.
    """
    keys = keys or ["symbol", "timestamp"]
    order_by = order_by or ["timestamp"]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Type coercion / timestamp normalization (F1, F2, P9)
# ---------------------------------------------------------------------------


def coerce_numeric(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """``pd.to_numeric(errors="coerce")`` analog: junk → null
    (``data_cleaner.py:117-118``).

    Overflow parity (found by ``tools/fuzz_oracle.py``): pandas treats
    a finite literal that overflows double ("1e400") as a COERCE
    failure → NaN, while Spark's cast saturates to ±Infinity. Only an
    EXPLICIT infinity token may stay infinite, so a string column's
    cast is post-filtered: ±inf results whose source text isn't an
    infinity literal become null."""
    cols = cols or [c for c in OHLCV_COLUMNS if c in df.columns]
    dtypes = dict(df.dtypes)
    updates = {}
    for c in cols:
        cast = F.col(c).cast("double")
        if dtypes.get(c) == "string":
            inf_token = F.lower(F.trim(F.col(c))).isin(
                "inf", "+inf", "-inf", "infinity", "+infinity", "-infinity"
            )
            cast = F.when(
                F.abs(cast) == F.lit(float("inf")), F.when(inf_token, cast)
            ).otherwise(cast)
        updates[c] = cast
    return df.withColumns(updates)


def normalize_timestamp(
    df: DataFrame, ts: str = "timestamp", epoch_unit: str = "s"
) -> DataFrame:
    """Normalize ``ts`` to a UTC timestamp column (``data_cleaner.py:175-189``).

    Numeric / numeric-string input is treated as epoch in ``epoch_unit``;
    other strings parse as datetime literals; invalid → null (dropped by
    ``drop_invalid_timestamps``).
    """
    dtype = dict(df.dtypes)[ts]
    col = F.col(ts)
    if dtype.startswith("timestamp"):
        out = col
    elif dtype in ("bigint", "int", "double", "float", "decimal"):
        out = epoch_to_timestamp(col, epoch_unit)
    else:
        # String: epoch-looking strings use the configured unit, else ISO parse.
        out = F.when(
            col.rlike(r"^\s*\d+(\.\d+)?\s*$"), epoch_to_timestamp(col, epoch_unit)
        ).otherwise(F.to_timestamp(col))
    return df.withColumn(ts, out)


def drop_invalid_timestamps(df: DataFrame, ts: str = "timestamp") -> DataFrame:
    """Drop rows whose timestamp failed to parse (``data_cleaner.py:663-688``)."""
    return df.na.drop(subset=[ts])


# ---------------------------------------------------------------------------
# Imputation (F4): ffill then bfill per symbol in time order
# ---------------------------------------------------------------------------


def _order_cols(order_by) -> list:
    return [order_by] if isinstance(order_by, str) else list(order_by)


def ffill(
    df: DataFrame,
    cols: list[str],
    partition_by: list[str] = ("symbol",),
    order_by="timestamp",
) -> DataFrame:
    """Forward-fill nulls (``fillna(method="ffill")``, ``data_cleaner.py:191-205``)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*_order_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumns({c: F.last(c, ignorenulls=True).over(w) for c in cols})


def bfill(
    df: DataFrame,
    cols: list[str],
    partition_by: list[str] = ("symbol",),
    order_by="timestamp",
) -> DataFrame:
    """Backward-fill nulls (``fillna(method="bfill")``).

    Evaluated as ``last(ignorenulls)`` over the REVERSED sort with an
    unbounded-PRECEDING frame: Spark computes unbounded-FOLLOWING
    aggregate frames by re-scanning the tail for every row (O(n²) per
    partition), while the preceding frame is one incremental pass —
    identical results, linear cost (same device as
    ``asof.asof_join``'s forward fill)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*[F.col(c).desc() for c in _order_cols(order_by)])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumns({c: F.last(c, ignorenulls=True).over(w) for c in cols})


def impute_ffill_bfill(
    df: DataFrame, cols: list[str] | None = None, partition_by: list[str] = ("symbol",)
) -> DataFrame:
    """ffill → bfill per numeric column (``data_cleaner.py:191-205``)."""
    cols = cols or [c for c in OHLCV_COLUMNS if c in df.columns]
    return bfill(ffill(df, cols, partition_by), cols, partition_by)


def interpolate_linear(
    df: DataFrame,
    cols: list[str] | None = None,
    partition_by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Time-weighted linear interpolation of null runs
    (``config_manager.py:49`` names ``handle_missing: "interpolate"``
    but the reference only ever ffills — this is the option a user
    switching engines would expect to work).

    Interior nulls get ``v_prev + (v_next − v_prev)·(t − t_prev)/
    (t_next − t_prev)`` (time-weighted, not row-weighted — equals
    pandas ``interpolate("linear")`` on regular grids and is the
    physically right answer across gaps on irregular ones). Head runs
    backfill, tail runs forward-fill (pandas ``limit_direction=
    "both"``). Four window aggregates per column over ONE partition
    ordering — a single shuffle for any number of columns.
    """
    cols = cols or [c for c in OHLCV_COLUMNS if c in df.columns]
    t_us = F.unix_micros(F.col(ts)).cast("double")
    wp = (
        Window.partitionBy(*partition_by)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # next-known lookups run over the REVERSED sort with a preceding
    # frame (strictly-before in reversed order = strictly-after in time)
    # — unbounded-FOLLOWING aggregate frames are O(n²) in Spark (see
    # bfill).
    wn = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(ts).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    updates = {}
    for c in cols:
        v = F.col(c)
        known_t = F.when(v.isNotNull(), t_us)
        pv = F.last(v, ignorenulls=True).over(wp)
        pt = F.last(known_t, ignorenulls=True).over(wp)
        nv = F.last(v, ignorenulls=True).over(wn)
        nt = F.last(known_t, ignorenulls=True).over(wn)
        interp = pv + (nv - pv) * (t_us - pt) / (nt - pt)
        updates[c] = (
            F.when(v.isNotNull(), v)
            .when(pv.isNull(), nv)  # head run → backfill
            .when(nv.isNull(), pv)  # tail run → forward-fill
            .otherwise(interp)
        )
    return df.withColumns(updates)


# ---------------------------------------------------------------------------
# Predicates / filters (P3–P8)
# ---------------------------------------------------------------------------


def drop_negative_rows(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Drop rows with any negative numeric value (``data_cleaner.py:207-216``)."""
    cols = cols or [c for c in OHLCV_COLUMNS if c in df.columns]
    cond = None
    for c in cols:
        term = F.col(c).isNull() | (F.col(c) >= 0)
        cond = term if cond is None else (cond & term)
    return df.filter(cond)


def nullify_negatives(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Nullify (not drop) negatives — ``data_validator.py:73-79`` variant."""
    cols = cols or [c for c in OHLCV_COLUMNS if c in df.columns]
    return df.withColumns(
        {c: F.when(F.col(c) >= 0, F.col(c)) for c in cols}
    )


def ohlc_consistent(tolerance: float = 0.0) -> Column:
    """OHLC consistency predicate (P5/P6).

    Strict (``simple_validator.py:83-91``): high >= low/open/close and
    low <= open/close. With ``tolerance`` t (``data_cleaner.py:238-269``,
    default 5% there): high*(1+t) >= x and low*(1-t) <= x.
    """
    h, l, o, c = (F.col(x) for x in ("high", "low", "open", "close"))
    hi = h * (1.0 + tolerance)
    lo = l * (1.0 - tolerance)
    return (hi >= l) & (hi >= o) & (hi >= c) & (lo <= o) & (lo <= c)


def filter_valid_ohlc(df: DataFrame, tolerance: float = 0.0) -> DataFrame:
    """Drop OHLC-inconsistent rows (strict-mode path)."""
    return df.filter(ohlc_consistent(tolerance))


def filter_positive_prices(df: DataFrame) -> DataFrame:
    """Positive prices, non-negative volume (``simple_validator.py:74-81``)."""
    cond = F.col("volume") >= 0
    for c in PRICE_COLUMNS:
        cond = cond & (F.col(c) > 0)
    return df.filter(cond)


def repair_ohlc(df: DataFrame, tolerance: float = 0.0) -> DataFrame:
    """Repair inconsistent rows: ``high := max(open,close,high)``,
    ``low := min(open,close,low)`` (``data_cleaner.py:251-263``)."""
    bad = ~ohlc_consistent(tolerance)
    return df.withColumns(
        {
            "high": F.when(bad, F.greatest("open", "close", "high")).otherwise(
                F.col("high")
            ),
            "low": F.when(bad, F.least("open", "close", "low")).otherwise(F.col("low")),
        }
    )


# ---------------------------------------------------------------------------
# IQR clip (F5 + A6) — aggregate-then-apply staging (2 jobs by necessity:
# quantiles are data-dependent scalars; SURVEY §4.2)
# ---------------------------------------------------------------------------


def iqr_clip(
    df: DataFrame,
    cols: list[str] | None = None,
    factor: float = 1.5,
    per_symbol: bool = True,
) -> DataFrame:
    """Winsorize outliers to ``[Q1 - f*IQR, Q3 + f*IQR]``
    (``data_cleaner.py:218-236``).

    Exact percentiles (linear interpolation — matches pandas
    ``quantile`` and DuckDB ``quantile_cont``). Implemented as a
    broadcast join of the tiny per-symbol bounds table against the fact
    — no second shuffle of the fact table.
    """
    cols = cols or [c for c in OHLCV_COLUMNS if c in df.columns]
    keys = ["symbol"] if per_symbol and "symbol" in df.columns else []
    aggs = []
    for c in cols:
        aggs += [
            F.percentile(F.col(c), F.lit(0.25)).alias(f"__q1_{c}"),
            F.percentile(F.col(c), F.lit(0.75)).alias(f"__q3_{c}"),
        ]
    bounds = df.groupBy(*keys).agg(*aggs)
    joined = (
        df.join(F.broadcast(bounds), on=keys, how="left")
        if keys
        else df.crossJoin(F.broadcast(bounds))
    )
    updates = {}
    for c in cols:
        q1, q3 = F.col(f"__q1_{c}"), F.col(f"__q3_{c}")
        iqr = q3 - q1
        lower, upper = q1 - factor * iqr, q3 + factor * iqr
        updates[c] = F.when(
            F.col(c).isNotNull(), F.greatest(lower, F.least(upper, F.col(c)))
        )
    out = joined.withColumns(updates)
    return out.drop(*[f"__{q}_{c}" for c in cols for q in ("q1", "q3")])


def zscore_outlier_clean(
    df: DataFrame,
    price_cols: list[str] | None = None,
    volume_col: str = "volume",
    threshold: float = 3.0,
) -> DataFrame:
    """Z-score variant (``validation/data_processor.py:86-123``): price
    outliers → null then ffill; volume outliers → per-symbol median."""
    price_cols = price_cols or [c for c in PRICE_COLUMNS if c in df.columns]
    keys = ["symbol"] if "symbol" in df.columns else []
    aggs = []
    for c in price_cols + [volume_col]:
        aggs += [
            F.avg(c).alias(f"__mu_{c}"),
            F.stddev_samp(c).alias(f"__sd_{c}"),
        ]
    aggs.append(F.median(volume_col).alias("__med_vol"))
    stats = df.groupBy(*keys).agg(*aggs)
    joined = (
        df.join(F.broadcast(stats), on=keys, how="left")
        if keys
        else df.crossJoin(F.broadcast(stats))
    )

    def is_outlier(c: str) -> Column:
        sd = F.col(f"__sd_{c}")
        z = F.abs((F.col(c) - F.col(f"__mu_{c}")) / sd)
        return sd.isNotNull() & (sd != 0) & (z > threshold)

    joined = joined.withColumns(
        {c: F.when(~is_outlier(c), F.col(c)) for c in price_cols}
        | {
            # when(is_outlier, med).otherwise(col) — NOT the negated
            # form: a NULL volume makes is_outlier NULL, and
            # when(~NULL, col).otherwise(med) would smear the median
            # over missing values (pandas comparison-with-NaN is False,
            # so the reference leaves NaN untouched; found by
            # tools/fuzz_oracle.py seed sweep)
            volume_col: F.when(
                is_outlier(volume_col), F.col("__med_vol")
            ).otherwise(F.col(volume_col))
        }
    )
    joined = ffill(joined, price_cols, keys or [F.lit(1)])
    drop = [f"__mu_{c}" for c in price_cols + [volume_col]]
    drop += [f"__sd_{c}" for c in price_cols + [volume_col]]
    return joined.drop(*drop, "__med_vol")


# ---------------------------------------------------------------------------
# Full cleaning pipeline (E1 step 4) — frozen stage order
# ---------------------------------------------------------------------------


def clean_ohlcv(
    df: DataFrame,
    mode: str = "repair",
    epoch_unit: str = "s",
    iqr_factor: float = 1.5,
    price_tolerance: float = 0.0,
    add_time_features: bool = True,
    impute_method: str = "ffill",
) -> DataFrame:
    """The 13-step ``validate_and_clean`` sequence
    (``data_cleaner.py:56-173``) as one lazy plan.

    lowercase → require → ts-normalize → drop-bad-ts → keep-first dedup
    → numeric coerce → impute → drop negatives → IQR clip → OHLC
    repair/drop → time features. Report counters are computed separately
    by :mod:`financial_data_pipeline_spark.plans.report` as aggregates
    over the before/after plans.
    """
    if mode not in ("repair", "strict"):
        raise ValueError(f"mode must be 'repair' or 'strict', got {mode!r}")
    df = lowercase_columns(df)
    df = require_columns(df)
    if "symbol" not in df.columns:
        df = df.withColumn("symbol", F.lit("UNKNOWN"))
    if impute_method not in ("ffill", "interpolate"):
        raise ValueError(
            f"impute_method must be 'ffill' or 'interpolate', got {impute_method!r}"
        )
    df = normalize_timestamp(df, epoch_unit=epoch_unit)
    df = drop_invalid_timestamps(df)
    df = dedup_keep_first(df, keys=["symbol", "timestamp"], order_by=["timestamp"])
    df = coerce_numeric(df)
    # "ffill" = reference parity (ffill→bfill, data_cleaner.py:191-205);
    # "interpolate" = the config option the reference names but never
    # implements (config_manager.py:49)
    df = (
        impute_ffill_bfill(df)
        if impute_method == "ffill"
        else interpolate_linear(df)
    )
    df = drop_negative_rows(df)
    if mode == "repair":
        df = iqr_clip(df, factor=iqr_factor)
        df = repair_ohlc(df, tolerance=price_tolerance)
    else:
        df = filter_positive_prices(df)
        df = filter_valid_ohlc(df, tolerance=price_tolerance)
        df = df.na.drop(subset=OHLCV_COLUMNS)
    if add_time_features:
        df = with_time_features(df)
    return df


def mad_outlier_flags(
    df: DataFrame,
    col: str,
    by: str = "symbol",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outlier flag via the modified z-score (Iglewicz & Hoaglin):
    0.6745·(x − median)/MAD with MAD = median(|x − median|) — the
    median-based sibling of the IQR clip and the z-score clean, immune
    to the outliers it hunts (mean/stddev are not).

    Two exact per-group median aggregates (Spark ``median`` ≡ DuckDB
    ``median``, the same parity the IQR path pins) with broadcast
    joins back; flags ride as ``{col}_mad_z`` / ``{col}_is_outlier``.
    A zero-MAD group (constant values) flags nothing — deviation from
    a constant is caught by the range checks, not robust z."""
    med = df.groupBy(by).agg(F.median(col).alias("__med"))
    with_med = df.join(F.broadcast(med), by)
    mad = (
        with_med.select(by, F.abs(F.col(col) - F.col("__med")).alias("__ad"))
        .groupBy(by)
        .agg(F.median("__ad").alias("__mad"))
    )
    z = F.when(
        F.col("__mad") > 0,
        0.6745 * (F.col(col) - F.col("__med")) / F.col("__mad"),
    )
    out = with_med.join(F.broadcast(mad), by)
    return out.select(
        *df.columns,
        z.alias(f"{col}_mad_z"),
        (F.abs(z) > threshold).alias(f"{col}_is_outlier"),
    )


def hampel_flags(
    df: DataFrame,
    col: str,
    n: int = 11,
    k: float = 3.0,
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """ROLLING Hampel filter: flag x_t when
    |x_t − med_t| > k·1.4826·MAD_t over the trailing n-bar window —
    the windowed sibling of :func:`mad_outlier_flags` (whose median is
    per-GROUP): a level shift later in the series does not poison
    earlier flags, which is what a spike detector on trending prices
    needs.

    Rolling median AND rolling MAD both need order statistics of the
    current window — not a two-stacked-windows composition — so both
    come from ONE bounded ``collect_list`` + ``array_sort`` per row
    (the ``cci`` device): per-row O(n log n), all codegen, no Python,
    no extra shuffle. Even-length windows average the two middle
    elements (the standard median). Warmup rows (fewer than n values)
    and zero-MAD windows (constant run) abstain — null flag column
    semantics match ``mad_outlier_flags``.
    """
    x = F.col(col).cast("double")
    w = (
        Window.partitionBy(by)
        .orderBy(ts)
        .rowsBetween(-(n - 1), 0)
    )
    arr = F.array_sort(F.collect_list(x).over(w))
    sz = F.size(arr)
    mid = (sz + 1) / 2
    med = (
        F.element_at(arr, F.floor(mid).cast("int"))
        + F.element_at(arr, F.ceil(mid).cast("int"))
    ) / 2.0
    dev = F.array_sort(F.transform(arr, lambda v: F.abs(v - med)))
    mad = (
        F.element_at(dev, F.floor(mid).cast("int"))
        + F.element_at(dev, F.ceil(mid).cast("int"))
    ) / 2.0
    flag = F.when(
        (sz >= n) & (mad > 0),
        F.abs(x - med) > F.lit(k) * F.lit(1.4826) * mad,
    )
    return df.withColumns(
        {
            f"{col}_rolling_median": F.when(sz >= n, med),
            f"{col}_hampel_outlier": flag,
        }
    )
