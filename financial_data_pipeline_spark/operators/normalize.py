"""Normalization + inverse (SURVEY.md F10–F12).

Re-expresses ``DataNormalizer``
(``src/data_etl/processing/data_normalizer.py:43-102``): z-score,
min-max, and log1p normalization with saved scaler parameters enabling
an exact round-trip denormalize (the reference's own test invariant:
round-trip ≈ original, rtol 1e-10 — ``tests/units/test_processing.py``).

Spark design: scaler parameters are a tiny per-group aggregate
(``fit``), broadcast-joined back for ``transform``/``inverse`` — the
fact table is never shuffled, only scanned. ``.std()`` in pandas is the
SAMPLE stddev (ddof=1) → ``stddev_samp`` (SURVEY.md A8 trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METHODS = ("zscore", "minmax", "log")


def fit_scalers(
    df: DataFrame, cols: list[str], method: str, by: list[str] = ("symbol",)
) -> DataFrame:
    """Compute scaler parameters per group: a small dimension DataFrame
    with columns ``by* , __p1_<col>, __p2_<col>`` where (p1, p2) is
    (mean, std) for zscore and (min, max) for minmax."""
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}; use one of {METHODS}")
    by = [c for c in by if c in df.columns]
    if method == "log":
        # log1p is stateless; emit an empty param frame for API symmetry.
        return df.select(*by).distinct()
    aggs = []
    for c in cols:
        if method == "zscore":
            aggs += [F.avg(c).alias(f"__p1_{c}"), F.stddev_samp(c).alias(f"__p2_{c}")]
        else:
            aggs += [F.min(c).alias(f"__p1_{c}"), F.max(c).alias(f"__p2_{c}")]
    return df.groupBy(*by).agg(*aggs)


def _with_params(df: DataFrame, scalers: DataFrame, by: list[str]) -> DataFrame:
    by = [c for c in by if c in df.columns and c in scalers.columns]
    return (
        df.join(F.broadcast(scalers), on=by, how="left")
        if by
        else df.crossJoin(F.broadcast(scalers))
    )


def normalize(
    df: DataFrame,
    cols: list[str],
    method: str = "zscore",
    by: list[str] = ("symbol",),
    scalers: DataFrame | None = None,
) -> DataFrame:
    """Normalize ``cols`` in place (``data_normalizer.py:43-63``).

    zscore: (x−mean)/std; minmax: (x−min)/(max−min); log: log1p(x).
    Pass a pre-fit ``scalers`` frame to reuse train-set parameters.
    """
    if method == "log":
        return df.withColumns({c: F.log1p(F.col(c)) for c in cols})
    scalers = scalers if scalers is not None else fit_scalers(df, cols, method, by)
    out = _with_params(df, scalers, list(by))
    updates = {}
    for c in cols:
        p1, p2 = F.col(f"__p1_{c}"), F.col(f"__p2_{c}")
        if method == "zscore":
            updates[c] = (F.col(c) - p1) / p2
        else:
            updates[c] = (F.col(c) - p1) / (p2 - p1)
    out = out.withColumns(updates)
    return out.drop(*[f"__p{i}_{c}" for c in cols for i in (1, 2)])


def rank_normalize(
    df: DataFrame,
    cols: list[str],
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Percent-rank feature scaling (beyond-reference: the standard
    robust alternative to z-score when distributions are heavy-tailed
    — rank-gauss without the gauss step).

    Each value maps to its within-group ``percent_rank`` in value
    order, ties sharing a rank (``(rank−1)/(n−1)``, the SQL-standard
    definition — identical in DuckDB, so oracle-comparable). One
    shuffle per distinct group key; all ``cols`` share it.
    """
    from pyspark.sql import Window

    by = [c for c in by if c in df.columns]
    updates = {}
    for c in cols:
        w = Window.partitionBy(*by).orderBy(F.col(c).asc())
        updates[c] = F.percent_rank().over(w)
    return df.withColumns(updates)


def denormalize(
    df: DataFrame,
    cols: list[str],
    scalers: DataFrame,
    method: str = "zscore",
    by: list[str] = ("symbol",),
) -> DataFrame:
    """Inverse transform (``data_normalizer.py:85-102``)."""
    if method == "log":
        return df.withColumns({c: F.expm1(F.col(c)) for c in cols})
    out = _with_params(df, scalers, list(by))
    updates = {}
    for c in cols:
        p1, p2 = F.col(f"__p1_{c}"), F.col(f"__p2_{c}")
        if method == "zscore":
            updates[c] = F.col(c) * p2 + p1
        else:
            updates[c] = F.col(c) * (p2 - p1) + p1
    out = out.withColumns(updates)
    return out.drop(*[f"__p{i}_{c}" for c in cols for i in (1, 2)])


def frac_diff_weights(d: float, threshold: float = 1e-4) -> list[float]:
    """Fixed-width fractional-differentiation weights (López de Prado,
    AFML ch.5): w_0 = 1, w_k = −w_{k−1}·(d−k+1)/k, truncated where
    |w_k| drops below ``threshold``. Driver-side: a few dozen floats."""
    w = [1.0]
    k = 1
    while True:
        nxt = -w[-1] * (d - k + 1) / k
        if abs(nxt) < threshold:
            break
        w.append(nxt)
        k += 1
    return w


def frac_diff(
    col: str,
    d: float = 0.4,
    threshold: float = 1e-4,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
):
    """Fractionally differentiated series: x̃_t = Σ_k w_k·x_{t−k} —
    the AFML answer to "integer differencing kills the memory ML
    models feed on": d ∈ (0, 1) removes just enough trend to pass
    stationarity while keeping long-range structure.

    The truncated weight vector is a driver-side constant, so the
    transform is a LITERAL-WEIGHTED sum of ``lag`` columns over one
    per-key sort — pure codegen, exactly reproducible, and the oracle
    interpolates the same weights. Rows without the full look-back
    abstain (the fixed-width convention: no expanding-window drift).
    """
    from pyspark.sql import Column, Window
    from pyspark.sql import functions as F

    w = frac_diff_weights(d, threshold)
    win = Window.partitionBy(*by).orderBy(ts)
    expr: Column = F.lit(w[0]) * F.col(col)
    for k, wk in enumerate(w[1:], start=1):
        expr = expr + F.lit(wk) * F.lag(col, k).over(win)
    full = F.lag(col, len(w) - 1).over(win).isNotNull()
    return F.when(full, expr)
