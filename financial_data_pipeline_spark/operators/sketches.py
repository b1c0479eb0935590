"""Mergeable distinct-count sketches (Apache DataSketches HLL).

Why this exists next to ``approx_count_distinct`` (HLL++): the
``distinct_users_daily_approx`` query answers ONE grain per scan. At
100 TB the raw events are too expensive to re-scan every time someone
asks for a coarser grain (weekly, monthly, all-time), and exact
per-grain distinct counts are NOT re-aggregatable — you cannot sum
daily distincts into a weekly distinct. DataSketches HLL sketches are:
each fine-grain group keeps a fixed-size (~KB) binary sketch, persisted
like any other column, and any coarser rollup is ``hll_union_agg`` over
the sketches alone — the raw data is never touched again. This is the
standard lakehouse pre-aggregation contract (build once at the finest
grain, serve every grain from the sketch table).

Spark-first notes:
- ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` are
  JVM built-ins (Spark 3.5+, DataSketches HLL_4) — no UDF, partial
  aggregation map-side, shuffle carries only (group key, sketch bytes).
- Accuracy: exact while the sketch stays in coupon LIST/SET mode
  (roughly up to ``2^(lg_k-2)`` distincts), ~1.04/sqrt(2^lg_k) relative
  standard error afterwards. The default ``lg_k=14`` keeps groups with
  ≤4k distinct keys exact — which is why the driver oracle can compare
  the estimate against DuckDB's exact COUNT(DISTINCT) at gate SF — and
  costs at most 16 KB per group at saturation.
- Union requires equal ``lg_k`` (we pin it) — mixing sizes silently
  degrades to the coarser sketch if allowed; we don't allow it.

Reference parity: the reference has no sketch support; this is part of
the beyond-reference training-data surface (SURVEY.md §6), sibling of
the HLL++ swap in ``distinct_users_daily_approx``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 14


def distinct_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    sketch_col: str = "sketch",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Finest-grain sketch build: one HLL sketch of ``key_col`` per
    group. This is the table you PERSIST (parquet binary column); every
    coarser grain is served from it via :func:`rollup_sketches`."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias(sketch_col)
    )


def rollup_sketches(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grain. Input rows
    are (fine group, sketch); output is (coarse group, unioned sketch).
    Shuffles only sketch bytes — the raw corpus is never re-read."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def estimate(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    out_col: str = "n_distinct",
) -> DataFrame:
    """Materialize the distinct-count estimate (BIGINT) and drop the
    binary sketch column."""
    return sketches.withColumn(
        out_col, F.hll_sketch_estimate(sketch_col)
    ).drop(sketch_col)


# ---------------------------------------------------------------------------
# KLL quantile sketches (mergeable percentiles, Spark 4.x built-ins)
# ---------------------------------------------------------------------------


def quantile_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: int = 200,
) -> DataFrame:
    """Per-group KLL quantile sketch over a double column — the
    quantile twin of :func:`distinct_sketches`: exact per-grain
    percentiles are not re-aggregatable either (you cannot merge two
    medians), but KLL sketches union losslessly, so one build at the
    finest grain serves every coarser grain without re-scanning raw
    data. ``k=200`` ≈ 1.65% worst-case rank error; the sketch stays
    EXACT while a group holds ≤ k values (the driver-SF regime the
    tests exploit)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "kll"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_quantile_sketches(
    sketches: DataFrame, group_cols: Sequence[str], k: int = 200
) -> DataFrame:
    """Coarser grain by merging sketch bytes only."""
    return sketches.groupBy(*group_cols).agg(
        F.kll_merge_agg_double(F.col("kll"), F.lit(k)).alias("kll"),
        F.sum("n_rows").alias("n_rows"),
    )


def sketch_quantiles(
    sketches: DataFrame, probs: Sequence[float]
) -> DataFrame:
    """Evaluate percentiles from the sketch column — no data scan."""
    out = sketches
    for p in probs:
        out = out.withColumn(
            f"p{int(p * 100)}",
            F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(float(p))),
        )
    return out.drop("kll")


# ---------------------------------------------------------------------------
# Theta sketches (mergeable distinct SET ALGEBRA, Spark 4.x built-ins)
# ---------------------------------------------------------------------------


def theta_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-group Theta sketch of distinct keys. Theta buys what HLL
    cannot: INTERSECTION and DIFFERENCE — retained users between two
    days, churned users between two weeks — as pure sketch algebra
    over persisted bytes. Exact while a group's distinct count stays
    below the sketch's retained-entry budget (~2^lg_k), estimated
    beyond it."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("theta")
    )


def theta_estimate(col):
    return F.theta_sketch_estimate(col)


def retention_between(
    sketches: DataFrame,
    period_col: str,
    period_a,
    period_b,
) -> DataFrame:
    """One row: |A|, |B|, retained = |A ∩ B|, churned = |A \\ B|, new =
    |B \\ A| — computed entirely from the two periods' sketch bytes."""
    a = sketches.filter(F.col(period_col) == period_a).select(
        F.col("theta").alias("ta")
    )
    b = sketches.filter(F.col(period_col) == period_b).select(
        F.col("theta").alias("tb")
    )
    both = a.crossJoin(b)
    return both.select(
        F.theta_sketch_estimate(F.col("ta")).alias("n_a"),
        F.theta_sketch_estimate(F.col("tb")).alias("n_b"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("ta"), F.col("tb"))
        ).alias("retained"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("ta"), F.col("tb"))
        ).alias("churned"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("tb"), F.col("ta"))
        ).alias("new_users"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable FREQUENCY estimation, pure built-ins)
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per-group Count-Min sketch in LONG form: one row per non-empty
    (group, row d, bucket w) counter — the frequency companion of the
    HLL/Theta/KLL/MG family (MG answers "who are the heavy hitters";
    CMS answers "how often does THIS key occur" for ANY key, including
    ones never stored).

    Guarantees (Cormode–Muthukrishnan): estimates never undercount;
    overcount ≤ (e/width)·N with probability 1 − (1/e)^depth. Row
    hashes are ``xxhash64(key, row_seed)`` — deterministic, engine-
    independent, no RNG. The build is ONE explode(depth) + groupBy:
    shuffle carries at most depth·width counter rows per group
    regardless of N, and merging sketches (or micro-batches) is a
    plain SUM on (group, d, w) — exactly additive, no error growth
    beyond the union's own N.
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    keyed = df.select(*group_cols, F.col(key_col).alias("__k"), rows)
    bucket = F.pmod(F.xxhash64(F.col("__k"), F.col("d")), F.lit(width))
    return (
        keyed.withColumn("w", bucket)
        .groupBy(*group_cols, "d", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Union two sketches built with the SAME (depth, width): sum the
    counters — the mergeability contract every sketch here shares."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "d", "w")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``keys``: min over the depth rows
    of each key's counters. Absent counters are true zeros (CMS never
    undercounts), so a key missing every row estimates 0. The keys
    frame fans out ×depth, joins the sketch on (group, d, w) —
    broadcast when the sketch is small (≤ depth·width rows/group) —
    and one min-aggregate folds back."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    probe = keys.select(
        *group_cols, F.col(key_col).alias("key"), rows
    ).withColumn("w", F.pmod(F.xxhash64(F.col("key"), F.col("d")), F.lit(width)))
    joined = probe.join(cms, on=[*group_cols, "d", "w"], how="left").na.fill(
        {"c": 0}
    )
    return joined.groupBy(*group_cols, "key").agg(
        F.min("c").alias("est_count")
    )
