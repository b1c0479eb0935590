"""Table profiling — the ANALYZE-shaped statistics pass.

Two parallel aggregates over the same (column-pruned) scan produce,
per requested column: row count, null count, exact distinct count,
min/max (as strings, type-erased for a uniform report row). This is
the stats collection every planner and every data-quality dashboard
runs first; at 100 TB what matters is that it is O(1) passes — the
plain counters are ONE keyless map-side-folding aggregate, the exact
NDVs are ONE Expand-based multi-distinct aggregate (hash all the way:
keeping string min/max out of the distinct rewrite is what keeps
SortAggregate + full sorts of the expanded rows out of the plan) —
and that the output is |columns| rows, not data.

``approx=True`` swaps exact distinct counts for HLL++
``approx_count_distinct`` (fixed-size sketches, no Expand fan-out) —
the 100 TB default, same trade as ``distinct_users_daily_approx``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per column: (column, n_rows, n_null, ndv, min_val,
    max_val) — min/max rendered as strings so heterogeneous columns
    share one schema."""
    cols = cols or df.columns
    ndv = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    dtypes = dict(df.dtypes)

    def render(expr, col):
        # float/double go through DECIMAL(38,6): a bare string cast
        # renders engine-specifically ('1.0E9' in the JVM vs
        # '1000000000.0' in DuckDB — fuzzed-table finding), while a
        # fixed-scale decimal prints identically everywhere.
        # Non-finite and out-of-decimal-range values are routed
        # EXPLICITLY before the decimal cast: Spark's double→decimal
        # cast yields NULL for NaN/±Inf/|x|>=1e32 under ansi=false
        # while DuckDB's ::DECIMAL(38,6) raises — a single NaN in a
        # profiled column made the oracle error rather than compare
        # (r8 ADVICE finding). The oracle twin carries the same CASE.
        # Parity contract: ±Inf and out-of-range values now compare
        # exactly; NaN renders cleanly on both sides but stays OUTSIDE
        # the cross-engine min/max parity contract — Spark orders NaN
        # greatest while DuckDB's min/max aggregate skips it whenever
        # another value competes (pinned in
        # test_r8_advice_regressions.py).
        # Applied AFTER the aggregate so min/max stay numeric.
        if dtypes.get(col) in ("double", "float"):
            return (
                F.when(F.isnan(expr), F.lit("NaN"))
                .when(expr == F.lit(float("inf")), F.lit("Inf"))
                .when(expr == F.lit(float("-inf")), F.lit("-Inf"))
                .when(F.abs(expr) >= F.lit(1e32), F.lit("out-of-range"))
                .otherwise(expr.cast("decimal(38,6)").cast("string"))
            )
        return expr.cast("string")

    plain = [F.count(F.lit(1)).alias("__n")]
    ndvs = []
    for c in cols:
        plain += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            render(F.min(F.col(c)), c).alias(f"__min_{c}"),
            render(F.max(F.col(c)), c).alias(f"__max_{c}"),
        ]
        ndvs.append(ndv(c).alias(f"__ndv_{c}"))
    if approx:
        # HLL sketches have fixed binary buffers (ObjectHashAggregate,
        # no Expand) — everything stays one aggregate over one scan.
        row = df.agg(*plain, *ndvs)
    else:
        # Exact NDVs in their OWN aggregate (r10, guide §2.3/§7.2): a
        # combined agg put min/max — whose STRING buffers no hash
        # aggregate supports — into the multi-distinct Expand rewrite,
        # forcing SortAggregate and two full sorts of the |cols|+1 ×
        # expanded rows (the measured cost of orders_profile). Split,
        # the plain pass is a keyless single-pass aggregate (no sort;
        # min/max/null counters fold map-side) and the distinct pass
        # carries pure dedup keys + count buffers → HashAggregate end
        # to end. Costs a second (column-pruned) scan — at any scale
        # rereading columnar data beats sorting Expand output. The
        # cross join is 1 row × 1 row.
        row = df.agg(*plain).crossJoin(df.agg(*ndvs))
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__ndv_{c}").alias("ndv"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
