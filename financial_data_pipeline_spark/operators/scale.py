"""Skew / scale utilities (SURVEY.md north-star: salting, bucketing).

AQE (on by default in ``session.py``) already handles the common cases:
skewed sort-merge joins are split at runtime and map-side partial
aggregation absorbs hot groupBy keys. What it cannot fix is a skewed
shuffle join whose small side is too big to broadcast whole but small
enough to replicate per salt — that is ``salted_join``. ``bucketed``
writes a table pre-shuffled on a key so repeated joins/aggs on that key
skip their exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform [0, buckets) salt column (deterministic per row via
    monotonically_increasing_id is NOT needed — rand suffices because
    the salt only spreads rows, it never keys semantics)."""
    return df.withColumn(col_name, (F.rand(seed=42) * buckets).cast("int"))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed fact side against a replicable dimension side.

    The skewed side gets a random salt in [0, buckets); the small side
    is exploded ×buckets so every (key, salt) bucket finds its match —
    a hot key's rows spread over ``buckets`` reducers instead of one.
    Cost: small side shuffles ×buckets — use only when the hot-key rows
    dwarf that (the 100 TB skew regime), and prefer plain broadcast
    whenever the dimension fits in memory.
    """
    salted = with_salt(skewed, buckets)
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted.join(replicated, on=[*on, "__salt"], how=how).drop("__salt")


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed parquet table: pre-shuffled on ``bucket_cols`` so joins
    and aggregations on those keys need no exchange (the lake analog of
    the reference's ``(symbol, timestamp)`` index)."""
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def zorder_key(
    cols: list[str], mins: list[int], maxs: list[int], bits: int = 16
) -> F.Column:
    """Morton (Z-order) interleave of N integer columns, as a pure
    codegen expression — no UDF.

    Each column is first scaled to ``bits``-bit rank space
    ((v − min) · (2^bits − 1) / (max − min), i.e. linear — callers with
    pathological value skew should pre-rank with ``percent_rank`` and
    pass the rank), then bit i of column j lands at interleaved
    position i·N + j. N·bits must fit a signed int64 (≤ 62).

    Why: sorting a table by z(a, b) clusters BOTH columns' value
    ranges within every file/row-group, so parquet min/max stats prune
    scans filtered on EITHER column — a plain sort by (a, b) prunes
    only on ``a``. This is the standard multi-dimensional data-layout
    technique (Delta/Iceberg OPTIMIZE ZORDER) expressed with stock
    Spark expressions.
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds int64")
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = max(hi - lo, 1)
        scaled.append(
            (
                (F.col(c).cast("long") - F.lit(lo))
                * F.lit((1 << bits) - 1)
                / F.lit(span)
            ).cast("long")
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of
    ``zorder_cols``: compute column min/max (one tiny agg job), range-
    partition + sort by the Morton key, drop the key, write. Each
    output file then covers a narrow range of EVERY z-column, so a
    downstream filter on any one of them skips most files/row-groups
    via parquet statistics — the scan-pruning layout for the 100 TB
    archive where queries filter on different keys than the partition
    column.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in zorder_cols],
        *[F.max(c).alias(f"hi_{c}") for c in zorder_cols],
    ).first()
    mins = [int(bounds[f"lo_{c}"]) for c in zorder_cols]
    maxs = [int(bounds[f"hi_{c}"]) for c in zorder_cols]
    z = zorder_key(zorder_cols, mins, maxs, bits)
    out = df.withColumn("__z", z)
    if num_files:
        out = out.repartitionByRange(num_files, "__z")
    out.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)


def enable_runtime_bloom_filters(
    spark, application_side_scan_threshold: str = "10GB"
) -> None:
    """Opt into Catalyst's runtime semi-join reduction for shuffle
    joins: when one side of an equi-join carries a selective filter,
    the optimizer aggregates that side's join keys into a Bloom filter
    (``BloomFilterAggregate``) and injects ``might_contain`` onto the
    other side's scan — non-matching fact rows die BEFORE the shuffle,
    which at 100 TB is the difference between shuffling the whole fact
    table and shuffling the ~matching slice. Broadcast joins don't need
    it (the hash table itself filters); this fires exactly where it
    pays: sort-merge/shuffled-hash joins too big to broadcast.

    The feature is on by default (``spark.sql.optimizer.runtime
    .bloomFilter.enabled``) but gated by an application-side scan-size
    threshold of 10 GB — right for production, never reached in local
    tests. This helper pins the production default explicitly and lets
    tests lower the gate to observe the injected filter
    (``tests/test_properties.py::test_runtime_bloom_filter_injected``).
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        application_side_scan_threshold,
    )
