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
