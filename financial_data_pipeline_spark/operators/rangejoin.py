"""Bucketized range (interval) join — beyond-reference scope.

Joining points to intervals with a pure range predicate (`start <= ts
<= end`, no equi key) is a theta join: Spark's only native plan is
BroadcastNestedLoopJoin — O(|points| · |intervals|) comparisons and a
broadcast of one whole side. The scale path is the classic *bucketized
range join* (the technique behind Databricks' range-join hint and
Flink's interval join, both public): quantize time into fixed buckets,
explode each interval into the buckets it covers, equi-join points on
the bucket id, then apply the exact range predicate to the survivors.

Shuffle is O(|points| + |intervals| · buckets_per_interval) and the
join is an ordinary hash join — pick ``bucket_seconds`` near the
typical interval length so intervals explode into ~1–2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 86_400,
    keys: list[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing its
    timestamp (inclusive bounds, SQL ``BETWEEN`` semantics), optionally
    co-keyed on ``keys``.

    Column names must be disjoint between the two frames apart from
    ``keys`` (standard join hygiene — select/alias before calling).
    ``how`` supports ``inner`` and ``left`` (a left join keeps
    unmatched points with null interval columns; implemented as the
    bucketized inner join unioned with the anti-join remainder, since
    a left join on the exploded bucket key would duplicate unmatched
    points once per probed bucket).
    """
    keys = list(keys)
    b_us = F.lit(int(bucket_seconds) * 1_000_000)
    p = points.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(point_ts)) / b_us)
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / b_us),
                F.floor(F.unix_micros(F.col(end_col)) / b_us),
            )
        ),
    )
    in_range = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    matched = p.join(i, on=["__bucket", *keys], how="inner").filter(in_range)
    if how == "inner":
        return matched.drop("__bucket")
    if how == "left":
        unmatched = points.join(
            matched.select(*points.columns).distinct(),
            on=points.columns,
            how="left_anti",
        )
        return matched.drop("__bucket").unionByName(
            unmatched, allowMissingColumns=True
        )
    raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
