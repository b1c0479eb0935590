"""Streaming trending items: top-k tokens per event-time window.

The heavy-hitters stream (``frequency_stream``) answers the GLOBAL
"most frequent ever" question with O(m) state; trending asks a
windowed one — "what is hot in each hour" — and its answer changes
shape: per-window counts are a watermark-bounded streaming aggregate,
but the RANKING step (top-k of each window) is not an incremental
aggregate at all, so the standard rendering is:

- ONE stateful operator: (window, token) counts with a watermark,
  append mode — rows emit exactly once, when their window closes;
- ``foreachBatch``: each micro-batch of CLOSED window-counts is a
  plain batch frame, so the per-window rank window + top-k filter run
  batch-side and land in the sink (here: parquet per batch, the same
  drain shape every streaming test here uses).

Ranking inside foreachBatch is correct BECAUSE append mode guarantees
each (window, token) row appears in exactly one batch after the
watermark passes — every window's full count set ranks together; no
cross-batch merge is ever needed. (In update mode this pattern would
be wrong — partial counts would rank repeatedly.)

State: O(open windows · active tokens) counters, watermark-bounded —
the exact continuous-aggregate contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_token_counts(
    stream: DataFrame,
    token_col: str = "token",
    ts: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window_start, window_end, token, n) — append-mode windowed
    counts; one stateful aggregate."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window).alias("w"), F.col(token_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            token_col,
            "n",
        )
    )


def rank_top_k(batch: DataFrame, k: int, token_col: str = "token") -> DataFrame:
    """Per-window top-k of a CLOSED window-count frame (deterministic
    ties: higher count first, then token)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc(token_col)
    )
    return (
        batch.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def trending_to_parquet(
    counts: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    k: int = 3,
    token_col: str = "token",
) -> None:
    """Drain available data: rank each batch of closed windows and
    append the top-k rows to parquet. Restart-safe via the checkpoint
    (closed windows never re-emit, so no batch ranks a window twice)."""

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        ranked = rank_top_k(batch_df, k, token_col)
        ranked.write.mode("append").parquet(out_path)

    (
        counts.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
