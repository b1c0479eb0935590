"""Streaming deduplication (beyond-reference scope; north-star LLM
pipeline ingest path).

A continuously-ingesting training-data pipeline needs dedup at ingest
time, not only in batch sweeps: drop a document whose exact content
hash was already seen within the (watermark-bounded) state horizon.

Spark rendering: ``dropDuplicatesWithinWatermark`` on the 60-bit
content hash — state is one row per distinct hash and is evicted once
the event-time watermark passes, so state size is bounded by
(distinct docs per watermark window), not by total history. This is
the streaming twin of ``operators.dedup.exact_dedup`` (same
``_hash60`` content hash), and at 100 TB/day it shards state by hash
across executors like any keyed stateful op.

For *unbounded* history dedup (never re-admit a doc ever seen), the
scale design is instead: maintain the batch hash table as a compacted
lake table and anti-join each micro-batch in ``foreachBatch`` — that
variant is ``dedup_against_history`` below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators.dedup import _hash60


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop exact-duplicate documents within the watermark horizon.

    Input: a streaming DataFrame with ``ts_col`` (event-time) and
    ``text_col``. Output: the stream minus rows whose content hash was
    already seen no earlier than the watermark allows. Uses
    ``dropDuplicatesWithinWatermark`` so late duplicates inside the
    horizon are still caught while state is evicted past it.
    """
    hashed = stream.withColumn("content_hash", _hash60(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def dedup_against_history(batch: DataFrame, history: DataFrame) -> DataFrame:
    """foreachBatch body for unbounded-history dedup: anti-join the
    micro-batch against the lake-side hash table (one shuffle keyed on
    the 8-byte hash; broadcast if the history fits).

    ``history`` is a DataFrame of ``content_hash`` (the compacted
    output of prior batches). Returns the surviving rows, already
    de-duplicated *within* the batch too (keep-lowest ``doc_id`` when
    present, else arbitrary-first via row_number on the hash).
    """
    hashed = batch.withColumn("content_hash", _hash60(F.col("text")))
    if "doc_id" in batch.columns:
        from pyspark.sql import Window

        w = Window.partitionBy("content_hash").orderBy("doc_id")
        in_batch = (
            hashed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        in_batch = hashed.dropDuplicates(["content_hash"])
    return in_batch.join(
        history.select("content_hash"), on="content_hash", how="left_anti"
    )
