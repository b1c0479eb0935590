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


def dedup_ingest_writer(table, query_key: str = "dedup_ingest"):
    """The production ``foreachBatch`` handler for exactly-once
    unbounded-history dedup ingest: each micro-batch is deduplicated
    in-batch, anti-joined against the lake table's own ``content_hash``
    column (the compacted history), and the survivors — hashes riding
    along — land as ONE manifest commit carrying the lake sink's batch
    ledger. A crash between the lake commit and the checkpoint commit
    replays the batch; the ledger skips it, so a duplicate can never be
    re-admitted and a novel doc is never lost
    (``tests/test_streaming_crash_matrix.py`` kills this handler in
    every death window and asserts both).

    ``table`` is the :class:`~financial_data_pipeline_spark.sources.
    laketable.LakeTable` that is BOTH the sink and the history — one
    commit keeps data, hash set, and ledger atomic. State is O(0) on
    the streaming side; the history anti-join is one shuffle keyed on
    the 8-byte hash (broadcast when the history fits), per the 100 TB
    design in the module docstring."""
    from .lake_sink import _META_PREFIX, last_committed_batch

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(table, query_key):
            return  # replayed delivery; already in the table
        if table.head_version() > 0:
            history = table.read().select("content_hash")
        else:
            history = batch.sparkSession.createDataFrame(
                [], "content_hash long"
            )
        fresh = dedup_against_history(batch, history)
        table._fault("lake_sink:pre_commit")
        table.commit(
            fresh,
            mode="append",
            app_meta={_META_PREFIX + query_key: int(batch_id)},
        )
        table._fault("lake_sink:post_commit")

    return handle
