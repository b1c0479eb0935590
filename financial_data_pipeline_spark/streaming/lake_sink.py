"""Exactly-once streaming sink into the snapshot lake table.

``foreachBatch`` gives at-least-once delivery: after a crash between
the sink's write and the checkpoint commit, Structured Streaming
REPLAYS the last micro-batch with the SAME ``batch_id``. The JDBC path
absorbs replays with keyed upserts (``streaming/serving.py``); an
append-only lake table can't — replaying an append duplicates rows.

The lakehouse answer (Delta's ``txnAppId``/``txnVersion``, public
design) is transactional idempotence: record the last applied batch id
IN the table's own commit metadata, atomically with the data. Here the
snapshot manifest is the transaction log, so the sink:

1. reads the head snapshot's ``app_meta[query_key]``;
2. skips any delivered batch with ``batch_id <=`` that (a replay:
   its data is already in the table — the previous run crashed after
   the table commit but before the checkpoint commit);
3. otherwise commits data + ``{query_key: batch_id}`` in ONE manifest
   write (the HEAD move is the commit point — there is no window in
   which data is visible without its batch id).

Result: exactly-once *table state* on top of at-least-once delivery,
the same contract Delta/Iceberg streaming sinks provide. Merge mode
routes through ``LakeTable.merge`` (stats-pruned copy-on-write), so a
keyed stream (e.g. UPDATE-mode windowed aggregates) lands as upserts
with the same idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from financial_data_pipeline_spark.sources.laketable import LakeTable

_META_PREFIX = "stream_batch:"


def last_committed_batch(table: LakeTable, query_key: str) -> int:
    """The newest micro-batch id the table has applied for this query
    (−1 if none) — read from the head snapshot manifest."""
    return int(table.app_meta().get(_META_PREFIX + query_key, -1))


def lake_batch_writer(
    table: LakeTable,
    query_key: str,
    mode: str = "append",
    key_cols: list[str] | None = None,
):
    """The ``foreachBatch`` handler: idempotent append/merge of one
    micro-batch into ``table``. ``query_key`` namespaces the batch-id
    ledger so several independent streams can share a table."""
    if mode not in ("append", "merge"):
        raise ValueError(f"mode must be append|merge, got {mode!r}")
    if mode == "merge" and not key_cols:
        raise ValueError("merge mode requires key_cols")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(table, query_key):
            return  # replayed delivery; already in the table
        # fault-injection seam (same hook as the lake commit protocol's
        # advance:* points): the streaming crash matrix kills the
        # writer here — before the lake commit and between the lake
        # commit and the checkpoint commit — and asserts exactly-once
        # across restart
        table._fault("lake_sink:pre_commit")
        meta = {_META_PREFIX + query_key: int(batch_id)}
        if mode == "merge":
            table.merge(batch_df, key_cols, app_meta=meta)
        else:
            table.commit(batch_df, mode="append", app_meta=meta)
        table._fault("lake_sink:post_commit")

    return handle


def stream_to_lake(
    result: DataFrame,
    table: LakeTable,
    checkpoint_dir: str,
    query_key: str = "default",
    mode: str = "append",
    key_cols: list[str] | None = None,
    output_mode: str = "append",
) -> None:
    """Drain the available stream into the lake table exactly-once and
    return when caught up (``availableNow`` — the batch-ingest-shaped
    streaming run every other streaming operator here uses; a
    production trigger is a one-word change)."""
    (
        result.writeStream.foreachBatch(
            lake_batch_writer(table, query_key, mode, key_cols)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
