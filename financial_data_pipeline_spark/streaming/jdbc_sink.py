"""Streaming → SQL-database upsert sink (the reference's continuous
crypto ingest into TimescaleDB, ``timeseries_db.py:205-250,411-429``,
re-expressed on Structured Streaming).

``foreachBatch`` + the staged set-based MERGE
(:func:`financial_data_pipeline_spark.sources.sinks.jdbc_staged_upsert`):
each micro-batch is written in parallel into a staging table by the
executors and folded into the target with ONE keyed ``MERGE``
statement.

Delivery semantics — exactly-once BY IDEMPOTENCE, not by ledger: a
keyed upsert of deterministic rows is a state overwrite, so a replayed
micro-batch (crash between sink completion and offset commit) re-folds
to the identical target state. This is the right tool when rows carry
their natural key (symbol, bucket_ts for OHLCV bars); use
``streaming/lake_sink.py``'s batch-id ledger when the sink is
APPEND-shaped and replays would duplicate. The staging table name is
suffixed with the epoch id so a concurrent retry can never collide
with a half-written stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from financial_data_pipeline_spark.sources.sinks import jdbc_staged_upsert


def jdbc_upsert_writer(
    stream_df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    checkpoint: str,
    on_conflict: str = "update",
    create_column_types: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataStreamWriter:
    """Build the writeStream for a keyed streaming upsert; caller picks
    the trigger (``.trigger(availableNow=True)`` for drain-style runs,
    a processing-time trigger for continuous tailing) and starts it."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        jdbc_staged_upsert(
            batch_df,
            url,
            table,
            key_cols,
            staging_table=f"{table}_stg_{batch_id}",
            on_conflict=on_conflict,
            properties=properties,
            create_column_types=create_column_types,
        )

    return (
        stream_df.writeStream.foreachBatch(handle)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
