"""Streaming → serving-store wiring (SURVEY.md §2.10 ∘ S13).

The reference's continuous aggregate lands in a TimescaleDB table that
readers query while the refresh job updates it in place
(``timescaledb_schema.sql:44-66``). The Spark rendering: the windowed
aggregate runs in UPDATE output mode — every micro-batch re-emits each
window whose aggregate changed — and ``foreachBatch`` applies the
micro-batch through the same batched keyed upsert the batch path uses
(``sinks.jdbc_upsert``), so a window that receives late rows simply
overwrites its previous row in the store.

Why upsert and not append: update-mode re-emissions and Spark task/
batch retries both re-send rows; a keyed ``INSERT … ON CONFLICT DO
UPDATE`` makes every re-delivery idempotent — exactly-once *effect* on
the store without any sink-side transaction coordination. That is the
same contract the reference gets from TimescaleDB's transactional
refresh, achieved lake-side.

At scale the upsert fan-in is per-partition batched (one connection,
``execute_values`` pages) and the streaming state is bounded by the
watermark exactly as in ``continuous_aggregate``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from financial_data_pipeline_spark.sources.sinks import jdbc_upsert


def stream_upsert(
    result: DataFrame,
    dsn: str,
    table: str,
    key_cols: list[str],
    checkpoint_dir: str,
    on_conflict: str = "update",
    batch_size: int = 1_000,
    executor: Callable | None = None,
) -> None:
    """Drain the available source, upserting every changed window into
    the serving table; restartable via ``checkpoint_dir`` like any
    checkpointed query (offsets + state + watermark recovered).

    ``executor`` is the same injectable statement runner as
    ``sinks.jdbc_upsert`` (tests inject a recorder; production uses the
    psycopg2 ``execute_values`` default).
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        jdbc_upsert(
            batch_df,
            dsn,
            table,
            key_cols,
            on_conflict=on_conflict,
            batch_size=batch_size,
            executor=executor,
        )

    q = (
        result.writeStream.foreachBatch(handle)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
