"""Incremental ingest via the latest-timestamp cursor (SURVEY.md A4, §7.1-9).

The reference ingests incrementally by asking the store for
``get_latest_timestamp(symbol)`` and downloading forward from there
(``timeseries_db.py:313-347``). Lake form: the cursor is a per-symbol
``max(timestamp)`` aggregate over the parquet dataset (parquet footer
min/max stats make this a metadata-mostly scan), the new batch is
trimmed with a broadcast cursor join, and the append is idempotent
against replayed pages — re-appending an already-ingested page adds 0
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def latest_cursors(
    spark: SparkSession, lake_path: str, ts: str = "timestamp"
) -> DataFrame | None:
    """Per-symbol high-water marks; None when the lake doesn't exist."""
    try:
        lake = spark.read.parquet(lake_path)
    except Exception:  # noqa: BLE001 - first ingest: no dataset yet
        return None
    return lake.groupBy("symbol").agg(F.max(ts).alias("__cursor"))


def incremental_append(
    spark: SparkSession,
    lake_path: str,
    batch: DataFrame,
    ts: str = "timestamp",
) -> int:
    """Append only rows strictly past each symbol's cursor; returns the
    number of appended rows. New symbols (no cursor) pass whole."""
    cursors = latest_cursors(spark, lake_path, ts)
    if cursors is not None:
        batch = batch.join(F.broadcast(cursors), on="symbol", how="left").filter(
            F.col("__cursor").isNull() | (F.col(ts) > F.col("__cursor"))
        ).drop("__cursor")
    n = batch.count()
    if n:
        batch.write.mode("append").parquet(lake_path)
    return n
