"""Exactly-once streaming → lake-table sink (streaming/lake_sink.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_pipeline_spark.sources.laketable import LakeTable
from financial_data_pipeline_spark.streaming.lake_sink import (
    lake_batch_writer,
    last_committed_batch,
    stream_to_lake,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _rows(start, n):
    t0 = dt.datetime(2025, 1, 1)
    return [
        (start + i, t0 + dt.timedelta(minutes=start + i), float(start + i))
        for i in range(n)
    ]


def _stream(spark, src_glob):
    return spark.readStream.schema(SCHEMA).parquet(src_glob)


def test_stream_appends_land_and_resume_skips_old_files(spark, tmp_path):
    src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
    table = LakeTable(spark, str(tmp_path / "lake"), stat_cols=["id"])

    spark.createDataFrame(_rows(0, 5), SCHEMA).write.parquet(str(src / "b1"))
    stream_to_lake(_stream(spark, str(src / "*")), table, ckpt, "q1")
    assert table.read().count() == 5
    b1 = last_committed_batch(table, "q1")
    assert b1 >= 0

    # restart from the same checkpoint with one new file: only the new
    # rows ingest (offsets recovered), ledger advances
    spark.createDataFrame(_rows(100, 3), SCHEMA).write.parquet(str(src / "b2"))
    stream_to_lake(_stream(spark, str(src / "*")), table, ckpt, "q1")
    assert table.read().count() == 8
    assert last_committed_batch(table, "q1") > b1
    ids = {r.id for r in table.read().select("id").collect()}
    assert ids == set(range(5)) | {100, 101, 102}


def test_replayed_batch_is_skipped(spark, tmp_path):
    """The crash-between-commits window: foreachBatch re-delivers the
    same batch_id; the ledger makes the second delivery a no-op."""
    table = LakeTable(spark, str(tmp_path / "lake"), stat_cols=["id"])
    handler = lake_batch_writer(table, "q1")
    df = spark.createDataFrame(_rows(0, 4), SCHEMA)

    handler(df, 0)
    v_after_first = table.head_version()
    assert table.read().count() == 4

    handler(df, 0)  # replay
    assert table.head_version() == v_after_first
    assert table.read().count() == 4

    handler(df, 1)  # genuinely new batch appends
    assert table.read().count() == 8


def test_merge_mode_upserts_idempotently(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "lake"), stat_cols=["id"])
    handler = lake_batch_writer(table, "q1", mode="merge", key_cols=["id"])

    handler(spark.createDataFrame(_rows(0, 4), SCHEMA), 0)
    updated = spark.createDataFrame(
        [(2, dt.datetime(2025, 1, 2), 99.0), (10, dt.datetime(2025, 1, 2), 10.0)],
        SCHEMA,
    )
    handler(updated, 1)
    got = {r.id: r.v for r in table.read().collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 99.0, 3: 3.0, 10: 10.0}

    handler(updated, 1)  # replayed merge: no state change
    assert {r.id: r.v for r in table.read().collect()} == got


def test_ledgers_are_namespaced_per_query(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "lake"), stat_cols=["id"])
    lake_batch_writer(table, "qA")(spark.createDataFrame(_rows(0, 2), SCHEMA), 7)
    assert last_committed_batch(table, "qA") == 7
    assert last_committed_batch(table, "qB") == -1
    # qB's batch 0 must not be mistaken for a qA replay
    lake_batch_writer(table, "qB")(spark.createDataFrame(_rows(10, 2), SCHEMA), 0)
    assert table.read().count() == 4
    assert last_committed_batch(table, "qA") == 7
    assert last_committed_batch(table, "qB") == 0


def test_invalid_modes_raise(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "lake"), stat_cols=["id"])
    with pytest.raises(ValueError, match="append|merge"):
        lake_batch_writer(table, "q", mode="overwrite")
    with pytest.raises(ValueError, match="key_cols"):
        lake_batch_writer(table, "q", mode="merge")
