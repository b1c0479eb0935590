"""Streaming reader vs expire/vacuum race (round-8 verdict item 6).

The lake crash matrix covers WRITER deaths; this pins the READER
contract for a long-running stream whose static side is a lake table
while a concurrent ``expire_snapshots`` churns it — the streaming twin
of ``test_laketable_reader_isolation``:

- pinned at a TAGGED snapshot → tag retention keeps manifest + data
  files alive through any vacuum: every micro-batch stays correct;
- pinned at an UNTAGGED snapshot that the vacuum expires → the next
  micro-batch fails with a CLEAN error (missing-file task failure,
  ``ignoreMissingFiles=false``), NEVER a silently partial batch;
- head-resolving (the dimension is re-read per micro-batch inside
  foreachBatch) → stable reads across vacuum rounds, each batch seeing
  the then-current snapshot whose files retention protects.

One continuous availableNow query per case, ``maxFilesPerTrigger=1``
for deterministic two-batch runs; the vacuum fires INSIDE foreachBatch
between batches, exactly the interleaving a live pipeline hits."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.sources.laketable import LakeTable
from financial_data_pipeline_spark.streaming.stream_join import (
    enrich_stream_static,
)


def _dim_batch(spark, payload: str):
    return spark.range(0, 20).select(
        F.col("id").alias("k"), F.lit(payload).alias("payload")
    )


def _fact_files(spark, src):
    for b in ("b1", "b2"):
        spark.range(0, 20).coalesce(1).select(
            F.col("id").alias("k"), F.lit(b).alias("batch_tag")
        ).write.parquet(str(src / b))


def _fact_stream(spark, src):
    return (
        spark.readStream.schema("k long, batch_tag string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )


def test_stream_pinned_tagged_snapshot_survives_vacuum(spark, tmp_path):
    dim = LakeTable(spark, str(tmp_path / "dim"), stat_cols=["k"])
    dim.commit(_dim_batch(spark, "v1"))  # v1
    dim.tag("pin", 1)
    dim.commit(_dim_batch(spark, "v2"), mode="overwrite")  # v2 (head)

    src = tmp_path / "facts"
    _fact_files(spark, src)
    pinned = dim.read(ref="pin")
    results = []

    def sink(batch_df, batch_id):
        out = enrich_stream_static(batch_df, pinned, on=["k"], how="inner")
        rows = out.collect()
        results.append((batch_id, len(rows), {r.payload for r in rows}))
        if batch_id == 0:
            # churn between batches: new head + vacuum everything
            # untagged — tag retention must keep v1 alive
            dim.commit(_dim_batch(spark, "v3"), mode="overwrite")
            dim.expire_snapshots(keep_last=1)

    q = (
        enrich_stream_static(_fact_stream(spark, src), pinned, on=["k"])
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert [(b, n) for b, n, _ in sorted(results)] == [(0, 20), (1, 20)]
    assert all(p == {"v1"} for _, _, p in results), (
        "tagged pin must keep serving the pinned payload across vacuums"
    )


def test_stream_pinned_untagged_snapshot_fails_clean_after_vacuum(
    spark, tmp_path
):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    dim = LakeTable(spark, str(tmp_path / "dim"), stat_cols=["k"])
    dim.commit(_dim_batch(spark, "v1"))  # v1 — untagged
    dim.commit(_dim_batch(spark, "v2"), mode="overwrite")  # v2 (head)
    v1_files = [fs.path for fs in dim._load_snapshot(1).files]

    src = tmp_path / "facts"
    _fact_files(spark, src)
    pinned = dim.read(version=1)
    results = []

    def sink(batch_df, batch_id):
        out = enrich_stream_static(batch_df, pinned, on=["k"], how="inner")
        rows = out.collect()
        results.append((batch_id, len(rows)))
        if batch_id == 0:
            dim.expire_snapshots(keep_last=1)  # reclaims v1's files
            assert not any(os.path.exists(p) for p in v1_files), (
                "precondition: the vacuum really deleted the pinned files"
            )

    q = (
        enrich_stream_static(_fact_stream(spark, src), pinned, on=["k"])
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(180)
        raise AssertionError("query must fail once the pin is vacuumed")
    # batch 0 completed correctly; batch 1 failed CLEAN — it recorded
    # nothing, it did not emit a partial/empty join result
    assert results == [(0, 20)]


def test_stream_head_resolving_dim_stable_across_vacuum(spark, tmp_path):
    dim = LakeTable(spark, str(tmp_path / "dim"), stat_cols=["k"])
    dim.commit(_dim_batch(spark, "v1"))  # v1 (head)

    src = tmp_path / "facts"
    _fact_files(spark, src)
    results = []

    def sink(batch_df, batch_id):
        # re-resolve the dimension at the CURRENT head each batch —
        # retention always protects the head snapshot's files
        out = batch_df.join(F.broadcast(dim.read()), on=["k"], how="inner")
        rows = out.collect()
        results.append((batch_id, len(rows), {r.payload for r in rows}))
        if batch_id == 0:
            dim.commit(_dim_batch(spark, "v2"), mode="overwrite")
            dim.expire_snapshots(keep_last=1)  # v1 reclaimed

    q = (
        _fact_stream(spark, src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert [(b, n) for b, n, _ in sorted(results)] == [(0, 20), (1, 20)]
    assert results[0][2] == {"v1"} and results[1][2] == {"v2"}, (
        "each batch must see the then-current committed snapshot"
    )
