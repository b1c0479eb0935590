"""Incremental LSH-index dedup: batches probe and grow a persistent
band/shingle index; history always wins regardless of id order."""

from financial_data_pipeline_spark.operators.dedup_incremental import (
    dedup_against_index,
    ingest_batch,
)

BASE = (
    "the quick brown fox jumps over the lazy dog near the riverbank "
    "while seven anxious owls watch from tall oak branches above"
)


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_incremental_index_lifecycle(spark, tmp_path):
    idx = str(tmp_path / "lsh_index")

    batch1 = spark.createDataFrame(
        [
            (10, BASE),
            (11, "completely different text about maritime trade routes in antiquity and bronze age shipping manifests"),
            (12, "a third unrelated document concerning alpine glacier measurements and seasonal snowpack variability records"),
        ],
        ["doc_id", "text"],
    )
    s1, m1 = ingest_batch(spark, batch1, idx, threshold=0.5)
    assert _ids(s1) == [10, 11, 12]
    assert m1.count() == 0

    batch2 = spark.createDataFrame(
        [
            (20, BASE.replace("dog", "cat")),       # near-dup of 10
            (21, "fresh unique content describing fermentation chemistry in traditional bread baking processes worldwide"),
            (22, "duplicated pair text about orbital mechanics and satellite constellation maintenance procedures today"),
            (23, "duplicated pair text about orbital mechanics and satellite constellation maintenance procedures tonight"),
            # LOWER id than its historical match 11 — must still drop
            (5, "completely different text about maritime trade routes in antiquity and bronze age shipping logs"),
        ],
        ["doc_id", "text"],
    )
    s2, m2 = ingest_batch(spark, batch2, idx, threshold=0.5)
    assert _ids(s2) == [21, 22]
    got = {(r.doc_id, r.matched_id) for r in m2.collect()}
    assert (20, 10) in got
    assert (23, 22) in got
    assert (5, 11) in got

    # survivors of batch2 are now themselves history
    batch3 = spark.createDataFrame(
        [(30, "fresh unique content describing fermentation chemistry in traditional bread baking processes everywhere")],
        ["doc_id", "text"],
    )
    s3, m3 = dedup_against_index(spark, batch3, idx, threshold=0.5)
    assert _ids(s3) == []
    assert {(r.doc_id, r.matched_id) for r in m3.collect()} == {(30, 21)}


def test_first_batch_without_index_self_dedups(spark, tmp_path):
    idx = str(tmp_path / "fresh_index")
    batch = spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, "some other entirely unrelated words about volcanic island formation processes")],
        ["doc_id", "text"],
    )
    s, m = dedup_against_index(spark, batch, idx, threshold=0.5)
    assert _ids(s) == [1, 3]
    assert {(r.doc_id, r.matched_id) for r in m.collect()} == {(2, 1)}


def test_streaming_foreachbatch_ingest(spark, tmp_path):
    """The per-batch dedup is a Structured-Streaming foreachBatch body:
    two file drops processed in two checkpointed runs; the second
    batch's near-dup of batch-1 content is dropped against the index,
    and the clean corpus accumulates only survivors."""
    src = tmp_path / "in"
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [(1, BASE), (2, "unrelated mountain weather station telemetry calibration notes for spring")],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [(10, BASE.replace("dog", "wolf")), (11, "entirely new subject matter regarding tidal estuary sediment transport")],
        ["doc_id", "text"],
    )

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(str(src / "*"))
        )

        def handle(batch_df, _bid):
            surv, _ = ingest_batch(batch_df.sparkSession, batch_df, idx)
            surv.write.mode("append").parquet(out)

        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    b1.write.parquet(str(src / "b1"))
    run_once()
    b2.write.parquet(str(src / "b2"))
    run_once()  # same checkpoint: only the new files are processed

    final = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert final == [1, 2, 11]  # 10 was a near-dup of indexed doc 1
