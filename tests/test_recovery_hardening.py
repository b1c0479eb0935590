"""Round-6 self-review hardening: the three crash/concurrency holes the
review pass found in the new recovery machinery.

1. ``recover_head`` must advance along the BASE CHAIN only — a crashed
   commit that lost a publish race (its recorded base below the
   published head) must never be promoted, or the published snapshot's
   files silently vanish from the live view.
2. ``recover_head`` must repair a HEAD pointing at an unreadable
   manifest (stalled-writer snapshot reclaimed as debris after the
   HEAD move) by falling back to the newest readable committed
   snapshot.
3. ``refresh_rollup``'s watermark must be monotone under racing
   refreshers: a slow refresher landing after a fast one must not drag
   the mark backwards (regressed marks force redundant recompute and,
   after a source vacuum, a spurious full rebuild).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from financial_data_pipeline_spark.sources.laketable import LakeTable
from financial_data_pipeline_spark.sources import rollup as rollup_mod
from financial_data_pipeline_spark.sources.rollup import (
    WATERMARK_KEY,
    refresh_rollup,
)


def _batch(spark, lo, hi, tag="t"):
    return spark.range(lo, hi).select(
        (F.col("id") % 7).cast("int").alias("day"),
        F.col("id").alias("value"),
        F.lit(tag).alias("tag"),
    )


def _orphan_manifest(table: LakeTable, version: int, base: int) -> None:
    """Hand-craft the artifact of the one race O_EXCL cannot arbitrate:
    a committed-looking manifest whose recorded base predates the
    current head (its writer passed the pre-create staleness check
    before a concurrent publish landed, then died before the
    post-create re-check could mark it aborted)."""
    donor = table._load_snapshot(base if base > 0 else 1)
    with open(table._snapshot_path(version), "w") as f:
        json.dump(
            {
                "version": version,
                "ts": 0.0,
                "mode": "append",
                "files": [vars(fs) for fs in donor.files],
                "app_meta": {},
                "staged": False,
                "base": base,
            },
            f,
        )


def test_recover_head_skips_orphan_off_the_base_chain(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tbl"), stat_cols=["day"])
    t.commit(_batch(spark, 0, 50, "a"))  # v1
    t.commit(_batch(spark, 50, 80, "b"))  # v2 (head)
    rows_before = t.read().count()

    # crashed commit derived from v1 — does NOT know about v2
    _orphan_manifest(t, 3, base=1)
    assert t.recover_head() == 2, "orphan off the chain must not win"
    assert t.head_version() == 2
    assert t.read().count() == rows_before  # v2's rows still live

    # a chained crashed commit (base == head) IS promoted, and the
    # chain continues through it
    _orphan_manifest(t, 4, base=2)
    assert t.recover_head() == 4
    assert t.head_version() == 4


def test_recover_head_repairs_unreadable_head_manifest(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tbl"), stat_cols=["day"])
    t.commit(_batch(spark, 0, 50, "a"))  # v1
    t.commit(_batch(spark, 50, 80, "b"))  # v2
    # simulate: HEAD moved to v3, then v3's manifest was reclaimed
    with open(t._head_path(), "w") as f:
        json.dump({"version": 3}, f)
    assert t.recover_head() == 2, "fall back to newest readable commit"
    assert t.read().count() == 80


def test_refresh_watermark_monotone_when_racer_already_advanced(
    spark, tmp_path, monkeypatch
):
    """The slow-refresher interleaving, deterministically: the target's
    head already carries wm=3 (a faster racer) when our refresh —
    started against src_head=2 — lands. The landed state must keep
    wm=3, not regress to 2."""
    src = LakeTable(spark, str(tmp_path / "src"), stat_cols=["day"])
    tgt = LakeTable(spark, str(tmp_path / "agg"), stat_cols=["day"])

    def key_of(df):
        return df  # day already present

    def agg(df):
        return df.groupBy("day").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
        )

    src.commit(_batch(spark, 0, 40, "a"))  # src v1
    refresh_rollup(src, tgt, key_of, agg, ["day"])  # wm = 1
    src.commit(_batch(spark, 40, 60, "b"))  # src v2
    src.commit(_batch(spark, 60, 70, "c"))  # src v3

    # fast racer B: refreshed through src v3 → wm = 3
    refresh_rollup(src, tgt, key_of, agg, ["day"])
    assert int(tgt.app_meta()[WATERMARK_KEY]) == 3

    # slow racer A: froze its reads at (wm=1, src_head=2) before B
    # landed — replay its commit now. Only the FIRST head_version()
    # call (refresh's src_head read) sees the stale value; read()
    # resolves the true head exactly as in the real interleaving, so
    # A's recompute sees all current source rows (the no-skip
    # contract) while its bookkeeping carries the stale mark.
    real_changes = src.read().filter(F.col("tag") == "b")
    real_head = src.head_version
    calls = {"n": 0}

    def stale_once():
        calls["n"] += 1
        return 2 if calls["n"] == 1 else real_head()

    monkeypatch.setattr(src, "head_version", stale_once)
    monkeypatch.setattr(
        tgt, "app_meta", lambda: {WATERMARK_KEY: 1}
    )
    monkeypatch.setattr(
        rollup_mod,
        "table_changes",
        lambda *_a, **_k: real_changes.withColumn(
            "_change_type", F.lit("insert")
        ).withColumn("_change_copies", F.lit(1)),
    )
    refresh_rollup(src, tgt, key_of, agg, ["day"])

    monkeypatch.undo()
    assert int(tgt.app_meta()[WATERMARK_KEY]) == 3, (
        "slow racer must not drag the watermark backwards"
    )
    # and the data still equals a from-scratch recompute
    expect = {
        (r["day"], r["n"], r["total"])
        for r in agg(key_of(src.read())).collect()
    }
    got = {
        (r["day"], r["n"], r["total"]) for r in tgt.read().collect()
    }
    assert got == expect


def test_refresh_watermark_monotone_on_metadata_only_path(
    spark, tmp_path, monkeypatch
):
    """Same race, empty-CDF branch: the metadata-only advance must also
    take max(src_head, current mark)."""
    src = LakeTable(spark, str(tmp_path / "src"), stat_cols=["day"])
    tgt = LakeTable(spark, str(tmp_path / "agg"), stat_cols=["day"])

    def key_of(df):
        return df

    def agg(df):
        return df.groupBy("day").agg(F.count(F.lit(1)).alias("n"))

    src.commit(_batch(spark, 0, 40, "a"))
    refresh_rollup(src, tgt, key_of, agg, ["day"])
    src.commit(_batch(spark, 40, 60, "b"))
    src.commit(_batch(spark, 60, 70, "c"))
    refresh_rollup(src, tgt, key_of, agg, ["day"])  # wm = 3

    empty = _batch(spark, 0, 0).withColumn(
        "_change_type", F.lit("insert")
    ).withColumn("_change_copies", F.lit(1))
    monkeypatch.setattr(src, "head_version", lambda: 2)
    monkeypatch.setattr(tgt, "app_meta", lambda: {WATERMARK_KEY: 1})
    monkeypatch.setattr(rollup_mod, "table_changes", lambda *_a, **_k: empty)
    refresh_rollup(src, tgt, key_of, agg, ["day"])

    monkeypatch.undo()
    assert int(tgt.app_meta()[WATERMARK_KEY]) == 3


def test_expire_spares_manifest_completed_after_debris_classification(
    spark, tmp_path, monkeypatch
):
    """The expire-side TOCTOU re-check: a manifest classified as debris
    but COMPLETED by its (stalled) writer before the unlink is spared."""
    import time as _time

    from financial_data_pipeline_spark.sources import laketable as lt

    t = LakeTable(spark, str(tmp_path / "tbl"), stat_cols=["day"])
    t.commit(_batch(spark, 0, 50, "a"))  # v1
    t.commit(_batch(spark, 50, 80, "b"))  # v2

    # dead-writer debris: empty manifest aged past the horizon
    path = t._snapshot_path(3)
    open(path, "x").close()
    old = _time.time() - lt._DEBRIS_AGE_S - 5
    os.utime(path, (old, old))

    # the moment expire reaches the pre-delete fault point, the writer
    # "wakes up" and completes its dump (a real commit with base=2)
    def wake(point):
        if point == "expire:pre_manifest_delete" and os.path.getsize(path) == 0:
            _orphan_manifest(t, 3, base=2)

    t.fault_hook = wake
    t.expire_snapshots(keep_last=1)
    t.fault_hook = None

    # the completed manifest survived and recover_head can promote it
    assert os.path.getsize(path) > 0
    assert 3 in t.snapshots()
    assert t.recover_head() == 3
