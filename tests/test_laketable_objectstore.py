"""The lake commit protocol on OBJECT-STORE semantics.

Round 8's verdict named the lake's POSIX coupling (O_EXCL create,
atomic rename) as the last un-retired 100 TB design risk: production
lakes live on S3/GCS/ABFS, which have conditional puts and atomic
whole-object PUTs but NO rename and NO create-then-fill. The
``MetaStore`` seam (sources/metastore.py) extracts the protocol's
primitives; this file runs the protocol against
``MemoryObjectMetaStore`` — in-memory, but with the store's semantics:

- fused conditional put as the commit point (If-None-Match) — the
  empty-manifest debris class is STRUCTURALLY IMPOSSIBLE, so the crash
  matrix expectations differ from POSIX at ``advance:post_create``
  (complete committed manifest + lagging HEAD, not debris);
- atomic overwrite PUTs for HEAD / flag flips (no temp files);
- copy-then-delete ``rename`` with a visible both-names window.

Covers: the commit crash matrix (object-store expectations), WAP
stage/publish, rollback + time travel, expire/vacuum, the OCC
multi-writer race (threads — one store instance, like one bucket), a
torn-HEAD reader probe, and the rename-window behavior. The
multiprocess leg stays POSIX-only (an in-memory store cannot span
processes; a real bucket is the multi-process store)."""

from __future__ import annotations

import json
import threading

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.sources.laketable import (
    CommitConflict,
    LakeTable,
    orphan_files,
)
from financial_data_pipeline_spark.sources.metastore import (
    MemoryObjectMetaStore,
    PosixMetaStore,
)


class _Killed(RuntimeError):
    pass


def _arm(table: LakeTable, point: str) -> None:
    def hook(p: str) -> None:
        if p == point:
            raise _Killed(point)

    table.fault_hook = hook


def _batch(spark, lo, hi, tag):
    return (
        spark.range(lo * 100, hi * 100)
        .select(
            (F.col("id") / 100).cast("int").alias("day"),
            F.col("id").alias("value"),
            F.lit(tag).alias("tag"),
        )
        .repartition(2)
    )


@pytest.fixture()
def store():
    return MemoryObjectMetaStore()


@pytest.fixture()
def table(spark, tmp_path, store):
    return LakeTable(
        spark, str(tmp_path / "tbl"), stat_cols=["day"], fs=store
    )


# ---------------------------------------------------------------------------
# store-semantics unit checks
# ---------------------------------------------------------------------------


def test_put_if_absent_is_atomic_under_threads(store):
    wins = []

    def race(i):
        if store.put_if_absent("/t/_manifests/v000001.json", f"w{i}"):
            wins.append(i)

    threads = [threading.Thread(target=race, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1  # exactly one conditional put succeeds
    assert store.get("/t/_manifests/v000001.json") == f"w{wins[0]}"


def test_rename_window_shows_both_names(store):
    store.put_atomic("/t/a", "x")
    seen = {}

    def hook(src, dst):
        seen["src"] = store.exists(src)
        seen["dst"] = store.exists(dst)

    store.rename_hook = hook
    store.rename("/t/a", "/t/b")
    assert seen == {"src": True, "dst": True}  # the non-atomic window
    assert not store.exists("/t/a") and store.get("/t/b") == "x"


def test_create_exclusive_is_unavailable(store):
    with pytest.raises(NotImplementedError):
        store.create_exclusive("/t/x")


# ---------------------------------------------------------------------------
# crash matrix — object-store expectations
# ---------------------------------------------------------------------------

# (fault point, did the crashed commit pass its commit point?)
# Differs from the POSIX matrix at advance:post_create: the conditional
# put landed the COMPLETE manifest, so the commit is durable (HEAD
# lags; recover_head repairs) — there is no debris window.
_COMMIT_POINTS = [
    ("commit:post_write_files", False),
    ("advance:pre_create", False),
    ("advance:post_create", True),  # complete manifest — committed
    ("advance:post_dump", True),
    ("advance:pre_head", True),
    ("advance:post_head", True),
]


@pytest.mark.parametrize("point,committed", _COMMIT_POINTS)
def test_commit_crash_matrix_objectstore(spark, table, point, committed):
    table.commit(_batch(spark, 0, 1, "base"))  # v1
    _arm(table, point)
    with pytest.raises(_Killed):
        table.commit(_batch(spark, 1, 2, "crashed"))
    table.fault_hook = None

    # 1. readable at a consistent snapshot
    assert table.read().count() in (100, 200)

    # 2. recovery per window
    if committed and point != "advance:post_head":
        # complete manifest, lagging HEAD: writers conflict until
        # recover_head promotes the committed snapshot
        assert table.read().count() == 100
        with pytest.raises(CommitConflict):
            table.commit(_batch(spark, 2, 3, "next"))
        assert table.recover_head() == 2
        assert table.read().count() == 200
        table.commit(_batch(spark, 2, 3, "next"))
        assert table.read().count() == 300
    elif point == "advance:post_head":
        assert table.read().count() == 200
        table.commit(_batch(spark, 2, 3, "next"))
        assert table.read().count() == 300
    else:
        # nothing durable in the metadata plane — no husk, no debris
        assert table.read().count() == 100
        assert table.snapshots() == [1]
        table.commit(_batch(spark, 2, 3, "next"))
        assert table.read().count() == 200
        if point == "commit:post_write_files":
            orphans = orphan_files(table)
            assert orphans
            for p in orphans:
                assert p not in set(table.pruned_files())

    head = table.head_version()
    assert table.recover_head() == head  # idempotent once current


def test_no_debris_class_on_objectstore(spark, table):
    """The POSIX matrix's post_create window leaves an empty manifest
    (debris) that conservatively blocks the next commit until aged.
    On the store the same crash leaves a COMPLETE committed manifest —
    the next commit conflicts for the OPPOSITE reason (real committed
    history), and recover_head (not debris aging) is the repair."""
    table.commit(_batch(spark, 0, 1, "base"))
    _arm(table, "advance:post_create")
    with pytest.raises(_Killed):
        table.commit(_batch(spark, 1, 2, "crashed"))
    table.fault_hook = None
    # the manifest is readable, not a husk
    snap = json.loads(table.fs.get(table._snapshot_path(2)))
    assert snap["version"] == 2 and snap["files"]
    assert table.recover_head() == 2
    assert table.read().count() == 200


# ---------------------------------------------------------------------------
# protocol lifecycle on the store
# ---------------------------------------------------------------------------


def test_wap_stage_publish_on_objectstore(spark, table):
    table.commit(_batch(spark, 0, 1, "base"))
    v = table.stage(_batch(spark, 1, 2, "wap"))
    assert table.read().count() == 100  # staged = invisible
    table.publish(v)
    assert table.read().count() == 200


def test_publish_crash_between_flip_and_head(spark, table):
    table.commit(_batch(spark, 0, 1, "base"))
    v = table.stage(_batch(spark, 1, 2, "wap"))
    _arm(table, "publish:pre_head")
    with pytest.raises(_Killed):
        table.publish(v)
    table.fault_hook = None
    # flipped but HEAD lags — recover_head promotes it
    assert table.recover_head() == v
    assert table.read().count() == 200


def test_rollback_time_travel_expire_on_objectstore(spark, table):
    table.commit(_batch(spark, 0, 1, "a"))
    table.commit(_batch(spark, 1, 2, "b"))
    table.commit(_batch(spark, 2, 3, "c"))
    assert table.read(version=1).count() == 100  # time travel
    table.rollback(2)
    assert table.read().count() == 200
    table.commit(_batch(spark, 3, 4, "d"))  # branches past detached v3
    assert table.read().count() == 300
    deleted = table.expire_snapshots(keep_last=2)
    assert isinstance(deleted, list)
    assert table.read().count() == 300  # head intact after vacuum


def test_conflict_and_retry_on_objectstore(spark, tmp_path, store):
    root = str(tmp_path / "tbl")
    t1 = LakeTable(spark, root, stat_cols=["day"], fs=store)
    t2 = LakeTable(spark, root, stat_cols=["day"], fs=store)
    t1.commit(_batch(spark, 0, 1, "base"))
    # t2 derives from v1; t1 commits v2 first; t2's commit must conflict
    base = t2.head_version()
    carried = t2._load_snapshot(base).files
    t1.commit(_batch(spark, 1, 2, "t1"))
    files = t2._write_files(_batch(spark, 2, 3, "t2"))
    with pytest.raises(CommitConflict):
        t2._advance("append", carried + files, base=base)
    # retry: re-read HEAD, re-derive the carried set (the documented
    # recipe), succeed against the new base
    base = t2.head_version()
    t2._advance(
        "append", t2._load_snapshot(base).files + files, base=base
    )
    assert t1.read().count() == 300


# ---------------------------------------------------------------------------
# OCC + torn-head probes (threads — one store, like one bucket)
# ---------------------------------------------------------------------------


def test_occ_race_objectstore(spark, tmp_path, store):
    """4 writer threads x 3 commits each with retry-on-conflict: the
    table converges to exactly 12 consecutive committed versions and
    the union of all rows — the occ_probe invariant, on the store."""
    root = str(tmp_path / "tbl")
    n_writers, n_commits = 4, 3
    errors = []

    def writer(w):
        t = LakeTable(spark, root, stat_cols=["day"], fs=store)
        for c in range(n_commits):
            df = _batch(spark, w * 10 + c, w * 10 + c + 1, f"w{w}c{c}")
            files = t._write_files(df)
            while True:  # retry: re-read HEAD, re-derive carried set
                base = t.head_version()
                carried = (
                    t._load_snapshot(base).files if base > 0 else []
                )
                try:
                    t._advance("append", carried + files, base=base)
                    break
                except CommitConflict:
                    continue
                except Exception as exc:  # pragma: no cover
                    errors.append(repr(exc))
                    return

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    reader = LakeTable(spark, root, stat_cols=["day"], fs=store)
    total = n_writers * n_commits
    assert reader.snapshots() == list(range(1, total + 1))
    assert reader.head_version() == total
    assert reader.read().count() == total * 100  # zero lost rows


def test_no_torn_head_reads_objectstore(spark, tmp_path, store):
    """Readers hammer head_version() while a writer commits — every
    read returns a valid monotonic version, never a decode error (the
    r8 torn-HEAD bug class, now pinned on the store's atomic PUT)."""
    root = str(tmp_path / "tbl")
    t = LakeTable(spark, root, stat_cols=["day"], fs=store)
    t.commit(_batch(spark, 0, 1, "base"))
    stop = threading.Event()
    bad = []
    seen = []

    def reader():
        r = LakeTable(spark, root, stat_cols=["day"], fs=store)
        while not stop.is_set():
            try:
                seen.append(r.head_version())
            except Exception as exc:  # torn read
                bad.append(repr(exc))

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for th in threads:
        th.start()
    for c in range(1, 6):
        t.commit(_batch(spark, c, c + 1, f"c{c}"))
    stop.set()
    for th in threads:
        th.join()
    assert not bad
    assert seen and all(1 <= v <= 6 for v in seen)


def test_posix_store_is_default(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tbl"), stat_cols=["day"])
    assert isinstance(t.fs, PosixMetaStore)
    assert t.fs.partial_manifest_writes
