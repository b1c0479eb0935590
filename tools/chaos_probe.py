"""Mixed-workload lake chaos probe: writers × readers × vacuum at once.

The OCC probe races writers; the crash matrix kills them; the reader
tests pin one reader against one vacuum. This probe runs ALL THREE
populations concurrently against ONE ``LakeTable`` — the closest local
approximation of a production lake under load:

- **W writer threads** appending disjoint 10-row batches through the
  OCC retry loop (the ``occ_probe`` append mix, ledger-audited);
- **R reader threads** in a tight loop: head snapshot reads (plus an
  eq-pruned marker read) validating EVERY result is a consistent
  snapshot — each acknowledged batch appears with exactly 10 rows or
  not at all. A torn read (partial batch) is an immediate failure;
- **1 maintenance thread** cycling ``expire_snapshots(keep_last=K)``
  (retention + vacuum) the whole time.

Reader outcome classes:
- ``ok``          — consistent snapshot (asserted complete batches);
- ``clean_error`` — the DOCUMENTED untagged-reader limitation: the
  version it resolved aged out mid-read and files vanished (clean
  exception, no partial rows) — counted, never hidden;
- anything else   — probe failure.

Invariants asserted at the end: zero lost commits (ledger vs final
state), zero torn reads, zero unexpected reader errors, reader-observed
head versions nondecreasing per thread.

Usage::

    python tools/chaos_probe.py [writers] [commits] [readers] [keep_last]
    python tools/chaos_probe.py --processes [writers] [commits] [readers] [keep_last]

``--processes`` runs the SAME mixed population across OS PROCESS
boundaries — every writer, reader, and the vacuum is its own process
with its own JVM/SparkSession (no shared page-cache assumptions, no
GIL serialization, real fd isolation; the round-8 verdict noted the
threads-only probe cannot see those). Children report ledgers/stats as
JSON on stdout; the parent re-runs the full invariant set (zero lost
commits, zero torn reads, zero unexpected reader errors) against the
final table state. Writers stop on their commit quota; readers and the
vacuum stop when the parent drops a sentinel file after the last
writer exits.

Prints one ``RESULT {...}`` JSON line (fold into SCALING.md). The
pytest twin (``tests/test_chaos_probe.py``) runs a small config of
each mode.
"""

from __future__ import annotations

import json
import sys
import threading
import time

sys.path.insert(0, ".")

MAX_RETRIES = 500


def run_chaos(
    spark,
    root: str,
    n_writers: int = 4,
    n_commits: int = 8,
    n_readers: int = 3,
    keep_last: int = 4,
) -> dict:
    from financial_data_pipeline_spark.sources.laketable import (
        CommitConflict,
        LakeTable,
    )

    ledger: dict[int, list[tuple[int, int]]] = {w: [] for w in range(n_writers)}
    retries = {w: 0 for w in range(n_writers)}
    errors: list[str] = []
    writers_done = threading.Event()
    start = threading.Barrier(n_writers + n_readers + 1)

    # seed the table so readers never hit the empty-table error
    seed_t = LakeTable(spark, root, stat_cols=["k"])
    seed_t.commit(
        spark.range(0, 10).selectExpr("id AS k", "-1 AS writer", "0 AS seq")
    )

    def writer(w: int) -> None:
        t = LakeTable(spark, root, stat_cols=["k"])
        start.wait()
        for i in range(n_commits):
            lo = (w + 1) * 1_000_000 + i * 10
            df = spark.range(lo, lo + 10).selectExpr(
                "id AS k", f"{w} AS writer", f"{i} AS seq"
            )
            # every 3rd commit is a MERGE on the writer's own 10-key
            # dim slice: merges REWRITE files, so expired snapshots
            # hold exclusive files and the vacuum actually reclaims —
            # pure appends never supersede anything. Keys are
            # writer-disjoint so the ledger invariant stays exact.
            if i % 3 == 2:
                dim_lo = (w + 1) * 10_000_000
                df = spark.range(dim_lo, dim_lo + 10).selectExpr(
                    "id AS k", f"{w} AS writer", f"{i} AS seq"
                )
                op = lambda d=df: t.merge(d, key_cols=["k"])
            else:
                op = lambda d=df: t.commit(d)
            for _attempt in range(MAX_RETRIES):
                try:
                    v = op()
                    ledger[w].append((i, v))
                    break
                except CommitConflict:
                    retries[w] += 1
            else:
                errors.append(f"writer {w} commit {i}: retries exhausted")
                return

    read_stats = {
        r: {"ok": 0, "clean_error": 0, "torn": 0, "bad": []}
        for r in range(n_readers)
    }

    def _is_clean_lake_error(e: Exception) -> bool:
        s = f"{type(e).__name__}: {e}"
        return any(
            m in s
            for m in (
                "FileNotFoundException",
                "does not exist",
                "snapshot selects no files",
                "FileReadException",
                "SnapshotExpired",
                "PATH_NOT_FOUND",
            )
        )

    def reader(r: int) -> None:
        t = LakeTable(spark, root, stat_cols=["k"])
        st = read_stats[r]
        last_head = -1
        start.wait()
        while not writers_done.is_set():
            try:
                head = t.head_version()
                assert head >= last_head, f"head regressed {last_head}->{head}"
                last_head = head
                if r % 2 == 0:
                    pdf = (
                        t.read()
                        .selectExpr("writer", "seq")
                        .groupBy("writer", "seq")
                        .count()
                        .toPandas()
                    )
                    torn = pdf[pdf["count"] != 10]
                    if len(torn):
                        st["torn"] += 1
                        st["bad"].append(
                            f"torn@v{head}: {torn.to_dict('records')[:3]}"
                        )
                    else:
                        st["ok"] += 1
                else:
                    # eq-pruned point read on a key the seed guarantees
                    n = t.read(pred_col="k", eq=("k", 5)).filter(
                        "k = 5"
                    ).count()
                    if n == 1:
                        st["ok"] += 1
                    else:
                        st["torn"] += 1
                        st["bad"].append(f"eq-read got {n} rows @v{head}")
            except AssertionError:
                raise
            except Exception as e:  # noqa: BLE001 — classified below
                if _is_clean_lake_error(e):
                    st["clean_error"] += 1
                else:
                    st["bad"].append(f"{type(e).__name__}: {e}")

    expire_cycles = {"n": 0, "deleted": 0}

    def maintenance() -> None:
        t = LakeTable(spark, root, stat_cols=["k"])
        start.wait()
        while not writers_done.is_set():
            deleted = t.expire_snapshots(keep_last=keep_last)
            expire_cycles["n"] += 1
            expire_cycles["deleted"] += len(deleted)
            time.sleep(0.2)
        # One final drain AFTER the last writer: the in-loop cycles can
        # all land before the final merges, in which case the files
        # those merges superseded are never seen by the vacuum — the
        # probe's reclaim count then depends on thread pacing, not on
        # the reclamation machinery. The drain vacuums the COMPLETE
        # version history once, which is also the natural end of a
        # maintenance lifecycle.
        deleted = t.expire_snapshots(keep_last=keep_last)
        expire_cycles["n"] += 1
        expire_cycles["deleted"] += len(deleted)

    t0 = time.monotonic()
    ths = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ] + [
        threading.Thread(target=reader, args=(r,), daemon=True)
        for r in range(n_readers)
    ] + [threading.Thread(target=maintenance, daemon=True)]
    for th in ths:
        th.start()
    for th in ths[:n_writers]:
        th.join()
    writers_done.set()
    for th in ths[n_writers:]:
        th.join(timeout=60)
    wall = time.monotonic() - t0
    assert not errors, errors

    # ---- final invariants ------------------------------------------
    t = LakeTable(spark, root, stat_cols=["k"])
    acked = [(w, i, v) for w, lst in ledger.items() for (i, v) in lst]
    versions = [v for (_, _, v) in acked]
    assert len(versions) == len(set(versions)), "version collision"
    assert len(acked) == n_writers * n_commits, "missing acks"
    final = t.read().selectExpr("k", "writer", "seq").toPandas()
    got = final.groupby(["writer", "seq"]).size().to_dict()
    for w, i, _v in acked:
        if i % 3 == 2:
            continue  # merge: superseded by the writer's later merges
        assert got.get((w, i)) == 10, f"lost commit writer={w} seq={i}"
    # each writer's dim slice holds exactly its LAST acked merge
    for w in range(n_writers):
        merged = [i for (i, _v) in ledger[w] if i % 3 == 2]
        if merged:
            last = max(merged)
            assert got.get((w, last)) == 10, (
                f"lost final merge writer={w} seq={last}"
            )
            dim = final[
                (final.k >= (w + 1) * 10_000_000)
                & (final.k < (w + 1) * 10_000_000 + 10)
            ]
            assert len(dim) == 10 and dim.k.is_unique, (
                f"dim slice drift writer={w}: {len(dim)} rows"
            )

    torn_total = sum(s["torn"] for s in read_stats.values())
    bad = [b for s in read_stats.values() for b in s["bad"]]
    assert torn_total == 0, f"torn reads: {bad}"
    assert not bad, f"unexpected reader errors: {bad}"

    ok_reads = sum(s["ok"] for s in read_stats.values())
    clean = sum(s["clean_error"] for s in read_stats.values())
    return {
        "writers": n_writers,
        "commits_per_writer": n_commits,
        "readers": n_readers,
        "keep_last": keep_last,
        "wall_sec": round(wall, 2),
        "acked_commits": len(acked),
        "commits_per_sec": round(len(acked) / wall, 2),
        "total_retries": sum(retries.values()),
        "reads_ok": ok_reads,
        "reads_clean_aged_out": clean,
        "torn_reads": torn_total,
        "reads_per_sec": round((ok_reads + clean) / wall, 2),
        "expire_cycles": expire_cycles["n"],
        "files_reclaimed": expire_cycles["deleted"],
        "head_version": t.head_version(),
    }




# ---------------------------------------------------------------------------
# multi-process mode: the same populations, one OS process each
# ---------------------------------------------------------------------------

_DONE_SENTINEL = ".writers_done"


def _child_spark(name: str):
    from financial_data_pipeline_spark import get_spark

    spark = get_spark(app_name=name, master="local[3]", shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def child_writer(root: str, w: int, n_commits: int) -> dict:
    """One writer process: the run_chaos append/merge mix with OCC
    retries; returns its ledger."""
    from financial_data_pipeline_spark.sources.laketable import (
        CommitConflict,
        LakeTable,
    )

    spark = _child_spark(f"chaos-writer-{w}")
    t = LakeTable(spark, root, stat_cols=["k"])
    acked, retries = [], 0
    for i in range(n_commits):
        if i % 3 == 2:
            dim_lo = (w + 1) * 10_000_000
            df = spark.range(dim_lo, dim_lo + 10).selectExpr(
                "id AS k", f"{w} AS writer", f"{i} AS seq"
            )
            op = lambda d=df: t.merge(d, key_cols=["k"])
        else:
            lo = (w + 1) * 1_000_000 + i * 10
            df = spark.range(lo, lo + 10).selectExpr(
                "id AS k", f"{w} AS writer", f"{i} AS seq"
            )
            op = lambda d=df: t.commit(d)
        for _attempt in range(MAX_RETRIES):
            try:
                acked.append((i, op()))
                break
            except CommitConflict:
                retries += 1
        else:
            return {"role": "writer", "id": w, "error": "retries exhausted"}
    return {"role": "writer", "id": w, "acked": acked, "retries": retries}


def child_reader(root: str, r: int) -> dict:
    """One reader process: consistency reads until the sentinel file
    appears; classifies ok / clean-aged-out / torn exactly like the
    thread-mode reader."""
    import os as _os

    from financial_data_pipeline_spark.sources.laketable import LakeTable

    spark = _child_spark(f"chaos-reader-{r}")
    t = LakeTable(spark, root, stat_cols=["k"])
    st = {"ok": 0, "clean_error": 0, "torn": 0, "bad": []}
    last_head = -1
    sentinel = _os.path.join(root, _DONE_SENTINEL)
    while not _os.path.exists(sentinel):
        try:
            head = t.head_version()
            if head < last_head:
                st["bad"].append(f"head regressed {last_head}->{head}")
                break
            last_head = head
            if r % 2 == 0:
                pdf = (
                    t.read()
                    .selectExpr("writer", "seq")
                    .groupBy("writer", "seq")
                    .count()
                    .toPandas()
                )
                torn = pdf[pdf["count"] != 10]
                if len(torn):
                    st["torn"] += 1
                    st["bad"].append(
                        f"torn@v{head}: {torn.to_dict('records')[:3]}"
                    )
                else:
                    st["ok"] += 1
            else:
                n = t.read(pred_col="k", eq=("k", 5)).filter("k = 5").count()
                if n == 1:
                    st["ok"] += 1
                else:
                    st["torn"] += 1
                    st["bad"].append(f"eq-read got {n} rows @v{head}")
        except Exception as e:  # noqa: BLE001 — classified below
            if _is_clean_lake_error_s(f"{type(e).__name__}: {e}"):
                st["clean_error"] += 1
            else:
                st["bad"].append(f"{type(e).__name__}: {e}")
    return {"role": "reader", "id": r, **st}


def child_vacuum(root: str, keep_last: int) -> dict:
    import os as _os
    import time as _time

    from financial_data_pipeline_spark.sources.laketable import LakeTable

    spark = _child_spark("chaos-vacuum")
    t = LakeTable(spark, root, stat_cols=["k"])
    cycles = deleted = 0
    sentinel = _os.path.join(root, _DONE_SENTINEL)
    while not _os.path.exists(sentinel):
        deleted += len(t.expire_snapshots(keep_last=keep_last))
        cycles += 1
        _time.sleep(0.2)
    return {"role": "vacuum", "cycles": cycles, "deleted": deleted}


def _is_clean_lake_error_s(s: str) -> bool:
    return any(
        m in s
        for m in (
            "FileNotFoundException",
            "does not exist",
            "snapshot selects no files",
            "FileReadException",
            "SnapshotExpired",
            "PATH_NOT_FOUND",
        )
    )


def run_chaos_mp(
    root: str,
    n_writers: int = 3,
    n_commits: int = 6,
    n_readers: int = 2,
    keep_last: int = 4,
    spark=None,
) -> dict:
    """Spawn the writer/reader/vacuum populations as SEPARATE OS
    processes (one JVM each) against ``root`` and assert the chaos
    invariants on the final state. ``spark`` (optional) is the
    PARENT's session, used only for the final verification read."""
    import os as _os
    import subprocess
    import tempfile

    import financial_data_pipeline_spark as pkg

    repo_root = _os.path.dirname(
        _os.path.dirname(_os.path.abspath(pkg.__file__))
    )
    env = dict(_os.environ)
    env["PYTHONPATH"] = repo_root + _os.pathsep + env.get("PYTHONPATH", "")

    # seed so readers never hit the empty-table error
    if spark is None:
        spark = _child_spark("chaos-mp-parent")
    from financial_data_pipeline_spark.sources.laketable import LakeTable

    _os.makedirs(root, exist_ok=True)
    seed_t = LakeTable(spark, root, stat_cols=["k"])
    seed_t.commit(
        spark.range(0, 10).selectExpr("id AS k", "-1 AS writer", "0 AS seq")
    )

    def spawn(role, *args):
        return subprocess.Popen(
            [
                sys.executable,
                _os.path.abspath(__file__),
                "--child",
                role,
                root,
                *[str(a) for a in args],
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
            cwd=repo_root,
        )

    t0 = time.monotonic()
    writers = [spawn("writer", w, n_commits) for w in range(n_writers)]
    readers = [spawn("reader", r) for r in range(n_readers)]
    vacuum = spawn("vacuum", keep_last)

    results = []
    for p in writers:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out.decode()[-500:]
        results.append(json.loads(out.decode().strip().splitlines()[-1]))
    # writers done -> drop the sentinel; readers/vacuum drain and exit
    with open(_os.path.join(root, _DONE_SENTINEL), "w") as f:
        f.write("done")
    for p in readers + [vacuum]:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out.decode()[-500:]
        results.append(json.loads(out.decode().strip().splitlines()[-1]))
    wall = time.monotonic() - t0

    writer_res = [r for r in results if r["role"] == "writer"]
    reader_res = [r for r in results if r["role"] == "reader"]
    vac_res = [r for r in results if r["role"] == "vacuum"][0]
    for r in writer_res:
        assert "error" not in r, r

    # ---- final invariants (same as run_chaos) ----------------------
    t = LakeTable(spark, root, stat_cols=["k"])
    acked = [
        (r["id"], i, v) for r in writer_res for (i, v) in r["acked"]
    ]
    versions = [v for (_, _, v) in acked]
    assert len(versions) == len(set(versions)), "version collision"
    assert len(acked) == n_writers * n_commits, "missing acks"
    final = t.read().selectExpr("k", "writer", "seq").toPandas()
    got = final.groupby(["writer", "seq"]).size().to_dict()
    for w, i, _v in acked:
        if i % 3 == 2:
            continue  # merge: superseded by the writer's later merges
        assert got.get((w, i)) == 10, f"lost commit writer={w} seq={i}"
    for r in writer_res:
        w = r["id"]
        merged = [i for (i, _v) in r["acked"] if i % 3 == 2]
        if merged:
            last = max(merged)
            assert got.get((w, last)) == 10, (
                f"lost final merge writer={w} seq={last}"
            )
    torn_total = sum(r["torn"] for r in reader_res)
    bad = [b for r in reader_res for b in r["bad"]]
    assert torn_total == 0, f"torn reads: {bad}"
    assert not bad, f"unexpected reader errors: {bad}"

    ok_reads = sum(r["ok"] for r in reader_res)
    clean = sum(r["clean_error"] for r in reader_res)
    return {
        "mode": "processes",
        "writers": n_writers,
        "commits_per_writer": n_commits,
        "readers": n_readers,
        "keep_last": keep_last,
        "wall_sec": round(wall, 2),
        "acked_commits": len(acked),
        "commits_per_sec": round(len(acked) / wall, 2),
        "total_retries": sum(r["retries"] for r in writer_res),
        "reads_ok": ok_reads,
        "reads_clean_aged_out": clean,
        "torn_reads": torn_total,
        "reads_per_sec": round((ok_reads + clean) / max(wall, 1e-9), 2),
        "expire_cycles": vac_res["cycles"],
        "files_reclaimed": vac_res["deleted"],
        "head_version": t.head_version(),
    }


def _child_main(argv) -> int:
    role, root = argv[0], argv[1]
    if role == "writer":
        out = child_writer(root, int(argv[2]), int(argv[3]))
    elif role == "reader":
        out = child_reader(root, int(argv[2]))
    elif role == "vacuum":
        out = child_vacuum(root, int(argv[2]))
    else:
        raise SystemExit(f"unknown child role {role!r}")
    print(json.dumps(out))
    return 1 if out.get("error") or out.get("bad") else 0


def main(argv):
    import tempfile

    from financial_data_pipeline_spark import get_spark

    if argv and argv[0] == "--child":
        return _child_main(argv[1:])
    processes = False
    if argv and argv[0] == "--processes":
        processes = True
        argv = argv[1:]
    n_writers = int(argv[0]) if len(argv) > 0 else 4
    n_commits = int(argv[1]) if len(argv) > 1 else 8
    n_readers = int(argv[2]) if len(argv) > 2 else 3
    keep_last = int(argv[3]) if len(argv) > 3 else 4
    with tempfile.TemporaryDirectory() as d:
        if processes:
            stats = run_chaos_mp(
                d + "/tbl", n_writers, n_commits, n_readers, keep_last
            )
        else:
            spark = get_spark(app_name="chaos-probe", shuffle_partitions=4)
            spark.sparkContext.setLogLevel("ERROR")
            stats = run_chaos(
                spark, d + "/tbl", n_writers, n_commits, n_readers, keep_last
            )
    print("RESULT " + json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
