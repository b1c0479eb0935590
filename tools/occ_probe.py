"""Multi-writer OCC contention probe.

The crash matrix proves single-conflict and death-window correctness;
this measures N concurrent committers racing ONE LakeTable: retry
counts, conflict rate, commit throughput, and fairness — and asserts
ZERO lost commits via a ledger (every acknowledged commit's marker must
be readable in the final table state).

Two key mixes, matching how real pipelines contend:

- ``append``  — disjoint row ranges per writer (ingest shards landing
  in one table): conflicts are pure metadata races on HEAD, every
  retry re-lists the head manifest but rewrites no data.
- ``merge``   — overlapping keys (writers upserting a shared dimension):
  conflicts force key-range re-derivation against the new head, the
  expensive retry path.

Usage::

    python tools/occ_probe.py [writers] [commits] [append|merge|both]

Prints one ``RESULT {...}`` JSON line per mix (fold into SCALING.md).
The pytest twin (``tests/test_occ_probe.py``) runs a small config and
asserts the no-lost-commits invariant.

Threading model: one SparkSession, one ``LakeTable`` handle per thread
(handles are cheap; the commit protocol's shared state is the
filesystem, which is the point). Spark job submission is thread-safe.
``fs=`` (a sources/metastore.py store instance shared by every handle)
runs the same probe on object-store semantics — the pytest twin runs
BOTH stores.
"""

from __future__ import annotations

import json
import sys
import threading
import time

sys.path.insert(0, ".")

MAX_RETRIES = 500


def run_probe(
    spark,
    root: str,
    n_writers: int = 8,
    n_commits: int = 5,
    mix: str = "append",
    fs=None,
) -> dict:
    """Race ``n_writers`` threads × ``n_commits`` each into ``root``.

    Returns the measured stats dict; raises AssertionError on any lost
    commit (an acknowledged version whose marker rows are absent from
    the final state) or version collision.
    """
    from financial_data_pipeline_spark.sources.laketable import (
        CommitConflict,
        LakeTable,
    )

    # writer_id -> list of (commit_idx, acked_version)
    ledger: dict[int, list[tuple[int, int]]] = {w: [] for w in range(n_writers)}
    retries = {w: 0 for w in range(n_writers)}
    errors: list[str] = []
    barrier = threading.Barrier(n_writers)

    def writer(w: int) -> None:
        t = LakeTable(spark, root, stat_cols=["k"], fs=fs)
        barrier.wait()
        for i in range(n_commits):
            if mix == "append":
                # disjoint ranges: writer w owns keys w*10^6 + i*10 ..
                lo = w * 1_000_000 + i * 10
                df = spark.range(lo, lo + 10).selectExpr(
                    "id AS k", f"{w} AS writer", f"{i} AS seq"
                )
                op = lambda: t.commit(df)
            else:
                # overlapping keys 0..19 shared by ALL writers; the
                # marker row k = 10^6 + w*10^3 + i is writer-unique so
                # acknowledged upserts stay provable after overwrites
                df = spark.range(0, 20).selectExpr(
                    "id AS k", f"{w} AS writer", f"{i} AS seq"
                ).union(
                    spark.range(
                        1_000_000 + w * 1_000 + i, 1_000_000 + w * 1_000 + i + 1
                    ).selectExpr("id AS k", f"{w} AS writer", f"{i} AS seq")
                )
                op = lambda: t.merge(df, key_cols=["k"])
            for _attempt in range(MAX_RETRIES):
                try:
                    v = op()
                    ledger[w].append((i, v))
                    break
                except CommitConflict:
                    retries[w] += 1
                    continue
            else:
                errors.append(f"writer {w} commit {i}: retries exhausted")
                return

    t0 = time.monotonic()
    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.monotonic() - t0
    assert not errors, errors

    # ---- invariants -----------------------------------------------
    t = LakeTable(spark, root, stat_cols=["k"], fs=fs)
    acked = [(w, i, v) for w, lst in ledger.items() for (i, v) in lst]
    versions = [v for (_, _, v) in acked]
    assert len(versions) == len(set(versions)), "version collision"
    assert len(acked) == n_writers * n_commits, "missing acks"
    final = t.read().selectExpr("k", "writer", "seq").toPandas()
    if mix == "append":
        # every acknowledged commit's 10 rows present exactly once
        got = final.groupby(["writer", "seq"]).size().to_dict()
        for w, i, _v in acked:
            assert got.get((w, i)) == 10, f"lost commit writer={w} seq={i}"
        assert len(final) == 10 * len(acked), "row count drift"
    else:
        # every acknowledged merge's unique marker row survived every
        # later overwrite of the shared keys — zero lost upserts
        markers = set(
            final[final.k >= 1_000_000][["writer", "seq"]].itertuples(
                index=False, name=None
            )
        )
        for w, i, _v in acked:
            assert (w, i) in markers, f"lost merge writer={w} seq={i}"
        # shared keys resolved to exactly one row each
        shared = final[final.k < 1_000_000]
        assert shared.k.is_unique and len(shared) == 20

    total_retries = sum(retries.values())
    per_writer = sorted(retries.values())
    return {
        "mix": mix,
        "writers": n_writers,
        "commits_per_writer": n_commits,
        "acked_commits": len(acked),
        "wall_sec": round(wall, 2),
        "commits_per_sec": round(len(acked) / wall, 2),
        "total_retries": total_retries,
        "conflict_rate": round(
            total_retries / (len(acked) + total_retries), 3
        ),
        "retry_fairness_min_max": [per_writer[0], per_writer[-1]],
        "head_version": t.head_version(),
    }


def main(argv):
    import tempfile

    from financial_data_pipeline_spark import get_spark

    n_writers = int(argv[0]) if len(argv) > 0 else 8
    n_commits = int(argv[1]) if len(argv) > 1 else 5
    mixes = [argv[2]] if len(argv) > 2 else ["append", "merge"]
    if mixes == ["both"]:
        mixes = ["append", "merge"]
    spark = get_spark(app_name="occ-probe", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    for mix in mixes:
        with tempfile.TemporaryDirectory() as d:
            stats = run_probe(spark, d + "/tbl", n_writers, n_commits, mix)
        print("RESULT " + json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
