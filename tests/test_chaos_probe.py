"""Pytest twin of tools/chaos_probe.py — writers × readers × vacuum
racing one LakeTable, small config.

The probe itself asserts every invariant (zero lost commits, zero torn
reads, zero unexpected reader errors, per-reader monotonic head); the
test adds the outcome-shape checks so a silently-degenerate run (no
reads happened, vacuum never fired) can't pass.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.chaos_probe import run_chaos  # noqa: E402


def test_chaos_mixed_workload(spark):
    with tempfile.TemporaryDirectory() as d:
        stats = run_chaos(
            spark,
            d + "/tbl",
            n_writers=3,
            n_commits=6,
            n_readers=2,
            keep_last=2,
        )
    assert stats["acked_commits"] == 18
    assert stats["torn_reads"] == 0
    assert stats["reads_ok"] > 0, "readers never completed a read"
    assert stats["expire_cycles"] > 0, "vacuum never cycled"
    # Reclaim is deterministic at keep_last=2 WITH the probe's final
    # drain cycle: each writer ends with a merge (i=5, i%3==2) that
    # supersedes its own i=2 merge output; the FIRST writer to finish
    # lands that merge at least two versions before the 19-version
    # head (the other two writers' final merges follow it), so its
    # superseded file is referenced only by versions older than the
    # two the drain keeps. keep_last=4 made this assertion a thread-
    # pacing race (three tightly-interleaved writers can put all
    # final merges inside the kept window — observed flaky in r9).
    assert stats["files_reclaimed"] > 0, "vacuum reclaimed nothing"


def test_chaos_mixed_workload_multiprocess():
    """The same mixed population across OS PROCESS boundaries: every
    writer, reader, and the vacuum is its own process with its own
    JVM/SparkSession — no shared page cache, no GIL serialization,
    real fd isolation (the round-8 verdict's gap: a threads-only probe
    cannot race across those). The probe re-runs the full invariant
    set in the parent; this twin keeps a small config under CI.
    files_reclaimed is NOT asserted here: reclamation depends on how
    many append snapshots still carry the superseded merge files at
    the final vacuum cycle, which is timing-dependent across process
    schedules (the thread-mode test pins it deterministically)."""
    from tools.chaos_probe import run_chaos_mp

    with tempfile.TemporaryDirectory() as d:
        stats = run_chaos_mp(
            d + "/tbl", n_writers=2, n_commits=3, n_readers=1, keep_last=4
        )
    assert stats["acked_commits"] == 6
    assert stats["torn_reads"] == 0
    assert stats["reads_ok"] > 0, "reader never completed a read"
    assert stats["expire_cycles"] > 0, "vacuum never cycled"
