"""Multi-writer OCC contention (round-8 verdict item 3).

``tools/occ_probe.py`` races N threads × M commits against one
LakeTable and asserts the ledger invariant — every acknowledged commit
remains provable in the final state. The multiprocess test proves
cross-JVM convergence for appends; this covers the thread-concurrency
shape AND the overlapping-key merge mix (the expensive retry path:
key-range re-derivation against the moved head)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.occ_probe import run_probe  # noqa: E402


def test_occ_append_no_lost_commits(spark, tmp_path):
    stats = run_probe(
        spark, str(tmp_path / "t"), n_writers=4, n_commits=3, mix="append"
    )
    assert stats["acked_commits"] == 12
    assert stats["head_version"] == 12  # every ack is a distinct version


def test_occ_merge_overlapping_keys_no_lost_upserts(spark, tmp_path):
    stats = run_probe(
        spark, str(tmp_path / "t"), n_writers=3, n_commits=2, mix="merge"
    )
    assert stats["acked_commits"] == 6
    assert stats["head_version"] == 6
    # overlapping keys MUST conflict at least once under 3-way racing;
    # zero retries would mean the staleness check silently stopped
    # firing (the lost-update guard) — the invariant assertions inside
    # run_probe would then be vacuous
    assert stats["total_retries"] >= 1
