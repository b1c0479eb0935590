"""Incremental continuous-aggregate refresh on the lake.

The reference stores bars in a TimescaleDB hypertable
(``src/data_etl/storage/timeseries_db.py:172`` —
``create_hypertable``); Timescale's signature feature on top of that
is the CONTINUOUS AGGREGATE: a materialized rollup that a refresh
policy keeps current by recomputing only the time buckets invalidated
by new/late/changed rows. This module is that feature re-expressed
lake-first:

- the **invalidation log** is derived, not maintained: the change data
  feed between the last-refreshed source version and HEAD
  (:func:`laketable.table_changes` — a manifest diff, cost tracks the
  churn) yields every changed row image, and bucketing those images
  yields exactly the set of dirty rollup keys;
- the **refresh** recomputes ONLY those keys from source HEAD (a
  broadcast semi-join prunes the scan; with the bucket column in the
  source's ``stat_cols`` the file skipping makes it partition-pruned),
  then lands survivors + fresh rows as ONE commit that rewrites only
  the target files whose key range intersects the dirty set — buckets
  whose source rows all disappeared drop out (upsert-with-deletes);
- the **watermark** (``rollup_src_version``) rides the same manifest
  write via ``app_meta``, so refresh state is atomic with the data it
  describes: a crash between refreshes re-runs idempotently, never
  double-applies, never skips.

100 TB shape: refresh cost is O(churned files) + O(dirty buckets'
source rows) + O(target files overlapping dirty keys) — independent of
both table sizes when churn is local (the streaming-append case). A
source vacuum that expired the watermark version degrades to a full
rebuild instead of failing.
"""

from __future__ import annotations

import logging
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .laketable import LakeTable, _nullsafe_key_cond, table_changes

_log = logging.getLogger(__name__)

WATERMARK_KEY = "rollup_src_version"

#: Observability counters for the watermark-monotonicity repair (the
#: race-loser path of concurrent refreshers). The gap-safety fallback
#: (``fallback_unprovable``) is deliberately silent-but-correct in
#: control flow — a persistent failure (e.g. a vacuum policy that
#: always reclaims the gap interval before the proof runs) degrades
#: into permanent regressed-mark churn; these counters (plus a WARNING
#: log naming the exception class) make that visible to an operator.
#: Cumulative per process; tests snapshot-and-diff around a refresh.
GAP_REPAIR_COUNTERS = {
    "bumped": 0,  # proof succeeded — mark bumped forward to base_wm
    "regressed_overlap": 0,  # gap keys overlap the rewrite — kept back
    "fallback_unprovable": 0,  # proof evaluation failed — kept back
}


def refresh_rollup(
    source: LakeTable,
    target: LakeTable,
    key_of: Callable[[DataFrame], DataFrame],
    agg: Callable[[DataFrame], DataFrame],
    key_cols: list[str],
) -> int:
    """Refresh ``target`` (the materialized rollup) against ``source``.

    ``key_of(df)`` adds the rollup key columns to raw source rows
    (e.g. the time bucket + symbol); ``agg(df_with_keys)`` aggregates a
    keyed frame into rollup rows, one per distinct key. The composition
    ``agg(key_of(...))`` must be key-complete: every input row maps to
    exactly one key, every key aggregates to exactly one output row.

    Returns the target version the refresh landed (the current head
    when there is nothing to do)."""
    k0 = key_cols[0]
    if k0 not in target.stat_cols:
        raise ValueError(
            f"refresh_rollup needs key column {k0!r} in the TARGET's "
            "stat_cols so the dirty-key rewrite can prune files"
        )
    src_head = source.head_version()
    wm = int(target.app_meta().get(WATERMARK_KEY, 0))
    if src_head == wm:
        return target.head_version()  # nothing committed since — no-op

    def full_rebuild() -> int:
        fresh = agg(key_of(source.read()))
        return target.commit(
            fresh, mode="overwrite", app_meta={WATERMARK_KEY: src_head}
        )

    if wm == 0 or target.head_version() == 0:
        return full_rebuild()
    try:
        changes = table_changes(source, wm, src_head)
    except FileNotFoundError:
        # the watermark snapshot was vacuumed out of source history —
        # the invalidation interval is gone; degrade to a full rebuild
        return full_rebuild()

    # dirty keys: bucket the changed row images (insert AND delete
    # sides — a delete invalidates its bucket exactly like an insert).
    # localCheckpoint (r9): the dirty-key frame is referenced by the
    # emptiness probe, the broadcast semi-join pruning the recompute,
    # the rewrite's bounds aggregate AND its anti-join — unpinned,
    # each reference re-ran the whole CDF manifest-diff + parquet
    # re-read. The frame is tiny by contract (keys track churn, not
    # table size), so pinning it costs one pass and each later use
    # reads the materialized rows.
    # lazy checkpoint (r10): the bounds aggregate right below is the
    # first action and materializes the pin — an eager checkpoint ran
    # that materialization as its own extra job per refresh.
    touched = (
        key_of(changes.drop("_change_type", "_change_copies"))
        .select(*key_cols)
        .distinct()
        .localCheckpoint(eager=False)
    )

    # ONE aggregate job answers both the emptiness probe (cnt == 0 ⇔
    # the former isEmpty()) and the file-pruning bounds the keyed
    # rewrite needs (r10, guide §1.2 — the two consumers previously ran
    # two separate jobs over the pinned frame). The row is passed into
    # _split_by_key_range below.
    bounds = touched.agg(
        F.min(k0).alias("lo"),
        F.max(k0).alias("hi"),
        F.count(F.lit(1)).alias("cnt"),
        F.max(F.col(k0).isNull()).alias("has_null"),
    ).first()

    if bounds["cnt"] == 0:
        # the CDF netted to zero rows (e.g. a source compaction rewrote
        # files with identical content, or every change in the interval
        # was later undone): nothing is dirty. Advance the watermark
        # metadata-only — every target file carries, no data job runs —
        # instead of pushing an empty key frame through the rewrite
        # (which would write an empty file set just to move a number).
        # max() against the base's CURRENT watermark keeps the mark
        # monotone when a faster concurrent refresher already advanced
        # it past our src_head; the pinned base makes this exact (a
        # commit landing after the read raises CommitConflict).
        head = target.head_version()
        head_snap = target._load_snapshot(head)
        head_wm = int(head_snap.app_meta.get(WATERMARK_KEY, 0))
        return target._advance(
            "refresh",
            head_snap.files,
            app_meta={WATERMARK_KEY: max(src_head, head_wm)},
            base=head,
        )

    # recompute ONLY the dirty keys, reading the source PINNED at
    # src_head — the exact version the invalidation interval was
    # computed against — so the rewritten data is consistent with the
    # watermark we commit (an unpinned read resolves HEAD at call time,
    # which may have advanced past the interval and would leave keys
    # changed in the gap marked refreshed but never recomputed). The
    # semi-join is broadcast (dirty-key count tracks churn, not table
    # size) and NULL-SAFE — a null bucket (null ts → null day) is a
    # real rollup group that groupBy keeps, so the dirty joins must
    # match it
    try:
        keyed = key_of(source.read(version=src_head))
    except FileNotFoundError:
        # src_head vacuumed between head_version() and the read
        return full_rebuild()
    fresh = agg(
        keyed.join(
            F.broadcast(touched),
            on=_nullsafe_key_cond(keyed, touched, key_cols),
            how="left_semi",
        )
    )
    # one-commit upsert-with-deletes via the shared keyed rewrite:
    # only target files whose k0 range can intersect a dirty key are
    # re-read; the anti-join runs on the DIRTY set (not the fresh
    # keys) so a bucket with no surviving source rows disappears
    # instead of going stale; the watermark rides the same commit
    target._check_schema_compat(fresh)
    target._enforce_constraints(fresh)
    # resolve the rewrite base here (same OCC window as _rewrite_keyed
    # resolving it itself — _advance re-checks staleness either way)
    # so the touched/carried split can reuse the bounds row above
    # instead of re-aggregating the key frame.
    rw_base = target.head_version()
    touched_files, carried_files = target._split_by_key_range(
        rw_base, touched, k0, bounds=bounds
    )
    v = target._rewrite_keyed(
        touched,
        key_cols,
        fresh,
        "refresh",
        app_meta={WATERMARK_KEY: src_head},
        base=rw_base,
        touched=touched_files,
        carried=carried_files,
    )
    # Watermark monotonicity repair: _rewrite_keyed resolves its own
    # base, so a slower refresher can land AFTER a faster one and merge
    # src_head over a higher mark. A regressed mark is SAFE (the next
    # refresh re-covers (src_head, head] and heals any key this rewrite
    # clobbered with data from the older source snapshot) but wasteful;
    # bumping it forward is cheap but only CORRECT when no key we just
    # rewrote also changed inside (src_head, base_wm] — for such a key
    # our rewrite replaced the faster racer's fresher rows with
    # source@src_head rows, and a bumped mark would declare that
    # interval refreshed so the staleness would never heal. So: bump
    # only when the interval's own dirty keys provably miss ours;
    # otherwise leave the regressed mark and let the next refresh
    # recompute the overlap. Best-effort either way: a CommitConflict
    # means yet another refresher committed past us, and ITS mark
    # supersedes both; a vacuumed interval means safety is unprovable,
    # so keep the self-healing regressed mark.
    snap = target._load_snapshot(v)
    base_wm = (
        int(target._load_snapshot(snap.base).app_meta.get(WATERMARK_KEY, 0))
        if snap.base > 0
        else 0
    )
    if base_wm > src_head:
        from .laketable import CommitConflict

        try:
            gap = table_changes(source, src_head, base_wm)
            gap_keys = (
                key_of(gap.drop("_change_type", "_change_copies"))
                .select(*key_cols)
                .distinct()
            )
            overlap_empty = gap_keys.join(
                F.broadcast(touched),
                on=_nullsafe_key_cond(gap_keys, touched, key_cols),
                how="left_semi",
            ).isEmpty()
        except Exception as e:  # noqa: BLE001 — deliberately broad: the
            # evaluation lazily re-reads BOTH change intervals' parquet,
            # which a concurrent source vacuum can delete mid-job (the
            # manifest miss raises Python FileNotFoundError, a data-file
            # miss surfaces as a JVM error through py4j). Either way
            # safety is unprovable, and the fallback — keep the
            # regressed mark — is always correct: the next refresh
            # re-covers the interval and heals. Count + log so a
            # PERSISTENT proof failure (permanent regressed-mark churn)
            # is visible, not silent.
            GAP_REPAIR_COUNTERS["fallback_unprovable"] += 1
            _log.warning(
                "rollup gap-safety proof failed (%s: %s); keeping the "
                "regressed watermark %d (< %d) — next refresh re-covers "
                "the interval",
                type(e).__name__,
                e,
                src_head,
                base_wm,
            )
            return v
        if not overlap_empty:
            GAP_REPAIR_COUNTERS["regressed_overlap"] += 1
            return v  # we overwrote fresher rows — regressed mark heals
        try:
            v = target._advance(
                "refresh",
                snap.files,
                app_meta={WATERMARK_KEY: base_wm},
                base=v,
            )
            GAP_REPAIR_COUNTERS["bumped"] += 1
        except CommitConflict:
            pass
    return v
