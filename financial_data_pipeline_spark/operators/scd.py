"""SCD Type-2 dimension merge (beyond-reference; north-star warehouse op).

The reference keeps dimension-ish metadata mutable-in-place (JSONB
upserts, ``metadata_db.py:153-240``) and loses history. A 100 TB
warehouse tracks dimension history instead: each key holds a chain of
versioned rows ``[valid_from, valid_to)`` with exactly one open row
(``valid_to IS NULL``, ``is_current = true``).

``scd2_merge`` applies one update snapshot in a single declarative
pass — no loops, no driver state:

- changed keys: the open row is CLOSED (``valid_to = as_of``) and a
  new open row with the update's attributes is inserted;
- unchanged keys and already-closed history rows: pass through;
- brand-new keys: inserted as open rows.

Execution shape: one hash join of the open rows against the update
snapshot on the key (broadcast if the snapshot is small — the usual
case: a day's dimension churn is tiny next to the dimension), then a
union of three branches over the SAME joined frame — Catalyst shares
the join via the repeated subtree, and closed-history rows are
column-pruned straight from the scan. No window functions, no global
sort; at 100 TB the join shuffles only the dimension (or nothing, when
the delta broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(
    snapshot: DataFrame,
    valid_from,
    keys: list[str] | None = None,
) -> DataFrame:
    """Bootstrap an SCD2 table from an initial snapshot: every row open
    from ``valid_from``."""
    return snapshot.select(
        "*",
        F.lit(valid_from).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    as_of,
    broadcast_updates: bool = True,
) -> DataFrame:
    """Merge one update snapshot into an SCD2 table.

    ``current``: SCD2 table (attribute cols + valid_from/valid_to/
    is_current). ``updates``: plain snapshot with the same attribute
    columns (no SCD columns). ``tracked``: attribute columns whose
    change triggers a new version; updates matching the open row on
    ALL tracked columns are no-ops. ``as_of``: the effective timestamp
    of the snapshot.

    Returns the merged SCD2 table (same schema as ``current``).
    """
    as_of_ts = F.lit(as_of).cast("timestamp")
    attr_cols = [c for c in current.columns if c not in
                 ("valid_from", "valid_to", "is_current")]
    upd = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in updates.columns]
    )
    if broadcast_updates:
        upd = F.broadcast(upd)

    closed_history = current.filter(~F.col("is_current"))
    open_rows = current.filter(F.col("is_current"))

    # LEFT join keeps the (huge) dimension un-shuffled when the delta
    # broadcasts — a full-outer here would force a wide sort-merge
    # shuffle of every open row just to find the handful of new keys.
    on = [open_rows[k] == upd[f"__u_{k}"] for k in keys]
    joined = open_rows.join(upd, on, "left")

    matched = F.col(f"__u_{keys[0]}").isNotNull()
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~(
            F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        )
    # NB: an unmatched row evaluates `changed` true (null ≠ value), so
    # every branch guards with `matched` first.

    # open rows with no update, or update identical on tracked cols
    unchanged_open = joined.filter(~matched | ~changed).select(
        *[F.col(c) for c in current.columns]
    )

    # open rows whose update differs: close them at as_of
    closed_now = (
        joined.filter(matched & changed)
        .select(
            *[F.col(c) for c in attr_cols],
            F.col("valid_from"),
            as_of_ts.alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )

    # new version for changed keys, open from as_of
    new_versions = (
        joined.filter(matched & changed)
        .select(*[F.col(f"__u_{c}").alias(c) for c in attr_cols])
    )

    # brand-new keys: anti join of the delta against the KEY-ONLY
    # projection of the open rows — the dimension side shuffles two
    # narrow columns at most (and nothing when the delta broadcasts
    # the other way at small scale).
    open_keys = open_rows.select(*keys)
    anti_on = [upd[f"__u_{k}"] == open_keys[k] for k in keys]
    brand_new = upd.join(open_keys, anti_on, "left_anti").select(
        *[F.col(f"__u_{c}").alias(c) for c in attr_cols]
    )

    fresh = new_versions.unionByName(brand_new).select(
        "*",
        as_of_ts.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )

    return closed_history.unionByName(
        unchanged_open
    ).unionByName(closed_now).unionByName(fresh)
