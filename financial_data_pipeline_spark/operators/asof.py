"""As-of (point-in-time) join — the canonical time-series join the
reference's domain needs and Spark's DataFrame API lacks (beyond-
reference scope; the reference itself is join-free on the fact table,
SURVEY.md §2.9).

Semantics (direction="backward", the financial default): for each left
row, attach the value columns of the *latest right row at-or-before*
the left row's timestamp, within the same ``by`` key — e.g. "the
prevailing quote for each trade", "the latest 4h bar close for each
tick". Equals pandas ``merge_asof(direction="backward")`` and DuckDB
``ASOF JOIN`` (left.ts >= right.ts). ``forward`` and ``nearest``
directions complete the pandas surface (nearest ties take backward,
as pandas does).

Execution shape — built for 100 TB, NOT a join at all:

- Union both sides (right rows carry their value columns, left rows
  carry nulls), then one window pass per ``by`` key ordered by
  (timestamp, side) with ``last(value, ignorenulls=True)`` over
  unboundedPreceding..current. Right rows sort *before* left rows at
  the same instant, so an exact-timestamp match is taken.
- Cost: ONE hash shuffle of (left ∪ right) on the by-key + a
  per-partition sort — the distributed merge-join formulation. No
  row-multiplying join, no range-condition nested loop, no skew
  amplification beyond the key's own volume.
- A plain SQL rendering (left join on key + ts-range then
  greatest-per-group) would be O(left × right-per-key) before the
  dedup; this composition never materializes candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "timestamp",
    by: str | None = "symbol",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    matched_ts_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join, pandas ``merge_asof`` directions:

    - ``backward`` (default): latest right row at-or-before the left
      row — ``last(ignorenulls) OVER (… PRECEDING..CURRENT)`` with
      right rows sorting BEFORE left at equal timestamps (exact match
      eligible).
    - ``forward``: first right row at-or-after — the mirror frame,
      ordered (ts asc, side desc) so equal-instant right rows land in
      the forward frame.
    - ``nearest``: both fills in the SAME union pass (one shuffle, two
      window frames over the two sort orders), then the closer match
      per row; ties take the backward side, matching pandas.

    ``value_cols``: right columns to attach (default: everything except
    ``on``/``by``). Names must not collide with left columns — alias on
    the right side first. ``tolerance_seconds``: nullify matches whose
    |Δt| exceeds this. ``matched_ts_col``: if set, also emit the
    matched right-row timestamp under this name. Right rows should be
    unique per (by, on); if not, dedup first.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if value_cols is None:
        excluded = {on} | ({by} if by else set())
        value_cols = [c for c in right.columns if c not in excluded]
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right value columns collide with left: {sorted(overlap)}")

    key_cols = ([by] if by else []) + [on]
    rtypes = {f.name: f.dataType for f in right.schema.fields}

    l_side = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in value_cols],
        F.lit(None).cast("long").alias("__r_ts_us"),
    )
    r_side = right.select(
        *key_cols,
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in left.schema.fields
            if f.name not in key_cols
        ],
        F.lit(0).alias("__side"),
        *value_cols,
        F.unix_micros(F.col(on)).alias("__r_ts_us"),
    )
    u = l_side.unionByName(r_side)

    part = Window.partitionBy(by) if by else Window.partitionBy()
    wb = part.orderBy(F.col(on).asc(), F.col("__side").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = part.orderBy(F.col(on).asc(), F.col("__side").desc()).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )

    cols = [*left.columns, F.col("__side")]
    if direction in ("backward", "nearest"):
        cols += [
            *[F.last(c, ignorenulls=True).over(wb).alias(f"__b_{c}") for c in value_cols],
            F.last("__r_ts_us", ignorenulls=True).over(wb).alias("__b_ts"),
        ]
    if direction in ("forward", "nearest"):
        cols += [
            *[F.first(c, ignorenulls=True).over(wf).alias(f"__f_{c}") for c in value_cols],
            F.first("__r_ts_us", ignorenulls=True).over(wf).alias("__f_ts"),
        ]
    filled = u.select(*cols).filter(F.col("__side") == 1)

    l_us = F.unix_micros(F.col(on))
    if direction == "backward":
        picked = {c: F.col(f"__b_{c}") for c in value_cols}
        m_ts = F.col("__b_ts")
    elif direction == "forward":
        picked = {c: F.col(f"__f_{c}") for c in value_cols}
        m_ts = F.col("__f_ts")
    else:
        bdiff, fdiff = l_us - F.col("__b_ts"), F.col("__f_ts") - l_us
        use_b = F.col("__f_ts").isNull() | (
            F.col("__b_ts").isNotNull() & (bdiff <= fdiff)
        )
        picked = {
            c: F.when(use_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
            for c in value_cols
        }
        m_ts = F.when(use_b, F.col("__b_ts")).otherwise(F.col("__f_ts"))

    filled = filled.select(
        *left.columns,
        *[picked[c].alias(c) for c in value_cols],
        m_ts.alias("__r_ts_us"),
    )

    if tolerance_seconds is not None:
        in_tol = F.abs(l_us - F.col("__r_ts_us")) <= F.lit(
            int(tolerance_seconds * 1_000_000)
        )
        filled = filled.select(
            *left.columns,
            *[F.when(in_tol, F.col(c)).alias(c) for c in value_cols],
            F.when(in_tol, F.col("__r_ts_us")).alias("__r_ts_us"),
        )

    out_cols = list(left.columns) + list(value_cols)
    if matched_ts_col is not None:
        return filled.select(
            *out_cols, F.timestamp_micros(F.col("__r_ts_us")).alias(matched_ts_col)
        )
    return filled.select(*out_cols)
