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

from dataclasses import dataclass

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
    # Forward fill as last(ignorenulls) over the REVERSED sort, not
    # first() over (CURRENT ROW, UNBOUNDED FOLLOWING): Spark evaluates
    # unbounded-FOLLOWING frames by re-scanning the tail for every row
    # (O(n²) per partition — measured 87s vs 1s at sf0.1), while the
    # unbounded-PRECEDING frame is a single incremental pass. At equal
    # timestamps, side asc in the reversed (ts desc) order puts right
    # rows before left, so an exact-ts right row stays eligible —
    # identical semantics to the ascending (ts asc, side desc) frame.
    wf = part.orderBy(F.col(on).desc(), F.col("__side").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    cols = [*left.columns, F.col("__side")]
    if direction in ("backward", "nearest"):
        cols += [
            *[F.last(c, ignorenulls=True).over(wb).alias(f"__b_{c}") for c in value_cols],
            F.last("__r_ts_us", ignorenulls=True).over(wb).alias("__b_ts"),
        ]
    if direction in ("forward", "nearest"):
        cols += [
            *[F.last(c, ignorenulls=True).over(wf).alias(f"__f_{c}") for c in value_cols],
            F.last("__r_ts_us", ignorenulls=True).over(wf).alias("__f_ts"),
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


@dataclass(frozen=True)
class FeatureTable:
    """One feature source for ``point_in_time_features``.

    ``df`` must carry the entity/time keys named by the caller;
    ``value_cols`` are attached to the spine as ``{prefix}{col}``;
    ``ttl_seconds`` nullifies values whose match is staler than the
    TTL at the spine row's time (per-table, the feature-store freshness
    contract).
    """

    name: str
    df: "DataFrame"
    value_cols: list[str]
    ttl_seconds: float | None = None
    prefix: str = ""


def point_in_time_features(
    spine: DataFrame,
    features: list[FeatureTable],
    on: str = "ts",
    by: str = "user_id",
    emit_matched_ts: bool = False,
) -> DataFrame:
    """Training-set assembly: attach, to every spine row, the latest
    at-or-before value of every feature table — the feature-store
    point-in-time-correct join that prevents label leakage (no feature
    row from the future of its spine row is ever visible).

    Execution — ONE shuffle for N feature tables, not N as-of joins:
    spine and every feature table union into one frame (each table's
    columns null on other tables' rows), hash-partitioned on the
    entity key once, sorted once per partition, and every feature
    column fills via ``last(ignorenulls)`` over the same
    unboundedPreceding window. Chained per-table as-of joins would
    re-shuffle the accumulated spine per table; here shuffle volume is
    (spine + Σ features) exactly once. Feature rows sort before spine
    rows at equal timestamps, so same-instant features are visible
    (at-or-before, inclusive — DuckDB ``ASOF JOIN`` / pandas
    ``merge_asof`` backward semantics).

    Feature tables should be unique per (entity, time); dedup upstream
    if not (e.g. ``greatest_per_group``). TTLs compare event-time
    microseconds — spine rows older than every in-TTL feature row get
    nulls, exactly what a model should see for a cold entity.
    """
    for ft in features:
        missing = [c for c in (by, on) if c not in ft.df.columns]
        if missing:
            raise ValueError(f"feature table {ft.name!r} lacks {missing}")

    out_names = {}
    for ft in features:
        for c in ft.value_cols:
            out = f"{ft.prefix}{c}"
            if out in spine.columns or out in out_names:
                raise ValueError(f"output column collision: {out!r}")
            out_names[out] = ft

    # One wide union: spine rows carry nulls for every feature slot,
    # each feature table fills its own slots + its match-ts marker.
    slots: list[tuple[str, str, "FeatureTable"]] = []  # (out, src, ft)
    for ft in features:
        for c in ft.value_cols:
            slots.append((f"{ft.prefix}{c}", c, ft))
    ft_types = {
        ft.name: {f.name: f.dataType for f in ft.df.schema.fields}
        for ft in features
    }

    spine_side = spine.select(
        *spine.columns,
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(ft_types[ft.name][src]).alias(out)
            for out, src, ft in slots
        ],
        *[F.lit(None).cast("long").alias(f"__ts_{ft.name}") for ft in features],
    )
    spine_types = {f.name: f.dataType for f in spine.schema.fields}
    parts = [spine_side]
    for ft in features:
        parts.append(
            ft.df.select(
                F.col(by),
                F.col(on),
                *[
                    F.lit(None).cast(spine_types[c]).alias(c)
                    for c in spine.columns
                    if c not in (by, on)
                ],
                F.lit(0).alias("__side"),
                *[
                    (F.col(src) if ft2 is ft else F.lit(None).cast(
                        ft_types[ft2.name][src2]
                    )).alias(out2)
                    for out2, src2, ft2 in slots
                    for src in [src2]
                ],
                *[
                    (
                        F.unix_micros(F.col(on))
                        if ft2 is ft
                        else F.lit(None).cast("long")
                    ).alias(f"__ts_{ft2.name}")
                    for ft2 in features
                ],
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *spine.columns,
        F.col("__side"),
        *[F.last(out, ignorenulls=True).over(w).alias(out) for out, _, _ in slots],
        *[
            F.last(f"__ts_{ft.name}", ignorenulls=True)
            .over(w)
            .alias(f"__ts_{ft.name}")
            for ft in features
        ],
    ).filter(F.col("__side") == 1)

    l_us = F.unix_micros(F.col(on))
    final_cols = list(spine.columns)
    for out, _, ft in slots:
        col = F.col(out)
        if ft.ttl_seconds is not None:
            fresh = (l_us - F.col(f"__ts_{ft.name}")) <= F.lit(
                int(ft.ttl_seconds * 1_000_000)
            )
            col = F.when(fresh, col)
        final_cols.append(col.alias(out))
    if emit_matched_ts:
        for ft in features:
            final_cols.append(
                F.timestamp_micros(F.col(f"__ts_{ft.name}")).alias(
                    f"__matched_{ft.name}"
                )
            )
    return filled.select(*final_cols)
