"""Sessionization: group per-user event streams into activity sessions
(beyond-reference scope — the standard event-analytics verb).

Built on Spark's native ``session_window`` (merging session windows,
SPARK-10816 lineage), which makes the SAME expression work in batch and
Structured Streaming (add ``withWatermark`` upstream for streams) and
lets Catalyst plan the session merge instead of a hand-rolled
gaps-and-islands window chain.

Semantics (and the oracle twin): a session is a maximal run of events
where each event arrives AT OR BEFORE previous_event_ts + gap — the
boundary is inclusive (verified empirically: an event at exactly
``prev + gap`` MERGES), so a gaps-and-islands twin must open a new
session only when ``ts > prev_ts + gap`` (strict ``>``, not ``>=``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """One row per (user, session): session_start/session_end (min/max
    event ts), n_events, and total_<value_col> when given.

    ONE shuffle on ``user_col`` (session_window aggregation is keyed on
    the partition cols; the windows merge inside the aggregation) —
    at 100 TB this scales like any keyed agg: partial map-side combine
    does not apply (merging is order-sensitive) but state per key is
    one open session, and skewed users are bounded by their own event
    counts, not the corpus.
    """
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"total_{value_col}"))
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(*aggs)
        .drop("session_window")
    )


def session_stats(
    sessions: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """Per-user rollup over ``sessionize`` output: session count, total
    events, mean session length (seconds) — the funnel/engagement
    summary table.

    Durations are summed as exact INTEGER microseconds and divided
    ONCE at the end — ``sum/n/1e6`` is pure IEEE on exact inputs, so
    any engine computing the same expression produces the identical
    double and the value is emitted UNROUNDED. (Rounding is the
    non-portable step here, not the arithmetic: an integer-µs mean
    can land exactly on a decimal rounding boundary, and Spark's
    BigDecimal HALF_UP vs DuckDB's float-multiply round then disagree
    by 1e-6 — observed at sf0.1.)
    """
    dur_us = F.unix_micros(F.col("session_end")) - F.unix_micros(
        F.col("session_start")
    )
    return sessions.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        (
            F.sum(dur_us) / F.count(F.lit(1)) / F.lit(1000000.0)
        ).alias("avg_session_sec"),
    )
