"""Streaming joins (beyond-reference scope; SURVEY.md §2.10 notes the
reference has no streaming at all).

Two join classes a continuous ingest pipeline needs:

- **stream-static enrichment**: a live fact stream joined to a slowly
  changing dimension (symbol metadata, provider config). Stateless —
  the dimension is re-read per micro-batch and broadcast; no streaming
  state, no watermark required.
- **stream-stream interval join**: two live streams joined on a key
  plus a time-range predicate (tick enriched with the bar whose bucket
  contains it, order matched to the quote in force). Spark buffers both
  sides in state; the watermarks PLUS the interval bound are what make
  that state finite — without the time-range condition the buffers
  grow forever. State eviction: a row can be dropped once the other
  side's watermark passes its timestamp + the interval width.

Scale notes (100 TB/day firehose): state size ≈ rate × (watermark +
interval) per side, hash-partitioned by the join key across executors —
the key must therefore be high-cardinality (symbol, user), never a
constant. Skewed keys (one hot symbol) hit a single state store; salt
the key and re-aggregate if one key exceeds a few million buffered rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream_static(
    stream: DataFrame, dim: DataFrame, on: list[str], how: str = "left"
) -> DataFrame:
    """Stream-static join: per micro-batch broadcast of the dimension.

    The static side is planned fresh each micro-batch, so an updated
    dimension table (e.g. a re-written parquet dir) is picked up on the
    next trigger without restarting the query.
    """
    return stream.join(F.broadcast(dim), on=on, how=how)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: ``left.key = right.key AND right_ts <=
    left_ts < right_ts + interval`` (the "record in force" predicate —
    a tick joins the bar bucket that contains it).

    Both sides get event-time watermarks; together with the interval
    bound Spark derives a state-cleanup threshold per side, so the
    join's state store is bounded by rate × (watermark + interval).

    The half-open bound means a left row matches AT MOST the right rows
    in one interval window — with non-overlapping right intervals
    (e.g. bars) exactly 0 or 1 matches, so the join never amplifies.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"l.{left_ts}") >= F.col(f"r.{right_ts}"))
        & (
            F.col(f"l.{left_ts}")
            < F.col(f"r.{right_ts}") + F.expr(f"INTERVAL {interval}")
        )
    )
    return lw.alias("l").join(rw.alias("r"), cond, "inner")


def interval_join_streams_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER variant of the interval join: left rows that never
    find a right match are STILL emitted (right side null) — but only
    once the watermark proves no match can arrive anymore, i.e. after
    the right watermark passes ``left_ts + interval``. Unmatched
    emission is therefore delayed by the watermark by design: the
    engine cannot know "no match" earlier without risking a wrong
    null. Use for must-not-drop pipelines (every order event flows
    downstream, quote-enriched when possible).

    Same bounded state as the inner variant; the outer side's state
    additionally holds matched-bits until eviction.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"l.{left_ts}") >= F.col(f"r.{right_ts}"))
        & (
            F.col(f"l.{left_ts}")
            < F.col(f"r.{right_ts}") + F.expr(f"INTERVAL {interval}")
        )
    )
    return lw.alias("l").join(rw.alias("r"), cond, "left_outer")
