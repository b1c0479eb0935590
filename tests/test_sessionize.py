"""Sessionization tests: gap semantics (half-open boundary), session
stats, streaming-compatibility of the session_window expression."""

import datetime as dt

import pyspark.sql.functions as F

from financial_data_pipeline_spark.operators.sessionize import (
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m), u, float(v)) for i, (m, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, value double",
    )


def test_sessionize_splits_on_gap(spark):
    # user 1: events at 0, 10, 20 min (one session), then 60, 65 (second)
    # user 2: single event
    df = _ev(
        spark,
        [(0, 1, 1), (10, 1, 2), (20, 1, 3), (60, 1, 4), (65, 1, 5), (5, 2, 9)],
    )
    out = sessionize(df, gap="30 minutes").orderBy("user_id", "session_start")
    rows = out.collect()
    assert len(rows) == 3
    s1, s2, s3 = rows
    assert (s1["user_id"], s1["n_events"], s1["total_value"]) == (1, 3, 6.0)
    assert s1["session_start"] == T0
    assert s1["session_end"] == T0 + dt.timedelta(minutes=20)
    assert (s2["user_id"], s2["n_events"], s2["total_value"]) == (1, 2, 9.0)
    assert (s3["user_id"], s3["n_events"]) == (2, 1)


def test_sessionize_inclusive_boundary(spark):
    # second event at EXACTLY prev + gap → MERGES (boundary inclusive);
    # pinned because the DuckDB oracle depends on this (strict > gap)
    df = _ev(spark, [(0, 1, 1), (30, 1, 1)])
    assert sessionize(df, gap="30 minutes").count() == 1
    # strictly past the gap → new session
    df2 = _ev(spark, [(0, 1, 1), (31, 1, 1)])
    assert sessionize(df2, gap="30 minutes").count() == 2


def test_sessionize_chained_extension(spark):
    # each gap < 30min but total span > 30min: one session (extends
    # from the LAST event, not the first)
    df = _ev(spark, [(0, 1, 1), (25, 1, 1), (50, 1, 1), (75, 1, 1)])
    out = sessionize(df, gap="30 minutes").collect()
    assert len(out) == 1
    assert out[0]["session_end"] == T0 + dt.timedelta(minutes=75)


def test_session_stats(spark):
    df = _ev(spark, [(0, 1, 1), (10, 1, 2), (60, 1, 3), (0, 2, 4)])
    stats = {
        r["user_id"]: r.asDict()
        for r in session_stats(sessionize(df, gap="30 minutes")).collect()
    }
    assert stats[1]["n_sessions"] == 2 and stats[1]["n_events"] == 3
    # sessions: [0,10] → 600s, [60,60] → 0s; avg 300s
    assert stats[1]["avg_session_sec"] == 300.0
    assert stats[2]["n_sessions"] == 1 and stats[2]["avg_session_sec"] == 0.0


def test_sessionize_works_on_stream(spark, tmp_path):
    # the SAME expression must be streamable: session_window + watermark
    df = _ev(spark, [(0, 1, 1), (10, 1, 2), (60, 1, 3)])
    src = str(tmp_path / "events")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src).withWatermark(
        "ts", "1 hour"
    )
    q = (
        sessionize(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits watermark-closed sessions; the plan
    # compiling + running proves streamability, rows may be withheld
    assert spark.table("sess_test").columns == [
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        "total_value",
    ]


def test_approx_distinct_within_rsd(spark):
    """HLL++ daily distinct-user estimates stay within the configured
    5% relative standard deviation of the exact counts (the documented
    100 TB swap for exact COUNT(DISTINCT))."""
    from financial_data_pipeline_spark.plans.driver_queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    rows = {
        r["day"]: r
        for r in QUERIES["distinct_users_daily_approx"](spark, sf_dir).collect()
    }
    exact = {
        r["day"]: r["n_users"]
        for r in QUERIES["distinct_users_daily"](spark, sf_dir).collect()
    }
    assert rows.keys() == exact.keys()
    for day, n in exact.items():
        # the bound |est - exact| <= max(3*rsd*n, 5) is computed inside
        # the query frame (the oracle compares it to literal TRUE);
        # cross-check its exact side against the independent exact query
        assert rows[day]["n_users_exact"] == n
        assert rows[day]["within_bound"]
