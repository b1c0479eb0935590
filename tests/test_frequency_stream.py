"""Streaming heavy hitters: MG-merge bounds, bounded state, and the
end-to-end file-stream run with restart resume."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.streaming.frequency_stream import (
    StreamingHeavyHitters,
    heavy_hitter_stream,
    mg_merge,
)


def test_mg_merge_bounds_and_size():
    m = 4
    s1 = pd.DataFrame({"item": ["a", "b", "c"], "count": [50, 30, 5]})
    s2 = pd.DataFrame({"item": ["a", "d", "e", "f"], "count": [40, 25, 6, 4]})
    out = mg_merge(s1, s2, m)
    assert len(out) <= m
    got = dict(zip(out["item"], out["count"]))
    # lower-bound property: merged count <= exact sum, and the heavy
    # item survives with count within the subtraction error
    assert got["a"] <= 90
    assert got["a"] >= 90 - 7  # kth combined count subtracted at most
    assert out.iloc[0]["item"] == "a"


def _write_batch(spark, path, rows):
    spark.createDataFrame([(r,) for r in rows], ["item"]).write.mode(
        "overwrite"
    ).parquet(path)


def test_stream_accumulates_across_batches(spark, tmp_path):
    """Planted hitter split across micro-batches (never dominant within
    one batch alone vs other items) is still the global winner."""
    src = tmp_path / "src"
    state = str(tmp_path / "hh_state.parquet")
    ckpt = str(tmp_path / "ckpt")

    batch1 = ["hot"] * 40 + [f"x{i}" for i in range(200)]
    batch2 = ["hot"] * 45 + [f"y{i}" for i in range(200)]
    _write_batch(spark, str(src / "b1"), batch1)

    stream = spark.readStream.schema("item string").parquet(str(src / "*"))
    q, sink = heavy_hitter_stream(stream, "item", state, ckpt, m=64)
    q.processAllAvailable()
    q.stop()

    _write_batch(spark, str(src / "b2"), batch2)
    stream = spark.readStream.schema("item string").parquet(str(src / "*"))
    q, sink = heavy_hitter_stream(stream, "item", state, ckpt, m=64)
    q.processAllAvailable()
    q.stop()

    top = sink.current(k=1)
    assert top.iloc[0]["item"] == "hot"
    n_total = len(batch1) + len(batch2)
    true = 85
    assert top.iloc[0]["count"] <= true
    assert top.iloc[0]["count"] >= true - n_total / (64 + 1)
    # bounded state regardless of ~400 distinct tail items
    assert len(sink.current()) <= 64


from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    cuts=st.lists(st.integers(min_value=0, max_value=400), max_size=4),
    m=st.integers(min_value=4, max_value=16),
)
def test_mg_merge_guarantee_any_batching(stream, cuts, m):
    """For ANY batching of ANY stream: every item with true frequency
    > N/(m+1) survives the merged summary, with
    count ≤ true ≤ count + N/(m+1). (The mergeable-summaries theorem,
    checked empirically.)"""
    items = [f"i{v}" for v in stream]
    n = len(items)
    bounds = sorted({min(c, n) for c in cuts})
    pieces, prev = [], 0
    for b in bounds + [n]:
        pieces.append(items[prev:b])
        prev = b

    state = pd.DataFrame({"item": pd.Series([], dtype=str), "count": []})
    for piece in pieces:
        if not piece:
            continue
        c = Counter(piece)
        # per-batch summary: a VALID MG summary (what batch_top_m now
        # feeds) — exact counts MG-truncated by subtracting the
        # (m+1)-th largest; a bare exact-top-m here breaks the merged
        # bound (this test found that)
        vc = c.most_common()
        if len(vc) > m:
            sub = vc[m][1]
            top = [(t, v - sub) for t, v in vc[:m] if v - sub > 0]
        else:
            top = vc
        batch = pd.DataFrame(
            {"item": [t for t, _ in top], "count": [v for _, v in top]}
        )
        state = mg_merge(state, batch, m)

    true = Counter(items)
    err = n / (m + 1)
    got = dict(zip(state["item"], state["count"]))
    for item, freq in true.items():
        if freq > err:
            assert item in got, (item, freq, err)
            assert got[item] <= freq
            assert got[item] >= freq - err
