"""Custom stateful streaming operator: incremental per-symbol EMA.

The batch EMA kernel (``operators/indicators.with_ema``) re-reads the
whole history; on a stream that is unnecessary — EMA is a one-value
recurrence (state = last EMA per span). This is the
``applyInPandasWithState`` rendering: state is {span: last_ema} per
symbol, each micro-batch folds its (time-sorted) rows into it and emits
one EMA row per input bar. Identical arithmetic to
``Series.ewm(span, adjust=False)`` — the test replays a file stream and
diffs against the batch kernel exactly.

Scale notes: state size = O(symbols × spans) doubles — trivially
bounded; no watermark needed (state never grows with time). Late/
out-of-order rows WITHIN a micro-batch are handled by the sort; rows
arriving in a later batch than their successors would mis-fold — on a
real feed pair this with a small watermark + sorted source, exactly the
constraint any incremental EMA consumer has.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("ema_12", T.DoubleType()),
        T.StructField("ema_26", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("ema_12", T.DoubleType()),
        T.StructField("ema_26", T.DoubleType()),
    ]
)
SPANS = (12, 26)


def _fold(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    alphas = {s: 2.0 / (s + 1.0) for s in SPANS}
    last = dict(zip(SPANS, state.get)) if state.exists else {s: None for s in SPANS}
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("timestamp")
        emas: dict[int, list[float]] = {s: [] for s in SPANS}
        for x in pdf["close"]:
            for s in SPANS:
                prev = last[s]
                # ewm(adjust=False): y_t = (1-α)·y_{t-1} + α·x_t, y_0 = x_0
                last[s] = x if prev is None else (1 - alphas[s]) * prev + alphas[s] * x
                emas[s].append(last[s])
        out.append(
            pd.DataFrame(
                {
                    "symbol": key[0],
                    "timestamp": pdf["timestamp"].values,
                    "close": pdf["close"].values,
                    "ema_12": emas[12],
                    "ema_26": emas[26],
                }
            )
        )
    state.update((last[12], last[26]))
    yield from out


def streaming_ema(stream: DataFrame) -> DataFrame:
    """Per-symbol incremental EMA over a bar stream (W2, streaming form).

    Input needs columns (symbol, timestamp, close); output adds
    ema_12/ema_26 — one row per input bar, state carried across
    micro-batches.
    """
    return (
        stream.select("symbol", "timestamp", "close")
        .groupBy("symbol")
        .applyInPandasWithState(
            _fold,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
