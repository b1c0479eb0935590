"""Streaming CUSUM change-point monitor (the stateful twin of
``operators/drift.cusum_flags``).

The batch operator standardizes against the series' own full-sample
mean/stddev; a stream cannot see the future, so the reference stats
are FROZEN at deploy time (the ``drift_stream`` posture: reference
derived from the training window, passed in as plain floats). With the
same frozen stats, batch and streaming produce IDENTICAL cusum values
for any micro-batch slicing — asserted in tests.

State per key is four doubles — the prefix sums and their running
minima — because ``s_t = P_t − min(P_0..P_t)``: O(keys) state total,
no watermark needed (nothing ever ages out), restart-safe via the
checkpoint like every ``applyInPandasWithState`` operator here.
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
        T.StructField("cusum_up", T.DoubleType()),
        T.StructField("cusum_down", T.DoubleType()),
        T.StructField("changepoint", T.BooleanType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("pu", T.DoubleType()),
        T.StructField("pd", T.DoubleType()),
        T.StructField("min_pu", T.DoubleType()),
        T.StructField("min_pd", T.DoubleType()),
    ]
)


def streaming_cusum(
    stream: DataFrame,
    ref_stats: dict[str, tuple[float, float]],
    drift: float = 0.0,
    threshold: float = 5.0,
    value_col: str = "close",
) -> DataFrame:
    """Per-symbol streaming CUSUM over (symbol, timestamp, value) rows.

    ``ref_stats`` maps key → (mu, sd), frozen. Emits one row per input
    with the running ``cusum_up`` / ``cusum_down`` / ``changepoint``.
    Keys absent from ``ref_stats`` are dropped (no reference — the
    deploy-time contract, mirroring the frozen-bin PSI stream).
    """

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        sym = key[0]
        if sym not in ref_stats:
            state.update((0.0, 0.0, 0.0, 0.0))  # touch state, emit nothing
            return
        mu, sd = ref_stats[sym]
        pu, pdown, min_pu, min_pd = (
            state.get if state.exists else (0.0, 0.0, 0.0, 0.0)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values("timestamp")
            ups, downs, flags = [], [], []
            for x in pdf[value_col]:
                z = (x - mu) / sd
                pu += z - drift
                pdown += -z - drift
                min_pu = min(min_pu, pu)
                min_pd = min(min_pd, pdown)
                cu = pu - min(min_pu, 0.0)
                cd = pdown - min(min_pd, 0.0)
                ups.append(cu)
                downs.append(cd)
                flags.append(bool(cu > threshold or cd > threshold))
            yield pd.DataFrame(
                {
                    "symbol": sym,
                    "timestamp": pdf["timestamp"].values,
                    "cusum_up": ups,
                    "cusum_down": downs,
                    "changepoint": flags,
                }
            )
        state.update((pu, pdown, min_pu, min_pd))

    return (
        stream.select("symbol", "timestamp", value_col)
        .groupBy("symbol")
        .applyInPandasWithState(
            fold,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
