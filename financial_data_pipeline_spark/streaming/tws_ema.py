"""Incremental EMA on the transformWithStateInPandas API (Spark 4.x).

``streaming/stateful.py`` renders the EMA recurrence on the classic
``applyInPandasWithState`` API; this is the SAME operator on the new
arbitrary-stateful-processing API (``StatefulProcessor`` +
``transformWithStateInPandas``), which is where Spark is heading:
typed named state (``getValueState`` with a schema, not one packed
tuple), multiple independent state variables per key, optional state
TTL, and event-time timers — none of which the classic API offers.

Semantics are pinned identical to the classic operator: per symbol,
``ewm(adjust=False)`` folds over time-sorted rows within each batch,
state = last EMA per span, one output row per input bar. The test
drains both operators over the same stream and diffs row-for-row —
an API migration with a proof, which is exactly what a production
estate wants before switching.

Same scale contract: state is O(symbols · spans) doubles; rows
arriving out of order ACROSS batches mis-fold (pair with a small
watermark + sorted source), exactly as documented for the classic
operator.

Environment seams (documented, not stubbed): execution requires the
``protobuf`` package (the TWS Python worker protocol) and the RocksDB
state store provider (``spark.sql.streaming.stateStore.providerClass``)
— the module imports and plans without either; the equivalence test
skips when protobuf is absent, the same posture as the psycopg2 JDBC
seams.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("ema_12", T.DoubleType()),
        T.StructField("ema_26", T.DoubleType()),
    ]
)
SPANS = (12, 26)


class EMAProcessor(StatefulProcessor):
    """Per-symbol EMA recurrence with one named ValueState per span."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        schema = T.StructType([T.StructField("v", T.DoubleType())])
        self._state = {
            s: handle.getValueState(f"ema_{s}", schema) for s in SPANS
        }

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        alphas = {s: 2.0 / (s + 1.0) for s in SPANS}
        last = {
            s: (self._state[s].get()[0] if self._state[s].exists() else None)
            for s in SPANS
        }
        for pdf in rows:
            pdf = pdf.sort_values("timestamp")
            emas: dict[int, list[float]] = {s: [] for s in SPANS}
            for x in pdf["close"]:
                for s in SPANS:
                    prev = last[s]
                    last[s] = (
                        x
                        if prev is None
                        else (1 - alphas[s]) * prev + alphas[s] * x
                    )
                    emas[s].append(last[s])
            yield pd.DataFrame(
                {
                    "symbol": key[0],
                    "timestamp": pdf["timestamp"].values,
                    "close": pdf["close"].values,
                    "ema_12": emas[12],
                    "ema_26": emas[26],
                }
            )
        for s in SPANS:
            if last[s] is not None:
                self._state[s].update((last[s],))

    def close(self) -> None:
        pass


def streaming_ema_tws(stream: DataFrame) -> DataFrame:
    """The ``transformWithStateInPandas`` twin of
    ``stateful.streaming_ema`` — identical output contract."""
    return (
        stream.select("symbol", "timestamp", "close")
        .groupBy("symbol")
        .transformWithStateInPandas(
            EMAProcessor(),
            outputStructType=OUT_SCHEMA,
            outputMode="append",
            timeMode="None",
        )
    )
