"""Streaming rolling Hampel spike filter (the stateful twin of
``operators/cleaning.hampel_flags``).

The batch operator takes the trailing n-bar window via
``collect_list`` over a sort; a stream cannot re-sort history, so the
window IS the state: the last n−1 values per key ride in a fixed-size
array column (``applyInPandasWithState``), and each arriving row
recomputes the window median/MAD exactly as the batch fold does. With
in-order delivery per key, batch and streaming flags are IDENTICAL
under any micro-batch slicing — asserted in tests.

State per key is n−1 doubles (n defaults to 11 → 10 doubles): O(keys)
total, bounded by construction — the honest contrast with the windowed
aggregates (whose state the watermark bounds) and CUSUM (O(1) closed
form): order statistics have no constant-size sufficient statistic, so
the minimal state is the window itself. No watermark needed; per-key
ORDER is the correctness contract (same as every per-key recurrence
here — enforce with a per-key ordered source or repartition+sortWithin
upstream).
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
        T.StructField("value", T.DoubleType()),
        T.StructField("rolling_median", T.DoubleType()),
        T.StructField("hampel_outlier", T.BooleanType()),
    ]
)


def _median(sorted_vals: list[float]) -> float:
    m = len(sorted_vals)
    return (sorted_vals[(m - 1) // 2] + sorted_vals[m // 2]) / 2.0


def streaming_hampel(
    stream: DataFrame,
    n: int = 11,
    k: float = 5.0,
    value_col: str = "close",
) -> DataFrame:
    """Per-symbol streaming Hampel over (symbol, timestamp, value).

    Emits one row per input with the trailing-window median and the
    outlier flag; warmup rows (< n values seen) and zero-MAD windows
    emit null flags, matching the batch operator's abstain contract.
    """
    state_schema = T.StructType(
        [T.StructField("window", T.ArrayType(T.DoubleType()))]
    )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        sym = key[0]
        (window,) = state.get if state.exists else ([],)
        window = list(window)
        for pdf in pdfs:
            pdf = pdf.sort_values("timestamp")
            meds, flags = [], []
            for x in pdf[value_col]:
                window.append(float(x))
                if len(window) > n:
                    window.pop(0)
                if len(window) < n:
                    meds.append(None)
                    flags.append(None)
                    continue
                sw = sorted(window)
                med = _median(sw)
                mad = _median(sorted(abs(v - med) for v in sw))
                meds.append(med)
                flags.append(
                    bool(abs(x - med) > k * 1.4826 * mad) if mad > 0 else None
                )
            yield pd.DataFrame(
                {
                    "symbol": sym,
                    "timestamp": pdf["timestamp"].values,
                    "value": pdf[value_col].astype(float).values,
                    "rolling_median": pd.array(meds, dtype="float64"),
                    "hampel_outlier": pd.array(flags, dtype="boolean"),
                }
            )
        state.update((window,))

    return (
        stream.select("symbol", "timestamp", value_col)
        .groupBy("symbol")
        .applyInPandasWithState(
            fold,
            outputStructType=OUT_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
