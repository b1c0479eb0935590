"""Streaming heavy hitters: mergeable Misra–Gries state over batches.

Batch heavy hitters (``operators/frequency.py``) answers top-k with a
two-pass plan; on an UNBOUNDED stream the second pass is impossible —
a streaming ``groupBy(item).count()`` keeps one state row per DISTINCT
item, which is exactly the O(domain) state that kills a billion-key
stream. The mergeable-summaries result (Agarwal et al., PODS'12 —
public) says Misra–Gries sketches merge: combine two size-``m``
summaries by summing counts on the union, then subtract the
(m+1)-largest combined count from everything and drop ≤ 0. The merged
summary keeps the MG guarantee for the concatenated stream.

Per micro-batch (``foreachBatch``):
1. batch summary = the SUM of per-Arrow-batch MG summaries
   (``batch_top_m`` — each is a valid MG summary because its
   truncation subtracts the (m+1)-th local count, removing ≥ (m+1)×
   its own error; a plain exact-top-m batch summary is NOT mergeable —
   its truncation drops error mass without the matching subtraction
   and the merged N/(m+1) bound fails, caught by the Hypothesis merge
   property test). Summing summaries adds their errors without
   touching size validity; one distributed narrow pass, no recount.
2. MG-merge into the persistent summary (one subtraction of the
   combined (m+1)-th count bounds size back to ≤ m rows — a driver
   pandas frame persisted as a single parquet footprint next to the
   stream checkpoint).

Every subtraction anywhere in this tree — inside an Arrow-batch
kernel, or at a merge — removes at least (m+1)× its own error from
the summary mass, so the total error telescopes to ≤ N/(m+1).

Guarantees after any number of batches over N total items: every item
with true frequency > N/(m+1) is PRESENT, with
count ≤ true ≤ count + N/(m+1). State is O(m), independent of the
distinct-item domain.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators.frequency import batch_top_m


def mg_merge(
    state: "pd.DataFrame", batch: "pd.DataFrame", m: int
) -> "pd.DataFrame":
    """Mergeable-summaries MG merge of two (item, count) frames to ≤ m
    rows. Counts in the result are LOWER bounds for the concatenated
    stream; the subtraction step is what keeps state bounded."""
    import pandas as pd

    merged = (
        pd.concat([state, batch], ignore_index=True)
        .groupby("item", as_index=False)["count"]
        .sum()
    )
    if len(merged) > m:
        kth = merged["count"].nlargest(m + 1).iloc[-1]
        merged["count"] = merged["count"] - kth
        merged = merged[merged["count"] > 0]
    return merged.sort_values(
        ["count", "item"], ascending=[False, True]
    ).reset_index(drop=True)


class StreamingHeavyHitters:
    """foreachBatch sink maintaining the mergeable MG summary.

    ``state_path`` holds the ≤ m-row summary as parquet — rewritten
    per batch (tiny), so a restarted query resumes from the last
    committed summary. Pair with a checkpointed source for end-to-end
    exactly-once (the summary write is idempotent per batch replay
    only if the source replays the same batch — same contract as any
    foreachBatch parquet upsert)."""

    def __init__(self, state_path: str, item_col: str, m: int = 512) -> None:
        self.state_path = state_path
        self.item_col = item_col
        self.m = m

    def _load_state(self) -> "pd.DataFrame":
        import pandas as pd

        if os.path.exists(self.state_path):
            return pd.read_parquet(self.state_path)
        return pd.DataFrame({"item": pd.Series([], dtype=str), "count": []})

    def current(self, k: int | None = None) -> "pd.DataFrame":
        st = self._load_state()
        return st.head(k) if k else st

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        summary = (
            batch_top_m(batch_df, self.item_col, self.m)
            .groupBy(self.item_col)
            .agg(F.sum("local_count").alias("count"))
            .withColumnRenamed(self.item_col, "item")
            .toPandas()
        )
        merged = mg_merge(self._load_state(), summary, self.m)
        tmp = self.state_path + ".tmp"
        merged.to_parquet(tmp, index=False)
        os.replace(tmp, self.state_path)


def heavy_hitter_stream(
    stream: DataFrame,
    item_col: str,
    state_path: str,
    checkpoint: str,
    m: int = 512,
):
    """Wire a streaming DataFrame into the MG state maintainer."""
    sink = StreamingHeavyHitters(state_path, item_col, m)
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    ), sink
