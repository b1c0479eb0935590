"""Frequency sketches: distributed heavy hitters + count-min probe.

Beyond-reference scope (the reference has no frequency analytics; this
is the standard corpus-profiling primitive a training-data pipeline
needs: "which tokens / domains / users dominate the corpus?").

Why not just ``groupBy(col).count().orderBy(...).limit(k)``? At 100 TB
the full groupBy shuffles one row per DISTINCT item — for tokens that
is billions of shuffle rows to answer a question about the top ~100.
The classic fix is a two-pass frequency-sketch plan:

1. **Candidate generation (one scan, no shuffle of items):** each Arrow
   batch emits only its local top-``m`` items by count
   (``value_counts().head(m)`` — vectorized, no per-row Python). The
   Misra–Gries/space-saving guarantee transfers: if a global item has
   frequency > N/m, then by averaging over any disjoint batch cover
   some batch has local frequency > N_batch/m, and fewer than ``m``
   items can exceed N_batch/m in one batch — so every true heavy
   hitter appears in some batch summary. The union of summaries is a
   SMALL superset (≤ m × batches rows, independent of distinct-item
   count).
2. **Exact recount (one scan, shuffle only candidate rows):** semi-join
   the corpus against the broadcast candidate set, exact groupBy count
   over survivors, filter/limit. Counts reported are EXACT — the sketch
   only bounds *which* items can win, which is why the DuckDB oracle
   can value-compare the result.

``cms_probe`` is the complementary estimator: Spark's built-in
count-min sketch (``DataFrame.stat.countMinSketch``, JVM partial-agg,
mergeable) probed for candidate counts with the standard one-sided
error bound (est ≥ true, est ≤ true + eps·N w.p. ≥ confidence) —
pytest asserts the bound rather than an oracle (estimates are
sketch-randomized, not portable).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_top_m(df: DataFrame, item_col: str, m: int) -> DataFrame:
    """Per-Arrow-batch local top-``m`` summaries (candidate superset).

    Output: (item, local_count) rows, ≤ ``m`` per batch. Contains every
    item whose GLOBAL frequency exceeds N/m (Misra–Gries pigeonhole —
    see module docstring). ``mapInPandas`` keeps this a single
    narrow scan: nothing shuffles, output size is bounded by
    m × batches regardless of corpus cardinality.
    """
    import pandas as pd

    out_schema = f"{item_col} string, local_count long"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            vc = pdf[item_col].value_counts()
            if len(vc) > m:
                # MG-style truncation, NOT a plain head(m): subtracting
                # the (m+1)-th count from the kept top-m makes this a
                # VALID mergeable MG summary — the subtraction removes
                # ≥ (m+1)× its own error from the summary mass, which
                # is exactly the invariant the mergeable-summaries
                # theorem's telescoping bound needs (a bare head(m)
                # drops error mass "for free" and breaks the merged
                # N/(m+1) guarantee — found by the Hypothesis merge
                # property test). Presence is unaffected: a local count
                # > n/m stays positive since (m+1)·C ≤ n.
                c = vc.iloc[m]
                vc = (vc.head(m) - c)
                vc = vc[vc > 0]
            yield pd.DataFrame(
                {item_col: vc.index.astype(str), "local_count": vc.values}
            )

    return df.select(item_col).mapInPandas(kernel, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 20,
    m: int = 512,
) -> DataFrame:
    """Exact top-``k`` most frequent items via the two-pass sketch plan.

    Correctness contract: results are identical to the full
    ``groupBy.count.orderBy.limit`` as long as every true top-``k``
    item has frequency > N/m — pick ``m`` ≫ k (default 512 vs k=20).
    Ties break on item ascending (deterministic).

    Pass 1 emits ≤ m candidates per batch (no shuffle of the corpus);
    pass 2 recounts exactly over a broadcast-semi-join-pruned scan —
    shuffle volume is O(candidate hits), not O(distinct items).
    """
    candidates = (
        batch_top_m(df, item_col, m).select(item_col).distinct()
    )
    pruned = df.join(F.broadcast(candidates), on=item_col, how="left_semi")
    counts = pruned.groupBy(item_col).agg(F.count("*").alias("freq"))
    return (
        counts.orderBy(F.col("freq").desc(), F.col(item_col).asc())
        .limit(k)
    )


def cms_probe(
    df: DataFrame,
    item_col: str,
    candidates: list[str],
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 7,
) -> dict[str, int]:
    """Count-min-sketch frequency estimates for ``candidates``.

    Builds Spark's JVM count-min sketch over ``item_col`` via the
    built-in ``count_min_sketch`` aggregate (partial aggregation per
    partition, a single fixed-size ~(2/eps)×ln(1/(1-conf))-counter
    binary merged map-side) and probes the deserialized sketch on the
    driver (``org.apache.spark.util.sketch.CountMinSketch`` — public
    Spark API). Guarantee: true ≤ est ≤ true + eps·N with prob ≥
    ``confidence``. Use when the candidate set is known a priori
    (monitoring named domains/users) and an O(1)-memory pass beats the
    exact recount of :func:`heavy_hitters`.
    """
    blob = df.agg(
        F.count_min_sketch(
            item_col, F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    ).first()["cms"]
    jvm = df.sparkSession._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(blob))
    )
    return {c: sketch.estimateCount(c) for c in candidates}
