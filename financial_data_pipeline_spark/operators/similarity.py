"""Similarity search over embedding columns (beyond-reference scope).

Brute-force cosine top-k as the exact baseline, an IVF (inverted-file)
probe-limited variant as the scale path, and threshold pair-joins for
embedding near-dup detection. Embeddings are ``array<float>`` columns
(driver ``embeddings`` table: vec_id, embedding float[64], label).

All dot products are computed with ``zip_with`` + ``aggregate``
higher-order functions — JVM-side, no Python. At 1000-executor scale
the brute-force path is a broadcast of the (tiny) query vector and a
single scan; the IVF path prunes the scan to the probed partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    One scan + TakeOrdered(k) — no shuffle of the embedding column.
    Deterministic tiebreak on id.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_build_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """IVF coarse quantizer: per-partition centroid = mean vector.

    Uses ``posexplode`` + groupBy(label, pos) + re-assemble — a single
    shuffle of (label, pos, component) triples.
    """
    dim = df.select(F.size(vec_col)).first()[0]
    exploded = df.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    comp = exploded.groupBy(label_col, "pos").agg(F.avg("v").alias("c"))
    return (
        comp.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            label_col,
            F.transform("pc", lambda s: s["c"]).alias("centroid"),
        )
    )


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest centroids, then exact
    cosine within those partitions only.

    The centroid table is tiny (one row per coarse cell) → the probe
    set is computed driver-side; the big scan is pruned by a pushed-down
    ``label IN (…)`` filter before any vector math runs.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = [
        r[0]
        for r in centroids.select(
            label_col, cosine(F.col("centroid"), q).alias("s")
        )
        .orderBy(F.desc("s"))
        .limit(nprobe)
        .collect()
    ]
    return brute_force_topk(
        df.filter(F.col(label_col).isin(probe)), query_vec, k, vec_col, id_col
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine ≥ threshold).

    With ``block_col`` (e.g. an LSH bucket or IVF cell), the self-join
    is restricted to same-block pairs — the 100 TB path. Without it,
    full O(n²) (small corpora / verification only).
    """
    sel = [F.col(id_col), F.col(vec_col)] + (
        [F.col(block_col)] if block_col else []
    )
    base = df.select(*sel)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_bucket(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(vec · plane_i).

    ``planes`` are fixed (seeded) hyperplanes supplied by the caller so
    the bucketing is deterministic and oracle-reproducible.
    """
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot(vec, pl) >= 0, F.lit(1 << i)).otherwise(0)
    return bucket
