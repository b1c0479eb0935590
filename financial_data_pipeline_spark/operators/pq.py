"""Product quantization (PQ) for ANN at memory scale.

The int8 scalar quantizer (``similarity.quantize_codes``) shrinks each
DIMENSION to a byte; product quantization (Jégou et al. 2011,
*Product Quantization for Nearest Neighbor Search*) shrinks each
SUBVECTOR to a byte: split the vector into ``m`` subspaces, learn
``k ≤ 256`` centroids per subspace, store each vector as ``m`` cell
ids — dim·4 bytes become m bytes (64-dim float → 4 bytes at m=4),
and query distance becomes ``m`` table lookups (ADC: asymmetric
distance computation) instead of a dim-length fold.

Spark-first shapes, everything JVM codegen:

- **train**: centroids are per-(subspace, cell) mean subvectors — one
  posexplode + component aggregate, exactly the
  ``ivf_build_centroids`` shuffle. Cell assignment for training is
  pluggable: the deterministic default tiles each subspace by its
  first component (``ntile`` per subspace — reproducible across
  engines/partitionings, so the oracle can rebuild the codebook
  bit-for-bit); ``ml_ann.train_ivf``-style k-means cells drop in for
  production (pytest-verified recall dominance over random cells).
- **encode**: corpus × (m·k ≤ 1024)-row broadcast join, argmin via
  ``min_by`` — no Python, no driver collect.
- **search**: the query's LUT (m·k squared-distance contributions) is
  a tiny broadcast; candidate ADC distance is one join + sum per
  (id, subspace) row; top-``rerank_k`` candidates rerank on exact
  full-precision L2 fetched by id (the standard PQ + rerank recipe;
  the big corpus scan reads m bytes per row, never the vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _subvec(vec_col: str, sub: int, d_sub: int):
    return F.slice(F.col(vec_col), sub * d_sub + 1, d_sub)


def subvector_rows(
    df: DataFrame, m: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, sub, sv): one row per vector per subspace. Requires the
    dimension to be divisible by ``m`` (checked on the first row)."""
    dim = df.select(F.size(vec_col)).first()[0]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    subs = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"), _subvec(vec_col, s, d_sub).alias("sv")
            )
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col).alias("id"), F.explode(subs).alias("x")).select(
        "id", "x.sub", "x.sv"
    )


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic codebook: per subspace, ``ntile(k)`` over the
    subvector's first component (ties by id) buckets the corpus into
    ``k`` cells; the centroid is the cell's mean subvector. Captures
    the leading axis of variance per subspace — enough structure for
    ADC to rank meaningfully — while staying engine-reproducible
    (RNG-free, partitioning-independent). Returns (sub, cell,
    centroid)."""
    sv = subvector_rows(df, m, vec_col, id_col)
    w = Window.partitionBy("sub").orderBy(
        F.col("sv").getItem(0).asc(), F.col("id").asc()
    )
    cells = sv.select(
        "sub", "sv", (F.ntile(k).over(w) - 1).alias("cell")
    )
    comp = cells.select(
        "sub", "cell", F.posexplode("sv").alias("pos", "v")
    ).groupBy("sub", "cell", "pos").agg(F.avg("v").alias("c"))
    return (
        comp.groupBy("sub", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "sub",
            "cell",
            F.transform("pc", lambda s: s["c"]).alias("centroid"),
        )
    )


def _sqdist(a, b):
    """Σ (a_i − b_i)² as a codegen fold over zipped arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    df: DataFrame,
    centroids: DataFrame,
    m: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes): each vector's nearest cell per subspace — a
    broadcast join against the (m·k)-row codebook + ``min_by`` argmin,
    codes ordered by subspace."""
    sv = subvector_rows(df, m, vec_col, id_col)
    joined = sv.join(F.broadcast(centroids), "sub")
    best = joined.groupBy("id", "sub").agg(
        F.min_by("cell", F.struct(_sqdist("sv", "centroid"), "cell")).alias(
            "code"
        )
    )
    return (
        best.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("sc"))
        .select(
            F.col("id").alias(id_col),
            F.transform("sc", lambda s: s["code"]).alias("codes"),
        )
    )


def pq_topk(
    codes: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    rerank_df: DataFrame,
    m: int = 4,
    k: int = 10,
    rerank_k: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC search + exact rerank: LUT = squared distance from each
    query subvector to every centroid (m·k rows, broadcast); candidate
    distance = Σ LUT[sub, codes[sub]]; the ``rerank_k`` best candidates
    join their full-precision vectors and rank by exact L2. Returns
    (id, adc_dist, l2_dist) top-``k``."""
    dim = len(query_vec)
    d_sub = dim // m
    q = F.lit([float(v) for v in query_vec])  # one Literal node (r9)
    lut = centroids.select(
        "sub",
        "cell",
        _sqdist(
            F.slice(q, F.col("sub") * d_sub + 1, d_sub), F.col("centroid")
        ).alias("d"),
    )
    cand = (
        codes.select(
            id_col, F.posexplode("codes").alias("sub", "cell")
        )
        .join(F.broadcast(lut), ["sub", "cell"])
        .groupBy(id_col)
        .agg(F.sum("d").alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(rerank_k)
    )
    exact = cand.join(rerank_df.select(id_col, vec_col), id_col).select(
        id_col,
        "adc_dist",
        _sqdist(
            F.col(vec_col),
            F.lit([float(v) for v in query_vec]),  # one Literal node (r9)
        ).alias("l2_dist"),
    )
    return exact.orderBy(F.asc("l2_dist"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# IVF-PQ (residual quantization within coarse cells — the IVFADC design)
# ---------------------------------------------------------------------------


def _vec_sub(a, b):
    return F.zip_with(a, b, lambda x, y: x - y)


def ivfpq_build(
    labeled: DataFrame,
    cell_centroids: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> tuple[DataFrame, DataFrame]:
    """(codes, pq_centroids) for the IVFADC layout (Jégou et al. §IV):
    PQ is trained and applied on RESIDUALS ``vec − cell_centroid`` —
    residuals concentrate around zero, so one shared m×k codebook
    covers every cell far better than raw-vector PQ at equal bytes.

    ``labeled`` carries the coarse cell id (``kmeans_assign`` or any
    assignment); ``cell_centroids`` is the (label, centroid) frame
    (``ivf_build_centroids``). Codes rows are (id, label, codes) —
    label rides along so the search scan can prune by pushed-down
    ``label IN (probes)`` before touching codes."""
    resid = labeled.join(
        F.broadcast(cell_centroids), label_col
    ).select(
        id_col,
        label_col,
        _vec_sub(F.col(vec_col), F.col("centroid")).alias("__resid"),
    )
    pq_cent = pq_train(resid, m, k, vec_col="__resid", id_col=id_col)
    codes = pq_encode(resid, pq_cent, m, vec_col="__resid", id_col=id_col)
    codes = codes.join(
        labeled.select(id_col, label_col), id_col
    )
    return codes, pq_cent


def ivfpq_topk(
    codes: DataFrame,
    cell_centroids: DataFrame,
    pq_centroids: DataFrame,
    query_vec: list[float],
    rerank_df: DataFrame,
    m: int = 4,
    k: int = 10,
    nprobe: int = 2,
    rerank_k: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """IVFADC search: probe the ``nprobe`` nearest cells (tiny centroid
    frame, driver probe like ``ivf_topk``), build ONE LUT per probed
    cell from the query's RESIDUAL against that cell (nprobe·m·k rows,
    broadcast), ADC-rank the probed cells' codes, exact-L2 rerank the
    shortlist on full-precision vectors. The big scan reads (label,
    m bytes) per row and is pruned to the probed cells before any
    arithmetic."""
    q = [float(v) for v in query_vec]
    dim = len(q)
    d_sub = dim // m
    qcol = F.lit([float(v) for v in q])  # one Literal node (r9)
    probes = [
        r[0]
        for r in cell_centroids.select(
            label_col, _sqdist(F.col("centroid"), qcol).alias("d")
        )
        .orderBy(F.asc("d"), F.asc(label_col))
        .limit(nprobe)
        .collect()
    ]
    # per-probed-cell LUT on the residual query
    resid_q = cell_centroids.filter(F.col(label_col).isin(probes)).select(
        label_col, _vec_sub(qcol, F.col("centroid")).alias("rq")
    )
    lut = resid_q.crossJoin(F.broadcast(pq_centroids)).select(
        label_col,
        "sub",
        "cell",
        _sqdist(
            F.slice(F.col("rq"), F.col("sub") * d_sub + 1, d_sub),
            F.col("centroid"),
        ).alias("d"),
    )
    cand = (
        codes.filter(F.col(label_col).isin(probes))
        .select(id_col, label_col, F.posexplode("codes").alias("sub", "cell"))
        .join(F.broadcast(lut), [label_col, "sub", "cell"])
        .groupBy(id_col)
        .agg(F.sum("d").alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(rerank_k)
    )
    exact = cand.join(rerank_df.select(id_col, vec_col), id_col).select(
        id_col,
        "adc_dist",
        _sqdist(F.col(vec_col), qcol).alias("l2_dist"),
    )
    return exact.orderBy(F.asc("l2_dist"), F.asc(id_col)).limit(k)
