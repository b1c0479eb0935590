"""MLlib-trained IVF index: k-means cell assignment for the ANN stack.

``similarity.ivf_topk_join`` probes an inverted-file index built from
ANY label column; the quality of the index IS the quality of those
labels (cells must group geometrically-close vectors or probing
nprobe cells misses true neighbors). This module trains the cells
properly with Spark MLlib's distributed k-means (Lloyd's algorithm:
each iteration is one broadcast of k centroids + one map-side
assignment + one reduce of per-cell sums — the standard scale form,
nothing collected to the driver but k·dim doubles).

Spark-first notes: ``array_to_vector`` is a JVM expression (no Python
in the conversion), MLlib k-means is JVM codegen end-to-end, and the
returned assignment frame drops straight into ``ivf_build_centroids``
/ ``ivf_topk_join`` — the index build composes with the existing
operators instead of duplicating them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_assign(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    label_col: str = "label",
    seed: int = 7,
    max_iter: int = 20,
) -> DataFrame:
    """``df`` with ``label_col`` REPLACED by the trained k-means cell id.

    One fit (≤ ``max_iter`` Lloyd iterations over the corpus) + one
    map-only transform. Deterministic for a fixed seed.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        k=k, seed=seed, maxIter=max_iter, featuresCol="__features"
    ).fit(feats)
    out = model.transform(feats)
    return out.drop(label_col, "__features").withColumnRenamed(
        "prediction", label_col
    )


def train_ivf(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    seed: int = 7,
) -> tuple[DataFrame, DataFrame]:
    """(labeled corpus, centroid table) ready for ``ivf_topk_join``.

    The centroid table is derived from the assignments with the
    existing ``ivf_build_centroids`` (mean per cell) so downstream
    probing uses exactly the same centroid definition the index was
    built with."""
    from financial_data_pipeline_spark.operators.similarity import (
        ivf_build_centroids,
    )

    labeled = kmeans_assign(df, k, vec_col, label_col, seed)
    centroids = ivf_build_centroids(labeled, vec_col, label_col)
    return labeled, centroids
