"""MLlib document-quality classifier (TF-IDF → logistic regression).

The hand-rolled weak-label scorers (``text.nb_class_scores`` Naive
Bayes, ``text.unigram_logprob_score`` perplexity proxy) cover the
no-dependency path; this module is the standard-tooling path a Spark
shop actually runs: hashed TF-IDF features into a distributedly-
trained logistic regression (L-BFGS — each iteration is one gradient
pass, tree-aggregated; nothing driver-side but the coefficient
vector). The fitted model is a map-only transform at scoring time —
at 100 TB the score pass fuses into whatever scan the curation
pipeline already does.

HashingTF (feature hashing) rather than a vocabulary fit: no
vocabulary shuffle, fixed feature width, and streaming-safe scoring —
the same trick the fingerprint/minhash operators use to avoid
corpus-wide dictionaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_quality_pipeline(
    text_col: str = "text",
    label_col: str = "weak_label",
    num_features: int = 1 << 15,
    reg_param: float = 0.01,
    max_iter: int = 30,
):
    """Tokenize → HashingTF → IDF → LogisticRegression pipeline."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__toks", pattern=r"\s+"
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="__tf", numFeatures=num_features
    )
    idf = IDF(inputCol="__tf", outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[tok, tf, idf, lr])


def train_quality_model(
    docs: DataFrame,
    label_col: str = "weak_label",
    text_col: str = "text",
    **kwargs,
):
    """Fit on weak-labeled docs (label ∈ {0.0, 1.0}). Returns the
    PipelineModel; persist with ``model.write().save(path)`` like any
    MLlib artifact."""
    pipe = build_quality_pipeline(text_col, label_col, **kwargs)
    return pipe.fit(docs)


def score_quality(
    model, docs: DataFrame, out_col: str = "quality_prob"
) -> DataFrame:
    """``docs`` + P(high quality) — map-only at scoring time."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    return scored.withColumn(
        out_col, vector_to_array("probability")[1]
    ).drop("__toks", "__tf", "__features", "rawPrediction", "probability", "prediction")
