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


def strip_training_summary(model) -> None:
    """Drop the fitted model's training summary (in place).

    The summary object pins the driver ``SparkSession``, and
    ``ProbabilisticClassificationModel.transform``'s prediction UDF
    captures the whole model into the task closure — so a retained
    summary ships the session to executors. That session is only
    *accidentally* serializable: the first use of ``Observation``
    anywhere in the session instantiates its (non-serializable)
    ``ObservationManager``, after which every subsequent
    ``model.transform`` action dies with ``NotSerializableException``.
    A saved-then-reloaded model never has a summary, which is why the
    bug only bites the train-and-score-in-one-session path. Stripping
    is also what you want at scale regardless: the closure should be
    the coefficient vector, not the training-job bookkeeping.

    Scala's ``private[ml] setSummary`` is public in bytecode, so the
    py4j call is safe; Connect-backed models (no ``_java_obj``) and
    summary-less stages are left untouched.
    """
    stages = getattr(model, "stages", [model])
    for stage in stages:
        jobj = getattr(stage, "_java_obj", None)
        if jobj is None:
            continue
        try:
            if jobj.hasSummary():
                from pyspark import SparkContext

                jvm = SparkContext._active_spark_context._jvm
                jobj.setSummary(jvm.scala.Option.empty())
        except Exception:
            continue


def train_quality_model(
    docs: DataFrame,
    label_col: str = "weak_label",
    text_col: str = "text",
    **kwargs,
):
    """Fit on weak-labeled docs (label ∈ {0.0, 1.0}). Returns the
    PipelineModel; persist with ``model.write().save(path)`` like any
    MLlib artifact. The training summary is stripped before returning
    (see ``strip_training_summary``)."""
    pipe = build_quality_pipeline(text_col, label_col, **kwargs)
    model = pipe.fit(docs)
    strip_training_summary(model)
    return model


def score_quality(
    model, docs: DataFrame, out_col: str = "quality_prob"
) -> DataFrame:
    """``docs`` + P(high quality) — map-only at scoring time."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    return scored.withColumn(
        out_col, vector_to_array("probability")[1]
    ).drop("__toks", "__tf", "__features", "rawPrediction", "probability", "prediction")
