"""End-to-end corpus curation pipeline — the LLM-training-data twin of
``plans/pipeline.run_pipeline_single``.

The reference ships one orchestration front door for its OHLCV surface
(``crypto_pipeline.py:run_pipeline``); this module is the same front
door for the beyond-reference corpus side: language filter → exact
dedup → near-dup canonical keep → Gopher quality rules → benchmark
decontamination → PII redaction (→ optional chunking), composed as ONE
lazy plan with a per-stage attrition report.

Stage semantics are SEQUENTIAL (each relational stage runs on the
previous stage's survivors — deduping docs that a later filter would
drop anyway is the industry-standard order and changes the dup graph),
but the report is still a single action: every doc is labeled with the
first stage that drops it (``dropped_at``) and the counters are
conditional sums over that one labeled frame.

Scale notes (the whole point of the composition):
- lang filter / Gopher rules / PII are map-only row-local expressions —
  they fuse into the scans that the relational stages already do.
- exact dedup shuffles 8-byte content hashes, never text
  (``dedup.exact_dedup``).
- near-dup uses the inverted-index verifier by default
  (``dedup.jaccard_pairs``: docs sharing ≥1 shingle, hot buckets
  capped) and the banded-LSH candidate path when ``use_lsh`` — both
  shuffle ids, not text.
- contamination broadcasts the benchmark's k-gram hashes; the corpus
  side never shuffles (``curation.contamination_overlap``).
- the label joins are id-only left joins against loser/contaminated id
  sets — tiny relative to the corpus, broadcast by AQE when they fit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators import curation, dedup


@dataclass(frozen=True)
class CurationConfig:
    """Knobs for ``curate_corpus`` (mirrors the reference's
    ``PipelineConfig`` pattern — ``plans/config.py``)."""

    lang_keep: tuple[str, ...] | None = None  # None = keep all languages
    exact_dedup: bool = True
    near_dedup: bool = True
    jaccard_threshold: float = 0.5
    shingle_k: int = 3
    use_lsh: bool = False  # banded-LSH candidates instead of inverted index
    minhash_perm: int = 16
    lsh_bands: int = 8
    # optional substring-overlap (winnowing) stage: drop docs sharing
    # >= winnow_min_shared fingerprints with a surviving doc (verbatim
    # passage reuse that whole-doc Jaccard misses); off by default
    substring_dedup: bool = False
    winnow_k: int = 8
    winnow_window: int = 4
    winnow_min_shared: int = 2
    gopher: bool = True
    decontaminate: bool = True
    contamination_k: int = 3
    min_overlap: int = 1
    redact_pii: bool = True
    chunk_size: int | None = None  # tokens per chunk; None = no chunking
    chunk_overlap: int = 0
    gopher_kwargs: dict = field(default_factory=dict)
    # optional NB classifier stage: drop docs whose self-trained
    # Naive-Bayes avg token log-odds (text.nb_class_scores, weak label
    # supplied by the caller) falls below this; None = stage off
    nb_min_score: float | None = None


STAGES = (
    "lang",
    "exact_dup",
    "near_dup",
    "substring_dup",
    "quality",
    "classifier",
    "contaminated",
)


def curation_labels(
    docs: DataFrame,
    config: CurationConfig = CurationConfig(),
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    nb_label: Column | None = None,
) -> DataFrame:
    """``docs`` + ``dropped_at`` (first dropping stage, or NULL=kept).

    ``nb_label``: weak boolean label column for the optional NB
    classifier stage (active when ``config.nb_min_score`` is set).
    Lazy — no action is triggered; callers filter or aggregate it.
    """
    # --- stage 1: language filter (map-only) -----------------------------
    if config.lang_keep is not None:
        lang_fail = ~F.col("lang").isin(*config.lang_keep)
    else:
        lang_fail = F.lit(False)
    s1 = docs.filter(~lang_fail)

    # --- stage 2: exact dedup among stage-1 survivors --------------------
    if config.exact_dedup:
        # Lazy-pin the winner id set (r9, guide §5): it is consumed by
        # TWO independent subtrees — the near-dup stage's s2 semi-join
        # (materialized eagerly at build time inside dedup_clusters)
        # and the exec-time __exact label anti-join — and unpinned the
        # second consumer re-ran the whole groupBy-over-content-hash,
        # i.e. a second full corpus scan + md5 pass. The set is one id
        # per distinct content hash (8 bytes/row at any corpus size).
        winners = (
            dedup.exact_dedup(s1, text_col, id_col)
            .select(id_col)
            .localCheckpoint(eager=False)
        )
        s2 = s1.join(winners, on=id_col, how="left_semi")
    else:
        winners = None
        s2 = s1

    # --- stage 3: near-dup canonical keep among stage-2 survivors --------
    if config.near_dedup:
        if config.use_lsh:
            cand = dedup.lsh_candidates(
                s2,
                text_col,
                id_col,
                num_perm=config.minhash_perm,
                bands=config.lsh_bands,
                k=config.shingle_k,
            )
        else:
            cand = None
        pairs = dedup.jaccard_pairs(
            s2,
            text_col,
            id_col,
            k=config.shingle_k,
            threshold=config.jaccard_threshold,
            candidates=cand,
        )
        clusters = dedup.dedup_clusters(pairs)
        near_losers = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select(F.col("doc_id").alias(id_col))
    else:
        near_losers = None

    # --- stage 3b: substring-overlap dedup among stage-3 survivors -------
    sub_losers = None
    if config.substring_dedup:
        from financial_data_pipeline_spark.operators import winnow

        s3 = (
            s2.join(near_losers, on=id_col, how="left_anti")
            if near_losers is not None
            else s2
        )
        sp = winnow.substring_overlap_pairs(
            s3,
            text_col,
            id_col,
            k=config.winnow_k,
            window=config.winnow_window,
            min_shared=config.winnow_min_shared,
        )
        sclusters = dedup.dedup_clusters(sp.select("id_a", "id_b"))
        sub_losers = sclusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select(F.col("doc_id").alias(id_col))

    # --- stage 4: Gopher quality rules — row-local and therefore set-
    # independent, so the flag is derived join-free on the labeled frame
    # below rather than via a survivor-set computation.

    # --- stage 4b: NB classifier (trained on the FULL input corpus —
    # deterministic and set-independent like gopher) ------------------
    clf_ids = None
    if config.nb_min_score is not None and nb_label is not None:
        from financial_data_pipeline_spark.operators.text import (
            nb_class_scores,
        )

        scores = nb_class_scores(docs, nb_label, text_col, id_col)
        clf_ids = scores.filter(
            F.col("avg_log_odds") < config.nb_min_score
        ).select(id_col)

    # --- stage 5: contamination (per-doc vs benchmark, set-independent) --
    contam_ids = None
    if config.decontaminate and benchmark is not None:
        contam_ids = (
            curation.contamination_overlap(
                docs, benchmark, text_col, id_col, k=config.contamination_k
            )
            .filter(F.col("n_overlap") >= config.min_overlap)
            .select(id_col)
        )

    # --- assemble the label column ---------------------------------------
    out = docs
    if config.gopher:
        out = curation.gopher_rules(out, text_col, **config.gopher_kwargs)
        quality_fail_col = ~F.col("keep")
    else:
        quality_fail_col = F.lit(False)

    def _flag(frame: DataFrame | None, name: str) -> None:
        nonlocal out
        if frame is not None:
            out = out.join(
                frame.withColumn(name, F.lit(True)), on=id_col, how="left"
            )
        else:
            out = out.withColumn(name, F.lit(None).cast("boolean"))

    # __exact flags directly off the WINNERS pin (r10, guide §2.3/§2.4):
    # the former shape joined an anti-join-derived loser-id frame, which
    # put a second s1 id scan + an extra join in the final plan. A doc
    # is an exact loser iff it is absent from winners — and for
    # lang-dropped docs (never in winners, so flagged here) the
    # ``dropped_at`` when-chain has already fired on 'lang', so the
    # label per doc is identical by case order.
    if winners is not None:
        out = out.join(
            winners.withColumn("__exact_w", F.lit(True)), on=id_col, how="left"
        ).withColumn("__exact", F.col("__exact_w").isNull())
    else:
        out = out.withColumn("__exact", F.lit(None).cast("boolean"))
    _flag(near_losers, "__near")
    _flag(sub_losers, "__substr")
    _flag(clf_ids, "__clf")
    _flag(contam_ids, "__contam")

    dropped_at = (
        F.when(lang_fail, F.lit("lang"))
        .when(F.col("__exact"), F.lit("exact_dup"))
        .when(F.col("__near"), F.lit("near_dup"))
        .when(F.col("__substr"), F.lit("substring_dup"))
        .when(quality_fail_col, F.lit("quality"))
        .when(F.col("__clf"), F.lit("classifier"))
        .when(F.col("__contam"), F.lit("contaminated"))
    )
    keep_cols = [*docs.columns, "dropped_at"]
    return out.withColumn("dropped_at", dropped_at).select(*keep_cols)


def curation_report(
    docs: DataFrame,
    config: CurationConfig = CurationConfig(),
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    nb_label: Column | None = None,
) -> DataFrame:
    """ONE-row attrition report over the labeled frame: input size,
    per-stage drop counts, survivors — the corpus twin of
    ``plans/report.report_counters`` (§1.3)."""
    labeled = curation_labels(
        docs, config, benchmark, text_col, id_col, nb_label
    )
    # count(when(...)) not sum(cast): count yields 0 (not NULL) for a
    # stage that drops nothing, e.g. when the stage is toggled off
    agg = [F.count(F.lit(1)).alias("n_input")] + [
        F.count(F.when(F.col("dropped_at") == s, 1)).alias(f"dropped_{s}")
        for s in STAGES
    ]
    return labeled.agg(
        *agg,
        F.count(F.when(F.col("dropped_at").isNull(), 1)).alias("n_kept"),
    )


def curate_corpus(
    docs: DataFrame,
    config: CurationConfig = CurationConfig(),
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    nb_label: Column | None = None,
) -> dict:
    """Run the pipeline; return ``{"df": curated, "labels": labeled,
    "report": one-row report DataFrame}`` — all lazy (the caller
    decides which to act on; the report is a single aggregate job)."""
    labeled = curation_labels(
        docs, config, benchmark, text_col, id_col, nb_label
    )
    kept = labeled.filter(F.col("dropped_at").isNull()).select(*docs.columns)
    if config.redact_pii:
        kept = curation.pii_redact(kept, text_col).select(*docs.columns)
    if config.chunk_size:
        kept = curation.chunk_documents(
            kept,
            text_col=text_col,
            size=config.chunk_size,
            overlap=config.chunk_overlap,
        )
    return {
        "df": kept,
        "labels": labeled,
        "report": curation_report(
            docs, config, benchmark, text_col, id_col, nb_label
        ),
    }
