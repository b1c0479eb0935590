"""Corpus-curation operator tests: Gopher-style quality rules, PII
redaction, contamination check, stratified sampling, mixture planning."""

import pyspark.sql.functions as F
import pytest

from financial_data_pipeline_spark.operators.curation import (
    SAMPLE_MOD,
    contamination_overlap,
    decontaminate,
    gopher_filter,
    gopher_rules,
    mixture_plan,
    pii_redact,
    stratified_sample,
)
from financial_data_pipeline_spark.sources.adapters import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def _doc_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_flag_crafted_docs(spark):
    good = "alpha " * 30  # 30 words, mean len 5
    short = "tiny doc"  # fails word count
    symbols = "# " * 40  # symbol per word → fails symbol ratio
    long_words = "extraordinarily " * 25  # mean word len 16 → fails
    bullets = "\n".join("- item %d" % i for i in range(10))  # all bullets
    repeated = "\n".join(["same line here"] * 10)  # 90% dup lines
    df = _doc_df(
        spark,
        [(0, good), (1, short), (2, symbols), (3, long_words), (4, bullets),
         (5, repeated)],
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert out[0]["keep"]
    assert not out[1]["rule_word_count"]
    assert not out[2]["rule_symbol"]
    assert not out[3]["rule_word_len"]
    assert not out[4]["rule_bullet"] and not out[4]["keep"]
    assert not out[5]["rule_dup_lines"] and not out[5]["keep"]
    assert out[5]["dup_line_frac"] == pytest.approx(0.9)
    kept = gopher_filter(df).select("doc_id").collect()
    assert [r.doc_id for r in kept] == [0]
    # no temp columns leak
    assert set(gopher_filter(df).columns) == {"doc_id", "text"}


def test_gopher_mean_word_len_exact(spark):
    df = _doc_df(spark, [(0, "ab abcd abcdef")])  # lens 2,4,6 → mean 4
    row = gopher_rules(df, min_words=1).first()
    assert row["mean_word_len"] == pytest.approx(4.0)
    assert row["n_words"] == 3


def test_pii_redact_all_classes(spark):
    df = _doc_df(
        spark,
        [
            (0, "mail a.user+x@sub.example.org now"),
            (1, "host 192.168.001.1 up"),
            (2, "call +44 20 7946 0958 today"),
            (3, "clean text only"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    assert out[0]["n_emails"] == 1 and "<EMAIL>" in out[0]["text"]
    assert "@" not in out[0]["text"]
    assert out[1]["n_ips"] == 1 and out[1]["text"] == "host <IP> up"
    assert out[2]["n_phones"] == 1 and out[2]["text"] == "call <PHONE> today"
    assert out[3]["text"] == "clean text only"
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) == (0, 0, 0)


def test_pii_email_swallowed_before_phone(spark):
    # digits inside an email must not survive as a phone match
    df = _doc_df(spark, [(0, "x +1234567890@example.com y")])
    row = pii_redact(df).first()
    assert row["text"] == "x <EMAIL> y"


def test_contamination_overlap_and_decontaminate(spark):
    bench = _doc_df(spark, [(100, "the quick brown fox jumps high")])
    corpus = _doc_df(
        spark,
        [
            (0, "a quick brown fox appears"),  # shares 'quick brown fox'
            (1, "totally unrelated words here"),
            (2, "the quick brown fox jumps high again"),  # shares many
        ],
    )
    hits = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination_overlap(corpus, bench, k=3).collect()
    }
    assert hits[0] == 1
    assert hits[2] >= 3
    assert 1 not in hits
    clean = decontaminate(corpus, bench, k=3)
    assert [r.doc_id for r in clean.select("doc_id").collect()] == [1]


def test_stratified_sample_membership_and_rates(docs):
    rates = {"src0": 0.0, "src1": 1.0}
    out = stratified_sample(docs, rates, default_rate=0.5)
    pdf = out.select("doc_id", "source").toPandas()
    assert (pdf["source"] != "src0").all()
    n_src1 = docs.filter(F.col("source") == "src1").count()
    assert (pdf["source"] == "src1").sum() == n_src1
    # determinism: same membership on re-run
    pdf2 = stratified_sample(docs, rates, default_rate=0.5).toPandas()
    assert sorted(pdf["doc_id"]) == sorted(pdf2["doc_id"])
    # monotonicity: higher rate ⊇ lower rate per stratum
    lo = stratified_sample(docs, {}, default_rate=0.2)
    hi = stratified_sample(docs, {}, default_rate=0.6)
    lo_ids = {r.doc_id for r in lo.select("doc_id").collect()}
    hi_ids = {r.doc_id for r in hi.select("doc_id").collect()}
    assert lo_ids <= hi_ids


def test_stratified_sample_no_shuffle(docs):
    plan = (
        stratified_sample(docs, {"src0": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_mixture_plan_rates(docs):
    out = mixture_plan(
        docs, {"src0": 0.7, "src1": 0.3}, token_budget=100
    ).toPandas()
    assert set(out["source"]) == {"src0", "src1"}
    out = out.set_index("source")
    for s, w in [("src0", 0.7), ("src1", 0.3)]:
        tokens = out.loc[s, "tokens"]
        expect = min(1.0, w * 100 / tokens)
        assert out.loc[s, "rate"] == pytest.approx(expect, abs=1e-6)
        assert out.loc[s, "expected_tokens"] == pytest.approx(
            expect * tokens, abs=0.01
        )
    # huge budget → whole stratum taken (rate capped at 1)
    capped = mixture_plan(docs, {"src0": 1.0}, token_budget=10**9).toPandas()
    assert (capped["rate"] == 1.0).all()
    assert (capped["expected_tokens"] == capped["tokens"]).all()


def test_sample_bucket_range(docs):
    from financial_data_pipeline_spark.operators.curation import _sample_bucket

    row = docs.select(
        F.min(_sample_bucket(F.col("doc_id"))).alias("lo"),
        F.max(_sample_bucket(F.col("doc_id"))).alias("hi"),
    ).first()
    assert 0 <= row["lo"] and row["hi"] < SAMPLE_MOD


def test_exact_k_sample_deterministic_topk(docs):
    from financial_data_pipeline_spark.operators.curation import exact_k_sample

    s1 = [r.doc_id for r in exact_k_sample(docs, 20).select("doc_id").collect()]
    s2 = [r.doc_id for r in exact_k_sample(docs, 20).select("doc_id").collect()]
    assert s1 == s2 and len(s1) == 20 == len(set(s1))
    # nested: top-10 is a prefix of top-20 (hash ranking is global)
    s_small = [
        r.doc_id for r in exact_k_sample(docs, 10).select("doc_id").collect()
    ]
    assert s1[:10] == s_small
    # executes as top-k, not a global sort
    plan = (
        exact_k_sample(docs, 20)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_length_percentiles_matches_pandas(docs):
    from financial_data_pipeline_spark.operators.curation import (
        length_percentiles,
    )

    out = length_percentiles(docs).toPandas().set_index("source")
    pdf = docs.select("source", "text").toPandas()
    pdf["n_tokens"] = pdf["text"].str.strip().str.split().str.len()
    for src, grp in pdf.groupby("source"):
        assert out.loc[src, "n_docs"] == len(grp)
        assert out.loc[src, "p50"] == pytest.approx(
            grp["n_tokens"].quantile(0.5), abs=1e-6
        )
        assert out.loc[src, "p95"] == pytest.approx(
            grp["n_tokens"].quantile(0.95), abs=1e-6
        )


def test_approx_percentiles_close_to_exact(spark):
    """percentile_approx per-source length quantiles land within 5% of
    the exact interpolated percentiles (the documented 100 TB swap)."""
    from financial_data_pipeline_spark.plans.driver_queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    exact = {
        r["source"]: r
        for r in QUERIES["corpus_length_stats"](spark, sf_dir).collect()
    }
    approx = {
        r["source"]: r
        for r in QUERIES["corpus_length_stats_approx"](spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for src, e in exact.items():
        a = approx[src]
        assert a["n_docs"] == e["n_docs"]
        # the 5% bound is computed inside the query frame (the oracle
        # compares it to literal TRUE); cross-check its exact side
        # against the independent exact query
        assert a["p50_exact"] == e["p50"] and a["p95_exact"] == e["p95"]
        assert a["p50_within"] and a["p95_within"]


def test_curate_corpus_end_to_end(spark):
    """The full curation pipeline front door: sequential stage
    attrition adds up, kept set matches the labels, PII is redacted,
    chunking bounds hold."""
    from financial_data_pipeline_spark.plans.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    # plant: exact copies of every 10th doc, one PII-bearing doc
    copies = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    corpus = docs.unionByName(copies).withColumn(
        "text",
        F.when(
            F.col("doc_id") == 1,
            F.concat(F.col("text"), F.lit(" mail me bob@example.com")),
        ).otherwise(F.col("text")),
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    cfg = CurationConfig(lang_keep=("en", "de", "fr", "es"), contamination_k=3)
    out = curate_corpus(corpus, cfg, bench)

    rep = out["report"].first().asDict()
    n_input = corpus.count()
    assert rep["n_input"] == n_input
    drops = sum(v for k, v in rep.items() if k.startswith("dropped_"))
    assert drops + rep["n_kept"] == n_input
    # planted exact copies: dropped at lang (zh originals) or exact_dup,
    # never kept
    kept_ids = {r.doc_id for r in out["df"].select("doc_id").collect()}
    assert not any(i >= 100000 for i in kept_ids)
    assert rep["dropped_exact_dup"] > 0
    assert len(kept_ids) == rep["n_kept"]
    # labels agree with the kept frame
    labeled_kept = {
        r.doc_id
        for r in out["labels"].filter(F.col("dropped_at").isNull()).collect()
    }
    assert labeled_kept == kept_ids
    # PII redaction applied to survivors
    if 1 in kept_ids:
        t = out["df"].filter(F.col("doc_id") == 1).first()["text"]
        assert "bob@example.com" not in t and "<EMAIL>" in t

    # chunked variant: every chunk within size, all from kept docs
    cfg2 = CurationConfig(
        lang_keep=("en", "de", "fr", "es"),
        contamination_k=3,
        chunk_size=200,
        chunk_overlap=50,
    )
    chunks = curate_corpus(corpus, cfg2, bench)["df"]
    rows = chunks.select("doc_id", "chunk_len").collect()
    assert rows and all(r.chunk_len <= 200 for r in rows)
    assert {r.doc_id for r in rows} <= kept_ids


def test_curation_config_stage_toggles(spark):
    """Disabled stages drop nothing; the LSH candidate path labels the
    same docs as the inverted-index path whenever its measured pair
    recall is 1 (it is at this SF — see query lsh_pair_recall)."""
    from financial_data_pipeline_spark.plans.curation_pipeline import (
        CurationConfig,
        curation_report,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 100000
        )
    )

    off = CurationConfig(
        lang_keep=None,
        exact_dedup=False,
        near_dedup=False,
        gopher=False,
        decontaminate=False,
        redact_pii=False,
    )
    rep = curation_report(corpus, off).first().asDict()
    assert rep["n_kept"] == rep["n_input"]
    assert all(v == 0 for k, v in rep.items() if k.startswith("dropped_"))

    base = CurationConfig(lang_keep=("en",))
    lsh = CurationConfig(lang_keep=("en",), use_lsh=True)
    r_base = curation_report(corpus, base).first().asDict()
    r_lsh = curation_report(corpus, lsh).first().asDict()
    assert r_base == r_lsh


def test_nb_classifier_stage_drops_low_scorers(spark):
    """With nb_min_score set, docs whose self-trained NB log-odds fall
    below the threshold drop at 'classifier' — unless an earlier stage
    already claimed them (precedence)."""
    from financial_data_pipeline_spark.operators.text import nb_class_scores
    from financial_data_pipeline_spark.plans.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    label = F.col("lang") == "en"
    cfg = CurationConfig(
        lang_keep=None,
        decontaminate=False,
        nb_min_score=0.0,
    )
    out = curate_corpus(docs, cfg, nb_label=label)
    rep = out["report"].first().asDict()
    assert rep["dropped_classifier"] > 0
    assert rep["n_input"] == rep["n_kept"] + sum(
        v for k, v in rep.items() if k.startswith("dropped_")
    )
    # every kept doc scores >= threshold
    kept_ids = {r.doc_id for r in out["df"].select("doc_id").collect()}
    low = {
        r.doc_id
        for r in nb_class_scores(docs, label)
        .filter(F.col("avg_log_odds") < 0.0)
        .collect()
    }
    assert kept_ids.isdisjoint(low)


def test_chunk_udtf_matches_dataframe_operator(spark):
    """SQL-front-door UDTF ≡ the JVM chunk_documents operator,
    row-for-row, on real documents."""
    from financial_data_pipeline_spark.functions.udtfs import register_udtfs
    from financial_data_pipeline_spark.operators.curation import chunk_documents
    from financial_data_pipeline_spark.sources.adapters import load_table

    register_udtfs(spark)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("udtf_docs")
    via_sql = spark.sql(
        "SELECT d.doc_id, c.chunk_off, c.chunk_text, c.chunk_len "
        "FROM udtf_docs d, LATERAL chunk_docs(d.text, 120, 30) c"
    )
    via_df = chunk_documents(docs, size=120, overlap=30).select(
        "doc_id", "chunk_off", "chunk_text", "chunk_len"
    )
    assert via_sql.exceptAll(via_df).count() == 0
    assert via_df.exceptAll(via_sql).count() == 0
    assert via_df.count() > 0


def test_cluster_balanced_sample_quota_and_determinism(spark):
    from financial_data_pipeline_spark.operators.curation import (
        cluster_balanced_sample,
    )
    from financial_data_pipeline_spark.sources.adapters import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = cluster_balanced_sample(emb, per_cluster=3)
    per = {r.label: r.n for r in
           got.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r.label: r.n for r in
             emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {l: min(3, n) for l, n in sizes.items()}
    # repartitioning does not change the chosen rows
    again = cluster_balanced_sample(emb.repartition(7), per_cluster=3)
    assert sorted(r.vec_id for r in got.select("vec_id").collect()) == \
           sorted(r.vec_id for r in again.select("vec_id").collect())


def test_compression_ratio_separates_repetition_from_prose(spark):
    from financial_data_pipeline_spark.operators.curation import (
        compression_ratio,
    )

    rows = [
        (1, "spam " * 400),  # template repetition: compresses hard
        (2, "The quarterly report outlines revenue growth across the "
            "region, with notable gains in logistics and a cautious "
            "outlook for commodity prices going into next year." * 3),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.compression_ratio
           for r in compression_ratio(df).collect()}
    assert got[1] < 0.05 < got[2] < 1.0
    assert got[3] == 1.0 and got[4] == 1.0
    # differential vs direct zlib on the same bytes
    import zlib

    raw = rows[1][1].encode()
    assert abs(got[2] - len(zlib.compress(raw, 6)) / len(raw)) < 1e-12


def test_temperature_mixture_plan_regimes(spark):
    from financial_data_pipeline_spark.operators.curation import (
        temperature_mixture_plan,
    )

    rows = [(i, "w " * 100, "big") for i in range(90)] + \
           [(100 + i, "w " * 100, "small") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    # alpha=1: proportional to token mass
    prop = {r.source: r.weight
            for r in temperature_mixture_plan(df, 10_000, alpha=1.0,
                                              ).collect()}
    assert abs(prop["big"] - 0.9) < 1e-6 and abs(prop["small"] - 0.1) < 1e-6
    # alpha=0: uniform regardless of mass
    uni = {r.source: r.weight
           for r in temperature_mixture_plan(df, 10_000, alpha=0.0).collect()}
    assert abs(uni["big"] - 0.5) < 1e-6 and abs(uni["small"] - 0.5) < 1e-6
    # intermediate alpha up-samples the small domain
    mid = {r.source: r.weight
           for r in temperature_mixture_plan(df, 10_000, alpha=0.3).collect()}
    assert 0.1 < mid["small"] < 0.5
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_mixture_plan(df, 10_000, alpha=-1)


def test_shuffle_shards_permutation_properties(spark):
    from financial_data_pipeline_spark.operators.curation import (
        shuffle_shards,
    )
    from financial_data_pipeline_spark.sources.adapters import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    sharded = shuffle_shards(docs, n_shards=4, seed=0)
    # exhaustive partition: every doc in exactly one shard
    assert sharded.count() == n
    assert sharded.select("doc_id").distinct().count() == n
    # per-shard positions are a contiguous 0..k-1 permutation
    per = sharded.groupBy("shard").agg(
        F.min("shard_pos").alias("lo"), F.max("shard_pos").alias("hi"),
        F.countDistinct("shard_pos").alias("d"), F.count(F.lit(1)).alias("k"),
    ).collect()
    assert len(per) == 4
    for r in per:
        assert (r.lo, r.hi, r.d) == (0, r.k - 1, r.k)
    # reproducible across partitionings; different seed reshuffles
    again = shuffle_shards(docs.repartition(13), n_shards=4, seed=0)
    a = sorted(map(tuple, sharded.select("doc_id", "shard", "shard_pos").collect()))
    b = sorted(map(tuple, again.select("doc_id", "shard", "shard_pos").collect()))
    assert a == b
    other = shuffle_shards(docs, n_shards=4, seed=1)
    c = sorted(map(tuple, other.select("doc_id", "shard", "shard_pos").collect()))
    assert a != c
    # not order-preserving: training order decorrelates from doc_id
    head = sharded.filter("shard = 0").orderBy("shard_pos").limit(10)
    ids = [r.doc_id for r in head.select("doc_id").collect()]
    assert ids != sorted(ids)


def test_curation_substring_stage_catches_passage_reuse(spark):
    """Docs that are NOT whole-doc near-dups but share a long verbatim
    passage drop at the substring stage; stage order holds (a near-dup
    never reaches the substring stage)."""
    from financial_data_pipeline_spark.plans.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    passage = " ".join(f"shared{i}" for i in range(14))
    mk = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    rows = [
        (1, mk("a", 40) + " " + passage, "en", "s1"),
        (2, mk("b", 40) + " " + passage, "en", "s1"),  # passage reuse only
        (3, mk("c", 45), "en", "s1"),
        (4, mk("c", 45), "en", "s1"),  # exact dup of 3
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    cfg = CurationConfig(
        substring_dedup=True,
        winnow_min_shared=1,
        near_dedup=True,
        gopher=False,
        decontaminate=False,
        redact_pii=False,
    )
    out = curate_corpus(docs, cfg)
    labels = {r.doc_id: r.dropped_at for r in out["labels"].collect()}
    assert labels[1] is None
    assert labels[2] == "substring_dup"
    assert labels[3] is None
    assert labels[4] == "exact_dup"
    rep = out["report"].first()
    assert rep["dropped_substring_dup"] == 1 and rep["n_kept"] == 2


def test_weighted_k_sample_props(spark):
    """A-ES weighted sampling: deterministic under repartition, k rows,
    heavier rows win more often (2x weight ~> 2x inclusion on average),
    zero/null weights excluded."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.curation import weighted_k_sample

    n = 2000
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            # ids < 1000 weight 1, >= 1000 weight 9
            "wt": np.where(np.arange(n) < 1000, 1.0, 9.0),
        }
    )
    pdf.loc[0, "wt"] = 0.0  # excluded
    df = spark.createDataFrame(pdf)
    s1 = weighted_k_sample(df, 200, "wt").toPandas()
    s2 = weighted_k_sample(df.repartition(13), 200, "wt").toPandas()
    assert len(s1) == 200
    assert sorted(s1.doc_id) == sorted(s2.doc_id)  # layout-independent
    assert 0 not in set(s1.doc_id)
    heavy = (s1.doc_id >= 1000).sum()
    # E[heavy] ~ 9/10 of the sample; deterministic hash, loose bound
    assert heavy > 150
