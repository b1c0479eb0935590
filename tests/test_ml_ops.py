"""MLlib integrations: k-means-trained IVF recall dominance and the
TF-IDF + logistic-regression quality classifier."""

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators.ml_ann import kmeans_assign, train_ivf
from financial_data_pipeline_spark.operators.ml_quality import (
    score_quality,
    train_quality_model,
)
from financial_data_pipeline_spark.sources.adapters import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_kmeans_assign_produces_k_cells(spark, emb):
    out = kmeans_assign(emb, k=8)
    labels = [r.label for r in out.select("label").distinct().collect()]
    assert len(labels) == 8
    assert set(out.columns) == set(emb.columns)


def test_trained_ivf_beats_random_cells(spark, emb):
    """The measured justification for training the index: IVF recall
    with k-means cells must dominate IVF over random cell assignment
    at the same nprobe (random cells ≈ nprobe/k recall)."""
    from financial_data_pipeline_spark.operators.similarity import (
        ivf_build_centroids,
        ivf_topk_join,
        knn_join,
        recall_at_k,
    )

    queries = emb.filter(F.col("vec_id") < 8)
    exact = knn_join(emb, queries, k=10)

    labeled, centroids = train_ivf(emb, k=8)
    trained = ivf_topk_join(labeled, centroids, queries, k=10, nprobe=2)
    r_trained = (
        recall_at_k(exact, trained, k=10).agg(F.avg("recall")).first()[0]
    )

    random_cells = emb.withColumn("label", (F.xxhash64("vec_id") % 8 + 8) % 8)
    rc = ivf_build_centroids(random_cells)
    r_random = (
        recall_at_k(
            exact, ivf_topk_join(random_cells, rc, queries, k=10, nprobe=2), k=10
        )
        .agg(F.avg("recall"))
        .first()[0]
    )
    assert r_trained > r_random, (r_trained, r_random)


@pytest.fixture(scope="module")
def weak_docs(spark):
    good = [(i, "clean fluent sentence with informative words", 1.0) for i in range(60)]
    bad = [(i + 100, "zzz qqq spam garbage noise junk", 0.0) for i in range(60)]
    return spark.createDataFrame(
        good + bad, ["doc_id", "text", "weak_label"]
    ).cache()


def test_quality_model_separates_planted_classes(spark, weak_docs):
    model = train_quality_model(weak_docs)
    scored = score_quality(model, weak_docs)
    agg = (
        scored.groupBy("weak_label")
        .agg(F.avg("quality_prob").alias("p"))
        .collect()
    )
    by_label = {r.weak_label: r.p for r in agg}
    assert by_label[1.0] > 0.9 > 0.1 > by_label[0.0]
    assert "quality_prob" in scored.columns
    assert "__features" not in scored.columns


def test_quality_model_scores_unseen_docs(spark, weak_docs):
    model = train_quality_model(weak_docs)
    unseen = spark.createDataFrame(
        [(1, "informative fluent clean text"), (2, "junk spam zzz")],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r.quality_prob
        for r in score_quality(model, unseen).collect()
    }
    assert rows[1] > rows[2]


def test_scoring_survives_session_observations(spark, weak_docs):
    """Regression: a retained training summary pins the SparkSession
    into the prediction-UDF closure, and once any ``Observation`` has
    instantiated the session's ObservationManager that closure is no
    longer serializable (NotSerializableException on every transform
    action). ``train_quality_model`` strips the summary, so scoring
    must work even after Observations have been used in the session."""
    from pyspark.sql import Observation

    obs = Observation()
    weak_docs.observe(obs, F.count(F.lit(1)).alias("n")).collect()
    assert obs.get["n"] == weak_docs.count()

    model = train_quality_model(weak_docs)
    lr_stage = model.stages[-1]
    assert not lr_stage._java_obj.hasSummary()
    out = score_quality(model, weak_docs).agg(F.avg("quality_prob")).first()
    assert out[0] is not None


def test_prototypicality_prune_quotas_and_regimes(spark, emb):
    from financial_data_pipeline_spark.operators.curation import (
        prototypicality_prune,
        prototypicality_rank,
    )

    ranked = prototypicality_rank(emb)
    sizes = {r.label: r.n for r in
             emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    # rank is a per-cluster permutation 1..n
    per = ranked.groupBy("label").agg(
        F.min("proto_rank").alias("lo"), F.max("proto_rank").alias("hi"),
        F.countDistinct("proto_rank").alias("d"), F.count(F.lit(1)).alias("n"),
    ).collect()
    for r in per:
        assert (r.lo, r.hi, r.d) == (1, sizes[r.label], sizes[r.label])

    import math
    hard = prototypicality_prune(emb, 0.3, keep="hard")
    got = {r.label: r.n for r in
           hard.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {l: math.ceil(0.3 * n) for l, n in sizes.items()}

    # hard and easy partitions are disjoint at complementary quotas
    easy = prototypicality_prune(emb, 0.3, keep="easy")
    hard_max = hard.agg(F.min("proto_dist")).first()[0]
    easy_min = easy.agg(F.max("proto_dist")).first()[0]
    ids_h = {r.vec_id for r in hard.select("vec_id").collect()}
    ids_e = {r.vec_id for r in easy.select("vec_id").collect()}
    assert not ids_h & ids_e


def test_prototypicality_composes_with_trained_cells(spark, emb):
    """The production path: k-means cells (ml_ann) instead of the
    table's own labels — hard examples per trained cell."""
    from financial_data_pipeline_spark.operators.curation import (
        prototypicality_prune,
    )

    labeled = kmeans_assign(emb.drop("label"), k=6)
    easy = prototypicality_prune(labeled, 0.5, keep="easy")
    hard = prototypicality_prune(labeled, 0.5, keep="hard")
    assert 0 < easy.count() <= emb.count()
    # prototypes sit strictly closer to their centroid than the hard set
    d_easy = easy.agg(F.avg("proto_dist")).first()[0]
    d_hard = hard.agg(F.avg("proto_dist")).first()[0]
    assert d_easy < d_hard


def test_pq_codes_shape_and_range(spark, emb):
    from financial_data_pipeline_spark.operators.pq import pq_encode, pq_train

    cent = pq_train(emb, m=4, k=16)
    assert cent.count() == 64  # m*k codebook rows
    codes = pq_encode(emb, cent, m=4)
    chk = codes.select(
        F.size("codes").alias("m"),
        F.array_min("codes").alias("lo"),
        F.array_max("codes").alias("hi"),
    ).agg(
        F.min("m"), F.max("m"), F.min("lo"), F.max("hi")
    ).first()
    assert chk == (4, 4, 0, 15)
    assert codes.count() == emb.count()


def test_pq_full_rerank_recovers_exact_topk(spark, emb):
    """rerank_k >= corpus: the exact-L2 rerank must reproduce the
    brute-force answer exactly (PQ only orders the candidate fetch)."""
    from financial_data_pipeline_spark.operators.pq import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    qv = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    cent = pq_train(emb, m=4, k=16)
    codes = pq_encode(emb, cent, m=4)
    n = emb.count()
    got = [
        r.vec_id
        for r in pq_topk(codes, cent, qv, emb, m=4, k=5, rerank_k=n).collect()
    ]
    assert got[0] == 3  # self-match first
    # the same answer as a direct exact-L2 scan
    exact = [
        r.vec_id
        for r in emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(v) for v in qv]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            ).alias("d"),
        ).orderBy("d", "vec_id").limit(5).collect()
    ]
    assert got == exact


def test_pq_adc_recall_beats_tiny_rerank_budget(spark, emb):
    """Widening the rerank budget must not lose exact neighbors
    (monotone recall), and a 10x-corpus-fraction budget should find
    most of the true top-10."""
    from financial_data_pipeline_spark.operators.pq import (
        pq_encode,
        pq_topk,
        pq_train,
    )
    from financial_data_pipeline_spark.operators.similarity import knn_join

    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    cent = pq_train(emb, m=4, k=16)
    codes = pq_encode(emb, cent, m=4)
    exact = {
        r.vec_id
        for r in emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(v) for v in qv]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            ).alias("d"),
        ).orderBy("d", "vec_id").limit(10).collect()
    }
    got50 = {r.vec_id for r in
             pq_topk(codes, cent, qv, emb, m=4, k=10, rerank_k=50).collect()}
    got200 = {r.vec_id for r in
              pq_topk(codes, cent, qv, emb, m=4, k=10, rerank_k=200).collect()}
    r50 = len(got50 & exact) / 10
    r200 = len(got200 & exact) / 10
    assert r200 >= r50
    assert r200 >= 0.5, (r50, r200)


def test_ivfpq_full_probe_full_rerank_is_exact(spark, emb):
    """nprobe = all cells and rerank_k = corpus: IVFADC must reproduce
    the exact L2 top-k (the index only orders the fetch)."""
    from financial_data_pipeline_spark.operators.pq import (
        ivfpq_build,
        ivfpq_topk,
    )
    from financial_data_pipeline_spark.operators.similarity import (
        ivf_build_centroids,
    )

    labeled = emb  # table's own label column as coarse cells
    cents = ivf_build_centroids(labeled).cache()
    codes, pq_cent = ivfpq_build(labeled, cents)
    qv = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    n_cells = cents.count()
    n = emb.count()
    got = [
        r.vec_id
        for r in ivfpq_topk(
            codes, cents, pq_cent, qv, emb, k=5, nprobe=n_cells, rerank_k=n
        ).collect()
    ]
    exact = [
        r.vec_id
        for r in emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(v) for v in qv]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            ).alias("d"),
        ).orderBy("d", "vec_id").limit(5).collect()
    ]
    assert got == exact and got[0] == 7


def test_ivfpq_pruned_probe_finds_self_with_trained_cells(spark, emb):
    from financial_data_pipeline_spark.operators.ml_ann import train_ivf
    from financial_data_pipeline_spark.operators.pq import (
        ivfpq_build,
        ivfpq_topk,
    )

    labeled, cents = train_ivf(emb.drop("label"), k=8)
    codes, pq_cent = ivfpq_build(labeled, cents)
    qv = [float(x) for x in emb.filter("vec_id = 11").first()["embedding"]]
    got = ivfpq_topk(
        codes, cents, pq_cent, qv, emb, k=5, nprobe=2, rerank_k=40
    ).collect()
    assert got[0].vec_id == 11 and got[0].l2_dist == 0.0
    # codes shape: m entries in [0, k)
    chk = codes.select(F.size("codes").alias("m")).distinct().collect()
    assert [r.m for r in chk] == [4]


def test_embedding_pca_spectrum_matches_numpy(spark):
    """Distributed Gram partials + driver eigh vs a straight numpy PCA
    on the collected matrix; planted low-rank structure dominates."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.similarity import (
        embedding_pca_spectrum,
    )

    rng = np.random.default_rng(71)
    n, d = 600, 16
    # rank-2 structure + noise: two dominant directions
    U = rng.normal(size=(n, 2)) @ (rng.normal(size=(2, d)) * 5.0)
    X = (U + rng.normal(size=(n, d))).astype("float32")
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": [r.tolist() for r in X]}
    )
    sdf = spark.createDataFrame(pdf).repartition(7)
    out = (
        embedding_pca_spectrum(sdf, top_k=5).orderBy("component").toPandas()
    )
    Xf = X.astype("float64")
    cov = np.cov(Xf, rowvar=False, bias=True)
    want = np.linalg.eigvalsh(cov)[::-1][:5]
    assert np.allclose(out.eigenvalue.to_numpy(), want, rtol=1e-6, atol=1e-6)
    # rank-2 planted: first two components dominate
    assert out.cum_ratio.iloc[1] > 0.8
    assert abs(out.explained_ratio.sum() - out.cum_ratio.iloc[-1]) < 1e-4


def test_mmr_diverse_topk_matches_numpy_greedy(spark):
    """MMR selection vs an independent numpy greedy; with a planted
    near-duplicate cluster slightly MORE relevant than a diverse set,
    diversity (λ<1) admits the spread vectors pure relevance would
    rank below the copies."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_spark.operators.similarity import (
        mmr_diverse_topk,
    )

    rng = np.random.default_rng(97)
    d = 16
    q = np.zeros(d)
    q[0] = 1.0
    # cluster: 5 near-copies at cos ~0.9 to q (one shared off-axis)
    v1 = 0.9 * q
    v1[1] = np.sqrt(1 - 0.81)
    dup = v1 + rng.normal(0, 0.005, size=(5, d))
    # spread: cos 0.8 to q, mutually diverse off-axis directions
    rest = []
    for i in range(45):
        u = rng.normal(size=d)
        u[0] = 0.0
        u[1] *= 0.1  # mostly orthogonal to the cluster's off-axis too
        u /= np.linalg.norm(u)
        rest.append(0.8 * q + 0.6 * u)
    X = np.vstack([dup, np.array(rest)]).astype("float64")
    pdf = pd.DataFrame(
        {"vec_id": np.arange(50), "embedding": [r.tolist() for r in X]}
    )
    out = (
        mmr_diverse_topk(
            spark.createDataFrame(pdf), q.tolist(), k=8, pool=50, lam=0.6
        )
        .orderBy("rank")
        .toPandas()
    )
    # independent greedy
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    rel = Xn @ q
    sim = Xn @ Xn.T
    chosen = []
    for _ in range(8):
        red = sim[:, chosen].max(axis=1) if chosen else np.zeros(50)
        score = 0.6 * rel - 0.4 * red
        order = np.lexsort((np.arange(50), -score))
        pick = next(i for i in order if i not in chosen)
        chosen.append(pick)
    assert out.vec_id.tolist() == chosen
    # pure relevance would rank all 5 copies first; MMR keeps ≤ 2
    assert sorted(np.argsort(-rel)[:5]) == [0, 1, 2, 3, 4]
    assert sum(v < 5 for v in out.vec_id) <= 2
    # the most relevant vector is still rank 1
    assert out.vec_id.iloc[0] == int(np.argmax(rel))


def test_lof_scores_matches_numpy_reference(spark):
    """Exact differential vs a direct numpy LOF (k=3) on a planted
    two-cluster + far-outlier layout; the outlier's LOF must dominate."""
    import numpy as np

    from financial_data_pipeline_spark.operators.similarity import lof_scores

    rng = np.random.default_rng(7)
    tight = rng.normal(0.0, 0.05, (12, 4))
    loose = rng.normal(5.0, 0.5, (8, 4))
    outlier = np.array([[20.0, 20.0, 20.0, 20.0]])
    X = np.vstack([tight, loose, outlier])
    k = 3
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r.vec_id: r for r in lof_scores(df, k=k, max_rows=100).collect()
    }

    n = len(X)
    d = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    d = np.round(d, 8)
    np.fill_diagonal(d, np.inf)
    nbrs = {}
    for i in range(n):
        order = sorted((d[i, j], j) for j in range(n) if j != i)
        nbrs[i] = [j for _, j in order[:k]]
    kdist = {i: max(d[i, j] for j in nbrs[i]) for i in range(n)}
    lrd = {
        i: 1.0 / (sum(max(kdist[j], d[i, j]) for j in nbrs[i]) / k)
        for i in range(n)
    }
    for i in range(n):
        want_lof = sum(lrd[j] for j in nbrs[i]) / k / lrd[i]
        assert abs(got[i].lof - want_lof) < 1e-8, i
        assert abs(got[i].k_dist - kdist[i]) < 1e-8, i
    assert got[n - 1].lof > 3.0
    assert got[n - 1].lof > max(got[i].lof for i in range(n - 1)) * 2


def test_blocked_all_pairs_family(spark):
    """The callable 100 TB path: with block_col, LOF / silhouette /
    kNN-accuracy restrict pairs to the block (equi-join, no O(n²)
    BNLJ), the max_rows guard is bypassed (no driver count), and with
    every row in ONE block the results equal the exact unblocked ones;
    singleton blocks drop out; the unblocked path still raises past
    max_rows."""
    import numpy as np
    import pytest as _pytest

    from financial_data_pipeline_spark.operators.similarity import (
        knn_label_accuracy,
        lof_scores,
        silhouette_by_label,
    )

    rng = np.random.default_rng(11)
    X = np.vstack(
        [rng.normal(0.0, 0.3, (15, 4)), rng.normal(4.0, 0.3, (15, 4))]
    )
    rows = [
        (int(i), [float(x) for x in X[i]], int(i // 15)) for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])

    # one-block ≡ exact: blocked pipeline on a constant block column
    one = df.withColumn("blk", F.lit(0))
    exact = {r.vec_id: r for r in lof_scores(df, k=3, max_rows=100).collect()}
    blocked = {
        r.vec_id: r for r in lof_scores(one, k=3, block_col="blk").collect()
    }
    assert set(exact) == set(blocked)
    for i in exact:
        assert abs(exact[i].lof - blocked[i].lof) < 1e-12

    s_exact = {r.label: r for r in silhouette_by_label(df).collect()}
    s_one = {
        r.label: r
        for r in silhouette_by_label(one, block_col="blk").collect()
    }
    assert s_exact.keys() == s_one.keys()
    for lbl in s_exact:
        assert (
            abs(s_exact[lbl].mean_silhouette - s_one[lbl].mean_silhouette)
            < 1e-12
        )

    a_exact = knn_label_accuracy(df, k=3).collect()
    a_one = knn_label_accuracy(one, k=3, block_col="blk").collect()
    assert sorted(map(tuple, a_exact)) == sorted(map(tuple, a_one))

    # real blocking by cluster: block-local neighbors are the cluster,
    # so the two tight clusters score near-perfect separation
    by_cluster = df.withColumn("blk", F.col("label"))
    s_blk = {
        r.label: r
        for r in silhouette_by_label(by_cluster, block_col="blk").collect()
    }
    # no other-label neighbor within a pure block → all points drop out
    assert s_blk == {}
    acc = knn_label_accuracy(by_cluster, k=3, block_col="blk").collect()
    assert all(r.loo_accuracy == 1.0 for r in acc)

    # singleton block drops out of LOF; other block unaffected
    lone = df.withColumn(
        "blk", F.when(F.col("vec_id") == 0, F.lit(99)).otherwise(F.lit(0))
    )
    lofs = lof_scores(lone, k=3, block_col="blk").collect()
    assert {r.vec_id for r in lofs} == set(range(1, 30))

    # guard still bites the unblocked path — and not the blocked one
    with _pytest.raises(ValueError, match="block_col"):
        lof_scores(df, k=3, max_rows=10).collect()
    assert (
        len(lof_scores(one, k=3, max_rows=10, block_col="blk").collect())
        == 30
    )

    # a NULL embedding has no geometry: dropped up front, never a
    # NULLS-FIRST kNN edge, and the other rows' scores are unchanged
    with_null = one.unionByName(
        spark.createDataFrame(
            [(99, None, 0, 0)], "vec_id long, embedding array<double>, label int, blk int"
        )
    )
    ln = {r.vec_id: r.lof for r in lof_scores(with_null, k=3, block_col="blk").collect()}
    assert 99 not in ln and set(ln) == set(range(30))
    for i in blocked:
        assert abs(ln[i] - blocked[i].lof) < 1e-12


def test_max_block_rows_subdivides_hot_blocks(spark):
    """The hot-block guard: with max_block_rows, an oversized block is
    subdivided by extra seeded hyperplanes until expected child size
    is within the cap — pair volume collapses from n_hot^2 toward
    cap*n_hot — while blocks already under the cap are untouched (one
    ':0' suffix, identical pair set and LOF values)."""
    import numpy as np

    from financial_data_pipeline_spark.operators.similarity import (
        _distance_pairs,
        lof_scores,
    )

    rng = np.random.default_rng(5)
    n_hot, n_cold = 400, 40
    X = rng.normal(0.0, 1.0, (n_hot + n_cold, 8))
    rows = [
        (int(i), [float(x) for x in X[i]], 0 if i < n_hot else 1 + i % 4)
        for i in range(n_hot + n_cold)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "blk"])

    uncapped = _distance_pairs(
        df, "embedding", "vec_id", "blk", 10**9, "t"
    ).count()
    capped = _distance_pairs(
        df, "embedding", "vec_id", "blk", 10**9, "t", max_block_rows=50
    ).count()
    # hot block alone contributes 400*399 uncapped pairs; subdivision
    # into ~2^3 children cuts that by roughly the subdivision factor
    assert uncapped >= n_hot * (n_hot - 1)
    assert capped < uncapped / 3

    # blocks under the cap are semantically untouched: same LOF values
    # with a cap far above every block size
    small = df.filter(F.col("blk") > 0)
    plain = {r.vec_id: r.lof for r in lof_scores(small, k=3, block_col="blk").collect()}
    wide_cap = {
        r.vec_id: r.lof
        for r in lof_scores(
            small, k=3, block_col="blk", max_block_rows=10_000
        ).collect()
    }
    assert plain.keys() == wide_cap.keys()
    for i in plain:
        assert abs(plain[i] - wide_cap[i]) < 1e-12


def test_hot_block_guard_distributed_fallback(spark, monkeypatch):
    """Round-8 ADVICE (low): the guard's driver collect is BOUNDED.
    With more oversized blocks than HOT_COLLECT_CAP the bits map must
    be computed distributed (sizes shuffle-join, JVM-side log2) and
    produce EXACTLY the same sub-blocked pair set as the driver-built
    broadcast path — the cap changes the physical plan, never the
    semantics."""
    import numpy as np

    from financial_data_pipeline_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    # 6 blocks of 30 rows each, cap 10 → every block oversized
    n_blk, per = 6, 30
    X = rng.normal(0.0, 1.0, (n_blk * per, 8))
    rows = [
        (int(i), [float(x) for x in X[i]], i % n_blk)
        for i in range(n_blk * per)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "blk"])

    def pairs():
        return {
            (r.i, r.j, r.d)
            for r in sim._distance_pairs(
                df, "embedding", "vec_id", "blk", 10**9, "t",
                max_block_rows=10,
            ).collect()
        }

    driver_path = pairs()  # 6 oversized blocks << default cap
    monkeypatch.setattr(sim, "HOT_COLLECT_CAP", 2)
    fallback_path = pairs()  # 6 > 2 → distributed bits map
    assert fallback_path == driver_path
    assert len(driver_path) > 0


def test_plane_schedule_and_derived_planes(spark):
    """RUNBOOK's `planes ≈ 4 + log2(k)` sizing rule as the shipped
    default (r08 verdict item 8): the schedule matches the measured
    probe points, seeded_planes is prefix-stable (a bigger schedule
    extends — never reshuffles — a smaller one), and derived_planes
    sizes from a frame count or a passed estimate identically."""
    from financial_data_pipeline_spark.operators.similarity import (
        BASE_CORPUS_ROWS,
        derived_planes,
        plane_schedule,
        seeded_planes,
    )

    assert plane_schedule(0) == 4
    assert plane_schedule(BASE_CORPUS_ROWS) == 4  # the measured base
    assert plane_schedule(BASE_CORPUS_ROWS * 8) == 7  # 4 + log2(8)
    assert plane_schedule(2000) == 6  # sf0.1 embeddings
    assert plane_schedule(10**12) == 24  # capped
    # the schedule is monotone — more corpus never means fewer planes
    pts = [plane_schedule(n) for n in (1, 10, 500, 10**3, 10**6, 10**9)]
    assert pts == sorted(pts)

    # prefix stability: plane i is independent of the schedule length
    assert seeded_planes(8, 16, seed=7)[:4] == seeded_planes(4, 16, seed=7)

    df = spark.range(0, BASE_CORPUS_ROWS * 2).selectExpr(
        "id AS vec_id", "array(cast(id AS double), 1.0d) AS embedding"
    )
    via_df = derived_planes(df)
    via_est = derived_planes(n_rows=BASE_CORPUS_ROWS * 2, dim=2)
    assert via_df == via_est == seeded_planes(5, 2, seed=7)
