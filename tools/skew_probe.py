"""Hostile-layout probe: what happens to the heavy per-key operators
when the keys are NOT uniform — one giant symbol, one hot user, one
hot all-pairs block, one dominant join key?

``tools/scaling_probe.py`` amplifies every key space uniformly; that
answers "does the plan scale", not "does the plan survive the classic
100 TB failure mode". This tool amplifies the sf0.1 tables k× TWICE —
once uniformly (the scaling_probe recipe) and once with ``hot_frac``
(default 80%) of the amplified rows collapsed onto ONE key:

- ``events``: one hot user_id AND one hot event_type (the bars'
  symbol), same rows otherwise — per-key windows, sessionization and
  the grouped-map EMA kernel each get one giant group.
- ``orders``: one hot o_custkey (80% of all orders belong to one
  customer) — the customer⋈orders⋈lineitem join family gets a skewed
  build/probe key (AQE skew-join territory). Dates still shift per
  copy (the range-join quadratic-amplifier guard from scaling_probe).
- ``embeddings``: vectors unchanged (spread-out originals, remapped
  ids) — block skew is injected at the OPERATOR, not the data: the
  blocked all-pairs family is probed with a block column that puts
  hot_frac of rows in ONE block, with and without the
  ``max_block_rows`` subdivision cap.

For each probe the report compares t_skew / t_uniform at the SAME k —
a partition-robust operator should stay within ~2× (one group's work
is serialized but not amplified); a super-linear pair stage or an
unsplittable scan shows up as 10×+ and needs a shipped mitigation
(chunked EMA, block subdivision, AQE skew join).

Usage::

    python tools/skew_probe.py [k] [hot_frac]

Prints one JSON line and writes the ``## Skew`` section of SKEW.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

# (query name, why it's skew-sensitive). Bar-grained indicator queries
# (ema_macd, sma_bollinger) are NOT here: hourly bars are calendar-
# bounded (~720/symbol over the 30-day span), so symbol skew cannot
# grow their groups — the grouped-map EMA is probed on raw events
# below, where the hot group really is 80% of the rows.
PROBES = [
    ("user_sessions", "per-user gap sessionization window"),
    ("session_window_stream_twin", "per-user session window (stream twin)"),
    ("latest_per_customer", "greatest-per-group on the hot key"),
    ("revenue_by_nation", "customer-orders-lineitem join, hot custkey"),
    ("returned_revenue_by_customer", "hot-key join + per-customer agg"),
]


def amplify_skew_events_only(
    spark, k: int, out_dir: str, hot_frac: float
) -> None:
    """Events amplified k× with hot_frac of all rows on ONE user and
    ONE event_type (= the bars' symbol). Deterministic hash split."""
    from pyspark.sql import functions as F

    copies = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__c")
    pct = int(round(hot_frac * 100))
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n_users = 10_000_000
    hot = F.pmod(F.xxhash64(F.col("event_id"), F.col("__c")), F.lit(100)) < pct
    (
        ev.select("*", copies)
        .select(
            (
                F.col("event_id") + F.col("__c").cast("long") * 1_000_000_000
            ).alias("event_id"),
            "ts",
            F.when(hot, F.lit(1).cast("long"))
            .otherwise(
                F.col("user_id") + F.col("__c").cast("long") * n_users
            )
            .alias("user_id"),
            F.when(hot, F.lit("click~hot"))
            .otherwise(F.concat_ws("~", "event_type", F.col("__c")))
            .alias("event_type"),
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/events.parquet")
    )


def amplify_skew(spark, k: int, out_dir: str, hot_frac: float) -> None:
    """Same volume as scaling_probe.amplify(k) but hot_frac of every
    amplified row collapses onto ONE key (deterministic hash split, no
    RNG). Non-skewed tables reuse the uniform amplifier."""
    from pyspark.sql import functions as F

    from tools.scaling_probe import amplify

    amplify(spark, k, out_dir)  # uniform layout for every table...

    # ...then overwrite events and orders with the skewed layout
    copies = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__c")
    pct = int(round(hot_frac * 100))

    amplify_skew_events_only(spark, k, out_dir, hot_frac)

    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    shift_years = F.make_interval(years=F.col("__c") * 8)
    hot_o = F.pmod(F.xxhash64(F.col("o_orderkey"), F.col("__c")), F.lit(100)) < pct
    (
        orders.select("*", copies)
        .select(
            (
                F.col("o_orderkey") + F.col("__c").cast("long") * 1_000_000_000
            ).alias("o_orderkey"),
            F.when(hot_o, F.lit(1).cast(orders.schema["o_custkey"].dataType))
            .otherwise(
                F.col("o_custkey") + F.col("__c").cast("long") * 10_000_000
            )
            .alias("o_custkey"),
            (F.col("o_orderdate") + shift_years).alias("o_orderdate"),
            *[
                c
                for c in orders.columns
                if c not in ("o_orderkey", "o_custkey", "o_orderdate")
            ],
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/orders.parquet")
    )


def _blocked_probes(hot_frac: float, k: int):
    """The blocked all-pairs family with OPERATOR-level block skew:
    hot_frac of the vectors in ONE block, the rest spread over the
    bucket count the adaptive-planes schedule would give at k×.

    History: this probe's first run measured 18+ MINUTES for the
    uncapped hot block — not the n² work itself, but the distance
    fold evaluating inside ONE task (small corpus → broadcast join →
    streamed side kept the parquet's single partition). The
    (block, id) repartition now in ``_distance_pairs`` spreads the
    fold across all cores, so the uncapped point measures the honest
    PARALLEL n² work and the ``max_block_rows`` subdivision shows the
    work itself collapsing (Σ n_b² → Σ cap·n_b)."""
    import math

    from pyspark.sql import functions as F

    from financial_data_pipeline_spark.operators.similarity import lof_scores
    from financial_data_pipeline_spark.sources.adapters import load_table

    n_buckets = 2 ** (4 + max(0, round(math.log2(k))))

    def with_blocks(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        hot = (
            F.pmod(F.xxhash64("vec_id"), F.lit(100))
            < int(round(hot_frac * 100))
        )
        return emb.withColumn(
            "block",
            F.when(hot, F.lit(-1)).otherwise(
                F.pmod(F.xxhash64("vec_id", F.lit(7)), F.lit(n_buckets))
            ),
        )

    return [
        (
            f"lof_blocked hot={int(hot_frac * 100)}% UNCAPPED",
            # max_block_rows=0 explicitly DISABLES the guard — since it
            # became the default (DEFAULT_MAX_BLOCK_ROWS), a bare call
            # would subdivide the hot block and this leg would no longer
            # measure the honest n² the cap exists to prevent
            lambda spark, sf_dir: lof_scores(
                with_blocks(spark, sf_dir), k=5, block_col="block",
                max_block_rows=0,
            ),
        ),
        (
            f"lof_blocked hot={int(hot_frac * 100)}% max_block_rows=2000",
            lambda spark, sf_dir: lof_scores(
                with_blocks(spark, sf_dir),
                k=5,
                block_col="block",
                max_block_rows=2000,
            ),
        ),
    ]


# ~40-token synthetic boilerplate: the classic 100 TB dedup failure
# mode is a template (cookie banner, license header) shared by a huge
# slice of the corpus — every such doc lands in the SAME LSH band
# buckets and the SAME shingle inverted-index buckets.
BOILERPLATE = (
    "terms of service agreement this website uses cookies to improve "
    "your experience by continuing to browse you accept our privacy "
    "policy and consent to data collection all rights reserved contact "
    "support for questions about billing shipping returns and refunds"
)


def amplify_skew_documents(spark, k: int, out_dir: str, hot_frac: float) -> None:
    """Documents amplified k× where ``hot_frac`` of the amplified rows
    become NEAR-identical boilerplate: the shared ~40-token template
    plus ONE unique trailing token per doc (so exact-hash dedup canNOT
    remove them — only near-dup machinery sees the family, and its
    band/shingle buckets hold hot_frac of the whole corpus). Cold rows
    use the uniform per-copy token prefix (disjoint shingle spaces).
    Deterministic hash split, no RNG."""
    from pyspark.sql import functions as F

    copies = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__c")
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    pct = int(round(hot_frac * 100))
    new_id = F.col("doc_id") + F.col("__c").cast("long") * 10_000_000
    hot = F.pmod(F.xxhash64(F.col("doc_id"), F.col("__c")), F.lit(100)) < pct
    pref = F.concat(F.lit("c"), F.col("__c"), F.lit("."))
    retok = F.array_join(
        F.transform(
            F.split("text", r"\s+"),
            lambda t: F.when(t == "", t).otherwise(F.concat(pref, t)),
        ),
        " ",
    )
    hot_text = F.concat(F.lit(BOILERPLATE + " u"), new_id.cast("string"))
    text = F.when(hot, hot_text).otherwise(retok)
    (
        docs.select("*", copies)
        .select(
            new_id.alias("doc_id"),
            text.alias("text"),
            "lang",
            F.concat_ws("~", "source", F.col("__c")).alias("source"),
            F.length(text).alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )


def dedup_probe(k: int, hot_frac: float) -> int:
    """Verdict-r5 item 5: measure the minhash/jaccard family on a hot
    boilerplate corpus, with the shipped ``capped_buckets`` guard
    (dedup.py) as the mitigation — registered defaults
    (max_bucket_size=1000) vs an explicitly uncapped run at a size
    where the quadratic is still feasible to time. Appends a
    ``## Text-dedup hot corpus`` section to SKEW.md."""
    from pyspark.sql import Observation

    from financial_data_pipeline_spark import get_spark
    from financial_data_pipeline_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidates,
    )
    from financial_data_pipeline_spark.plans.driver_queries import QUERIES
    from tools.scaling_probe import amplify_documents

    spark = get_spark(app_name="fdp-dedup-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    uni = tempfile.mkdtemp(prefix="fdp_dskew_uni_")
    hot = tempfile.mkdtemp(prefix="fdp_dskew_hot_")
    mild = tempfile.mkdtemp(prefix="fdp_dskew_mild_")
    n_docs = 5000 * k
    # feasible uncapped point: a hot family of ~2000 docs is ~2e6 true
    # pairs (~9e7 verify structs) — big enough to measure the
    # quadratic, small enough to finish; 80% of 40k docs would be
    # ~5e8 pairs in ONE capped-off bucket row (the OOM the cap exists
    # to prevent), so the uncapped leg runs on the mild layout only.
    mild_frac = 2000 / n_docs
    print(f"amplifying documents x{k} uniform -> {uni}", file=sys.stderr)
    amplify_documents(spark, k, uni)
    print(
        f"amplifying documents x{k} hot_frac={hot_frac} -> {hot}",
        file=sys.stderr,
    )
    amplify_skew_documents(spark, k, hot, hot_frac)
    print(
        f"amplifying documents x{k} hot_frac={mild_frac:.4f} (uncapped leg) "
        f"-> {mild}",
        file=sys.stderr,
    )
    amplify_skew_documents(spark, k, mild, mild_frac)

    def run(fn, sf_dir: str, runs: int = 2) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = []
    for name in ("minhash_lsh_pairs", "ngram_jaccard_pairs"):
        tu = run(QUERIES[name], uni)
        tsk = run(QUERIES[name], hot)
        rows.append(
            (
                f"{name} (registered, cap=1000)",
                f"{int(hot_frac * 100)}% boilerplate corpus",
                round(tu, 3),
                round(tsk, 3),
                round(tsk / tu, 2),
            )
        )
        print(
            f"{name}: uniform {tu:.2f}s  hot {tsk:.2f}s  ({tsk / tu:.2f}x)",
            file=sys.stderr,
        )

    # surface the guard's own telemetry on the hot corpus: how many
    # buckets were dropped, how big the biggest was
    obs = Observation("lsh_cap")
    from financial_data_pipeline_spark.sources.adapters import load_table

    cand = lsh_candidates(
        load_table(spark, hot, "documents"), num_perm=16, bands=8, observation=obs
    )
    n_cand = cand.count()
    dropped = obs.get
    print(
        f"hot corpus lsh_candidates: {n_cand} candidates, "
        f"dropped_buckets={dropped.get('dropped_buckets')}, "
        f"max_bucket_docs={dropped.get('max_bucket_docs')}",
        file=sys.stderr,
    )

    # uncapped quadratic, measured where it still finishes: the mild
    # layout's single ~2000-doc family, cap lifted in BOTH stages
    def minhash_uncapped(spark, d):
        docs = load_table(spark, d, "documents")
        c = lsh_candidates(docs, num_perm=16, bands=8, max_bucket_size=10**9)
        return jaccard_pairs(
            docs, k=3, threshold=0.5, candidates=c, max_bucket_size=10**9
        )

    t_capped = run(QUERIES["minhash_lsh_pairs"], mild, runs=2)
    t_uncapped = run(minhash_uncapped, mild, runs=1)
    rows.append(
        (
            "minhash_lsh_pairs mild hot family (~2000 docs), cap=1000",
            "hot family dropped by the cap",
            None,
            round(t_capped, 3),
            None,
        )
    )
    rows.append(
        (
            "minhash uncapped, same mild layout",
            "~2e6-pair quadratic paid in full",
            None,
            round(t_uncapped, 3),
            None,
        )
    )
    print(
        f"mild layout: capped {t_capped:.2f}s  uncapped {t_uncapped:.2f}s "
        f"({t_uncapped / t_capped:.1f}x)",
        file=sys.stderr,
    )

    lines = [
        "",
        "## Text-dedup hot corpus (round 6)",
        "",
        f"`tools/skew_probe.py --dedup {k} {hot_frac}`: documents "
        f"amplified {k}× ({n_docs} docs) twice — uniformly and with "
        f"{int(hot_frac * 100)}% of rows turned into NEAR-identical "
        "boilerplate (shared ~40-token template + one unique trailing "
        "token, so exact dedup cannot remove the family and every hot "
        "doc lands in the same LSH band / shingle buckets). The shipped "
        "mitigation is `capped_buckets` (operators/dedup.py): buckets "
        "over `max_bucket_size` (default 1000, what the registered "
        "queries run) are dropped before pair expansion, with "
        "`Observation` telemetry instead of silent truncation.",
        "",
        "| probe | layout | uniform sec | hot sec | ratio |",
        "|---|---|---|---|---|",
    ]
    for name, why, tu, tsk, r in rows:
        lines.append(
            f"| {name} | {why} | {tu if tu is not None else '—'} |"
            f" {tsk if tsk is not None else '—'} |"
            f" {r if r is not None else '—'} |"
        )
    lines += [
        "",
        f"- Hot-corpus candidate count {n_cand} with "
        f"dropped_buckets={dropped.get('dropped_buckets')}, "
        f"max_bucket_docs={dropped.get('max_bucket_docs')} — the "
        "boilerplate family's band buckets are all dropped by the cap, "
        "so the registered path's cost stays at the COLD corpus's "
        "scale. Semantics: this is an explicit recall trade — a "
        f"{int(hot_frac * 100)}%-of-corpus near-dup family is "
        "quadratically many TRUE pairs (~5×10⁸ here), which no engine "
        "should materialize; production handles the family via "
        "`dedup_clusters`/`exact_dedup` on a canonicalized text or by "
        "acting on the cap telemetry, not by emitting every pair.",
        "- The uncapped leg (cap lifted in both stages) pays the "
        "quadratic honestly at a size where it still finishes: the "
        "~2000-doc family alone costs "
        f"{t_uncapped:.1f}s vs {t_capped:.1f}s capped "
        f"({t_uncapped / t_capped:.1f}×) — and grows with the SQUARE "
        "of the family while the capped path is flat. At 80% of 40k "
        "docs the uncapped single-bucket pair array (~5×10⁸ structs in "
        "one row) is the executor OOM the cap exists to prevent.",
    ]
    with open("SKEW.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(
        json.dumps(
            {
                "k": k,
                "hot_frac": hot_frac,
                "dedup_results": rows,
                "candidates_hot": n_cand,
                "dropped_buckets": dropped.get("dropped_buckets"),
                "max_bucket_docs": dropped.get("max_bucket_docs"),
            }
        )
    )
    for d in (uni, hot, mild):
        shutil.rmtree(d, ignore_errors=True)
    return 0


def main() -> int:
    if "--dedup" in sys.argv:
        argv = [a for a in sys.argv[1:] if a != "--dedup"]
        k = int(argv[0]) if argv else 8
        hot_frac = float(argv[1]) if len(argv) > 1 else 0.8
        return dedup_probe(k, hot_frac)
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8

    from financial_data_pipeline_spark import get_spark
    from financial_data_pipeline_spark.plans.driver_queries import QUERIES

    spark = get_spark(app_name="fdp-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from tools.scaling_probe import amplify

    uni = tempfile.mkdtemp(prefix="fdp_skew_uni_")
    skw = tempfile.mkdtemp(prefix="fdp_skew_hot_")
    print(f"amplifying {BASE} x{k} uniform -> {uni}", file=sys.stderr)
    amplify(spark, k, uni)
    print(
        f"amplifying {BASE} x{k} hot_frac={hot_frac} -> {skw}",
        file=sys.stderr,
    )
    amplify_skew(spark, k, skw, hot_frac)

    def run(fn, sf_dir: str, runs: int = 2) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = []
    for name, why in PROBES:
        tu = run(QUERIES[name], uni)
        tsk = run(QUERIES[name], skw)
        rows.append((name, why, round(tu, 3), round(tsk, 3), round(tsk / tu, 2)))
        print(
            f"{name}: uniform {tu:.2f}s  skew {tsk:.2f}s  ({tsk / tu:.2f}x)",
            file=sys.stderr,
        )

    # the shipped EMA mitigation, measured against the kernel it fixes
    # on the RAW event series (symbol = event_type, so the hot type is
    # one 80%-of-the-table group)
    from pyspark.sql import functions as F

    from financial_data_pipeline_spark.operators import indicators
    from financial_data_pipeline_spark.sources.adapters import load_table

    def event_series(spark, d):
        return load_table(spark, d, "events").select(
            F.col("event_type").alias("symbol"),
            F.col("ts").alias("timestamp"),
            F.col("value").cast("double").alias("close"),
        )

    for label, fn in (
        (
            "with_ema hot-symbol (one Arrow task per group)",
            lambda spark, d: indicators.with_ema(
                event_series(spark, d), spans=[12, 26]
            ),
        ),
        (
            "with_ema_chunked hot-symbol (mitigation)",
            lambda spark, d: indicators.with_ema_chunked(
                event_series(spark, d), spans=[12, 26]
            ),
        ),
    ):
        tu = run(fn, uni)
        tsk = run(fn, skw)
        rows.append(
            (label, "grouped-map EMA", round(tu, 3), round(tsk, 3), round(tsk / tu, 2))
        )
        print(
            f"{label}: uniform {tu:.2f}s  skew {tsk:.2f}s  ({tsk / tu:.2f}x)",
            file=sys.stderr,
        )

    # block skew is injected at the operator (same embedding bytes in
    # both dirs): compare hot-uncapped vs hot-capped directly. The
    # uncapped variant is the measured blowup — one block holding 80%
    # of 16k vectors is a 1.6e8-pair SINGLE-TASK join — so it runs
    # once (timing precision is irrelevant at 100×-over)
    for label, fn in _blocked_probes(hot_frac, k):
        runs = 1 if "UNCAPPED" in label else 2
        tu = run(fn, uni, runs=runs)  # hot block over uniform vectors
        rows.append((label, "hot all-pairs block", round(tu, 3), None, None))
        print(f"{label}: {tu:.2f}s", file=sys.stderr)

    # deep EMA point: the chunked mitigation pays a constant (rank job
    # + warmup shuffle) that dominates at 0.8M rows — find the
    # crossover by amplifying EVENTS ONLY much further and timing the
    # hot-symbol series once per variant
    k_deep = k * 8
    deep = tempfile.mkdtemp(prefix="fdp_skew_deep_")
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings".split()
    ):
        shutil.copy(f"{BASE}/{t}.parquet", f"{deep}/{t}.parquet")
    amplify_skew_events_only(spark, k_deep, deep, hot_frac)
    for label, fn in (
        (f"with_ema hot-symbol {k_deep}x deep",
         lambda spark, d: indicators.with_ema(
             event_series(spark, d), spans=[12, 26])),
        (f"with_ema_chunked hot-symbol {k_deep}x deep",
         lambda spark, d: indicators.with_ema_chunked(
             event_series(spark, d), spans=[12, 26])),
    ):
        td = run(fn, deep, runs=1)
        rows.append((label, "grouped-map EMA, deep point", None, round(td, 3), None))
        print(f"{label}: {td:.2f}s", file=sys.stderr)
    shutil.rmtree(deep, ignore_errors=True)

    lines = [
        "# SKEW — measured hostile-layout behavior",
        "",
        f"`tools/skew_probe.py {k} {hot_frac}`: sf0.1 amplified {k}× twice "
        f"— uniformly and with {int(hot_frac * 100)}% of amplified rows on "
        "ONE key (user/symbol for events, custkey for orders; block skew "
        "injected at the operator for the all-pairs family). Ratio = "
        "t_skew / t_uniform at the same k; ≤ ~2× means the operator "
        "survives the hot key, larger needs the named mitigation.",
        "",
        "| probe | why skew-sensitive | uniform sec | skew sec | ratio |",
        "|---|---|---|---|---|",
    ]
    for name, why, tu, tsk, r in rows:
        lines.append(
            f"| {name} | {why} | {tu if tu is not None else '—'} |"
            f" {tsk if tsk is not None else '—'} |"
            f" {r if r is not None else '—'} |"
        )
    lines += [
        "",
        "## Reading the table",
        "",
        "- Per-key windows (sessions, greatest-per-group) and the fact "
        "joins ride partial aggregation / AQE skew-join: skew ratios "
        "hover around 1× (often BELOW — fewer distinct keys, cheaper "
        "shuffles).",
        "- The grouped-map EMA serializes the hot symbol into one Arrow "
        "task; `with_ema_chunked` (rank-chunked + W-row warmup overlap) "
        "bounds every task and batch. At local[32] scale the sequential "
        "kernel's single task is still fast, so the chunked path's "
        "constant (rank job + warmup shuffle) makes it a wash on wall "
        "clock — its win is the BOUND: per-task memory and straggler "
        "length stop growing with the hot key, which is what matters "
        "when one group is 80% of 100 TB.",
        "- The hot all-pairs block is the real quadratic: Σ n_b² with "
        "one dominant block IS n². `max_block_rows` subdivides the hot "
        "block with extra seeded hyperplanes (work → Σ cap·n_b) — the "
        "capped run lands back under the uniform-layout time. The "
        "(block, id) streamed-side repartition this probe forced into "
        "`_distance_pairs` matters just as much: without it the fold "
        "evaluated inside ONE task under the broadcast join "
        "(measured 233 s for a 2·10⁷-pair frame → 23 s).",
    ]
    with open("SKEW.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"k": k, "hot_frac": hot_frac, "results": rows}))
    shutil.rmtree(uni, ignore_errors=True)
    shutil.rmtree(skw, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
