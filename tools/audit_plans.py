"""Physical-plan audit over the driver-contract query inventory.

For every ``queries()`` entry, captures the AQE-final executed plan and
extracts the execution-shape facts that matter at 100 TB: shuffle
count, join strategies, Python-eval stages, whole-stage-codegen spans,
scan pushdown. Flags antipatterns:

- CartesianProduct / BroadcastNestedLoopJoin (O(n·m) blowup)
- Exchange SinglePartition under a Window (global sort serializes)
- BatchEvalPython (row-at-a-time Python UDF — never in a hot path;
  Arrow-batched ArrowEvalPython / FlatMapGroupsInPandas are the
  sanctioned Python stages)
- parquet scans with no pushed filters AND no column pruning

Writes PLANS.md (one row per query + flag details). Run:
    python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_string(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString()


def audit(name: str, df, full_schema_cols: int = 12) -> dict:
    p = plan_string(df)
    facts = {
        "query": name,
        "shuffles": len(re.findall(r"Exchange hashpartitioning", p)),
        "single_part": len(re.findall(r"Exchange SinglePartition", p)),
        "range_part": len(re.findall(r"Exchange rangepartitioning", p)),
        "bhj": len(re.findall(r"BroadcastHashJoin", p)),
        "smj": len(re.findall(r"SortMergeJoin", p)),
        "codegen": len(set(re.findall(r"\*\((\d+)\)", p))),
        "arrow_py": len(re.findall(r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", p)),
    }
    flags = []
    if re.search(r"CartesianProduct", p):
        flags.append("CARTESIAN")
    if re.search(r"BroadcastNestedLoopJoin", p):
        flags.append("NESTED_LOOP_JOIN")
    if re.search(r"BatchEvalPython", p):
        flags.append("ROW_PYTHON_UDF")
    # A window is global only when its own input collapses to one
    # partition: Window → (Sort/AQE wrappers) → Exchange SinglePartition
    # within a few plan lines. A one-row global aggregate elsewhere in
    # the same plan (count/avg scalars) must NOT flag.
    if re.search(
        r"Window [^\n]*\n(?:[^\n]*\n){0,3}?[^\n]*Exchange SinglePartition", p
    ):
        flags.append("GLOBAL_WINDOW")
    # scan discipline: every parquet scan should prune columns.
    # ReadSchema lines can be truncated ("...") — skip those, they
    # prove nothing either way.
    for m in re.finditer(r"ReadSchema: struct<([^>\n]*)>", p):
        body = m.group(1)
        if "..." in body:
            continue
        ncols = len(body.split(",")) if body else 0
        if ncols >= full_schema_cols:
            flags.append(f"WIDE_SCAN({ncols}c)")
            break
    facts["flags"] = ",".join(flags) or "-"
    return facts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from financial_data_pipeline_spark import get_spark
    from financial_data_pipeline_spark.plans.driver_queries import QUERIES

    spark = get_spark(app_name="fdp-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    # Session-cache invariant (r10, VERDICT r9 #5): a builder that
    # persists a frame consumed by the RETURNED plan can never
    # unpersist it, and Spark's CacheManager then substitutes the
    # cached subtree into every later query sharing the canonical plan
    # — both a cross-query plan regression and a violation of the
    # computes-from-parquet bench contract (the 49a248f leak class).
    # After every builder + its action, the cache must be EMPTY.
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    cache_leaks: list[str] = []

    rows = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            # Execute THIS df object (write/noop would clone the plan and
            # leave this one's AQE un-finalized): collect is safe at
            # sf0.01 — every inventory query returns small results.
            df.collect()
            rows.append(audit(name, df))
        except Exception as exc:  # noqa: BLE001
            rows.append({"query": name, "flags": f"ERROR:{exc}"[:60]})
        if not cache_mgr.isEmpty():
            cache_leaks.append(name)
            rows[-1]["flags"] = (
                rows[-1].get("flags", "-").rstrip("-") + "CACHE_LEAK"
            )
            spark.catalog.clearCache()  # don't cascade into later audits

    cols = ["query", "shuffles", "single_part", "bhj", "smj", "codegen", "arrow_py", "flags"]
    out = ["# PLANS — physical-plan audit of the driver-contract queries",
           "",
           f"Captured from the AQE-final executed plan at `{sf_dir}` on "
           "local[*]. Columns: hash-shuffle count, single-partition "
           "exchanges, broadcast-hash joins, sort-merge joins, "
           "whole-stage-codegen spans, Arrow Python stages, antipattern "
           "flags (see tools/audit_plans.py docstring).",
           "",
           "| " + " | ".join(cols) + " |",
           "|" + "---|" * len(cols)]
    for r in rows:
        out.append("| " + " | ".join(str(r.get(c, "")) for c in cols) + " |")
    flagged = [r for r in rows if r.get("flags", "-") not in ("-",)]
    out += [
        "",
        f"Flagged: {len(flagged)}/{len(rows)}.",
        "",
        "## Known, intentional flags",
        "",
        "- `chronological_split` (no longer flagged): SP1's global",
        "  row-order contract (`data_splitter.py:32-64`) is now served by",
        "  `splitter.global_row_index` — range-partition + per-partition",
        "  row_number + offsets — so the query has NO single-partition",
        "  window while returning the exact same ranked rows (the library",
        "  also keeps `chronological_split_by_quantile` as the zero-sort",
        "  approximate path; SURVEY.md §7.4 item 4).",
        "- `volume_profile` NESTED_LOOP_JOIN: a broadcast crossJoin of the",
        "  ONE-row global (min, max) price range onto the facts — O(n·1),",
        "  the standard two-pass histogram shape, not a pair blowup.",
        "- `customer_spend_rank` GLOBAL_WINDOW: rank()/ntile() over the",
        "  whole customer set is inherently a total order; the window runs",
        "  on the already-aggregated per-customer frame (|customers| rows,",
        "  orders of magnitude smaller than the fact table), never on the",
        "  facts.",
        "- `rich_lapsed_by_segment` NESTED_LOOP_JOIN: the scalar subquery",
        "  (global average balance) is a ONE-row broadcast crossJoin onto",
        "  customer — O(n·1), same shape as `volume_profile`; keeps the",
        "  scalar lazy instead of a driver collect.",
        "- `tfidf_top_terms` NESTED_LOOP_JOIN: the corpus size n_docs is",
        "  a ONE-row broadcast crossJoin onto the tf frame — O(n·1)",
        "  scalar distribution, same pattern as above.",
        "- `unigram_logprob` NESTED_LOOP_JOIN: the corpus token total is",
        "  a ONE-row broadcast crossJoin — O(n·1) scalar distribution,",
        "  same shape as `tfidf_top_terms`.",
        "- `nb_lang_score` NESTED_LOOP_JOIN: the NB totals (T_pos, T_neg,",
        "  V) are a ONE-row broadcast crossJoin onto the vocabulary-count",
        "  frame — O(vocab·1) scalar distribution, same shape as",
        "  `unigram_logprob`.",
        "- `lsh_pair_recall` NESTED_LOOP_JOIN: the final row is the",
        "  crossJoin of two ONE-row count aggregates (exact vs LSH pair",
        "  counts) — an O(1) join.",
        "- `js_drift_close` / `hist_chi2_drift` NESTED_LOOP_JOIN: the",
        "  SINGLE-feature case of `drift._hist_compact` — the per-",
        "  feature (min, max) stats join's key is the same literal on",
        "  both sides, so Catalyst constant-folds the equi-condition",
        "  and the ONE-row broadcast stats frame joins as a BNLJ —",
        "  O(n·1) scalar distribution, the `volume_profile` shape.",
        "  (`feature_drift_psi`, multi-feature, keeps a real key and",
        "  shows the BHJ; the former dense-grid crossJoin is gone —",
        "  bins densify in a map+sequence fold, 20→12 exchanges.)",
        "- `categorical_psi_sources` NESTED_LOOP_JOIN: the (t_ref,",
        "  t_new) totals are a ONE-row broadcast crossJoin onto the",
        "  per-category grid — O(categories·1) scalar distribution,",
        "  same shape as `volume_profile` (keeps totals lazy instead of",
        "  the former driver .first()).",
        "- `inverse_vol_rebalanced` GLOBAL_WINDOW: the cumulative",
        "  compounding window runs on the per-PERIOD frame (one row per",
        "  rebalance week — a handful of rows), never on facts; the",
        "  fact-sized stages are all keyed on (symbol, period).",
        "- `ivf_recall_at_10` NESTED_LOOP_JOIN: IVF probe selection is",
        "  the (queries × centroids) broadcast crossJoin — O(16 · cells)",
        "  rows against a one-row-per-cell centroid table, then a",
        "  window keeps nprobe per query. By design (no driver collect).",
        "- `validation_report` / `validation_report_strict`",
        "  NESTED_LOOP_JOIN: the report row is assembled by crossJoining",
        "  four ONE-row aggregates (O(1) joins). The fact-side work is",
        "  one flag-frame pass (single symbol shuffle) + scalar-dependent",
        "  re-aggregations — see plans/report.py.",
        "- `walk_forward_plan` NESTED_LOOP_JOIN: the four fold-boundary",
        "  quantiles are ONE row broadcast-crossJoined onto the bars —",
        "  O(n·1) scalar distribution, same shape as `volume_profile`.",
        "- `quantized_ann_recall` NESTED_LOOP_JOIN: candidate generation",
        "  is the (corpus × 16-query) broadcast crossJoin — the same",
        "  bounded fan-out every ANN harness uses (`ivf_recall_at_10`);",
        "  the 16-row side is broadcast, never shuffled.",
        "- `major_value_parts` NESTED_LOOP_JOIN: the global revenue total",
        "  is a ONE-row broadcast crossJoin onto the per-part aggregate —",
        "  the q11 scalar-subquery shape, O(parts·1).",
        "- `target_encoding_loo` NESTED_LOOP_JOIN: the global target mean",
        "  is a ONE-row broadcast crossJoin onto the facts — O(n·1) scalar",
        "  distribution, the `volume_profile` shape.",
        "- `ab_test_welch` NESTED_LOOP_JOIN: the two groups' one-row",
        "  aggregates crossJoin into the single result row — an O(1) join.",
        "- `lineitem_expectations` NESTED_LOOP_JOIN: the suite result is",
        "  three ONE-row counter frames crossJoined into one report row —",
        "  O(1) joins; all fact-side work is a single scan-bound",
        "  aggregate + a keys-only shuffle + one anti-join.",
        "- `rfm_segments` GLOBAL_WINDOW: the three ntile quintiles are",
        "  total orders BY DEFINITION and run on the per-customer",
        "  AGGREGATE (|customers| rows) — the `customer_spend_rank`",
        "  shape; order facts never see the windows.",
        "- `part_basket_rules` NESTED_LOOP_JOIN: the order total is a",
        "  ONE-row broadcast crossJoin onto the (support-filtered) pair",
        "  frame — O(pairs·1) scalar distribution.",
        "- `user_retention_km` / `cuped_variance_reduction` /",
        "  `rfm_segments` scalar one-row crossJoins: same O(n·1)",
        "  scalar-distribution shape (KM horizon, CUPED combine, RFM",
        "  order-date horizon).",
        "- `chi2_type_by_dow` GLOBAL_WINDOW: the marginal/total windows",
        "  run over the OBSERVED-CELL frame (≤ r·c rows, here 35),",
        "  never the events; a contingency table is a global object.",
        "- `doc_quality_auc` GLOBAL_WINDOW: a single global AUC is a",
        "  pooled total-order rank BY DEFINITION; the keyed form",
        "  (`binary_auc(by=[...])`) partitions the same window.",
        "- `inverse_vol_portfolio` NESTED_LOOP_JOIN: the Σ(1/σ) weight",
        "  normalizer is a ONE-row broadcast crossJoin onto the per-symbol",
        "  vol frame — O(symbols·1) scalar distribution.",
        "- `user_retention_km` NESTED_LOOP_JOIN + GLOBAL_WINDOW: the",
        "  censoring horizon (global max ts) is a ONE-row broadcast",
        "  crossJoin; the KM windows are a total order BY CONSTRUCTION",
        "  (survival telescopes over event times) and run on the reduced",
        "  per-distinct-duration frame, never the raw events.",
        "- `customer_spend_gini` GLOBAL_WINDOW: the Gini rank is a total",
        "  order over the per-customer AGGREGATE (|customers| rows), the",
        "  `customer_spend_rank` shape — facts never see the window.",
        "- `wilcoxon_user_spend` GLOBAL_WINDOW + NESTED_LOOP_JOIN: same",
        "  shape as `mann_whitney_purchase_view` below — an unkeyed",
        "  paired test is a pooled total-order rank over the per-user",
        "  AGGREGATE plus a one-row tie-correction crossJoin.",
        "- `mann_whitney_purchase_view` GLOBAL_WINDOW + NESTED_LOOP_JOIN:",
        "  the query runs the two-group test with NO key (by=[]), so the",
        "  pooled rank is inherently a total order — keyed invocations",
        "  (`by=[...]`, as `ks_drift_by_dow` uses) partition it; the",
        "  crossJoin is the one-row rank-sum × one-row tie-correction",
        "  combine, an O(1) join (the `ab_test_welch` shape).",
        "- `temperature_mixture_plan` GLOBAL_WINDOW: the tempered-share",
        "  normalizer window runs over the per-SOURCE aggregate (one row",
        "  per source — tens of rows), never the documents.",
        "- `bm25_search` NESTED_LOOP_JOIN: corpus stats (n_docs, avgdl)",
        "  are a ONE-row broadcast crossJoin onto the tf frame — the",
        "  `tfidf_top_terms` scalar-distribution shape.",
        "- `hybrid_search_rrf` NESTED_LOOP_JOIN + GLOBAL_WINDOW: rank",
        "  fusion is BY DEFINITION a global rank, computed over the two",
        "  BOUNDED top-k candidate pools (≤ 2k rows), not the corpus;",
        "  the crossJoins distribute the one-row corpus stats (BM25 leg)",
        "  and the literal query vector (cosine leg).",
        "- `purged_fold_counts` NESTED_LOOP_JOIN: the fold time",
        "  boundaries are a ONE-row broadcast crossJoin onto the bars —",
        "  the `walk_forward_plan` shape, O(n·1).",
        "- `theta_retention_days` NESTED_LOOP_JOIN: the observation",
        "  horizon (global max ts) is a ONE-row broadcast crossJoin —",
        "  the `user_retention_km` shape.",
        "- `embedding_pca_spectrum` NESTED_LOOP_JOIN + GLOBAL_WINDOW:",
        "  the invariant frame crossJoins the 10-row spectrum with the",
        "  ONE-row independently-computed trace, and the monotone/cum",
        "  windows run over exactly those 10 component rows — both",
        "  constant-size BY CONSTRUCTION; the distributed work (Gram",
        "  partials, per-dimension var_pop) stays keyed and windowless.",
        "- `quality_calibration_bins` GLOBAL_WINDOW: percent_rank for the",
        "  reliability deciles is a pooled total order BY DEFINITION and",
        "  runs on the per-doc (score, label) projection; at corpus scale",
        "  swap the exact rank for approx-quantile bin edges",
        "  (percentile_approx) — documented in curation.py.",
        "- `rebalance_turnover` NESTED_LOOP_JOIN: the week-grid",
        "  densification crossJoins the DISTINCT symbol list (a handful of",
        "  rows) with the DISTINCT week list (single-digit rows) —",
        "  O(symbols·weeks) grid rows, never fact-sized.",
        "- `bh_fdr_hourly` GLOBAL_WINDOW: Benjamini-Hochberg is a global",
        "  rank over the HYPOTHESIS frame (one row per symbol×hour, ≤",
        "  a few hundred), never the bars — the multiple-testing ladder",
        "  is a total order by definition.",
        "- `revenue_pareto_deciles` NESTED_LOOP_JOIN + GLOBAL_WINDOW:",
        "  ntile(10) over the per-customer AGGREGATE (the",
        "  `customer_spend_rank` shape); the revenue total is a ONE-row",
        "  broadcast crossJoin, and the cumulative-share window runs over",
        "  exactly 10 decile rows.",
        "- `lang_source_assoc` NESTED_LOOP_JOIN: the grand total n is a",
        "  ONE-row broadcast crossJoin onto the contingency CELL frame",
        "  (≤ langs × sources rows) — scalar distribution, O(cells·1).",
        "- `knn_label_accuracy` NESTED_LOOP_JOIN: same deliberate",
        "  all-pairs distance frame as `silhouette_by_label` /",
        "  `lof_outliers` (repartitioned, per-IVF-block at scale).",
        "- `event_entropy_rate` NESTED_LOOP_JOIN: one-row transition",
        "  total crossJoined onto the (types × types) bigram frame —",
        "  O(cells·1) scalar distribution.",
        "- `pmi_top_bigrams` NESTED_LOOP_JOIN: the bigram grand total",
        "  is a ONE-row broadcast crossJoin onto the support-filtered",
        "  bigram frame — O(bigrams·1) scalar distribution.",
        "- `lang_log_odds_tokens` NESTED_LOOP_JOIN + GLOBAL_WINDOW:",
        "  one-row totals crossJoin, and the two top/bottom-10 rank",
        "  windows run on the support-filtered TOKEN frame (a",
        "  vocabulary, not facts) — a global leaderboard is a total",
        "  order by definition.",
        "- `silhouette_by_label` NESTED_LOOP_JOIN: the i≠j pair",
        "  self-join is the deliberate exact all-pairs distance frame",
        "  (repartitioned across cores, the `lof_outliers` contract);",
        "  per-IVF-block at corpus scale.",
        "- `cluster_validity_indices` / `lang_source_mutual_info`",
        "  NESTED_LOOP_JOIN: one-row totals / tiny centroid frames",
        "  crossJoined for lazy scalar distribution — O(rows·1); the",
        "  label×label centroid join is |labels|²·dim, never",
        "  point-pair-sized.",
        "- `conditional_beta` GLOBAL_WINDOW: the running-peak drawdown",
        "  state is computed on the per-HOUR market frame (one row per",
        "  timestamp — hundreds of rows), never on symbol×hour facts;",
        "  a single market clock is a total order by definition.",
        "- `revenue_mom_yoy` GLOBAL_WINDOW: the MoM/YoY lag windows run",
        "  on the per-MONTH aggregate (≤ ~84 rows over TPC-H's seven",
        "  years) — a calendar series is a total order by definition;",
        "  the order facts never see the window.",
        "- `theil_decomposition` / `lang_detect_kappa` /",
        "  `term_burstiness` / `doc_keywords` / `source_kl_divergence`",
        "  NESTED_LOOP_JOIN: each is",
        "  a ONE-row global-total (or n-docs) broadcast crossJoin onto an",
        "  aggregated frame — the `tfidf_top_terms` scalar-distribution",
        "  shape, O(rows·1), never a pair blowup.",
        "- `part_skyline` GLOBAL_WINDOW: the strictly-cheaper prefix max",
        "  is a total order on price BY DEFINITION and runs on the",
        "  DEDUPLICATED per-price frame (|distinct prices| rows), never",
        "  the part table; this window is exactly what replaces the",
        "  O(n²) dominance self-join.",
        "- `lof_outliers` NESTED_LOOP_JOIN: the all-pairs i≠j self-join",
        "  is the DELIBERATE exact-kNN candidate set, hard-guarded by",
        "  max_rows (20k → ≤ 4·10⁸ cheap distance rows); the documented",
        "  scale path runs the identical plan per IVF/LSH block where",
        "  block-local density is the semantically right neighborhood.",
        "",
    ]
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    for r in rows:
        print(r)
    if cache_leaks:
        print(
            f"FAIL: session cache non-empty after {len(cache_leaks)} "
            f"builder(s): {cache_leaks} — every persist consumed by a "
            "returned plan leaks into later queries via CacheManager "
            "plan substitution",
            file=sys.stderr,
        )
        raise SystemExit(2)
    print("cache invariant: session cache empty after all builders")


if __name__ == "__main__":
    main()
