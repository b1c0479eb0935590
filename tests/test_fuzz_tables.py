"""Pytest twin of tools/fuzz_tables.py — one seeded hostile table set,
the high-risk query subset, full oracle comparison.

The standalone tool sweeps the ENTIRE registry per seed (committed as
FUZZ.md evidence); the suite keeps a fixed-seed subset of the queries
that the round-8 harvest proved sensitive to mutated data, so every
fix stays pinned:

- rounding/cast boundaries: chronological_split, volume/dollar bars
- tie-breaks: top_drawdown_episodes, top_orders
- unicode + degenerate docs: edit_distance_pairs, tfidf_top_terms,
  gopher_quality_flags, token_entropy, token_sort_dedup, zipf_fit
- empty-shingle/empty-fingerprint conventions: ngram_jaccard_pairs,
  simhash_pairs, substring_overlap_pairs, dedup_clusters
- zero vectors + cosine ties: prototypicality_prune, embedding_topk,
  embedding_pairs_blocked
- payload range: events_props_json, events_props_variant
- stringification: orders_profile
- NULL-text convention (r9: the fuzzer plants NULL texts + vertical
  tabs): text_stats, lang_detect, doc_fingerprint, pii_redaction,
  curation_report, corpus_length_stats

Round 9: THREE seeds (0/1/2) run under CI, not just seed 0 — the
10-seed evidence in FUZZ.md lives in tool runs; this keeps a third of
it re-proven by the committed suite alone (r8 verdict item 3).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from check_oracle import sweep  # noqa: E402
from fuzz_tables import make_tables  # noqa: E402

HIGH_RISK = [
    "chronological_split",
    "volume_bars",
    "dollar_bars",
    "top_drawdown_episodes",
    "top_orders",
    "edit_distance_pairs",
    "tfidf_top_terms",
    "gopher_quality_flags",
    "token_entropy",
    "token_sort_dedup",
    "zipf_fit",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "substring_overlap_pairs",
    "dedup_clusters",
    "prototypicality_prune",
    "embedding_topk",
    "embedding_pairs_blocked",
    "events_props_json",
    "events_props_variant",
    "orders_profile",
    "temperature_mixture_plan",
    "shuffle_shard_plan",
    "text_stats",
    "lang_detect",
    "doc_fingerprint",
    "pii_redaction",
    "curation_report",
    "corpus_length_stats",
]

_SEEDS = [0, 1, 2]


@pytest.fixture(scope="module", params=_SEEDS, ids=lambda s: f"seed{s}")
def fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_tables") / f"seed{request.param}"
    make_tables(request.param, str(d))
    return str(d)


def test_high_risk_queries_on_fuzzed_tables(spark, fuzz_dir):
    results, failures = sweep(spark, fuzz_dir, only=HIGH_RISK, quiet=True)
    assert len(results) == len(HIGH_RISK)
    bad = {k: v["err"] for k, v in results.items() if v["err"]}
    assert failures == 0, bad
    # hash-matched, not just rows-only, for every oracle-backed query
    weak = [k for k, v in results.items() if v["hash_match"] is False]
    assert not weak, weak
