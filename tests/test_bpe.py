"""Distributed BPE vs an in-process reference implementation —
identical merge lists and identical encodings (greedy left-to-right,
overlap-counting, (count desc, pair asc) tie-break)."""

import pytest

from financial_data_pipeline_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    learn_bpe_merges,
)

DOCS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest newest newest newest newest"),
    (3, "newer newer newer wider wider new"),
    (4, "lowest newest widest low lower"),
]


def _ref_word_counts(docs):
    wc = {}
    for _, text in docs:
        for w in text.lower().split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def _ref_merge_word(sym, left, right):
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _ref_learn_full(word_counts, n_merges, min_count=2):
    vocab = {tuple(list(w) + [END_OF_WORD]): c for w, c in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pc = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_count:
            break
        merges.append((rank, l, r, cnt))
        new = {}
        for sym, c in vocab.items():
            t = _ref_merge_word(sym, l, r)
            new[t] = new.get(t, 0) + c
        vocab = new
    return merges


def _ref_encode(word, merges):
    sym = tuple(list(word) + [END_OF_WORD])
    for _, l, r, _ in sorted(merges):
        sym = _ref_merge_word(sym, l, r)
    return list(sym)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_learned_merges_match_reference(spark, docs_df):
    got = learn_bpe_merges(docs_df, n_merges=12, checkpoint_every=4)
    want = _ref_learn_full(_ref_word_counts(DOCS), 12)
    assert got == want
    assert len(got) >= 8  # corpus is rich enough to actually learn


def test_encoding_matches_reference_and_rebuilds_text(spark, docs_df):
    merges = learn_bpe_merges(docs_df, n_merges=10, checkpoint_every=4)
    out = {
        r.doc_id: r.bpe_tokens
        for r in apply_bpe(docs_df, merges, checkpoint_every=4).collect()
    }
    for doc_id, text in DOCS:
        want = [t for w in text.lower().split() for t in _ref_encode(w, merges)]
        assert out[doc_id] == want, doc_id
        # lossless: stripping markers reconstructs the normalized text
        rebuilt = "".join(out[doc_id]).replace(END_OF_WORD, " ").strip()
        assert rebuilt == " ".join(text.lower().split())


def test_driver_and_distributed_paths_agree(spark, docs_df):
    """r9 size-adaptive learn: the driver merge loop (default, vocab
    under threshold) and the forced distributed rounds must learn the
    identical merge list — the branch switch is physical only."""
    fast = learn_bpe_merges(docs_df, n_merges=12, checkpoint_every=4)
    dist = learn_bpe_merges(
        docs_df, n_merges=12, checkpoint_every=4, driver_threshold=0
    )
    assert fast == dist == _ref_learn_full(_ref_word_counts(DOCS), 12)


def test_early_stop_on_min_count(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    merges = learn_bpe_merges(df, n_merges=10, min_count=2)
    assert merges == []  # every pair occurs once
