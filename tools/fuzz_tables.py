"""Fuzzed-table differential sweep — every oracle becomes a property test.

The four committed correctness layouts (sf0.01 / sf0.001 / hostile
partitioning / full sf0.1) all run over the SAME driver-generated data,
so they can never observe how the registry behaves on inputs the
generator doesn't produce: duplicate keys, same-instant timestamps,
exact value ties in rank/top-k order columns, unicode-hostile text,
degenerate embeddings, extreme-magnitude numerics. This tool MUTATES
the real sf0.001 tables with seeded hostile transformations and runs
the ENTIRE query registry against each mutated directory via the same
``check_oracle.sweep`` harness — amplifying all ~360 DuckDB oracles
into property tests. Starting from real data keeps the value domains
and referential integrity that keep queries non-degenerate.

Mutation classes (all seeded, applied with per-seed probabilities):

- key collisions: duplicated events / lineitem rows, same-instant
  ``ts`` groups (window tie-break + keep-first determinism)
- value ties: exact duplicates planted in ``o_totalprice`` /
  ``l_extendedprice`` / ``value`` (rank & top-k tie-break attack)
- heavy key skew: one user / one supplier absorbs a large row share
- unicode-hostile documents: CJK, emoji ZWJ sequences, combining
  marks, zero-width chars, RTL runs, NFC/NFD doubles — plus empty,
  whitespace-only, single-char, and very long docs, exact and
  near-duplicate texts, duplicate-line docs
- degenerate embeddings: zero vectors, exact-duplicate vectors,
  scaled copies, single-label blocks (cosine ties + guard paths)
- extreme finite numerics: ±1e6 / 1e-150 / 0 outliers on signed
  columns, domain-bounded price extremes (see mut_numeric_extremes
  for the dynamic-range calibration rationale)
- row-order shuffle of every table (parquet row order is an implicit
  input; results must not depend on it)

Divergences found here are either engine/oracle parity bugs (fix both
sides + pin a fixture) or undeclared data-contract assumptions (tie
columns, null handling) — both worth surfacing before 100 TB does.

Usage::

    python tools/fuzz_tables.py [n_seeds] [--keep] [--out DIR] [query ...]

Exits nonzero on any divergence. ``tests/test_fuzz_tables.py`` runs a
fixed seed through the high-risk query subset as part of the suite.
"""

from __future__ import annotations

import os
import shutil
import sys
import unicodedata

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

SRC_DIR = os.environ.get("SPARK_GRAFT_FUZZ_SRC", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# ---------------------------------------------------------------------------
# Hostile text fragments (all public unicode)
# ---------------------------------------------------------------------------

UNICODE_MONSTERS = [
    "漢字テキスト 中文文本 データ 分析",                      # CJK mix
    "👩‍👩‍👧‍👦 family 🇫🇷🇯🇵 flags 🧑🏽‍💻 coder",  # ZWJ + skin tones + flags
    "café résumé naïve",               # combining marks (NFD)
    "café résumé naïve",                                        # same, NFC
    "a​b‌c‍d﻿e",                            # zero-width chars
    "مرحبا بالعالم שלום עולם mixed rtl",                        # RTL runs
    "ß groß STRASSE İstanbul ﬁnance ﬂow",                      # casing traps
    "x y z  tabs\tand\nnewlines\r\n v\x0Bt",    # odd whitespace incl. U+000B
    "\x0Blead vt\x0Bmid vt trail\x0B",         # vertical-tab monster: Java \s
                                                # has \x0B, RE2's does not (r8
                                                # ADVICE -> pinned WS_TOKEN_RE)
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕊𝕡𝕒𝕣𝕜 ｆｕｌｌｗｉｄｔｈ",                   # astral + fullwidth
    "ᚠᚢᚦᚨᚱᚲ ᛏᛖᛊᛏ runes ☃ ☄ ★",                              # runic + symbols
]

TOKENS = [
    "spark", "group", "query", "row", "data", "slow", "small", "filter",
    "customer", "line", "the", "batch", "value", "merge", "table", "join",
]


def _rng_text(rng: np.random.Generator, n_tokens: int) -> str:
    return " ".join(rng.choice(TOKENS, size=n_tokens))


# ---------------------------------------------------------------------------
# Per-table mutators: (rng, pdf) -> pdf  (schema/dtypes preserved by writer)
# ---------------------------------------------------------------------------


def mut_names(rng, pdf, col):
    """Swap a few name strings for unicode monsters; sometimes duplicate
    one name across two keys (group-by-name vs by-key divergence)."""
    pdf = pdf.copy()
    n = len(pdf)
    k = max(1, n // 5)
    idx = rng.choice(n, size=min(k, n), replace=False)
    for i in idx:
        pdf.loc[pdf.index[i], col] = str(rng.choice(UNICODE_MONSTERS))
    if n >= 2 and rng.random() < 0.5:
        a, b = rng.choice(n, size=2, replace=False)
        pdf.loc[pdf.index[b], col] = pdf.loc[pdf.index[a], col]
    return pdf


def mut_numeric_extremes(rng, pdf, col, allow_negative=True, positive=False):
    """Plant outlier magnitudes and exact ties.

    The outlier ceiling is 1e6 (1-3 orders above the data domains), NOT
    1e150 or 1e9: the registry's bitwise-match contract pins
    accumulation ORDER and absorbs residual ULP noise in per-query
    rounding grains (typically 1e-6), but windowed VARIANCE over a
    window containing a 1e9 outlier amplifies double-epsilon to ~3e-7
    — right at the grain, so boundary flips appear that measure the FP
    libraries, not the engine. At 1e6 the worst variance-path error is
    ~3e-10, two orders inside every pinned grain. 1e-150 underflow-side
    extremes are kept for signed columns (they vanish into sums
    harmlessly but stress min/max/compare paths).

    ``positive=True`` is for columns with a positivity CONTRACT —
    ``events.value`` plays the price role in the OHLCV adapter
    (FIXTURES.md T6), and the return family's ln(close/prev) consumes
    prices that ``clean_ohlcv`` (P4 positive-price filter) guarantees
    positive upstream; planting 0/negative prices only exercises the
    oracle harness's ln() error path, not an engine behavior. The
    price pool additionally stays inside the instrument-price dynamic
    range [1, 1e3]: price×volume cascades (force index, ×1e9-scaled
    Amihud illiquidity) push intermediate magnitudes ~4 orders above
    the price, so a 1e7 price makes double-ULP larger than the
    queries' 1e-6 rounding grain — FP-library measurement again, not
    engine semantics. Ties (the block below) are the real attack."""
    pdf = pdf.copy()
    n = len(pdf)
    # Full-precision irrationals / binary-exact magnitudes only: any
    # literal with <= ~6 decimals (123.456, 1e6, even 123.456789 after
    # a /20 window mean) makes group means land EXACTLY on round-half
    # grids (58.7638625), where the engines' different accumulation
    # orders flip the last rounded digit — an FP-measurement, not an
    # engine bug (a genuinely half-grid mean is cross-engine ambiguous
    # by nature). 2^20 sums stay binary-exact; 100*pi / 100*e style
    # constants keep means off every decimal grid at background
    # (~1e-8) probability, like real data.
    if positive:
        pool = [1.0, 314.1592653589793, 271.8281828459045]
    else:
        pool = [0.0, 1e-150, 1048576.0, 314.1592653589793]
        if allow_negative:
            pool += [-1048576.0, -271.8281828459045]
    k = max(1, n // 20)
    idx = rng.choice(n, size=min(k, n), replace=False)
    pdf.loc[pdf.index[idx], col] = rng.choice(pool, size=len(idx))
    # exact ties: copy one value over a random subset
    if n >= 4:
        tie_val = float(pdf[col].iloc[int(rng.integers(n))])
        tie_idx = rng.choice(n, size=max(2, n // 30), replace=False)
        pdf.loc[pdf.index[tie_idx], col] = tie_val
    return pdf


def mut_region(rng, pdf):
    return mut_names(rng, pdf, "r_name")


def mut_nation(rng, pdf):
    return mut_names(rng, pdf, "n_name")


def mut_customer(rng, pdf):
    pdf = mut_names(rng, pdf, "c_name")
    pdf = mut_numeric_extremes(rng, pdf, "c_acctbal")
    if rng.random() < 0.5:  # segment skew: half the rows one segment
        idx = rng.choice(len(pdf), size=len(pdf) // 2, replace=False)
        pdf.loc[pdf.index[idx], "c_mktsegment"] = "BUILDING"
    return pdf


def mut_supplier(rng, pdf):
    pdf = mut_names(rng, pdf, "s_name")
    return mut_numeric_extremes(rng, pdf, "s_acctbal")


def mut_part(rng, pdf):
    pdf = mut_names(rng, pdf, "p_name")
    pdf = mut_numeric_extremes(rng, pdf, "p_retailprice", allow_negative=False)
    if rng.random() < 0.3:  # p_size edge values
        idx = rng.choice(len(pdf), size=max(1, len(pdf) // 20), replace=False)
        pdf.loc[pdf.index[idx], "p_size"] = np.int32(0)
    return pdf


def mut_orders(rng, pdf):
    pdf = mut_numeric_extremes(rng, pdf, "o_totalprice", allow_negative=False)
    n = len(pdf)
    # same-day collision block: many orders on one date
    if n >= 8:
        day = pdf["o_orderdate"].iloc[int(rng.integers(n))]
        idx = rng.choice(n, size=n // 8, replace=False)
        pdf.loc[pdf.index[idx], "o_orderdate"] = day
    # status skew
    if rng.random() < 0.5:
        idx = rng.choice(n, size=n // 2, replace=False)
        pdf.loc[pdf.index[idx], "o_orderstatus"] = "F"
    return pdf


def mut_lineitem(rng, pdf):
    pdf = mut_numeric_extremes(rng, pdf, "l_extendedprice", allow_negative=False)
    n = len(pdf)
    # quantity ties + zeros; discount/tax boundary values
    idx = rng.choice(n, size=max(1, n // 25), replace=False)
    pdf.loc[pdf.index[idx], "l_quantity"] = 0.0
    idx = rng.choice(n, size=max(1, n // 25), replace=False)
    pdf.loc[pdf.index[idx], "l_discount"] = 0.0
    idx = rng.choice(n, size=max(1, n // 25), replace=False)
    pdf.loc[pdf.index[idx], "l_tax"] = 0.0
    # supplier skew: ~40% of rows one supplier
    if rng.random() < 0.6:
        hot = int(pdf["l_suppkey"].iloc[int(rng.integers(n))])
        idx = rng.choice(n, size=int(n * 0.4), replace=False)
        pdf.loc[pdf.index[idx], "l_suppkey"] = hot
    # shipdate collision block
    day = pdf["l_shipdate"].iloc[int(rng.integers(n))]
    idx = rng.choice(n, size=n // 10, replace=False)
    pdf.loc[pdf.index[idx], "l_shipdate"] = day
    # duplicated rows (PK break: same (orderkey, linenumber) twice)
    dup = pdf.sample(n=max(1, n // 40), random_state=int(rng.integers(2**31)))
    return pd.concat([pdf, dup], ignore_index=True)


def mut_events(rng, pdf):
    pdf = mut_numeric_extremes(rng, pdf, "value", positive=True)
    n = len(pdf)
    # same-instant ts groups (as-of join + session window tie attack)
    for _ in range(3):
        t = pdf["ts"].iloc[int(rng.integers(n))]
        idx = rng.choice(n, size=max(2, n // 30), replace=False)
        pdf.loc[pdf.index[idx], "ts"] = t
    # user skew: one user absorbs ~40%
    hot = int(pdf["user_id"].iloc[int(rng.integers(n))])
    idx = rng.choice(n, size=int(n * 0.4), replace=False)
    pdf.loc[pdf.index[idx], "user_id"] = hot
    # hostile-but-valid props payloads
    idx = rng.choice(n, size=max(1, n // 10), replace=False)
    ks = rng.integers(-(10**12), 10**12, size=len(idx))
    pdf.loc[pdf.index[idx], "props"] = [f'{{"k": {int(k)}}}' for k in ks]
    # duplicated rows incl. event_id
    dup = pdf.sample(n=max(1, n // 30), random_state=int(rng.integers(2**31)))
    return pd.concat([pdf, dup], ignore_index=True)


def mut_documents(rng, pdf):
    pdf = pdf.copy()
    n = len(pdf)
    texts = pdf["text"].tolist()

    def put(i, s):
        texts[i] = s

    # unicode monsters woven into real token streams
    for i in rng.choice(n, size=max(3, n // 12), replace=False):
        m = str(rng.choice(UNICODE_MONSTERS))
        put(int(i), f"{_rng_text(rng, 8)} {m} {_rng_text(rng, 8)}")
    # NFC/NFD doubles of one document
    if n >= 2:
        i, j = (int(x) for x in rng.choice(n, size=2, replace=False))
        base = f"{_rng_text(rng, 12)} café naïve résumé coöperate"
        put(i, unicodedata.normalize("NFC", base))
        put(j, unicodedata.normalize("NFD", base))
    # degenerate docs — includes NULL text: size(NULL tokens) is -1 in
    # Spark, so every ==0 zero-token guard that forgets to coalesce
    # pairs NULL docs with everything (r8 ADVICE -> dedup.tokens())
    degen = ["", " ", "\n\n\n", "a", "。", "🙂", "\t \t", "x" * 3,
             None, None, "\x0B", "\x0B\x0B \x0B"]
    for s, i in zip(degen, rng.choice(n, size=len(degen), replace=False)):
        put(int(i), s)
    # one very long doc (winnowing/token-count stress)
    put(int(rng.integers(n)), _rng_text(rng, 4000))
    # exact duplicates (dedup clusters) + near-duplicates (one token off)
    src = int(rng.integers(n))
    if texts[src] is None:  # planted NULL can't seed the near-dup pair
        src = next(i for i in range(n) if texts[i] is not None)
    for i in rng.choice(n, size=3, replace=False):
        put(int(i), texts[src])
    for i in rng.choice(n, size=2, replace=False):
        put(int(i), texts[src] + " extra")
    # duplicate-line doc (line dedup)
    put(int(rng.integers(n)), "\n".join([_rng_text(rng, 5)] * 6 + ["unique line"]))
    # monster PAIR sharing a 16-char prefix: exercises prefix-blocked
    # edit distance on non-ASCII (codepoint-vs-byte levenshtein trap)
    # including astral (surrogate-pair) chars
    i, j = (int(x) for x in rng.choice(n, size=2, replace=False))
    pre = "shared prefix 16x "
    put(i, pre + "café 漢字テキスト 𝔘𝔫𝔦 👩‍👩‍👧‍👦 tail one")
    put(j, pre + "cafe 漢字テスト 𝔘𝔫 👩‍👩‍👧 tail two")
    pdf["text"] = texts
    pdf["n_chars"] = [len(t) if t is not None else None for t in texts]
    return pdf


def mut_embeddings(rng, pdf):
    pdf = pdf.copy()
    n = len(pdf)
    vecs = [np.asarray(v, dtype=np.float32).copy() for v in pdf["embedding"]]
    dim = len(vecs[0])
    # zero vector(s)
    for i in rng.choice(n, size=2, replace=False):
        vecs[int(i)] = np.zeros(dim, dtype=np.float32)
    # exact duplicates (cosine ties in top-k)
    src = int(rng.integers(n))
    for i in rng.choice(n, size=3, replace=False):
        vecs[int(i)] = vecs[src].copy()
    # scaled copies (same direction, different norm) — 1e±3, not 1e±6:
    # a 1e6-norm vector pushes the PCA covariance trace to ~1e12 where
    # round-6 itself is past double's representable grain (see FUZZ.md)
    for i, s in zip(rng.choice(n, size=3, replace=False), [1e-3, 1e3, 2.0]):
        vecs[int(i)] = (vecs[src] * np.float32(s)).astype(np.float32)
    # single-label block
    if rng.random() < 0.5:
        idx = rng.choice(n, size=n // 4, replace=False)
        pdf.loc[pdf.index[idx], "label"] = np.int32(
            int(pdf["label"].iloc[int(rng.integers(n))])
        )
    pdf["embedding"] = vecs
    return pdf


MUTATORS = {
    "region": mut_region,
    "nation": mut_nation,
    "customer": mut_customer,
    "supplier": mut_supplier,
    "part": mut_part,
    "orders": mut_orders,
    "lineitem": mut_lineitem,
    "events": mut_events,
    "documents": mut_documents,
    "embeddings": mut_embeddings,
}


def make_tables(seed: int, out_dir: str, src_dir: str = SRC_DIR) -> str:
    """Write the mutated table set for ``seed`` under ``out_dir``,
    preserving every source schema bit-for-bit (dtypes, list<float>,
    timestamp[us]); row order is shuffled last for every table."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for t in TABLES:
        src = f"{src_dir}/{t}.parquet"
        schema = pq.read_schema(src).remove_metadata()
        pdf = pd.read_parquet(src)
        pdf = MUTATORS[t](rng, pdf)
        pdf = pdf.sample(frac=1.0, random_state=seed + 17).reset_index(drop=True)
        tbl = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
        pq.write_table(tbl, f"{out_dir}/{t}.parquet")
    return out_dir


def main() -> int:
    argv = sys.argv[1:]
    keep = "--keep" in argv
    argv = [a for a in argv if a != "--keep"]
    out_base = "/tmp/fuzz_tables"
    if "--out" in argv:
        i = argv.index("--out")
        out_base = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    n_seeds = int(argv[0]) if argv and argv[0].isdigit() else 3
    only = argv[1:] if argv and argv[0].isdigit() else argv

    from financial_data_pipeline_spark import get_spark
    from check_oracle import sweep

    spark = get_spark(shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    total_fail = 0
    bad: dict[int, list[str]] = {}
    for seed in range(n_seeds):
        d = f"{out_base}/seed{seed}"
        shutil.rmtree(d, ignore_errors=True)
        make_tables(seed, d)
        print(f"\n=== fuzz seed {seed} -> {d} ===")
        results, failures = sweep(spark, d, only=only, quiet=True)
        total_fail += failures
        if failures:
            bad[seed] = [k for k, v in results.items() if v["err"]]
        if not keep and not failures:
            shutil.rmtree(d, ignore_errors=True)
    print(f"\nfuzz-tables: {n_seeds} seeds, {total_fail} failing query-runs")
    for seed, names in bad.items():
        print(f"  seed {seed}: {names}")
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
