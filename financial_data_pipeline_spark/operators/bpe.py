"""Distributed byte-pair-encoding (BPE) vocabulary induction.

The tokenizer-training counterpart of the text/curation stack
(Sennrich et al. 2016, public paper): learn the top-N merge rules from
a corpus, then encode the corpus with them.

Scale design — the whole point of the distributed formulation:

- **Learning never re-scans the corpus.** BPE statistics depend only
  on the word → frequency map, so ONE corpus pass builds the weighted
  vocabulary table (|distinct words| rows — megabytes where the corpus
  is terabytes) and all ``n_merges`` iterations run against that
  table. Each round is: adjacent-pair explode + one weighted count
  aggregate + a 1-row argmax collect (the k-means pattern: a tiny
  per-round driver value steering the next distributed step), then a
  pure-codegen fold rewrites the symbol arrays. A lazy
  ``localCheckpoint`` after every fold pins the plan depth to one fold
  per round (materialized by the round's own argmax job — no extra
  job).
- **Encoding touches each distinct word once.** ``apply_bpe`` encodes
  the distinct-word table (same fold, merges replayed in rank order)
  and broadcast-joins word → tokens back onto the corpus — the corpus
  itself is scanned once and never carries intermediate symbol arrays.

Greedy semantics match the reference algorithm exactly: within a
round, occurrences of the pair merge left-to-right without
re-considering the freshly merged token ("aaa" + (a,a) → ["aa","a"]),
and pair counting counts overlapping occurrences (zip(w, w[1:])).
Ties break on (count desc, left asc, right asc) — deterministic, so
two engines (or a pure-Python reference) learn identical merge lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators.text import ws_tokens

END_OF_WORD = "</w>"


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    words = F.explode(ws_tokens(F.col(text_col))).alias("word")
    return (
        df.select(words)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def _initial_symbols(word: Column) -> Column:
    """Characters + an end-of-word sentinel (so a word-final merge is a
    different token than the same pair mid-word — the standard setup)."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _merge_fold(sym: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping replacement of the (left, right)
    adjacent pair with its concatenation — a pure-codegen ``aggregate``
    fold carrying (output-so-far, pending-symbol) state."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        return (
            F.when(acc["pend"].isNull(), F.struct(acc["arr"].alias("arr"), x.alias("pend")))
            .when(
                (acc["pend"] == left) & (x == right),
                F.struct(
                    F.concat(acc["arr"], F.array(F.lit(merged))).alias("arr"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["arr"], F.array(acc["pend"])).alias("arr"),
                    x.alias("pend"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["pend"].isNull(), acc["arr"]).otherwise(
            F.concat(acc["arr"], F.array(acc["pend"]))
        )

    return F.aggregate(sym, init, step, finish)


# NOTE (r7, measured): gating the fold behind a per-row "contains the
# pair" predicate (when(exists(...), fold).otherwise(sym)) is a
# PESSIMIZATION here, not the obvious win: Catalyst's projection
# collapse merges the per-round selects into one nested expression, so
# the extra exists() roughly triples the expression size PER ROUND —
# exponential analysis blowup between checkpoints (a 12-round learn at
# checkpoint_every=8 stopped terminating; at checkpoint_every=4 it ran
# 2.7 s -> 3.8 s). The plain fold's per-row cost is not the bottleneck
# at any measured scale (the 12 sequential argmax jobs are — see
# BENCH_DETAIL), so each round folds every row unconditionally.


def _pair_counts(vocab: DataFrame) -> DataFrame:
    n = F.size("sym")
    pairs = F.arrays_zip(
        F.slice("sym", 1, n - 1).alias("l"), F.slice("sym", 2, n - 1).alias("r")
    )
    return (
        vocab.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "weight")
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("weight").alias("cnt"))
    )


def _learn_merges_driver(
    word_counts: dict[str, int], n_merges: int, min_count: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side merge loop over a collected word→weight map —
    value-identical to the distributed rounds: integer pair counts
    over the same symbol sequences (overlap-counting, exactly like
    ``_pair_counts``'s zip of adjacent slices), the same
    (count desc, left asc, right asc) argmax (Python string comparison
    is code-point order ≡ Spark/DuckDB binary UTF-8 order), and the
    same greedy left-to-right non-overlapping rewrite as
    ``_merge_fold``. Identical symbol sequences share one dict entry
    (weights summed) — a pure dedup, invisible to the counts."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        key = tuple(list(w) + [END_OF_WORD])
        vocab[key] = vocab.get(key, 0) + c
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((rank, left, right, cnt))
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == left
                    and sym[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 8,
    driver_threshold: int = 200_000,
) -> list[tuple[int, str, str, int]]:
    """Learn up to ``n_merges`` merge rules; returns
    ``[(rank, left, right, pair_count), …]``. Stops early when no pair
    reaches ``min_count``.

    Execution is size-adaptive (r9 optimization, the
    ``dedup_clusters`` ``driver_threshold`` pattern): BPE statistics
    depend only on the word→frequency map, which is orders of
    magnitude smaller than the corpus — when it fits the driver
    (≤ ``driver_threshold`` distinct words ≈ tens of MB) the merge
    loop runs in-process over the COLLECTED map instead of as
    ``n_merges`` sequential distributed argmax jobs (measured: the 12
    per-round jobs, not per-row fold cost, dominated the distributed
    learn at every test SF — 2.75 s → ~0.6 s at sf0.1). Tokenization
    stays distributed either way (one corpus pass builds the map), and
    the driver loop replays the identical integer/tie-break semantics,
    so the learned merges are equal by construction. A web-scale
    typo-heavy vocabulary (1e9+ distinct words) exceeds the threshold
    and takes the distributed rounds unchanged; ``driver_threshold=0``
    forces them (oracle-exercised via ``bpe_merges_distributed``).

    ``checkpoint_every`` is retained for API compatibility but unused
    by the learn loop since r10: the per-round lazy checkpoint bounds
    plan depth at one fold (``apply_bpe`` still uses the cadence — its
    replay loop has no per-round action to piggyback on)."""
    wc = _word_counts(df, text_col)
    if driver_threshold > 0:
        rows = wc.limit(driver_threshold + 1).collect()
        if len(rows) <= driver_threshold:
            return _learn_merges_driver(
                {r["word"]: int(r["weight"]) for r in rows},
                n_merges,
                min_count,
            )
    vocab = wc.select(
        _initial_symbols(F.col("word")).alias("sym"), "weight"
    )
    # The vocab table is orders of magnitude smaller than the corpus —
    # collapse it to a few partitions so the 12+ per-round jobs don't
    # pay 32-task scheduling overhead each (size the constant up for
    # genuinely huge vocabularies).
    #
    # Per-round LAZY checkpoint (r10, guide §2.4/§7.3): every round
    # already runs one action (the argmax collect), so a lazy
    # localCheckpoint after each fold is materialized BY that action —
    # no standalone checkpoint job — while truncating the plan so each
    # round's argmax analyzes/compiles exactly ONE fold over a
    # LogicalRDD instead of up to ``checkpoint_every`` nested folds
    # (the fold is a large case-when HOF; chained copies dominated the
    # per-round driver time). Each fold now also EXECUTES exactly once
    # (under the eager cadence, rounds between checkpoints re-ran all
    # folds since the last one). Values are untouched: same folds, same
    # counts, same argmax.
    vocab = vocab.coalesce(4).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0].cnt < min_count:
            break
        left, right, cnt = top[0].left, top[0].right, int(top[0].cnt)
        merges.append((rank, left, right, cnt))
        vocab = vocab.select(
            _merge_fold(F.col("sym"), left, right).alias("sym"), "weight"
        ).localCheckpoint(eager=False)
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    checkpoint_every: int = 8,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Encode ``text_col`` with a learned merge list: the corpus's
    DISTINCT words are encoded once (merges replayed in rank order over
    the word table, checkpointed to bound plan depth) and broadcast-
    joined back — the corpus scan carries only the final token arrays.
    """
    words = (
        df.select(
            F.explode(ws_tokens(F.col(text_col))).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    enc = words.select("word", _initial_symbols(F.col("word")).alias("sym"))
    for i, (_, left, right, _) in enumerate(sorted(merges)):
        enc = enc.select("word", _merge_fold(F.col("sym"), left, right).alias("sym"))
        if (i + 1) % checkpoint_every == 0:
            enc = enc.localCheckpoint()
    # A web-scale distinct-word table (typo-heavy crawls reach 1e9+
    # words) can exceed broadcast limits — broadcast_vocab=False leaves
    # the join strategy to Catalyst/AQE (sort-merge on the word key)
    lookup = enc.withColumnRenamed("sym", out_col)
    if broadcast_vocab:
        lookup = F.broadcast(lookup)
    # posexplode + sorted reassembly: collect_list order is NOT
    # guaranteed after the join, so the word position rides along and
    # an array_sort on (pos, tokens) structs restores document order
    exploded = df.select(
        *df.columns,
        F.posexplode(ws_tokens(F.col(text_col))).alias(
            "__p", "__w"
        ),
    ).filter(F.col("__w") != "")
    joined = exploded.join(lookup, exploded["__w"] == lookup["word"], "left")
    keys = [c for c in df.columns]
    ordered = F.array_sort(F.collect_list(F.struct(F.col("__p"), F.col(out_col))))
    return joined.groupBy(*keys).agg(
        F.flatten(F.transform(ordered, lambda s: s[out_col])).alias(out_col)
    )
