"""Named regressions for the four round-8 ADVICE findings.

Each test pins one cross-engine parity bug class found by the r8
advisor, with the Spark engine and a DuckDB twin run side by side on a
purpose-built micro-frame (the fuzzed-table suite covers the same
classes statistically; these make each finding a named, deterministic
assertion):

1. U+000B tokenization: Java's ``\\s`` includes vertical tab, RE2's
   does not, so a bare ``\\S+`` token split diverged on \\x0B docs —
   pinned by the explicit ``WS_TOKEN_RE`` class on both sides.
2. NULL-text shingles: ``size(NULL)`` is -1 under ansi=false, so the
   ``== 0`` zero-token guard missed NULL docs and emitted a '' shingle
   pairing every NULL doc with every other — pinned by the coalesce in
   ``dedup.tokens``.
3. int64 sum overflow: Spark ``sum(long)`` wraps silently where DuckDB
   promotes to HUGEINT — pinned by summing through decimal(38,0).
4. Non-finite decimal render: double→decimal(38,6) yields NULL for
   NaN/±Inf/|x|>=1e32 in Spark but RAISES in DuckDB — pinned by
   explicit routing before the cast in ``profile.table_profile``.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators import dedup, winnow
from financial_data_pipeline_spark.operators.profile import table_profile
from financial_data_pipeline_spark.operators.text import (
    WS_TOKEN_RE,
    token_count_ws,
    ws_tokens,
)

VT = "\x0b"


# ---------------------------------------------------------------------------
# 1. U+000B — pinned whitespace class
# ---------------------------------------------------------------------------


def test_ws_tokens_vertical_tab_matches_duckdb(spark):
    texts = [f"{VT}a{VT}b", f"x{VT}", f"{VT}{VT} {VT}", "plain text"]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["toks"], r["n"])
        for r in sdf.select(
            ws_tokens(F.col("text"), lower=False).alias("toks"),
            token_count_ws(F.col("text")).alias("n"),
        ).collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": texts}))
    want = con.execute(
        r"SELECT regexp_extract_all(text, '[^ \t\n\x0B\f\r]+'),"
        r"       len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+'))"
        r" FROM t"
    ).fetchall()
    assert got == [(list(w[0]), w[1]) for w in want]
    # the actual Java semantics: \x0B separates tokens
    assert got[0] == (["a", "b"], 2)
    assert got[2] == ([], 0)


def test_ws_token_re_is_explicit_class():
    # a bare \S or \s anywhere in the pinned pattern would reintroduce
    # the engine-specific whitespace set
    assert "\\S" not in WS_TOKEN_RE and "\\s" not in WS_TOKEN_RE
    assert "\\x0B" in WS_TOKEN_RE


# ---------------------------------------------------------------------------
# 2. NULL text — no shingles, no fingerprints
# ---------------------------------------------------------------------------


@pytest.fixture()
def null_text_docs(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, None),
        (3, None),
        (4, ""),
        (5, "alpha beta gamma delta"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_null_text_docs_emit_no_shingles(spark, null_text_docs):
    sh = dedup.shingle_rows(null_text_docs, k=3)
    ids = {r["doc_id"] for r in sh.select("doc_id").distinct().collect()}
    # docs 2/3 (NULL) and 4 (empty) contribute nothing; the real pair does
    assert ids == {1, 5}
    # and therefore NULL docs never pair: jaccard over these docs only
    # reports the genuine duplicate pair
    pairs = dedup.jaccard_pairs(null_text_docs, k=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 5)}


def test_null_text_docs_emit_no_winnow_grams(spark, null_text_docs):
    kg = winnow.kgram_rows(null_text_docs, k=8)
    ids = {r["id"] for r in kg.select("id").distinct().collect()}
    assert ids == {1, 5}


# ---------------------------------------------------------------------------
# 3. int64 overflow — decimal-exact group sums
# ---------------------------------------------------------------------------


def test_bigint_sum_overflow_matches_duckdb_hugeint(spark):
    # 2x overflows int64 (wraps to a negative long sum) but stays under
    # 2^64: parity is exact for |group sum| < 2^64 — above that DuckDB's
    # hugeint→double conversion goes through two 64-bit halves and can
    # land 1 ULP off the correctly-rounded double both Spark's decimal
    # cast and Python produce (verified against 3x = 2.77e19)
    near_max = 9_223_372_036_854_775_000
    rows = [("a", near_max), ("a", near_max), ("b", 7)]
    sdf = spark.createDataFrame(rows, "g string, k long")
    got = {
        r["g"]: r["avg_k"]
        for r in sdf.groupBy("g")
        .agg(
            F.round(
                F.sum(F.col("k").cast("decimal(38,0)"))
                / F.count("k").cast("double"),
                2,
            ).alias("avg_k")
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "k"]))
    want = dict(
        con.execute(
            "SELECT g, round(sum(k) / count(k)::DOUBLE, 2) FROM t GROUP BY g"
        ).fetchall()
    )
    assert got == want
    # regression guard: the wrapped long sum would have been negative
    wrapped = sdf.filter("g = 'a'").agg(F.sum("k").alias("s")).collect()[0]["s"]
    assert wrapped < 0, "long sum no longer wraps — revisit this pin"


# ---------------------------------------------------------------------------
# 4. non-finite profile render
# ---------------------------------------------------------------------------


DUCKDB_RENDER_CASE = (
    "CASE WHEN isnan({a}) THEN 'NaN' "
    "WHEN isinf({a}) AND {a} > 0 THEN 'Inf' "
    "WHEN isinf({a}) THEN '-Inf' "
    "WHEN abs({a}) >= 1e32 THEN 'out-of-range' "
    "ELSE {a}::DECIMAL(38,6)::VARCHAR END"
)


def _duckdb_minmax(vals):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    return con.execute(
        f"SELECT {DUCKDB_RENDER_CASE.format(a='min(x)')},"
        f"       {DUCKDB_RENDER_CASE.format(a='max(x)')} FROM t"
    ).fetchone()


def test_profile_render_inf_matches_duckdb(spark):
    # NaN-free: full cross-engine parity, including ±Inf and the
    # decimal(38,6) out-of-range branch — where the old render made the
    # oracle RAISE (::DECIMAL on Inf) while Spark returned NULL
    vals = [1.5, float("inf"), float("-inf"), 3.0]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    prof = table_profile(sdf, ["x"]).collect()[0]
    assert (prof["min_val"], prof["max_val"]) == _duckdb_minmax(vals)
    assert (prof["min_val"], prof["max_val"]) == ("-Inf", "Inf")


def test_profile_render_nan_documented_divergence(spark):
    # NaN is EXCLUDED from the parity contract: Spark's min/max order
    # NaN greatest (max -> 'NaN') while DuckDB's aggregate comparisons
    # skip NaN when any other value competes (max -> 'Inf'). The render
    # keeps both sides comparable strings instead of NULL-vs-raise; if
    # either engine changes ordering semantics this pin will flag it.
    vals = [1.5, float("nan"), float("inf"), 3.0]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    prof = table_profile(sdf, ["x"]).collect()[0]
    assert prof["max_val"] == "NaN"
    assert _duckdb_minmax(vals)[1] == "Inf"


def test_profile_render_out_of_range(spark):
    sdf = spark.createDataFrame([(2.5e32,), (1.0,)], "x double")
    prof = table_profile(sdf, ["x"]).collect()[0]
    assert prof["max_val"] == "out-of-range"
    assert prof["min_val"] == "1.000000"
