"""Pytest wrapper for the property-based differential fuzzer
(``tools/fuzz_oracle.py`` — round-8 verdict item 2).

Each (seed, check) pair is one case: a seeded random dirty corpus
(gaps, nulls, NaN heads, constant columns, duplicate keys, single-row
symbols, epoch edges, junk strings) pushed through a cleaning /
resample / indicator / split operator and compared differentially
against pandas reference semantics. 20 seeds × 13 checks = 260 cases.

A divergence found here becomes a pinned fixture — the first was the
"1e400" double-overflow coercion (pandas ``to_numeric`` coerces to
NaN, a bare Spark cast saturates to Infinity), pinned in
``coerce_numeric`` and re-asserted explicitly below.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import fuzz_oracle  # noqa: E402

SEEDS = range(20)


@pytest.mark.parametrize("check", sorted(fuzz_oracle.CHECKS))
def test_fuzz_differential(spark, check):
    """Run every seed through one check; aggregate divergences so a
    failure names every bad seed at once."""
    bad = {}
    for seed in SEEDS:
        errs = fuzz_oracle.CHECKS[check](spark, seed)
        if errs:
            bad[seed] = errs
    assert not bad, f"{check}: {bad}"


def test_overflow_coercion_pinned(spark):
    """Regression fixture for the fuzzer's first find: string literals
    that overflow double coerce to null (pandas parity), while explicit
    infinity tokens stay infinite."""
    from financial_data_pipeline_spark.operators.cleaning import coerce_numeric

    df = spark.createDataFrame(
        [("1e400",), ("-1e400",), ("inf",), ("-Infinity",), ("1e3",), ("abc",)],
        "close string",
    )
    got = [r.close for r in coerce_numeric(df, ["close"]).collect()]
    assert got[0] is None and got[1] is None
    assert got[2] == float("inf") and got[3] == float("-inf")
    assert got[4] == 1000.0 and got[5] is None
