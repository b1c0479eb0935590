"""Declarative data-quality expectations (dbt-test / Deequ-style).

The reference validates OHLCV frames with hand-rolled counter code
(``data_validator.py``, ``data_cleaner.py:82-167`` — already ported in
``plans/report.py``). This module generalizes that pattern to ANY
table: callers declare expectations (not-null, unique key, value
range, set membership, referential integrity, custom predicate) and
``validate`` evaluates ALL row-local ones in ONE aggregate pass over a
single scan — violation counts are conditional sums, so the cost is
one map-side-combined aggregate regardless of how many expectations
are declared. Uniqueness and referential checks need their own
shuffle/join by nature and are computed as separate small plans over
the same cached scan lineage.

At 100 TB: the row-local pass is scan-bound (no shuffle); the unique
check shuffles only the key columns; the referential check is a
left-anti join that broadcasts the dimension side when small. Nothing
collects to the driver except the one-row counter frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """name + a violation condition (Column) evaluated per row."""

    name: str
    violation: Column


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"{col}_null", F.col(col).isNull())


def expect_between(col: str, lo, hi) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"{col}_out_of_range", c.isNotNull() & ((c < lo) | (c > hi))
    )


def expect_in_set(col: str, allowed: list) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"{col}_not_in_set", c.isNotNull() & ~c.isin(allowed)
    )


def expect_matches(col: str, regex: str) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"{col}_pattern_mismatch", c.isNotNull() & ~c.rlike(regex)
    )


def expect_predicate(name: str, predicate: Column) -> Expectation:
    """Custom row predicate that must HOLD; violation = NOT predicate.
    Null predicate results count as violations (unknown ≠ pass)."""
    return Expectation(name, ~F.coalesce(predicate, F.lit(False)))


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """One-row frame: total_rows + one violation counter per
    expectation — a single aggregate over a single scan."""
    aggs = [F.count(F.lit(1)).alias("total_rows")] + [
        F.sum(e.violation.cast("long")).alias(e.name) for e in expectations
    ]
    return df.agg(*aggs)


def unique_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """One row: number of EXTRA rows beyond one per key (0 = key is
    unique). Shuffles only the key columns."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias(
                "duplicate_key_rows"
            )
        )
    )


def referential_violations(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """One row: fact rows whose key has no match in the dimension —
    a left-anti join (Catalyst broadcasts the dim side when small)."""
    missing = fact.select(F.col(fact_key)).join(
        dim.select(F.col(dim_key).alias(fact_key)),
        on=fact_key,
        how="left_anti",
    )
    return missing.agg(F.count(F.lit(1)).alias("orphan_rows"))


def expectation_suite(
    df: DataFrame,
    expectations: list[Expectation],
    unique_keys: list[str] | None = None,
    ref: tuple[DataFrame, str, str] | None = None,
) -> DataFrame:
    """Full suite as ONE one-row result: row-local counters, optional
    unique-key counter, optional referential counter — crossJoined
    1-row frames (each side is a single row; the join is free)."""
    out = validate(df, expectations)
    if unique_keys:
        out = out.crossJoin(unique_violations(df, unique_keys))
    if ref is not None:
        dim, fact_key, dim_key = ref
        out = out.crossJoin(referential_violations(df, fact_key, dim, dim_key))
    return out


def is_valid(report_row, allow: dict[str, int] | None = None) -> bool:
    """Gate helper: True iff every violation counter is within its
    allowance (default 0). ``report_row`` is the collected first row of
    an ``expectation_suite`` frame."""
    allow = allow or {}
    d = report_row.asDict()
    return all(
        v <= allow.get(k, 0)
        for k, v in d.items()
        if k != "total_rows" and v is not None
    )


def quarantine_split(
    df: DataFrame,
    expectations: list[Expectation],
    reason_col: str = "__violations",
) -> tuple[DataFrame, DataFrame]:
    """Row-level gate: ``(valid, quarantined)`` — the dead-letter path
    the counter suite deliberately avoids. Each quarantined row carries
    the NAMES of the expectations it violates (an array column), so
    the quarantine is self-describing and re-processable after a rule
    fix; valid rows pass through schema-unchanged.

    Shape: one flag projection (same conditional expressions the
    counter pass uses) + two filters over the SAME lineage — Spark
    evaluates the scan once per sink but never shuffles; at 100 TB
    write both sides in one pass via the flagged frame if two scans
    hurt (documented trade)."""
    flags = F.array_compact(
        F.array(
            *[
                F.when(e.violation, F.lit(e.name)) for e in expectations
            ]
        )
    )
    flagged = df.withColumn(reason_col, flags)
    valid = flagged.filter(F.size(reason_col) == 0).drop(reason_col)
    quarantined = flagged.filter(F.size(reason_col) > 0)
    return valid, quarantined
