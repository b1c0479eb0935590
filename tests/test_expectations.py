"""Expectation-suite tests: planted violations are counted exactly,
clean data passes, and the gate helper applies allowances."""

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.operators.expectations import (
    expect_between,
    expect_in_set,
    expect_matches,
    expect_not_null,
    expect_predicate,
    expectation_suite,
    is_valid,
    referential_violations,
    unique_violations,
    validate,
)


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, 10.0, "A", "x@y.com"),
        (2, None, "N", "bad-email"),   # null qty + pattern miss
        (2, 99.0, "Z", None),          # dup key + range + set + null email
        (4, 5.0, "R", "a@b.org"),
    ]
    return spark.createDataFrame(rows, ["k", "qty", "flag", "email"])


def test_row_local_counters_exact(spark, dirty):
    row = validate(
        dirty,
        [
            expect_not_null("qty"),
            expect_between("qty", 0, 50),
            expect_in_set("flag", ["A", "N", "R"]),
            expect_matches("email", r"^[^@]+@[^@]+\.[a-z]+$"),
        ],
    ).first()
    assert row["total_rows"] == 4
    assert row["qty_null"] == 1
    assert row["qty_out_of_range"] == 1      # nulls don't double-count
    assert row["flag_not_in_set"] == 1
    assert row["email_pattern_mismatch"] == 1


def test_unique_and_referential(spark, dirty):
    assert unique_violations(dirty, ["k"]).first()["duplicate_key_rows"] == 1
    dim = spark.createDataFrame([(1,), (2,)], ["id"])
    assert (
        referential_violations(dirty, "k", dim, "id").first()["orphan_rows"] == 1
    )  # k=4 has no parent


def test_suite_and_gate(spark, dirty):
    rep = expectation_suite(
        dirty,
        [expect_not_null("qty")],
        unique_keys=["k"],
        ref=(spark.createDataFrame([(1,), (2,), (4,)], ["id"]), "k", "id"),
    ).first()
    assert not is_valid(rep)
    assert is_valid(rep, allow={"qty_null": 1, "duplicate_key_rows": 1})


def test_clean_data_passes(spark):
    clean = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("qty")
    )
    rep = expectation_suite(
        clean,
        [expect_not_null("qty"), expect_between("qty", 0, 9)],
        unique_keys=["k"],
    ).first()
    assert is_valid(rep)


def test_predicate_nulls_count_as_violations(spark):
    df = spark.createDataFrame([(None,), (2.0,)], ["x"])
    row = validate(
        df, [expect_predicate("x_positive", F.col("x") > 0)]
    ).first()
    assert row["x_positive"] == 1


def test_table_profile_exact_and_approx(spark):
    from financial_data_pipeline_spark.operators.profile import table_profile
    from financial_data_pipeline_spark.sources.adapters import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    prof = {r.column: r for r in
            table_profile(orders, ["o_custkey", "o_orderstatus"]).collect()}
    pdf = orders.toPandas()
    assert prof["o_custkey"].n_rows == len(pdf)
    assert prof["o_custkey"].ndv == pdf["o_custkey"].nunique()
    assert prof["o_orderstatus"].n_null == int(
        pdf["o_orderstatus"].isna().sum()
    )
    assert prof["o_custkey"].min_val == str(pdf["o_custkey"].min())

    # HLL++ swap: within the documented ~5% relative error
    ap = {r.column: r for r in
          table_profile(orders, ["o_custkey"], approx=True).collect()}
    exact = prof["o_custkey"].ndv
    assert abs(ap["o_custkey"].ndv - exact) <= max(3, 0.05 * exact)
    # single-scan contract: one row per column, same n_rows everywhere
    assert {r.n_rows for r in prof.values()} == {len(pdf)}


def test_quarantine_split_row_level_gate(spark):
    from financial_data_pipeline_spark.operators.expectations import (
        expect_between,
        expect_not_null,
        quarantine_split,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 99.0), (4, None)],
        ["id", "v"],
    )
    exps = [expect_not_null("v"), expect_between("v", 0, 10)]
    valid, quar = quarantine_split(df, exps)
    assert [r.id for r in valid.orderBy("id").collect()] == [1]
    got = {r.id: set(r["__violations"]) for r in quar.collect()}
    assert got[2] == {"v_null"} == got[4]
    assert got[3] == {"v_out_of_range"}
    assert valid.columns == df.columns  # schema passthrough
    # partition: every row lands exactly one side
    assert valid.count() + quar.count() == df.count()
