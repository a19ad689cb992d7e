"""Data-quality expectations (operators/quality.py): violation counts,
NULL semantics, uniqueness arithmetic, referential integrity, and the
single-pass plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.operators import quality as dq


@pytest.fixture()
def messy(spark):
    return spark.createDataFrame(
        [
            (1, "A", 10.0, 100),
            (2, "B", -5.0, 100),     # range violation
            (2, "B", 3.0, 100),      # duplicate id (with previous row)
            (None, "C", 7.0, 100),   # null id
            (4, "Z", 8.0, 999),      # bad category, bad fk
        ],
        "id long, cat string, score double, fk long",
    )


@pytest.fixture()
def dims(spark):
    return spark.createDataFrame([(100,), (200,)], "dim_id long")


def report(df, exps):
    return {r.rule: r for r in dq.validate(df, exps).collect()}


def test_row_rules_and_null_semantics(messy):
    got = report(
        messy,
        [
            dq.expect_not_null("id"),
            dq.expect_in_set("cat", ["A", "B", "C"]),
            dq.expect_in_range("score", 0.0, 50.0),
            dq.expect_satisfies("score_under_9", F.col("score") < 9.0),
        ],
    )
    assert got["id_not_null"].violations == 1
    assert got["cat_in_set"].violations == 1          # only 'Z'; NULLs would pass
    assert got["score_in_range"].violations == 1      # only -5.0
    assert got["score_under_9"].violations == 1       # 10.0
    assert all(r.total == 5 for r in got.values())
    assert not got["id_not_null"].passed


def test_unique_counts_surplus_rows(messy):
    got = report(messy, [dq.expect_unique("id"), dq.expect_unique("id", "cat")])
    # ids: 1,2,2,NULL,4 → 4 distinct (NULL is a distinct struct value) → 1 surplus
    assert got["unique_id"].violations == 1
    assert got["unique_id_cat"].violations == 1
    got2 = report(messy, [dq.expect_unique("id", "cat", "score")])
    assert got2["unique_id_cat_score"].violations == 0
    assert got2["unique_id_cat_score"].passed


def test_ref_integrity_ignores_nulls(messy, dims):
    got = report(messy, [dq.expect_ref_integrity("fk", dims, "dim_id")])
    assert got["fk_ref_integrity"].violations == 1   # only 999; rows with fk=100 ok
    assert got["fk_ref_integrity"].total == 5


def test_all_pass_report(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "id long, cat string")
    out = dq.validate(
        df, [dq.expect_not_null("id"), dq.expect_unique("id")]
    ).collect()
    assert all(r.passed and r.violations == 0 for r in out)


def test_requires_expectations(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        dq.validate(df, [])


def test_non_ref_rules_are_one_pass(spark, sf_dir):
    """Every non-referential rule shares ONE scan + ONE aggregate: the
    physical plan contains exactly one parquet scan (and no join)."""
    from covid_custom_sql_engine_spark.catalog import load_table

    l = load_table(spark, sf_dir, "lineitem")
    plan = (
        dq.validate(
            l,
            [
                dq.expect_not_null("l_orderkey"),
                dq.expect_in_range("l_quantity", 1, 45),
                dq.expect_unique("l_orderkey", "l_linenumber"),
            ],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_inclusion_audit_holds_and_violations(spark):
    """IND audit: a holding FK, a violated candidate with a counted
    unmatched set, and NULL children excluded from both sides."""
    from covid_custom_sql_engine_spark.operators.quality import inclusion_audit

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (5,), (None,)], "k int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    out = {
        r.candidate: r
        for r in inclusion_audit(
            [
                ("child.k in parent.k", child, "k", parent, "k"),
                ("parent.k in child.k", parent, "k", child, "k"),
            ]
        ).collect()
    }
    a = out["child.k in parent.k"]
    # distinct non-null children {1,2,5}: 5 unmatched
    assert (a.n_lhs_distinct, a.n_unmatched, a.holds) == (3, 1, False)
    b = out["parent.k in child.k"]
    assert (b.n_lhs_distinct, b.n_unmatched, b.holds) == (3, 1, False)
    ok = inclusion_audit(
        [("sub", spark.createDataFrame([(1,), (2,)], "k int"), "k", parent, "k")]
    ).collect()[0]
    assert ok.holds and ok.n_unmatched == 0
