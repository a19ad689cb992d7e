"""Parity-sensitive edge cases for core operators (SURVEY §5 list)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from covid_custom_sql_engine_spark.operators import (
    ref_sort,
    ref_group_agg,
    ref_join,
    safe_corr,
    select_existing,
    whole_table_agg,
)
from covid_custom_sql_engine_spark.operators.core import dsum


def test_sort_nulls_ascending_last(spark):
    # reference sort_values: ascending → nulls LAST (dataframe.py:180)
    df = spark.createDataFrame([(1, 3.0), (2, None), (3, 1.0)], "id int, v double")
    got = [r.id for r in ref_sort(df, "v", ascending=True).collect()]
    assert got == [3, 1, 2]


def test_sort_nulls_descending_first(spark):
    # descending → nulls FIRST (opposite of Spark's default)
    df = spark.createDataFrame([(1, 3.0), (2, None), (3, 1.0)], "id int, v double")
    got = [r.id for r in ref_sort(df, "v", ascending=False).collect()]
    assert got == [2, 1, 3]


def test_group_agg_count_star_semantics(spark):
    # count counts ALL rows incl. null values = COUNT(*) (dataframe.py:53-54)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)], "k string, v double"
    )
    rows = {r.k: r for r in ref_group_agg(df, "k", {"v": ["count", "sum"]}).collect()}
    assert rows["a"].count_v == 3
    assert rows["b"].count_v == 1
    assert rows["b"].sum_v is None  # no numeric values → None (dataframe.py:55-56)


def test_group_agg_std_single_value_null(spark):
    # std of <2 numeric values → None (dataframe.py:76-82)
    df = spark.createDataFrame([("a", 1.0), ("b", 1.0), ("b", 2.0)], "k string, v double")
    rows = {r.k: r for r in ref_group_agg(df, "k", {"v": ["std"]}).collect()}
    assert rows["a"].std_v is None
    assert rows["b"].std_v == pytest.approx(math.sqrt(0.5))


def test_group_agg_median_even_interpolation(spark):
    # even count → mean of two middles (dataframe.py:68-75)
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("a", 10.0), ("a", 20.0)], "k string, v double")
    (r,) = ref_group_agg(df, "k", {"v": ["median"]}).collect()
    assert r.median_v == 6.0


def test_group_agg_missing_column_all_none(spark):
    # missing value column → all-None aggregates (dataframe.py:42-45)
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    (r,) = ref_group_agg(df, "k", {"nope": ["count", "sum", "avg"]}).collect()
    assert r.count_nope is None and r.sum_nope is None and r.avg_nope is None


def test_group_agg_unknown_fn_raises(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError):
        ref_group_agg(df, "k", {"v": ["variance"]})


def test_group_agg_null_key_is_a_group(spark):
    # None is a legal group key component (dataframe.py:25)
    df = spark.createDataFrame([(None, 1.0), (None, 2.0), ("x", 3.0)], "k string, v double")
    rows = ref_group_agg(df, "k", {"v": ["sum"]}).collect()
    by_key = {r.k: r.sum_v for r in rows}
    assert by_key[None] == 3.0 and by_key["x"] == 3.0


def test_deterministic_agg_matches_plain(spark):
    df = spark.createDataFrame([("a", float(i)) for i in range(100)], "k string, v double")
    det = ref_group_agg(df.repartition(8), "k", {"v": ["sum", "avg", "std"]}, deterministic=True)
    plain = ref_group_agg(df, "k", {"v": ["sum", "avg", "std"]})
    (d,), (p,) = det.collect(), plain.collect()
    assert d.sum_v == pytest.approx(p.sum_v)
    assert d.avg_v == pytest.approx(p.avg_v)
    assert d.std_v == pytest.approx(p.std_v, rel=1e-6)


def test_projection_drops_missing_silently(spark):
    # dataframe.py:150-151
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    assert select_existing(df, ["a", "zzz"]).columns == ["a"]
    with pytest.raises(ValueError):
        select_existing(df, ["zzz"])
    with pytest.raises(ValueError):
        select_existing(df, [])


def test_join_r_prefix_and_null_keys(spark):
    # right columns prefixed r_ incl. join key (dataframe.py:231-233);
    # null build keys skipped; null probe keys never match (225-228)
    left = spark.createDataFrame([(1, "x"), (None, "y"), (2, "z")], "k int, lv string")
    right = spark.createDataFrame([(1, "A"), (None, "B")], "k int, rv string")
    out = ref_join(left, right, on=("k", "k"), how="inner")
    assert set(out.columns) == {"k", "lv", "r_k", "r_rv"}
    rows = out.collect()
    assert len(rows) == 1 and rows[0].lv == "x" and rows[0].r_rv == "A"


def test_join_left_emits_unmatched_with_nulls(spark):
    # dataframe.py:242-246
    left = spark.createDataFrame([(1, "x"), (3, "w")], "k int, lv string")
    right = spark.createDataFrame([(1, "A")], "k int, rv string")
    rows = {r.k: r for r in ref_join(left, right, on=("k", "k"), how="left").collect()}
    assert rows[3].r_rv is None and rows[1].r_rv == "A"


def test_join_one_to_many_duplication(spark):
    # one-to-many duplication (dataframe.py:235-241)
    left = spark.createDataFrame([(1, "x")], "k int, lv string")
    right = spark.createDataFrame([(1, "A"), (1, "B")], "k int, rv string")
    assert ref_join(left, right, on=("k", "k")).count() == 2


def test_join_unsupported_type(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(NotImplementedError):
        ref_join(df, df, on=("k", "k"), how="outer")


def test_safe_corr_min_pairs_null(spark):
    df = spark.createDataFrame([(1.0, 2.0), (2.0, 4.0), (3.0, None)], "x double, y double")
    (r,) = safe_corr(df, "x", "y").collect()  # only 2 complete pairs
    assert r.corr is None


def test_safe_corr_zero_variance_zero(spark):
    # zero denominator → 0.0, not NaN/NULL (dataframe.py:271)
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double")
    (r,) = safe_corr(df, "x", "y").collect()
    assert r.corr == 0.0


def test_safe_corr_perfect(spark):
    df = spark.createDataFrame([(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)], "x double, y double")
    (r,) = safe_corr(df, "x", "y").collect()
    assert r.corr == pytest.approx(1.0)


def test_whole_table_agg_skips_unknown_columns(spark):
    # dataframe.py:210
    df = spark.createDataFrame([(1.0,)], "v double")
    out = whole_table_agg(df, {"v": ["sum"], "zzz": ["sum"]})
    assert out.columns == ["sum_v"]


def test_dsum_partition_independence(spark):
    vals = [(float(i) * 0.1,) for i in range(1000)]
    df = spark.createDataFrame(vals, "v double")
    a = df.repartition(1).agg(dsum(F.col("v")).alias("s")).collect()[0].s
    b = df.repartition(17).agg(dsum(F.col("v")).alias("s")).collect()[0].s
    assert a == b  # bit-identical, not just approx


def test_approx_percentile_within_bound(spark, sf_dir):
    """approx_percentile accuracy parameter bounds rank error vs the
    exact percentile (the approximate-aggregates scale path)."""
    from covid_custom_sql_engine_spark.catalog import load_table
    from pyspark.sql import functions as F

    l = load_table(spark, sf_dir, "lineitem")
    r = l.agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx"),
        F.count("l_extendedprice").alias("n"),
    ).collect()[0]
    # rank error ≤ n/accuracy ⇒ value within the local value spread;
    # for a sanity bound assert within 1% of the exact median's value
    assert abs(r.approx - r.exact) <= abs(r.exact) * 0.01
