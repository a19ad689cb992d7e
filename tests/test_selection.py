"""Distributed exact median: equivalence with F.median on edge cases."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.operators.selection import exact_median


def _check(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = exact_median(df, "v")
    exp = df.agg(F.median("v")).collect()[0][0]
    if exp is None:
        assert got is None
    else:
        assert got == pytest.approx(exp, abs=1e-12)


def test_odd_even_counts(spark):
    _check(spark, [3.0, 1.0, 2.0])
    _check(spark, [4.0, 1.0, 3.0, 2.0])  # even: interpolates 2.5


def test_nulls_ignored(spark):
    _check(spark, [None, 5.0, None, 1.0, 3.0])


def test_all_equal_and_empty(spark):
    _check(spark, [7.0] * 50)
    _check(spark, [None, None])


def test_two_values(spark):
    _check(spark, [1.0, 2.0])


def test_random_matches_builtin(spark):
    rng = random.Random(7)
    for n in (11, 100, 1001):
        _check(spark, [rng.uniform(-1000, 1000) for _ in range(n)])
    _check(spark, [float(rng.randint(0, 5)) for _ in range(500)])  # heavy ties


def test_skewed_bucket_distribution(spark):
    # 99% of mass in a narrow band + far outliers: ranks land in a
    # crowded bucket
    vals = [1.0 + i * 1e-9 for i in range(999)] + [1e9]
    _check(spark, vals)
