"""Known-value unit tests for the rank-statistics helpers
(selection.mann_whitney_u / average_ranks) and spot semantics of the
round-10-continuation time-series queries."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.operators import selection as sel


def test_average_ranks_midranks(spark):
    df = spark.createDataFrame(
        [(10.0,), (20.0,), (20.0,), (30.0,)], "v double"
    )
    got = {
        r["v"]: r["r"]
        for r in sel.average_ranks(df, "v", "r").collect()
    }
    assert got == {10.0: 1.0, 20.0: 2.5, 30.0: 4.0}


def test_average_ranks_null_gets_null(spark):
    df = spark.createDataFrame([(1.0,), (None,), (2.0,)], "v double")
    rows = sel.average_ranks(df, "v", "r").collect()
    by_v = {r["v"]: r["r"] for r in rows}
    assert by_v[1.0] == 1.0 and by_v[2.0] == 2.0
    assert by_v[None] is None


def test_mann_whitney_no_ties_exact(spark):
    # a = {1,2,3}, b = {4,5,6}: R_a = 6, U = 0, var = (9/12)*7 = 5.25
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (3.0, "a"), (4.0, "b"), (5.0, "b"), (6.0, "b")],
        "v double, g string",
    )
    row = sel.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert (row["n_a"], row["n_b"]) == (3, 3)
    assert row["u_stat"] == 0.0
    assert row["z_stat"] == round(-4.5 / math.sqrt(5.25), 6)
    assert bool(row["significant"]) == (abs(row["z_stat"]) > 1.959964)


def test_mann_whitney_ties_midranks(spark):
    # a = {1,1,2}, b = {1,2,2}: value 1 has t=3 (ranks 1-3, midrank 2),
    # value 2 has t=3 (ranks 4-6, midrank 5). R_a = 2+2+5 = 9, U = 3.
    # ties term = 2*(27-3) = 48; var = (9/12)*((7) - 48/(6*5)) = 5.4/...
    df = spark.createDataFrame(
        [(1.0, "a"), (1.0, "a"), (2.0, "a"), (1.0, "b"), (2.0, "b"), (2.0, "b")],
        "v double, g string",
    )
    row = sel.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert row["u_stat"] == 3.0
    var = (9 / 12.0) * (7 - 48 / 30.0)
    assert row["z_stat"] == round((3.0 - 4.5) / math.sqrt(var), 6)


def test_mann_whitney_empty_group_null_z(spark):
    df = spark.createDataFrame([(1.0, "a"), (2.0, "a")], "v double, g string")
    row = sel.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert row["n_b"] == 0
    assert row["z_stat"] is None


def test_running_sums_matches_ordered_cumsum(spark):
    df = spark.createDataFrame(
        [(5, 2), (1, 10), (3, 4), (2, 1)], "v int, c int"
    )
    rows = sel.running_sums(df, "v", ["c"]).orderBy("v").collect()
    vals = [(r["v"], r["_cum_c"]) for r in rows]
    assert vals == [(1, 10), (2, 11), (3, 15), (5, 17)]


def test_rank_correlation_perfect_monotone(spark, tmp_path):
    # On a frame where daily count and revenue are perfectly
    # co-monotone, both rho and tau must be exactly 1.
    import datetime

    rows = [
        (datetime.date(2024, 1, 1 + i), float(i + 1), i + 1)
        for i in range(5)
    ]
    d = spark.createDataFrame(rows, "t date, y double, x int")
    r = sel.average_ranks(d, "x", "rx")
    r = sel.average_ranks(r, "y", "ry")
    got = r.select(
        F.corr(F.col("rx"), F.col("ry")).alias("c")
    ).collect()[0]["c"]
    assert got == pytest.approx(1.0, abs=1e-12)


# --- hypothesis property tests: the distributed rank primitives must
# match brute-force references on arbitrary inputs ---

from hypothesis import HealthCheck, given, settings, strategies as st

_HSETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vals = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=60
)


@given(vs=_vals)
@settings(**_HSETTINGS)
def test_property_average_ranks(spark, vs):
    df = spark.createDataFrame([(float(v),) for v in vs], "v double")
    got = [
        r["r"]
        for r in sel.average_ranks(df, "v", "r").orderBy("v").collect()
    ]
    # brute-force midranks
    s = sorted(vs)
    exp = []
    for v in s:
        lo = s.index(v) + 1
        hi = lo + s.count(v) - 1
        exp.append((lo + hi) / 2.0)
    assert got == exp


@given(
    a=st.lists(st.integers(0, 20), min_size=1, max_size=40),
    b=st.lists(st.integers(0, 20), min_size=1, max_size=40),
)
@settings(**_HSETTINGS)
def test_property_mann_whitney(spark, a, b):
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, g string")
    row = sel.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    # brute-force U: count pairs a<b as 1, ties as 1/2
    u_b = sum(
        1.0 if x < y else (0.5 if x == y else 0.0) for x in a for y in b
    )
    # engine reports U_a = R_a - n_a(n_a+1)/2 = #(a>b) + ties/2
    u_a = len(a) * len(b) - u_b
    assert row["u_stat"] == u_a
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(-30, 30), st.integers(1, 5)
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@settings(**_HSETTINGS)
def test_property_running_sums(spark, pairs):
    df = spark.createDataFrame(pairs, "v int, c int")
    got = [
        (r["v"], r["_cum_c"])
        for r in sel.running_sums(df, "v", ["c"]).orderBy("v").collect()
    ]
    acc, exp = 0, []
    for v, c in sorted(pairs):
        acc += c
        exp.append((v, acc))
    assert got == exp
