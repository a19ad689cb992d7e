"""Distributed exact median: equivalence with F.median on edge cases."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.operators.selection import exact_median, exact_medians_plan


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


# --- exact_medians_plan: the declarative multi-metric form ---------------


def _check_plan(spark, cols):
    """cols: dict name -> list of values (same length, None-padded)."""
    names = list(cols)
    n = max(len(v) for v in cols.values())
    rows = [tuple(cols[c][i] if i < len(cols[c]) else None for c in names) for i in range(n)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in names))
    got = exact_medians_plan(df, names).collect()
    assert len(got) == 1
    exp = df.agg(*[F.median(c).alias(f"median_{c}") for c in names]).collect()[0]
    for c in names:
        g, e = got[0][f"median_{c}"], exp[f"median_{c}"]
        if e is None:
            assert g is None, c
        else:
            assert g == pytest.approx(e, abs=1e-12), c


def test_plan_multi_metric(spark):
    rng = random.Random(11)
    _check_plan(
        spark,
        {
            "hi_card": [rng.uniform(-1e6, 1e6) for _ in range(1001)],
            "lo_card": [float(rng.randint(0, 3)) for _ in range(1000)],
            "with_nulls": [None if i % 3 == 0 else float(i) for i in range(1001)],
        },
    )


def test_plan_all_null_and_all_equal(spark):
    _check_plan(spark, {"a": [None, None, None], "b": [5.0, 5.0, 5.0], "c": [1.0, 2.0, 3.0, 4.0]})


def test_plan_single_row(spark):
    _check_plan(spark, {"a": [42.0]})


def test_plan_caller_supplied_stats(spark):
    df = spark.createDataFrame([(float(i), float(i * i)) for i in range(100)], "x double, y double")
    stats = df.agg(
        F.count("x").alias("count_x"), F.min("x").alias("min_x"), F.max("x").alias("max_x"),
        F.count("y").alias("count_y"), F.min("y").alias("min_y"), F.max("y").alias("max_y"),
    )
    got = exact_medians_plan(df, ["x", "y"], stats=stats).collect()[0]
    assert got["median_x"] == 49.5
    assert got["median_y"] == pytest.approx((49.0**2 + 50.0**2) / 2)


# --- global_rank: distributed ROW_NUMBER() OVER (ORDER BY ...) ---


def test_global_rank_matches_single_partition_window(spark):
    from pyspark.sql import Window

    from covid_custom_sql_engine_spark.operators.selection import global_rank

    rng = random.Random(7)
    rows = [(i, rng.uniform(-100, 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(16)
    got = {r.id: r.rnk for r in global_rank(df, ["v", "id"], "rnk").collect()}
    exp = {
        r.id: r.rnk
        for r in df.withColumn(
            "rnk", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == exp


def test_global_rank_empty_and_single_row(spark):
    from covid_custom_sql_engine_spark.operators.selection import global_rank

    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    assert global_rank(df.filter(F.lit(False)), ["v", "id"]).count() == 0
    [row] = global_rank(df, ["v", "id"]).collect()
    assert row["rank"] == 1


def test_global_rank_single_pinned_exchange(spark):
    """Both the local-rank branch and the offsets branch must read ONE
    frozen materialization of the range exchange (checkpoint): an
    unpinned subtree can draw different sampled range boundaries per
    evaluation, misaligning offsets and partition contents (the round-2
    driver flake class). The exchange runs once at pin time, so the
    final plan contains ZERO range exchanges and scans the frozen RDD."""
    from covid_custom_sql_engine_spark.operators.selection import global_rank

    import tempfile

    d = tempfile.mkdtemp(prefix="grank_")
    spark.createDataFrame(
        [(i, float(i), "x" * 10) for i in range(100)], "id long, v double, payload string"
    ).write.mode("overwrite").parquet(d)
    df = spark.read.parquet(d)
    plan = global_rank(df, ["v", "id"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 0
    assert "ExistingRDD" in plan  # the pinned (checkpointed) base


def test_global_rank_wide_frame_dense_ranks(spark):
    """VERDICT r2 #2: the offsets and local-rank branches must agree on
    a WIDE frame (extra non-key columns previously made the two range
    exchanges non-identical plans, defeating exchange reuse). Ranks must
    be a dense permutation of 1..n with every payload intact."""
    import random

    from covid_custom_sql_engine_spark.operators.selection import global_rank

    rng = random.Random(11)
    rows = [
        (i, rng.uniform(-1e6, 1e6), "p" * (i % 37), float(i % 101), i % 7)
        for i in range(20_000)
    ]
    df = spark.createDataFrame(
        rows, "id long, v double, payload string, w double, grp int"
    ).repartition(32)
    out = global_rank(df, ["v", "id"], "rnk").collect()
    assert sorted(r.rnk for r in out) == list(range(1, 20_001))
    by_rank = sorted(out, key=lambda r: r.rnk)
    assert [(r.v, r.id) for r in by_rank] == sorted((r.v, r.id) for r in out)
    # payloads ride along unharmed
    assert all(r.payload == "p" * (r.id % 37) for r in out)


def test_global_rank_deterministic_across_reruns(spark):
    """Two independent constructions (two pins, two checkpoint jobs)
    must assign identical ranks — determinism is by construction, not
    by luck of boundary sampling."""
    import random

    from covid_custom_sql_engine_spark.operators.selection import global_rank

    rng = random.Random(13)
    rows = [(i, rng.uniform(0, 1)) for i in range(10_000)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(24)
    a = {r.id: r.rnk for r in global_rank(df, ["v", "id"], "rnk").collect()}
    b = {r.id: r.rnk for r in global_rank(df, ["v", "id"], "rnk").collect()}
    assert a == b


def test_equidepth_buckets_matches_ntile(spark):
    from pyspark.sql import Window

    from covid_custom_sql_engine_spark.operators.selection import equidepth_buckets

    rng = random.Random(3)
    for n, B in [(997, 10), (100, 7), (5, 10), (64, 8), (1, 3)]:
        rows = [(i, rng.uniform(0, 1000)) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v double").repartition(8)
        got = {
            r.id: r.bucket
            for r in equidepth_buckets(df, ["v", "id"], B).collect()
        }
        exp = {
            r.id: r.nt
            for r in df.withColumn(
                "nt", F.ntile(B).over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == exp, (n, B)


def test_skyline_2d_matches_brute_force_random(spark):
    """Seeded random clouds (with duplicate points, ties on each axis,
    and NULLs): the distributed sweep equals the O(n²) dominance spec."""
    import random

    from covid_custom_sql_engine_spark.operators.selection import skyline_2d

    rng = random.Random(23)
    rows = [
        (
            i,
            float(rng.randrange(20)) if rng.random() > 0.05 else None,
            rng.randrange(15) if rng.random() > 0.05 else None,
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y int")
    got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    pts = [(i, x, y) for i, x, y in rows if x is not None and y is not None]
    want = sorted(
        i
        for i, x, y in pts
        if not any(
            qx <= x and qy >= y and (qx < x or qy > y)
            for j, qx, qy in pts
            if j != i
        )
    )
    assert got == want


def test_skyline_2d_single_point_and_all_dominated(spark):
    from covid_custom_sql_engine_spark.operators.selection import skyline_2d

    one = spark.createDataFrame([(1, 5.0, 5)], "id long, x double, y int")
    assert [r.id for r in skyline_2d(one, "x", "y").collect()] == [1]
    # a strictly better point dominates everything else
    dom = spark.createDataFrame(
        [(1, 1.0, 10), (2, 2.0, 9), (3, 3.0, 1)], "id long, x double, y int"
    )
    assert sorted(r.id for r in skyline_2d(dom, "x", "y").collect()) == [1]
    # duplicates of the optimum all survive (neither dominates the other)
    dup = spark.createDataFrame(
        [(1, 1.0, 10), (2, 1.0, 10), (3, 2.0, 1)], "id long, x double, y int"
    )
    assert sorted(r.id for r in skyline_2d(dup, "x", "y").collect()) == [1, 2]


def test_ks_statistic_matches_reference(spark):
    """Exact D against a bisect-based Python reference on seeded
    gaussian samples with a real location shift."""
    import bisect
    import random

    from covid_custom_sql_engine_spark.operators.selection import ks_statistic

    rng = random.Random(5)
    rows = [(rng.gauss(0, 1), "a") for _ in range(2000)] + [
        (rng.gauss(0.3, 1), "b") for _ in range(1500)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    out = ks_statistic(df, "v", "g", "a", "b").collect()[0]
    a = sorted(v for v, g in rows if g == "a")
    b = sorted(v for v, g in rows if g == "b")
    d = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in sorted(set(a) | set(b))
    )
    assert out.n_a == 2000 and out.n_b == 1500
    assert abs(out.d_stat - round(d, 6)) < 1e-9


def test_ks_statistic_identical_and_empty_group(spark):
    from covid_custom_sql_engine_spark.operators.selection import ks_statistic

    same = spark.createDataFrame(
        [(float(i % 7), "a") for i in range(50)]
        + [(float(i % 7), "b") for i in range(50)],
        "v double, g string",
    )
    r = ks_statistic(same, "v", "g", "a", "b").collect()[0]
    assert r.d_stat == 0.0
    # a group with zero rows: NULL d_stat, not a division error
    one = spark.createDataFrame([(1.0, "a")], "v double, g string")
    r2 = ks_statistic(one, "v", "g", "a", "b").collect()[0]
    assert r2.n_b == 0 and r2.d_stat is None


def test_chi2_statistic_zero_on_identical_split(spark):
    """Identical category distributions across groups -> chi2 exactly
    0; dof = (2-1)*(k-1); unobserved grid cells contribute E."""
    from covid_custom_sql_engine_spark.operators.selection import chi2_statistic

    rows = [(g, c) for g in (0, 1) for c in ("a", "b", "c") for _ in range(4)]
    df = spark.createDataFrame(rows, "grp int, cat string")
    out = chi2_statistic(df, "grp", "cat").collect()[0]
    assert out.chi2 == 0.0 and out.dof == 2 and out.n == 24

    # total separation: group 0 only 'a' (8 rows), group 1 only 'b'
    # (8 rows) -> chi2 = n = 16 (the 2x2 maximum), dof 1
    rows2 = [(0, "a")] * 8 + [(1, "b")] * 8
    df2 = spark.createDataFrame(rows2, "grp int, cat string")
    out2 = chi2_statistic(df2, "grp", "cat").collect()[0]
    assert out2.chi2 == 16.0 and out2.dof == 1

    # nulls excluded from both axes
    rows3 = rows2 + [(None, "a"), (0, None)]
    df3 = spark.createDataFrame(rows3, "grp int, cat string")
    assert chi2_statistic(df3, "grp", "cat").collect()[0].n == 16


def test_wasserstein_1_exact_small(spark):
    """W1 on a tiny two-group sample vs the hand-computed ECDF area."""
    import numpy as np

    from covid_custom_sql_engine_spark.operators.selection import wasserstein_1

    # a = {1,2,3}, b = {2,4}: distinct pooled v = 1,2,3,4
    # F_a = 1/3, 2/3, 1, 1 ; F_b = 0, 1/2, 1/2, 1
    # W1 = |1/3-0|*1 + |2/3-1/2|*1 + |1-1/2|*1 = 1/3 + 1/6 + 1/2 = 1.0
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (3.0, "a"), (2.0, "b"), (4.0, "b")],
        "v double, g string",
    )
    out = wasserstein_1(df, "v", "g", "a", "b").collect()[0]
    assert out.n_a == 3 and out.n_b == 2
    assert abs(out.w1 - 1.0) < 1e-6

    # identical distributions -> 0; location shift by c -> exactly c
    same = spark.createDataFrame(
        [(float(i % 5), "a") for i in range(40)]
        + [(float(i % 5), "b") for i in range(40)],
        "v double, g string",
    )
    assert wasserstein_1(same, "v", "g", "a", "b").collect()[0].w1 == 0.0
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 100, 300).astype(float)
    shift = spark.createDataFrame(
        [(float(v), "a") for v in vals]
        + [(float(v + 2.5), "b") for v in vals],
        "v double, g string",
    )
    w = wasserstein_1(shift, "v", "g", "a", "b").collect()[0].w1
    # the fixed-point term sum quantizes each of ~600 ECDF-step terms
    # at 6dp, so exactness holds to ~terms*5e-7, not machine epsilon
    assert abs(w - 2.5) < 1e-4


def test_cusum_series_peak_at_level_shift(spark):
    """A clean level shift at t=10: |S_t| peaks exactly at the shift."""
    from covid_custom_sql_engine_spark.operators.selection import cusum_series

    # 10 days at 0, then 10 days at 10: mean 5, S_t = -5t until the
    # shift (min at t=10), then climbs back to 0
    rows = [(i, 0.0) for i in range(1, 11)] + [
        (i, 10.0) for i in range(11, 21)
    ]
    df = spark.createDataFrame(rows, "t int, x double")
    out = {r.t: r for r in cusum_series(df, "t", "x").collect()}
    assert len(out) == 20
    peak = [t for t, r in out.items() if r.is_peak]
    assert peak == [10]
    assert out[10].cusum == -50.0
    assert out[20].cusum == 0.0


def test_kcore_peel_converges_on_clique_plus_tail(spark):
    """A 5-clique with a pendant path: k=3 peeling keeps exactly the
    clique (each clique node has degree 4; tail nodes peel away)."""
    from covid_custom_sql_engine_spark.functions.graph import kcore_peel

    clique = [(f"n{i}", f"n{j}") for i in range(5) for j in range(5) if i != j]
    tail = [("n0", "t1"), ("t1", "n0"), ("t1", "t2"), ("t2", "t1")]
    df = spark.createDataFrame(clique + tail, "src string, dst string")
    out = {r.node: r.degree for r in kcore_peel(df, k=3, rounds=3).collect()}
    assert set(out) == {f"n{i}" for i in range(5)}
    assert all(d == 4 for d in out.values())


def test_kaplan_meier_textbook(spark):
    """The classic worked example: durations (t, event) =
    (1,1),(2,1),(2,0),(3,1),(4,0) — S(1)=4/5, S(2)=4/5·3/4=0.6,
    S(3)=0.6·1/2=0.3, S(4) censored-only keeps 0.3; at-risk counts
    5,4,2,1; censored rows counted but not event-weighted."""
    from covid_custom_sql_engine_spark.operators.selection import kaplan_meier

    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0)], "t int, ev int"
    )
    rows = {r.t_days: r for r in kaplan_meier(df, "t", "ev").collect()}
    assert rows[1].n_risk == 5 and rows[1].d_events == 1
    assert abs(rows[1].survival - 0.8) < 1e-6
    assert rows[2].n_risk == 4 and rows[2].d_events == 1
    assert rows[2].c_censored == 1
    assert abs(rows[2].survival - 0.6) < 1e-6
    assert rows[3].n_risk == 2
    assert abs(rows[3].survival - 0.3) < 1e-6
    assert rows[4].n_risk == 1 and rows[4].d_events == 0
    assert abs(rows[4].survival - 0.3) < 1e-6


def test_kaplan_meier_all_events_hits_zero(spark):
    """With no censoring the curve ends at 0 (the d=n final row is
    guarded by the 1e-300 floor, not an ln(0) error)."""
    from covid_custom_sql_engine_spark.operators.selection import kaplan_meier

    df = spark.createDataFrame([(1, 1), (2, 1)], "t int, ev int")
    rows = {r.t_days: r for r in kaplan_meier(df, "t", "ev").collect()}
    assert abs(rows[1].survival - 0.5) < 1e-6
    assert rows[2].survival == 0.0


def test_logrank_identical_groups_is_zero(spark):
    """Two groups with identical (time, event) profiles: observed =
    expected at every event time, so chi2 = 0 and not significant."""
    from covid_custom_sql_engine_spark.operators.selection import logrank_test

    rows = [(t, ev, g) for g in ("a", "b") for t, ev in
            [(1, 1), (2, 1), (3, 0), (4, 1)]]
    df = spark.createDataFrame(rows, "t int, ev int, g string")
    r = logrank_test(df, "t", "ev", "g", "a", "b").collect()[0]
    assert r.n_a == 4 and r.n_b == 4
    assert r.chi2_logrank == 0.0
    assert r.significant is False


def test_logrank_hand_computed(spark):
    """Cross-check against a plain-Python reference implementation of
    the Mantel-Cox statistic on a small asymmetric fixture."""
    from covid_custom_sql_engine_spark.operators.selection import logrank_test

    data = [(1, 1, "a"), (2, 1, "a"), (2, 0, "a"), (5, 1, "a"),
            (3, 1, "b"), (4, 0, "b"), (5, 1, "b"), (6, 1, "b"), (6, 0, "b")]
    # reference: iterate distinct times ascending
    times = sorted({t for t, _, _ in data})
    o = v = 0.0
    for t in times:
        d1 = sum(1 for tt, ev, g in data if tt == t and ev and g == "a")
        d2 = sum(1 for tt, ev, g in data if tt == t and ev and g == "b")
        r1 = sum(1 for tt, _, g in data if tt >= t and g == "a")
        r2 = sum(1 for tt, _, g in data if tt >= t and g == "b")
        d, n = d1 + d2, r1 + r2
        o += d1 - d * r1 / n
        if n > 1:
            v += d * (r1 / n) * (r2 / n) * (n - d) / (n - 1)
    expected = round(o * o / v, 6)
    df = spark.createDataFrame(data, "t int, ev int, g string")
    r = logrank_test(df, "t", "ev", "g", "a", "b").collect()[0]
    assert r.n_a == 4 and r.n_b == 5
    assert abs(r.chi2_logrank - expected) < 1e-6
