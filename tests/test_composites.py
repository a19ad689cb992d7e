"""Composite operators (SURVEY §2.2) semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.operators import (
    argmax_latest,
    distinct_sorted,
    lagged_corr_best,
    latest_per_group,
    locf,
    pivot_wide,
    rolling_avg,
    stat_summary,
)


def test_locf_fills_gaps_with_initial_zero(spark):
    # app.py:1038-1046: carry last value, initial 0
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, 7.0), ("b", 1, None)],
        "k string, t int, v double",
    )
    out = {(r.k, r.t): r.v_filled for r in locf(df, "k", "t", "v").collect()}
    assert out[("a", 1)] == 0.0  # initial
    assert out[("a", 3)] == 5.0  # carried
    assert out[("a", 4)] == 7.0
    assert out[("b", 1)] == 0.0


def test_locf_no_initial(spark):
    df = spark.createDataFrame([("a", 1, None), ("a", 2, 5.0)], "k string, t int, v double")
    out = {r.t: r.v_filled for r in locf(df, "k", "t", "v", initial=None).collect()}
    assert out[1] is None


def test_argmax_latest_picks_max_order_col(spark):
    # app.py:712-729: latest row per group with non-null data
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 3, None), ("a", 2, 20.0), ("b", 1, 5.0)],
        "k string, t int, v double",
    )
    rows = {r.k: r for r in argmax_latest(df, "k", "t", "t", require_not_null=["v"]).collect()}
    assert rows["a"].t == 2  # t=3 filtered (null v), t=2 wins
    assert rows["b"].t == 1


def test_rolling_avg_trailing_window(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 6)], "k string, t int, v double"
    )
    out = {r.t: r.v_smoothed for r in rolling_avg(df, "k", "t", "v", window_rows=3).collect()}
    assert out[1] == 1.0
    assert out[2] == 1.5
    assert out[5] == 4.0  # (3+4+5)/3


def test_pivot_wide_max_tiebreak(spark):
    # app.py:1132-1133: ties broken by max
    df = spark.createDataFrame(
        [("d1", "x", 1.0), ("d1", "x", 9.0), ("d1", "y", 2.0)], "d string, c string, v double"
    )
    (r,) = pivot_wide(df, "d", "c", ["x", "y"], "v", agg="max").collect()
    assert r.x == 9.0 and r.y == 2.0


def test_latest_per_group_single_pass(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 3.0, 5.0), ("b", 2.0, 2.0)], "k string, m1 double, m2 double"
    )
    rows = {r.k: r for r in latest_per_group(df, "k", ["m1", "m2"]).collect()}
    assert rows["a"].m1 == 3.0 and rows["a"].m2 == 10.0


def test_distinct_sorted(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",)], "v string")
    assert [r.v for r in distinct_sorted(df, "v").collect()] == ["a", "b"]


def test_lagged_corr_self_lag0_is_one(spark):
    df = spark.createDataFrame(
        [("a", i, float(i) + (i % 3)) for i in range(1, 20)], "k string, t int, v double"
    )
    rows = {r.lag: r for r in lagged_corr_best(df, "k", "t", "v", "v", max_lag=2).collect()}
    assert rows[0].corr == pytest.approx(1.0)
    assert rows[0].n_pairs == 19
    assert rows[1].n_pairs == 18  # one fewer pair per lag step


def test_stat_summary_shape(spark):
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], "a double, b double")
    out = stat_summary(df, ["a", "b"]).collect()
    assert {r.metric for r in out} == {"a", "b"}
    row_a = next(r for r in out if r.metric == "a")
    # Row.count is a method; index by name
    assert row_a["count"] == 2.0 and row_a["sum"] == 4.0 and row_a["median"] == 2.0


def test_funnel_counts(spark):
    from covid_custom_sql_engine_spark.operators.composites import funnel_counts

    # u1 completes a->b->c in order; u2 does b before a (never converts
    # past a); u3 only a
    rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
        (2, 10, "b"), (2, 20, "a"),
        (3, 5, "a"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = {r.step: r for r in funnel_counts(df, ["a", "b", "c"]).collect()}
    assert out["a"].n_users == 3
    assert out["b"].n_users == 1  # only u1 has b after a
    assert out["c"].n_users == 1
    assert out["a"].conversion == 1.0
    assert abs(out["b"].conversion - round(1 / 3, 6)) < 1e-9


def test_funnel_strict_order(spark):
    from covid_custom_sql_engine_spark.operators.composites import funnel_counts

    # same-timestamp step does NOT count (strictly after)
    rows = [(1, 10, "a"), (1, 10, "b")]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = {r.step: r for r in funnel_counts(df, ["a", "b"]).collect()}
    assert out["a"].n_users == 1 and out["b"].n_users == 0


def test_time_weighted_avg_hand_case(spark):
    """value 10 held 1s then 20 held 3s -> TWA 17.5; single-event and
    zero-elapsed keys -> NULL."""
    import datetime as dt

    from covid_custom_sql_engine_spark.operators.composites import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0, 10.0),
        (1, 2, t0 + dt.timedelta(seconds=1), 20.0),
        (1, 3, t0 + dt.timedelta(seconds=4), 99.0),  # last: no holding time
        (2, 4, t0, 5.0),                              # single event: dropped
        (3, 5, t0, 1.0),
        (3, 6, t0, 2.0),                              # zero elapsed: NULL twa
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    got = {r.user_id: (r.twa, r.n_intervals) for r in
           time_weighted_avg(df, "user_id", "ts", "value", tiebreak="event_id").collect()}
    assert got[1][0] == pytest.approx((10.0 * 1 + 20.0 * 3) / 4) and got[1][1] == 2
    assert 2 not in got
    assert got[3][0] is None and got[3][1] == 1


def test_event_transitions_hand_case(spark):
    import datetime as dt

    from covid_custom_sql_engine_spark.operators.composites import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "a"), (1, 2, t0 + dt.timedelta(1), "b"),
        (1, 3, t0 + dt.timedelta(2), "a"),
        (2, 4, t0, "a"), (2, 5, t0 + dt.timedelta(1), "b"),
        (3, 6, t0, "c"),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    got = {(r.from_state, r.to_state): r.n_transitions
           for r in event_transitions(df, "user_id", ["ts", "event_id"], "event_type").collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_retention_cohorts_hand_case(spark):
    import datetime as dt

    from covid_custom_sql_engine_spark.operators.composites import retention_cohorts

    monday = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, monday), (1, monday + dt.timedelta(days=8)),   # wk0 and wk1
        (2, monday + dt.timedelta(days=1)),                # wk0 only
        (3, monday + dt.timedelta(days=7)),                # cohort wk1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort.strftime("%Y-%m-%d"), r.period_offset): r.n_active
           for r in retention_cohorts(df, "user_id", "ts", "week").collect()}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-08", 0): 1}


def test_debounce_events_hand_case(spark):
    import datetime as dt

    from covid_custom_sql_engine_spark.operators.composites import debounce_events

    t0 = dt.datetime(2024, 1, 1)
    s = lambda n: t0 + dt.timedelta(seconds=n)
    rows = [
        (1, 1, s(0), "a"),    # burst 1 start -> kept
        (2, 1, s(10), "a"),   # within 30s of prev -> dropped
        (3, 1, s(25), "a"),   # chains off event 2 -> dropped
        (4, 1, s(120), "a"),  # new burst -> kept
        (5, 1, s(0), "b"),    # different type -> kept
        (6, 2, s(5), "a"),    # different user -> kept
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    kept = sorted(
        r.event_id
        for r in debounce_events(
            df, ["user_id", "event_type"], ["ts", "event_id"], "ts", "30 seconds"
        ).collect()
    )
    assert kept == [1, 4, 5, 6]


def test_ewma_matches_python_reference(spark):
    """The truncated window fold must equal the direct weighted sum
    Σ αʲ x_{t-j} / Σ αʲ computed in plain Python, per partition, for a
    span smaller than, equal to, and larger than the series."""
    from covid_custom_sql_engine_spark.operators.composites import ewma

    vals = {"a": [3.0, -1.5, 2.25, 8.0, 0.5], "b": [10.0, 20.0]}
    rows = [(g, i, v) for g, xs in vals.items() for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    for span in (1, 3, 5, 32):
        out = {
            (r.g, r.i): r.ewma
            for r in ewma(df, "v", "i", partition_col="g", alpha=0.9, span=span).collect()
        }
        for g, xs in vals.items():
            for t in range(len(xs)):
                window = xs[max(0, t - span + 1) : t + 1]
                num = den = 0.0
                for x in window:  # same fold order as the HOF aggregate
                    num = num * 0.9 + x
                    den = den * 0.9 + 1.0
                assert out[(g, t)] == num / den, (g, t, span)


def test_ewma_span_one_is_identity(spark):
    from covid_custom_sql_engine_spark.operators.composites import ewma

    df = spark.createDataFrame(
        [(1, 5.0), (2, -3.0)], "i long, v double"
    )
    out = {r.i: r.ewma for r in ewma(df, "v", "i", span=1).collect()}
    assert out == {1: 5.0, 2: -3.0}


def test_retention_matrix_small_scenario(spark):
    """3 users: u1 active weeks 0/1/2, u2 weeks 0/2, u3 (later cohort)
    its own week only. Offset-0 rows double as cohort sizes."""
    import datetime as dt

    from covid_custom_sql_engine_spark.operators.composites import (
        retention_matrix,
    )

    def ts(day):  # Monday 2024-01-01 + day
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

    rows = [
        (1, ts(0)), (1, ts(8)), (1, ts(15)),   # u1: weeks 0,1,2
        (2, ts(2)), (2, ts(16)),               # u2: weeks 0,2
        (3, ts(7)),                            # u3: cohort week 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort.date().isoformat(), r.period_offset): (
            r.n_active, r.cohort_size, r.retention
        )
        for r in retention_matrix(df, "user_id", "ts", "week").collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)   # only u1 in week 1
    assert out[("2024-01-01", 2)] == (2, 2, 1.0)   # u1 and u2 return
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)   # u3's own cohort
    assert len(out) == 4
