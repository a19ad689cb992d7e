"""MERGE-upsert and SCD2 operators (operators/merge.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.operators.merge import merge_upsert, scd2_intervals


def _base(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "id long, name string, bal double",
    )


def test_merge_updates_and_inserts(spark):
    upd = spark.createDataFrame(
        [(2, 99.0), (7, 70.0)], "id long, bal double"
    )
    out = {r.id: r for r in merge_upsert(_base(spark), upd, "id").collect()}
    assert len(out) == 4
    assert out[2].bal == 99.0 and out[2].name == "bob"  # partial update
    assert out[1].bal == 10.0  # untouched
    assert out[7].bal == 70.0 and out[7].name is None  # insert
    assert out[3].bal == 30.0


def test_merge_null_update_keeps_base_value(spark):
    upd = spark.createDataFrame([(1, None)], "id long, bal double")
    out = {r.id: r for r in merge_upsert(_base(spark), upd, "id").collect()}
    assert out[1].bal == 10.0  # NULL in change set = keep


def test_merge_broadcast_and_shuffle_modes_agree(spark):
    upd = spark.createDataFrame(
        [(1, 11.0), (9, 90.0)], "id long, bal double"
    )
    a = sorted(merge_upsert(_base(spark), upd, "id").collect())
    b = sorted(
        merge_upsert(_base(spark), upd, "id", broadcast_updates=False).collect()
    )
    assert a == b


def test_merge_ignores_update_only_columns(spark):
    upd = spark.createDataFrame(
        [(1, 50.0, "x")], "id long, bal double, extra string"
    )
    out = merge_upsert(_base(spark), upd, "id")
    assert out.columns == ["id", "name", "bal"]
    assert {r.bal for r in out.filter(F.col("id") == 1).collect()} == {50.0}


def test_scd2_intervals(spark):
    log = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "z")],
        "id long, ts long, attr string",
    )
    rows = {
        (r.id, r.valid_from): r
        for r in scd2_intervals(log, "id", "ts", ["attr"]).collect()
    }
    assert rows[(1, 10)].valid_to == 20 and not rows[(1, 10)].is_current
    assert rows[(1, 20)].valid_to == 30
    assert rows[(1, 30)].valid_to is None and rows[(1, 30)].is_current
    assert rows[(2, 5)].is_current


def test_snapshot_diff_roundtrip_with_merge(spark):
    """Applying the diff's adds/changes via merge_upsert and dropping
    the removes reproduces the new snapshot exactly."""
    from covid_custom_sql_engine_spark.operators.merge import (
        merge_upsert,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, None, "D")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(2, 20.0, "B"), (3, 31.0, "C"), (4, 4.0, "D"), (5, 50.0, "E")],
        "k long, v double, s string",
    )
    diff = {r.k: r.change_type for r in snapshot_diff(old, new, "k").collect()}
    assert diff == {1: "removed", 3: "changed", 4: "changed", 5: "added"}

    # roundtrip: old + diff -> new
    upserts = new.join(
        snapshot_diff(old, new, "k").filter(F.col("change_type") != "removed"),
        "k",
    ).select("k", "v", "s")
    removed = [k for k, t in diff.items() if t == "removed"]
    rebuilt = merge_upsert(old, upserts, "k").filter(~F.col("k").isin(removed))
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_snapshot_diff_key_only_and_empty_compare_cols(spark):
    """ADVICE r2: tables sharing only the key (or an explicit
    compare_cols=[]) must yield an added/removed-only diff, not a
    TypeError from a None predicate."""
    from covid_custom_sql_engine_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    diff = {r.k: r.change_type for r in snapshot_diff(old, new, "k").collect()}
    assert diff == {1: "removed", 3: "added"}

    old2 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    new2 = spark.createDataFrame([(2, "CHANGED"), (3, "c")], "k long, s string")
    # explicit [] means "ignore attribute changes": only membership diffs
    diff2 = {
        r.k: r.change_type
        for r in snapshot_diff(old2, new2, "k", compare_cols=[]).collect()
    }
    assert diff2 == {1: "removed", 3: "added"}


def test_rollup_state_merge_equals_full_recompute(spark):
    """The MV-maintenance invariant: merge(state(A), state(B), state(C))
    finalizes to exactly the direct aggregate of A ∪ B ∪ C, for any
    split — including batches missing some keys entirely."""
    from covid_custom_sql_engine_spark.operators.merge import (
        finalize_rollup,
        merge_rollup_states,
        rollup_state,
    )

    full = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("b", -1.0), ("b", 4.0), ("c", 0.25)],
        "k string, v double",
    )
    batches = [
        spark.createDataFrame([("a", 1.5), ("b", -1.0)], "k string, v double"),
        spark.createDataFrame([("a", 2.5)], "k string, v double"),
        spark.createDataFrame([("b", 4.0), ("c", 0.25)], "k string, v double"),
    ]
    merged = finalize_rollup(
        merge_rollup_states(*[rollup_state(b, ["k"], "v") for b in batches]),
        "v",
    )
    direct = finalize_rollup(rollup_state(full, ["k"], "v"), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_rollup_state_null_values_and_single_state(spark):
    """NULL values don't count toward n/sum/min/max; an all-NULL key
    finalizes to n=0 with NULL sum/avg/min/max. merge of ONE state is
    the identity."""
    from covid_custom_sql_engine_spark.operators.merge import (
        finalize_rollup,
        merge_rollup_states,
        rollup_state,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("z", None)], "k string, v double"
    )
    st = rollup_state(df, ["k"], "v")
    out = {r.k: r for r in finalize_rollup(merge_rollup_states(st), "v").collect()}
    assert out["a"].n_v == 1 and out["a"].sum_v == 1.0 and out["a"].avg_v == 1.0
    assert out["z"].n_v == 0
    assert out["z"].sum_v is None and out["z"].avg_v is None
    assert out["z"].min_v is None and out["z"].max_v is None
