"""Extended join family: as-of and range joins."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.operators import asof_join, range_join


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00")), (2, "u", _ts("2024-01-01 12:00:00"))],
        "id int, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 09:00:00"), 1.0), ("u", _ts("2024-01-01 11:00:00"), 2.0)],
        "k string, t timestamp, v double",
    )
    out = {r.id: r.r_v for r in asof_join(left, right, "k", "t", "t", ["v"]).collect()}
    assert out[1] == 1.0  # 10:00 → latest right ≤ 10:00 is 09:00
    assert out[2] == 2.0  # 12:00 → 11:00


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, "u", _ts("2024-01-01 10:00:00"))], "id int, k string, t timestamp")
    right = spark.createDataFrame([("u", _ts("2024-01-01 10:00:00"), 42.0)], "k string, t timestamp, v double")
    (r,) = asof_join(left, right, "k", "t", "t", ["v"]).collect()
    assert r.r_v == 42.0


def test_asof_no_earlier_right_gives_null(spark):
    left = spark.createDataFrame([(1, "u", _ts("2024-01-01 08:00:00"))], "id int, k string, t timestamp")
    right = spark.createDataFrame([("u", _ts("2024-01-01 09:00:00"), 1.0)], "k string, t timestamp, v double")
    (r,) = asof_join(left, right, "k", "t", "t", ["v"]).collect()
    assert r.r_v is None


def test_asof_keys_isolated(spark):
    left = spark.createDataFrame([(1, "a", _ts("2024-01-01 10:00:00"))], "id int, k string, t timestamp")
    right = spark.createDataFrame([("b", _ts("2024-01-01 09:00:00"), 9.0)], "k string, t timestamp, v double")
    (r,) = asof_join(left, right, "k", "t", "t", ["v"]).collect()
    assert r.r_v is None  # other key's rows never leak


def test_range_join_half_open(spark):
    events = spark.createDataFrame([(1, 0.0), (2, 50.0), (3, 199.9)], "id int, v double")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0)], "band string, lo double, hi double"
    )
    out = {r.id: r.band for r in range_join(events, bands, "v", "lo", "hi").collect()}
    assert out == {1: "low", 2: "mid", 3: "mid"}  # hi exclusive, lo inclusive


def test_salted_join_matches_plain(spark, sf_dir):
    """Salting is physical only: same rows as the unsalted join, hot key
    spread across salt partitions."""
    from covid_custom_sql_engine_spark.operators.joins import salted_join
    from covid_custom_sql_engine_spark.catalog import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    # manufacture skew: 90% of rows share one key
    skewed = o.withColumn(
        "k", F.when(F.col("o_orderkey") % 10 < 9, F.lit(1)).otherwise(F.col("o_orderkey"))
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], ["k", "label"])
    plain = skewed.join(dim, "k").select("o_orderkey", "label")
    salted = salted_join(skewed, dim, "k", "k").select("o_orderkey", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    """The point of salting: a single hot key's rows must take MANY salt
    values (per-row salt), not collapse onto one (per-key salt — the
    round-1 bug that kept the hot key in a single shuffle partition)."""
    import pyspark.sql.functions as F

    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id"))
    salts = (
        hot.withColumn("_lsalt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)))
        .select("_lsalt").distinct().count()
    )
    assert salts == 8  # 10k rows of one key cover all 8 salt values


def test_salted_join_left_and_unsupported(spark):
    from covid_custom_sql_engine_spark.operators.joins import salted_join
    import pyspark.sql.functions as F
    import pytest

    left = spark.createDataFrame([(1, "a"), (3, "c")], ["k", "lv"])
    right = spark.createDataFrame([(1, "x")], ["k", "rv"])
    out = salted_join(left, right, "k", "k", salt=4, how="left")
    rows = {r.lv: r.rv for r in out.collect()}
    assert rows == {"a": "x", "c": None}  # unmatched left row survives once
    assert out.count() == 2
    with pytest.raises(NotImplementedError):
        salted_join(left, right, "k", "k", how="full")


def test_interval_join_multiset_and_invalid(spark):
    """Duplicate input rows produce duplicate pairs (theta-join multiset
    semantics — a blanket distinct() would collapse them); intervals
    with end < start are dropped instead of crashing F.sequence."""
    from covid_custom_sql_engine_spark.operators.joins import interval_join

    a = spark.createDataFrame(
        [
            ("s1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 13:00:00")),
            ("s1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 13:00:00")),  # dup row
            ("bad", _ts("2024-01-01 12:00:00"), _ts("2024-01-01 09:00:00")),  # end < start
        ],
        "a_id string, s timestamp, e timestamp",
    )
    b = spark.createDataFrame(
        [("i1", _ts("2024-01-01 11:00:00"), _ts("2024-01-01 12:00:00"))],
        "b_id string, bs timestamp, be timestamp",
    )
    out = interval_join(a, b, "s", "e", "bs", "be").collect()
    assert len(out) == 2  # the dup pair appears twice, 'bad' matches nothing
    assert all(r.a_id == "s1" and r.b_id == "i1" for r in out)


def test_interval_join_multibucket_pair_once(spark):
    """A pair overlapping across many buckets is emitted exactly once
    (first-shared-bucket rule), even though both sides explode into
    several bucket rows."""
    from covid_custom_sql_engine_spark.operators.joins import interval_join

    a = spark.createDataFrame(
        [("s1", _ts("2024-01-01 01:30:00"), _ts("2024-01-01 07:30:00"))],
        "a_id string, s timestamp, e timestamp",
    )
    b = spark.createDataFrame(
        [("i1", _ts("2024-01-01 00:10:00"), _ts("2024-01-01 06:10:00"))],
        "b_id string, bs timestamp, be timestamp",
    )
    out = interval_join(a, b, "s", "e", "bs", "be").collect()
    assert len(out) == 1
