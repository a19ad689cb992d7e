"""Sink paths: partition pruning on partitioned writes, shuffle-free
joins on bucketed tables."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.catalog import load_table
from covid_custom_sql_engine_spark.sources.sinks import (
    write_bucketed,
    write_partitioned,
    write_single_csv,
)


def test_partitioned_write_prunes(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="sink_part_")
    o = load_table(spark, sf_dir, "orders")
    write_partitioned(o, d, ["o_orderpriority"])
    # hive-style dirs exist
    assert any(x.startswith("o_orderpriority=") for x in os.listdir(d))
    back = spark.read.parquet(d).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter reaches the scan: non-matching dirs never read
    assert "PartitionFilters" in plan
    exp = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == exp


def test_bucketed_join_no_shuffle(spark, sf_dir):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders")
        write_bucketed(c, "b_cust", ["c_custkey"], n_buckets=8, sort_by=["c_custkey"])
        write_bucketed(
            o.withColumnRenamed("o_custkey", "c_custkey"),
            "b_ord",
            ["c_custkey"],
            n_buckets=8,
            sort_by=["c_custkey"],
        )
        j = spark.table("b_cust").join(spark.table("b_ord"), "c_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-bucketed: no shuffle on either side
        exp = c.join(o, c.c_custkey == o.o_custkey).count()
        assert j.count() == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_cust")
        spark.sql("DROP TABLE IF EXISTS b_ord")


def test_single_csv_roundtrip(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="sink_csv_") + "/out"
    n = load_table(spark, sf_dir, "nation")
    write_single_csv(n, d)
    back = spark.read.option("header", True).csv(d)
    assert back.count() == n.count()
    assert set(back.columns) == set(n.columns)


def test_orc_roundtrip_with_pushdown(spark, sf_dir):
    from covid_custom_sql_engine_spark.sources.sinks import write_orc

    d = tempfile.mkdtemp(prefix="sink_orc_") + "/data"
    o = load_table(spark, sf_dir, "orders")
    write_orc(o, d)
    back = spark.read.orc(d)
    assert back.count() == o.count()
    # values identical (orc preserves types incl. timestamps)
    a = sorted(map(tuple, o.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # filter pushdown + column pruning reach the ORC scan
    q = back.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull" in plan
    assert "o_totalprice" not in plan.split("ReadSchema:")[1]


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir):
    from covid_custom_sql_engine_spark.sources.sinks import compact_parquet

    d = tempfile.mkdtemp(prefix="compact_") + "/data"
    o = load_table(spark, sf_dir, "orders")
    o.repartition(64).write.mode("overwrite").parquet(d)  # 64 tiny files
    before_files = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert before_files >= 32
    before = sorted(map(tuple, spark.read.parquet(d).collect()))
    n_after = compact_parquet(spark, d, target_file_mb=128)
    assert n_after < before_files
    assert sorted(map(tuple, spark.read.parquet(d).collect())) == before


def test_compact_parquet_recovers_interrupted_swap(spark, sf_dir):
    """ADVICE r2: a run interrupted between the two swap renames parks
    the data at ._compact_old with nothing at path; the next invocation
    must restore it (and clear stale temp dirs) instead of failing."""
    from covid_custom_sql_engine_spark.sources.sinks import compact_parquet

    d = tempfile.mkdtemp(prefix="compact_crash_") + "/data"
    n = load_table(spark, sf_dir, "nation")
    n.repartition(8).write.mode("overwrite").parquet(d)
    before = sorted(map(tuple, spark.read.parquet(d).collect()))

    # simulate the crash window: data moved to backup, stale tmp left over
    os.rename(d, d + "._compact_old")
    os.makedirs(d + "._compact_tmp")
    with open(d + "._compact_tmp/garbage", "w") as f:
        f.write("stale")

    compact_parquet(spark, d, target_file_mb=128)
    assert sorted(map(tuple, spark.read.parquet(d).collect())) == before
    assert not os.path.exists(d + "._compact_old")
    assert not os.path.exists(d + "._compact_tmp")
