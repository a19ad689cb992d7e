"""The 5-operation demo showcase: per-step narration, timings, and the
same result as computing the pipeline directly on parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.demo import sql_operations_demo


def test_demo_narrates_five_ops_with_timings(spark, sf_dir, tmp_path):
    out = sql_operations_demo(spark, sf_dir, csv_dir=str(tmp_path / "csv"))
    log = out["log"]
    assert len(log.entries) == 5
    ops = [e.op for e in log.entries]
    assert ops[0].startswith("csv_parse")
    assert ops[1].startswith("filter")
    assert ops[2].startswith("project")
    assert ops[3].startswith("groupby")
    assert ops[4].startswith("join")
    assert all(e.ms > 0 and e.rows is not None for e in log.entries)
    # reference-style render: "op -> N rows in X ms"
    assert "rows in" in log.render()


def test_demo_result_matches_direct_parquet(spark, sf_dir, tmp_path):
    from covid_custom_sql_engine_spark.catalog import load_table
    from covid_custom_sql_engine_spark.operators import core as ops

    out = sql_operations_demo(spark, sf_dir, csv_dir=str(tmp_path / "csv2"))
    got = sorted(map(tuple, out["result"].collect()))

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100_000)
    g = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        ops.dsum(F.col("o_totalprice")).alias("sum_totalprice"),
    )
    c = load_table(spark, sf_dir, "customer")
    want = sorted(
        map(
            tuple,
            g.join(F.broadcast(c), g["o_custkey"] == c["c_custkey"])
            .select(
                "o_custkey", "n_orders", "sum_totalprice",
                F.col("c_mktsegment").alias("r_c_mktsegment"),
                F.col("c_nationkey").alias("r_c_nationkey"),
            )
            .collect(),
        )
    )
    assert got == want
