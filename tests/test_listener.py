"""Execution log (SURVEY A17): operator timing capture."""

from __future__ import annotations

from covid_custom_sql_engine_spark.plans import ExecutionLog, timed_action


def test_timed_count_records(spark):
    log = ExecutionLog()
    df = spark.range(100)
    n = log.timed_count("range(100)", df)
    assert n == 100
    assert len(log.entries) == 1
    e = log.entries[0]
    assert e.op == "range(100)" and e.rows == 100 and e.ms > 0
    assert "range(100) -> 100 rows" in log.render()


def test_slow_flag_threshold():
    log = ExecutionLog()
    e = log.record("fast", 1, 10.0)
    assert not e.slow and "[SLOW]" not in str(e)
    e2 = log.record("slow", 1, 1500.0)
    assert e2.slow and "[SLOW]" in str(e2)


def test_timed_action_context(spark):
    log = ExecutionLog()
    with timed_action(log, "collect"):
        spark.range(10).collect()
    assert log.entries[0].op == "collect" and log.entries[0].ms > 0


def test_observe_metrics_piggyback(spark, sf_dir):
    """df.observe computes pipeline metrics during the action itself —
    no second job (the scale-correct form of timed_count)."""
    from pyspark.sql import functions as F

    from covid_custom_sql_engine_spark.catalog import load_table
    from covid_custom_sql_engine_spark.plans.listener import observe_metrics

    o = load_table(spark, sf_dir, "orders")
    df, obs = observe_metrics(
        o.filter(F.col("o_totalprice") > 0),
        "ingest",
        rows=F.count(F.lit(1)),
        total=F.sum("o_totalprice"),
    )
    df.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["rows"] == o.filter(F.col("o_totalprice") > 0).count()
    assert m["total"] > 0
