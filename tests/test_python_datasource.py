"""Python Data Source API surface (sources/python_datasource.py).

Covers the four design claims: Arrow-batch reads, repartition-invariant
determinism, source-level filter pushdown, and batch/stream equivalence
with replayable offsets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.sources import python_datasource as pds


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pds.register(spark)


def _load(spark, **opts):
    r = spark.read.format("synth_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_count_and_schema(spark):
    df = _load(spark, n_rows=5_000, n_partitions=4)
    assert df.count() == 5_000
    assert df.schema.simpleString() == (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:string>"
    )
    assert df.rdd.getNumPartitions() == 4


def _key(rows):
    return sorted((r.event_id, r.user_id, r.event_type, round(r.value, 9), r.props, str(r.ts)) for r in rows)


def test_partition_invariant_determinism(spark):
    a = _key(_load(spark, n_rows=3_000, n_partitions=3).collect())
    b = _key(_load(spark, n_rows=3_000, n_partitions=7, arrow_batch=256).collect())
    assert a == b
    # different seed → different data
    c = _key(_load(spark, n_rows=3_000, n_partitions=3, seed=7).collect())
    assert a != c


def test_filter_pushdown_prunes_source(spark):
    df = _load(spark, n_rows=100_000)
    flt = df.filter((F.col("event_id") >= 500) & (F.col("event_id") < 650))
    plan = flt._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "GreaterThanOrEqual(event_id,500)" in plan
    assert "LessThan(event_id,650)" in plan
    rows = flt.collect()
    assert len(rows) == 150
    assert {r.event_id for r in rows} == set(range(500, 650))
    # pushed range matches the unpruned scan's values exactly
    full = {r.event_id: r.value for r in df.filter(F.col("event_id") < 1000).collect()}
    assert all(abs(full[r.event_id] - r.value) < 1e-12 for r in rows)


def test_equality_pushdown(spark):
    df = _load(spark, n_rows=10_000)
    rows = df.filter(F.col("event_id") == 1234).collect()
    assert len(rows) == 1 and rows[0].event_id == 1234


def test_stream_matches_batch_exactly(spark):
    opts = {"n_rows": 2_500, "rows_per_batch": 700, "seed": 5}
    stream = (
        spark.readStream.format("synth_events")
        .options(**{k: str(v) for k, v in opts.items()})
        .load()
    )
    name = "synth_stream_out"
    # default trigger: the simple stream reader serves rows_per_batch per
    # micro-batch, so the full range takes ceil(2500/700)=4 batches; poll
    # the sink until the source is drained (read() returns empty at cap).
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql(f"SELECT count(*) c FROM {name}").first().c >= 2_500:
            break
        time.sleep(0.5)
    q.stop()
    got = _key(spark.sql(f"SELECT * FROM {name}").collect())
    want = _key(_load(spark, n_rows=2_500, seed=5).collect())
    assert got == want
