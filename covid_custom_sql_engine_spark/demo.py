"""The reference's "SQL Operations Demo" tab as a composed pipeline.

The reference narrates its 5 core database operations step by step with
per-operation timings and row counts (app.py:347-898: CSV parsing,
WHERE filtering, SELECT projection, group-by + aggregation, hash join;
timing log app.py:489-495, 1387-1391). This module is that showcase on
the Spark engine: each step is materialized and timed through the A17
:class:`ExecutionLog`, and every intermediate frame is returned for
inspection — the inspect-each-step surface a user of the reference's
demo tab expects, driven by the same operators the rest of the engine
uses.

Unlike the dashboard pipeline (one lazy plan per output), the demo
deliberately forces each step: the narration IS the product here, and
the per-step counts/timings mirror the reference's
``"op -> N rows in X ms"`` log lines.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid_custom_sql_engine_spark.operators import core as ops
from covid_custom_sql_engine_spark.plans.listener import ExecutionLog
from covid_custom_sql_engine_spark.sources import read_csv_ref
from covid_custom_sql_engine_spark.sources.csv_source import try_float, try_long

_DEMO_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority"]


def _demo_csv_path(sf_dir: str, csv_dir: str | None) -> str:
    tag = os.path.basename(os.path.abspath(sf_dir)) or "sf"
    return csv_dir or os.path.join(tempfile.gettempdir(), f"spark_graft_demo_{tag}")


def sql_operations_demo(
    spark: SparkSession,
    sf_dir: str,
    log: ExecutionLog | None = None,
    csv_dir: str | None = None,
    min_totalprice: float = 100_000.0,
) -> dict[str, object]:
    """Run the 5-operation demo; returns per-step frames + the log.

    1. **CSV parsing** (S1-S3): the orders table is materialized as a
       real CSV once (so the demo genuinely exercises the parser), then
       parsed back in parity mode — all-STRING columns + try-cast
       accessors, the Spark expression of the reference's per-cell
       coercion (csv_parser.py:6-16).
    2. **Filtering** (F1): WHERE o_totalprice > ``min_totalprice``.
    3. **Projection** (P1): SELECT a 3-column subset.
    4. **Group By + aggregation** (G1/G2): hash agg per customer.
    5. **Hash join** (J1): broadcast join to the customer dim with the
       reference's ``r_`` column prefix.

    Returns ``{"steps": {...}, "result": DataFrame, "log": ExecutionLog}``;
    ``log.render()`` is the reference-style narration.
    """
    log = log if log is not None else ExecutionLog()
    from covid_custom_sql_engine_spark.catalog import load_table

    # Op 1 — CSV parsing. Materialize once per sf_dir (deterministic
    # path), then parse with the reference-parity reader.
    path = _demo_csv_path(sf_dir, csv_dir)
    if not os.path.isdir(path):
        load_table(spark, sf_dir, "orders").select(*_DEMO_COLS).coalesce(1).write.mode(
            "overwrite"
        ).option("header", True).csv(path)
    parsed = read_csv_ref(spark, path)
    log.timed_count("csv_parse(orders)", parsed)

    # Op 2 — WHERE: boolean mask selection.
    filtered = parsed.filter(try_float("o_totalprice") > min_totalprice)
    log.timed_count(f"filter(o_totalprice > {min_totalprice:g})", filtered)

    # Op 3 — SELECT: column-subset projection (typed via try-cast).
    projected = filtered.select(
        try_long("o_orderkey").alias("o_orderkey"),
        try_long("o_custkey").alias("o_custkey"),
        try_float("o_totalprice").alias("o_totalprice"),
    )
    log.timed_count("project(o_orderkey, o_custkey, o_totalprice)", projected)

    # Op 4 — GROUP BY + aggregation: hash agg with map-side combine.
    grouped = projected.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        ops.dsum(F.col("o_totalprice")).alias("sum_totalprice"),
    )
    log.timed_count("groupby(o_custkey).agg(count, sum)", grouped)

    # Op 5 — hash join: broadcast the customer dim, r_-prefix its cols.
    customer = load_table(spark, sf_dir, "customer")
    result = grouped.join(
        F.broadcast(customer), grouped["o_custkey"] == customer["c_custkey"]
    ).select(
        "o_custkey",
        "n_orders",
        "sum_totalprice",
        F.col("c_mktsegment").alias("r_c_mktsegment"),
        F.col("c_nationkey").alias("r_c_nationkey"),
    )
    log.timed_count("join(customer, r_ prefix)", result)

    return {
        "steps": {
            "parsed": parsed,
            "filtered": filtered,
            "projected": projected,
            "grouped": grouped,
        },
        "result": result,
        "log": log,
    }
