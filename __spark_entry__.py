"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation notes:
- Every aggregate/computed column is aliased identically in the Spark
  query and the oracle SQL (driver sorts columns by name before hashing).
- Double-valued aggregates are rounded on BOTH sides so that
  summation-order floating-point jitter between engines can't flip the
  value hash.
- Timestamps are emitted as formatted strings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from covid_custom_sql_engine_spark import queries_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    dashboard pipeline shape — filter → group-agg → broadcast-join
    enrichment (SURVEY §7 phase 0) on the TPC-H-ish tables."""
    return queries_registry.QUERIES["flagship_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(queries_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (same tables)."""
    return dict(queries_registry.ORACLES)
