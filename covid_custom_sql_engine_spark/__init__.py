"""covid_custom_sql_engine_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query / data-processing
capabilities of the reference engine ``angelaykang/covid-custom-sql-engine``
(a from-scratch in-memory columnar DataFrame with select / filter / sort /
group-agg / join / corr, plus an analytics app composing ~20 dataflow
operators on top — see SURVEY.md).

Design stance:
- Declarative DataFrame / SQL plans; Catalyst + Tungsten pick physical
  strategies (broadcast joins for dims, hash agg with partial combine,
  whole-stage codegen, AQE).
- Built-in ``pyspark.sql.functions`` everywhere; Pandas UDFs only where
  built-ins genuinely can't express the semantics.
- Designed for multi-executor scale (partition-count, broadcast, salting
  hooks) even though tests run on local[*].
"""

from covid_custom_sql_engine_spark.session import get_spark
from covid_custom_sql_engine_spark.catalog import load_tables, TABLE_NAMES

__all__ = ["get_spark", "load_tables", "TABLE_NAMES"]
__version__ = "0.1.0"
