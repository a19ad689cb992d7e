"""Parquet catalog over the driver testdata star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under an
``sf*`` directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier", "customer", "part"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Analyzed-DataFrame memo, keyed per Spark application: repeated
# load_table calls re-list the path and re-read the parquet footer for
# schema inference (~50-150 ms of fixed driver-side latency), which
# dominates trivial queries. DataFrames are immutable logical plans, so
# reusing one within an application is safe.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan — Catalyst pushes filters/pruning into it.

    ``events.ts`` has shipped in two parquet encodings across testdata
    generations: TIMESTAMP(NANOS) and plain timestamp[us] (NTZ). For
    the nanos encoding Spark reads it as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and we floor-divide to
    microseconds — the same truncation DuckDB applies; the micros
    encoding passes through as timestamp_ntz, which DuckDB also reads
    as a naive TIMESTAMP, so either way both engines see identical
    timestamp values.
    """
    if name == "events":
        # Harmless on micros-encoded data; without this runtime-settable
        # conf a nanos-encoded file throws PARQUET_TYPE_ILLEGAL under any
        # session that didn't set it at build time (also needed at
        # execution time, so it is set on cache hits too). Setting it here
        # makes load_table work under ANY SparkSession — callers may build
        # their own.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _DF_CACHE[key] = df
    return df


def parallelize_small(df: DataFrame) -> DataFrame:
    """Spread a small input across all cores for CPU-heavy per-row work.

    Small parquet files arrive as one split, so expression-heavy stages
    (shingling, hashing) would run single-threaded locally. On a real
    cluster big inputs already split; this only repartitions when the
    scan produced fewer partitions than the session's parallelism.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    names = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view for the SQL API path."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
