"""Z-order layout + data-quality expectation queries.

Split from the single-file registry (round 10); bodies unchanged.
"""

from __future__ import annotations

import math  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window, functions as F  # noqa: F401

from covid_custom_sql_engine_spark.catalog import load_table, parallelize_small  # noqa: F401
from covid_custom_sql_engine_spark.operators import core as ops  # noqa: F401
from covid_custom_sql_engine_spark.operators import composites as comp  # noqa: F401
from covid_custom_sql_engine_spark.operators import joins as xjoins  # noqa: F401
from covid_custom_sql_engine_spark.functions import corpus as cp  # noqa: F401
from covid_custom_sql_engine_spark.functions import dedup as dd  # noqa: F401
from covid_custom_sql_engine_spark.functions import similarity as sim  # noqa: F401
from covid_custom_sql_engine_spark.functions import sketches as sks  # noqa: F401
from covid_custom_sql_engine_spark.functions import text as tx  # noqa: F401
from covid_custom_sql_engine_spark.registry._base import query  # noqa: F401,E501


# Z-order layout (operators/layout.py — beyond-reference storage
# clustering for multi-dimensional data skipping)
# ---------------------------------------------------------------------------


def _zorder_oracle() -> str:
    from covid_custom_sql_engine_spark.operators.layout import sql_zvalue

    zv = sql_zvalue(["user_id", "value"], [(0.0, 1500.0), (0.0, 600.0)], bits=8)
    return f"""
    SELECT ({zv} >> 8) AS z_tile,
           count(*) AS n_events,
           min(user_id) AS min_user, max(user_id) AS max_user,
           min(value) AS min_value, max(value) AS max_value
    FROM events
    GROUP BY 1
    """


@query("zorder_cluster_stats", oracle=_zorder_oracle())
def zorder_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-curve tile profile of events over (user_id, value): the
    16-bit interleaved z-key's top 8 bits define 256 tiles; per tile the
    report shows the bounding box each output file would carry as
    parquet min-max stats after :func:`layout.zorder_by` — compact on
    BOTH dimensions, which is the whole point (a linear sort keeps only
    its leading column tight). Pure unrolled integer bit ops in
    codegen; one hash aggregate."""
    from covid_custom_sql_engine_spark.operators.layout import zvalue

    e = load_table(spark, sf_dir, "events")
    z = zvalue(
        [F.col("user_id"), F.col("value")], [(0.0, 1500.0), (0.0, 600.0)], bits=8
    )
    return (
        e.select(F.shiftright(z, 8).alias("z_tile"), "user_id", "value")
        .groupBy("z_tile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# Data-quality expectations (operators/quality.py — beyond-reference;
# the reference's only validation is load-time schema checking,
# src/schema.py)
# ---------------------------------------------------------------------------


@query(
    "data_quality_report",
    oracle="""
    WITH t AS (
        SELECT count(*) AS total,
               sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS v0,
               sum(CASE WHEN NOT (l_returnflag IN ('A','N','R') OR l_returnflag IS NULL)
                        THEN 1 ELSE 0 END)::BIGINT AS v1,
               sum(CASE WHEN NOT ((l_quantity BETWEEN 1 AND 45) OR l_quantity IS NULL)
                        THEN 1 ELSE 0 END)::BIGINT AS v2,
               sum(CASE WHEN NOT (l_discount <= 0.08) THEN 1 ELSE 0 END)::BIGINT AS v3,
               count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v4
        FROM lineitem
    ),
    refv AS (
        SELECT count(*) AS rv FROM lineitem
        WHERE l_orderkey IS NOT NULL
          AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    ),
    rows_out AS (
        SELECT 'l_orderkey_not_null' AS rule, 'not_null' AS kind, v0 AS violations, total FROM t
        UNION ALL
        SELECT 'l_returnflag_in_set', 'in_set', v1, total FROM t
        UNION ALL
        SELECT 'l_quantity_in_range', 'in_range', v2, total FROM t
        UNION ALL
        SELECT 'discount_at_most_8pct', 'satisfies', v3, total FROM t
        UNION ALL
        SELECT 'unique_l_orderkey_l_linenumber', 'unique', v4, total FROM t
        UNION ALL
        SELECT 'l_orderkey_ref_integrity', 'ref_integrity', rv, total FROM refv, t
    )
    SELECT rule, kind, violations, total, violations = 0 AS passed FROM rows_out
    """,
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite run over lineitem: nullability, set membership,
    range, an arbitrary boolean contract, composite-key uniqueness, and
    referential integrity against orders. All non-referential rules fold
    into ONE aggregation pass (conditional counters + a distinct-count,
    all map-side-combinable); the FK rule is a key-pruned broadcast
    anti-join count. The generated data REALLY violates the uniqueness
    and range rules — the report proves the detector, not just the
    plumbing."""
    from covid_custom_sql_engine_spark.operators import quality as dq

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return dq.validate(
        l,
        [
            dq.expect_not_null("l_orderkey"),
            dq.expect_in_set("l_returnflag", ["A", "N", "R"]),
            dq.expect_in_range("l_quantity", 1, 45),
            dq.expect_satisfies("discount_at_most_8pct", F.col("l_discount") <= 0.08),
            dq.expect_unique("l_orderkey", "l_linenumber"),
            dq.expect_ref_integrity("l_orderkey", o, "o_orderkey"),
        ],
    )


# ---------------------------------------------------------------------------
