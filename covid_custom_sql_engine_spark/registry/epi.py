"""The reference's implied derived analytics (functions/epi.py).

The reference's PRETTY map names ``herd_threshold_estimate``,
``eff_40``/``eff_60`` and ``economic_resilience_score`` (app.py:63-69)
but its snapshot never computes them — the last SURVEY §1.4 stretch
items. These queries drive the computations over the star schema so
the driver verifies the exact arithmetic cross-engine; the COVID-shaped
semantics (which columns play vaccination%, outcome, capacity, burden)
are pinned by tests/test_epi.py on the reference-shaped fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from covid_custom_sql_engine_spark.catalog import load_table
from covid_custom_sql_engine_spark.functions import epi
from covid_custom_sql_engine_spark.registry._base import (
    _sql_davg,
    _sql_dsum,
    query,
)


def _mask(expr: str, other: str) -> str:
    return f"(CASE WHEN ({expr}) IS NOT NULL AND ({other}) IS NOT NULL THEN ({expr}) END)"


def _sql_ols_fit() -> str:
    """The vaccination-effect oracle: OLS sums over pairwise-complete
    (x, y) with fixed-point dsum — the exact twin of epi.ols_exprs."""
    mx, my = _mask("x", "y"), _mask("y", "x")
    return f"""
    WITH s AS (SELECT l_discount * 100 AS x, l_quantity AS y FROM lineitem),
    a AS (SELECT count({mx}) AS n,
                 {_sql_dsum(mx)} AS sx,
                 {_sql_dsum(my)} AS sy,
                 {_sql_dsum(f'{mx} * {mx}')} AS sxx,
                 {_sql_dsum(f'{mx} * {my}')} AS sxy
          FROM s),
    f AS (SELECT n, sx, sy,
                 CASE WHEN n < 3 THEN NULL
                      WHEN (n * sxx - sx * sx) <= 0 THEN 0.0
                      ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx)
                 END AS b
          FROM a),
    g AS (SELECT n, b,
                 CASE WHEN n >= 3 THEN (sy - b * sx) / n END AS a0
          FROM f)
    SELECT n AS n_pairs,
           round(b, 6) AS slope,
           round(a0, 6) AS intercept,
           round(b * 40.0, 6) AS eff_40,
           round(b * 60.0, 6) AS eff_60,
           round(CASE WHEN b < 0
                      THEN least(greatest(-a0 / b, 0.0), 100.0) END,
                 6) AS herd_threshold_estimate
    FROM g
    """


@query("vaccination_effect_fit", oracle=_sql_ols_fit())
def vaccination_effect_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The implied vaccination-effect estimates (app.py:67-69 display
    names): OLS of an outcome on a percent-scaled treatment with the
    safe-corr guard discipline; eff_k = slope·k, herd threshold = the
    x-intercept when slope < 0. Star-schema stand-ins: x = discount
    percent, y = quantity (the driver verifies the arithmetic; the
    COVID-column mapping is pinned in tests/test_epi.py). ONE hash
    aggregate — five decimal sums with map-side combine."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_discount") * 100).alias("x"),
        F.col("l_quantity").alias("y"),
    )
    return epi.vaccination_effect(li, "x", "y", effect_points=(40.0, 60.0))


def _norm_sql(v: str, lo: str, hi: str) -> str:
    return f"(CASE WHEN {hi} - {lo} > 0 THEN ({v} - {lo}) / ({hi} - {lo}) END)"


_RES_N1 = _norm_sql("v1", "lo1", "hi1")
_RES_N2 = _norm_sql("v2", "lo2", "hi2")


@query(
    "resilience_score_by_nation",
    oracle=f"""
    WITH per AS (
        SELECT c_nationkey AS nationkey,
               {_sql_davg('c_acctbal')} AS v1,
               {_sql_davg('o_totalprice')} AS v2
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY 1),
    b AS (SELECT min(v1) AS lo1, max(v1) AS hi1,
                 min(v2) AS lo2, max(v2) AS hi2 FROM per)
    SELECT nationkey,
           round(CASE WHEN {_RES_N1} IS NOT NULL OR {_RES_N2} IS NOT NULL
                      THEN coalesce((0.0 + {_RES_N1}) / 1, 0.0)
                         - coalesce({_RES_N2}, 0.0)
                 END, 6) AS economic_resilience_score
    FROM per, b
    """,
)
def resilience_score_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The implied "Economic Resilience Score (Computed)" (app.py:63):
    per-key mean of min-max-normalized capacity indicators minus
    normalized burden. Star-schema stand-ins: capacity = customer
    account balance, burden = order totalprice, key = nation. One
    per-key hash aggregate + a ONE-row global-bounds broadcast (the
    intended BroadcastNestedLoopJoin of a scalar frame)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("nationkey"), "c_acctbal"
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    joined = c.join(o, c.c_custkey == o.o_custkey).select(
        "nationkey", "c_acctbal", "o_totalprice"
    )
    return epi.economic_resilience_score(
        joined, "nationkey", ("c_acctbal",), "o_totalprice"
    )
