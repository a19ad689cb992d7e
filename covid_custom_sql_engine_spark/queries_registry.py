"""Named query registry: Spark implementation + DuckDB oracle per operator.

Each entry exercises one operator/capability from SURVEY.md §2 on the
driver testdata tables. Conventions (driver compare = row-count + schema
+ order-insensitive value-hash, columns sorted by name):

- identical aliases on both sides;
- double-valued *computed* aggregates rounded identically on both sides
  (summation order differs between engines; raw pass-through columns are
  not rounded);
- timestamps emitted as formatted strings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from covid_custom_sql_engine_spark.catalog import load_table
from covid_custom_sql_engine_spark.operators import core as ops
from covid_custom_sql_engine_spark.operators import composites as comp
from covid_custom_sql_engine_spark.operators import joins as xjoins
from covid_custom_sql_engine_spark.functions import dedup as dd
from covid_custom_sql_engine_spark.functions import similarity as sim
from covid_custom_sql_engine_spark.functions import text as tx

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- SQL snippets mirroring the deterministic aggregate mode (ops.dsum) ---
# Per-row double math is IEEE-deterministic; fixed-point summation is
# order-independent → bit-identical values on both engines, no rounding.


def _sql_dsum(x: str) -> str:
    return f"CAST(sum(CAST(({x}) AS DECIMAL(38,6))) AS DOUBLE)"


def _sql_davg(x: str) -> str:
    return f"(CASE WHEN count({x}) > 0 THEN {_sql_dsum(x)} / count({x}) END)"


def _sql_dstd(x: str) -> str:
    # round(6): the n·Σx²−(Σx)² cancellation amplifies last-ulp
    # double→decimal cast differences between engines (~1e-10 absolute),
    # so std alone carries a final rounding on both sides.
    n = f"count({x})"
    sx, sxx = _sql_dsum(x), _sql_dsum(f"({x}) * ({x})")
    var = f"(({n} * {sxx} - {sx} * {sx}) / ({n} * ({n} - 1)))"
    return f"(CASE WHEN {n} < 2 THEN NULL ELSE round(sqrt(greatest({var}, 0.0)), 6) END)"


def _sql_ref7(x: str) -> str:
    """The reference 7-fn aggregate block with {fn}_{col} aliases."""
    return f"""
           count(*) AS count_{x},
           {_sql_dsum(x)} AS sum_{x},
           {_sql_davg(x)} AS avg_{x},
           min({x}) AS min_{x},
           max({x}) AS max_{x},
           median({x}) AS median_{x},
           {_sql_dstd(x)} AS std_{x}"""


# ---------------------------------------------------------------------------
# Phase 0 — flagship: filter → group-agg → broadcast-join enrichment
# (the reference's dashboard pipeline shape, SURVEY §3 entry point 2)
# ---------------------------------------------------------------------------


@query(
    "flagship_revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           count(*) AS n_rows,
           {_sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS sum_revenue,
           {_sql_davg('l.l_quantity')} AS avg_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter (A5) → broadcast join chain (J1/A16) → grouped agg (G2).

    Dims broadcast (customer/nation are tiny next to lineitem) so the
    only shuffle is the lineitem⋈orders equi-join + final aggregation;
    the shipdate filter and 4-column projection push into the parquet
    scan.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < "1997-01-01")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            ops.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_revenue"),
            (ops.dsum(F.col("l_quantity")) / F.count("l_quantity")).alias("avg_qty"),
        )
    )


# ---------------------------------------------------------------------------
# §2.1 core operator parity
# ---------------------------------------------------------------------------


@query(
    "filter_range_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1995-12-31'
      AND l_returnflag IN ('A', 'R')
    """,
)
def filter_range_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 + A5 + A6 + P1: conjunctive membership+range filter then
    drop-missing projection (requests a nonexistent column, which the
    reference silently drops, dataframe.py:150-151)."""
    l = load_table(spark, sf_dir, "lineitem")
    filtered = l.filter(
        F.col("l_shipdate").between("1994-01-01", "1995-12-31")
        & F.col("l_returnflag").isin("A", "R")
    ).withColumn("ship_date", F.date_format("l_shipdate", "yyyy-MM-dd"))
    return ops.select_existing(
        filtered,
        ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "ship_date", "no_such_column"],
    )


@query(
    "group_agg_ref7",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_sql_ref7('l_quantity')}
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def group_agg_ref7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1+G2: the reference's 7-fn grouped aggregate with {fn}_{col}
    naming, count = COUNT(*), exact median, sample std with n<2 → NULL
    (dataframe.py:28-87), in deterministic aggregation mode."""
    l = load_table(spark, sf_dir, "lineitem")
    return ops.ref_group_agg(
        l, ["l_returnflag", "l_linestatus"], {"l_quantity": ops.REF_AGG_FNS}, deterministic=True
    )


@query(
    "join_ref_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           c.c_name AS r_c_name, c.c_mktsegment AS r_c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_ref_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 inner: build-small/probe-big hash join with r_-prefixed right
    columns (dataframe.py:214-248) → BroadcastHashJoin."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = ops.ref_join(o, c, on=("o_custkey", "c_custkey"), how="inner")
    return joined.select("o_orderkey", "o_totalprice", "r_c_name", "r_c_mktsegment")


@query(
    "join_ref_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS r_n_name, n.n_regionkey AS r_n_regionkey
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def join_ref_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 left: unmatched left rows survive with NULL right side
    (dataframe.py:242-246)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = ops.ref_join(c, n, on=("c_nationkey", "n_nationkey"), how="left")
    return joined.select("c_custkey", "c_name", "r_n_name", "r_n_regionkey")


_CORR_X = "(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL THEN l_quantity END)"
_CORR_Y = "(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL THEN l_extendedprice END)"


@query(
    "safe_corr_qty_price",
    oracle=f"""
    SELECT CASE
             WHEN count({_CORR_X}) < 3 THEN NULL
             WHEN (sqrt(greatest(count({_CORR_X}) * {_sql_dsum(_CORR_X + '*' + _CORR_X)}
                                 - {_sql_dsum(_CORR_X)} * {_sql_dsum(_CORR_X)}, 0.0))
                   * sqrt(greatest(count({_CORR_Y}) * {_sql_dsum(_CORR_Y + '*' + _CORR_Y)}
                                   - {_sql_dsum(_CORR_Y)} * {_sql_dsum(_CORR_Y)}, 0.0))) = 0
               THEN 0.0
             ELSE (count({_CORR_X}) * {_sql_dsum(_CORR_X + '*' + _CORR_Y)}
                   - {_sql_dsum(_CORR_X)} * {_sql_dsum(_CORR_Y)})
                  / (sqrt(greatest(count({_CORR_X}) * {_sql_dsum(_CORR_X + '*' + _CORR_X)}
                                   - {_sql_dsum(_CORR_X)} * {_sql_dsum(_CORR_X)}, 0.0))
                     * sqrt(greatest(count({_CORR_Y}) * {_sql_dsum(_CORR_Y + '*' + _CORR_Y)}
                                     - {_sql_dsum(_CORR_Y)} * {_sql_dsum(_CORR_Y)}, 0.0)))
           END AS corr
    FROM lineitem
    """,
)
def safe_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: pairwise-complete Pearson r via the reference's computational
    formula with min-pairs guard and zero-denominator → 0.0
    (dataframe.py:250-273), deterministic fixed-point sums."""
    l = load_table(spark, sf_dir, "lineitem")
    return ops.safe_corr(l, "l_quantity", "l_extendedprice")


@query(
    "whole_table_agg",
    oracle=f"""
    SELECT {_sql_ref7('o_totalprice')}
    FROM orders
    """,
)
def whole_table_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 + A13: whole-table single-row aggregate — the reference fakes
    this with a constant group key (app.py:938-944); Spark has global
    agg natively."""
    o = load_table(spark, sf_dir, "orders")
    return ops.whole_table_agg(o, {"o_totalprice": ops.REF_AGG_FNS}, deterministic=True)


@query(
    "sort_nulls_rank",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY (CASE WHEN o_orderstatus = 'O' THEN NULL
                                             ELSE o_totalprice END) ASC NULLS LAST,
                              o_orderkey ASC) AS rn
    FROM orders
    """,
)
def sort_nulls_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: reference sort null placement (ascending → nulls LAST,
    dataframe.py:180 — the opposite of Spark's default) materialized as
    a rank so the order-insensitive hash can verify ordering."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "_v", F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(F.col("o_totalprice"))
    )
    w = Window.orderBy(F.col("_v").asc_nulls_last(), F.col("o_orderkey").asc())
    return o.select("o_orderkey", F.row_number().over(w).alias("rn"))


# ---------------------------------------------------------------------------
# §2.2 composite capabilities
# ---------------------------------------------------------------------------


@query(
    "latest_per_group",
    oracle="""
    SELECT o_custkey,
           max(o_totalprice) AS max_totalprice,
           strftime(max(o_orderdate), '%Y-%m-%d') AS last_order_date
    FROM orders
    GROUP BY o_custkey
    """,
)
def latest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the LATEST_TBL workhorse — max per group for many metrics in
    one aggregation pass (vs. one groupby per metric in the reference,
    app.py:129-158)."""
    o = load_table(spark, sf_dir, "orders")
    out = comp.latest_per_group(o, "o_custkey", ["o_totalprice", "o_orderdate"])
    return out.select(
        "o_custkey",
        F.col("o_totalprice").alias("max_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_order_date"),
    )


@query(
    "distinct_sorted",
    oracle="SELECT DISTINCT o_orderpriority FROM orders",
)
def distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: sorted(set(col)) (app.py:143)."""
    return comp.distinct_sorted(load_table(spark, sf_dir, "orders"), "o_orderpriority")


@query(
    "argmax_latest",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def argmax_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A9: latest non-null row per group via one window idiom
    (app.py:712-729 forward scan / 812-828 reverse scan)."""
    o = load_table(spark, sf_dir, "orders")
    out = comp.argmax_latest(o, "o_custkey", "o_orderdate", "o_orderkey")
    return out.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 limit + deterministic top-k (TakeOrderedAndProject — no full
    sort, per-partition heaps then merge)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "minmax_dates",
    oracle="""
    SELECT strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
           strftime(max(o_orderdate), '%Y-%m-%d') AS max_date
    FROM orders
    """,
)
def minmax_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: global date bounds (app.py:247-251)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_date"),
    )
