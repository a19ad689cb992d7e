"""Flagship + SURVEY §2.1 core operator parity + §2.2 composites.

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
from covid_custom_sql_engine_spark.registry._base import _sql_davg, _sql_dstd, _sql_dsum, _sql_ref7, _sql_safe_corr, query  # noqa: F401,E501


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


@query(
    "safe_corr_qty_price",
    oracle=f"""
    SELECT {_sql_safe_corr('l_quantity', 'l_extendedprice')} AS corr
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
    a rank so the order-insensitive hash can verify ordering.

    Ranked via operators/selection.global_rank — the repo's two-phase
    range-partitioned plan — NOT a bare Window.orderBy, which funnels
    the whole table through one task (the last single-partition sort in
    the registry until r5; r4 VERDICT "What's wrong" #1). NULLS LAST is
    encoded as a leading is-null boolean sort key (false < true), so the
    range exchange, the within-partition sort, and the oracle's
    ASC NULLS LAST agree on one total order with o_orderkey as the
    unique tiebreak."""
    from covid_custom_sql_engine_spark.operators.selection import global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("_v"),
    ).withColumn("_vnull", F.col("_v").isNull())
    return global_rank(o, ["_vnull", "_v", "o_orderkey"], "rn").select(
        "o_orderkey", F.col("rn").cast("bigint").alias("rn")
    )


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


# ---------------------------------------------------------------------------
# §2.2 composites, continued
# ---------------------------------------------------------------------------


@query(
    "pivot_wide",
    oracle=f"""
    SELECT l_returnflag,
           {_sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
           {_sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: long→wide pivot (app.py:1013-1024) with explicit pivot values
    (unbounded pivot = a driver-side distinct collect; bound it at scale)."""
    l = load_table(spark, sf_dir, "lineitem")
    out = comp.pivot_wide(l, "l_returnflag", "l_linestatus", ["O", "F"], "l_quantity", agg="sum_det")
    return out.select("l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F"))


@query(
    "locf_fill",
    oracle="""
    SELECT event_id,
           coalesce(
             last_value(CASE WHEN event_type = 'click' THEN NULL ELSE value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             0.0) AS value_filled
    FROM events
    """,
)
def locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: forward-fill / LOCF with initial 0 (app.py:1038-1046) — the
    reference's only window-shaped computation. Nulls are synthesized by
    blanking 'click' values so the fill path is actually exercised."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "_v", F.when(F.col("event_type") == "click", F.lit(None)).otherwise(F.col("value"))
    )
    out = comp.locf(e, "user_id", ["ts", "event_id"], "_v", out_col="value_filled")
    return out.select("event_id", "value_filled")


@query(
    "rolling_avg_7",
    oracle="""
    SELECT event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS value_smoothed
    FROM events
    """,
)
def rolling_avg_7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19: trailing 7-row rolling mean (the OWID smoothing, derived)."""
    e = load_table(spark, sf_dir, "events")
    out = comp.rolling_avg(e, "user_id", ["ts", "event_id"], "value", 7, out_col="value_smoothed")
    return out.select("event_id", F.round("value_smoothed", 6).alias("value_smoothed"))


@query(
    "time_weighted_avg",
    oracle=f"""
    WITH x AS (SELECT user_id, value, ts,
                      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
               FROM events),
    y AS (SELECT user_id, value,
                 (epoch_us(nts) - epoch_us(ts)) AS dt_us
          FROM x WHERE nts IS NOT NULL)
    SELECT user_id,
           round(CASE WHEN {_sql_dsum('dt_us')} != 0
                 THEN {_sql_dsum('value * dt_us')} / {_sql_dsum('dt_us')} END, 6) AS twa,
           count(*) AS n_intervals
    FROM y GROUP BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event value
    (operators/composites.time_weighted_avg): each value held until the
    user's next event, Σ value·Δt / Σ Δt — the irregular-sampling
    aggregate a plain avg gets wrong. Exact µs holding times +
    fixed-point sums → bit-identical across engines."""
    e = load_table(spark, sf_dir, "events")
    out = comp.time_weighted_avg(e, "user_id", "ts", "value", tiebreak="event_id")
    # ~1e13-magnitude value*µs products round differently at the
    # decimal cast's 6th fractional digit between engines — round the
    # quotient (convention: computed doubles rounded on both sides).
    return out.withColumn("twa", F.round("twa", 6))


@query(
    "topn_per_group",
    oracle="""
    WITH r AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
                      row_number() OVER (PARTITION BY o_orderpriority
                                         ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders)
    SELECT o_orderkey, o_orderpriority, o_totalprice, rn
    FROM r WHERE rn <= 3
    """,
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each priority — the N>1 complement
    of latest-per-group. Per-group window row_number: one shuffle on
    the group key, and the rank predicate becomes a per-partition
    top-N heap (WindowGroupLimit) rather than a full sort+filter."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "rn")
    )


@query(
    "debounce_events",
    oracle="""
    WITH x AS (SELECT event_id, user_id, event_type, ts, value,
                      CASE WHEN lag(ts) OVER w IS NULL
                                OR ts >= lag(ts) OVER w + INTERVAL '5 minutes'
                           THEN 1 ELSE 0 END AS brk
               FROM events
               WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
    y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS burst
          FROM x),
    z AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type, burst
                                       ORDER BY ts, event_id) AS rn
          FROM y)
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, value
    FROM z WHERE rn = 1
    """,
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst debounce (operators/composites.debounce_events): collapse
    each rapid same-user same-type chain (successive events < 5 min
    apart) to its first row — the clickstream double-fire/retry-storm
    cleaner."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    out = comp.debounce_events(
        e, ["user_id", "event_type"], ["ts", "event_id"], "ts", "5 minutes"
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "value",
    )


@query(
    "rolling_zscore_anomalies",
    oracle="""
    WITH s AS (SELECT event_id, event_type, value,
                      count(value) OVER w AS n,
                      CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sx,
                      CAST(sum(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxx
               FROM events
               WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)),
    z AS (SELECT event_id, event_type, value,
                 (value - sx / n)
                 / round(sqrt(greatest((n * sxx - sx * sx) / (n * (n - 1)), 0.0)), 6) AS z
          FROM s
          WHERE n >= 30
            AND round(sqrt(greatest((n * sxx - sx * sx) / (n * (n - 1)), 0.0)), 6) > 0)
    SELECT event_id, event_type, value, round(z, 6) AS z
    FROM z WHERE abs(z) > 3
    """,
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly flags: each event scored against the mean/std of
    the PREVIOUS 100 same-type events (trailing window excludes the
    current row so an outlier can't mask itself); |z| > 3 with ≥30
    history rows flags it. The windowed complement of the global
    zscore_outliers. Window sums run as fixed-point decimals — exact
    and order-independent, so both engines derive bit-identical stats;
    the std carries the same round(6) as the global formula (the n·Σx²
    cancellation amplifies last-ulp cast differences)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-100, -1)
    )
    dec = lambda c: F.sum(c.cast("decimal(38,6)")).over(w).cast("double")
    s = e.select(
        "event_id",
        "event_type",
        "value",
        F.count("value").over(w).alias("n"),
        dec(F.col("value")).alias("sx"),
        dec(F.col("value") * F.col("value")).alias("sxx"),
    )
    var = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) / (
        F.col("n") * (F.col("n") - 1)
    )
    std = F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6)
    z = (F.col("value") - F.col("sx") / F.col("n")) / std
    return (
        s.filter((F.col("n") >= 30) & (std > 0))
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
        .filter(F.abs("z") > 3)
    )


@query(
    "interevent_gap_percentiles",
    oracle="""
    WITH g AS (SELECT event_type,
                      epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                            ORDER BY ts, event_id)) AS gap_us
               FROM events)
    SELECT event_type,
           count(gap_us) AS n_gaps,
           round(quantile_cont(gap_us, 0.5) / 1e6, 6) AS p50_s,
           round(quantile_cont(gap_us, 0.9) / 1e6, 6) AS p90_s,
           round(quantile_cont(gap_us, 0.99) / 1e6, 6) AS p99_s
    FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
    """,
)
def interevent_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency distribution of the event stream: per event type, exact
    p50/p90/p99 of the seconds since the same user's previous event —
    the arrival-process profile capacity planning reads. One shuffle on
    user_id for the lag window, then grouped two-phase bucketed
    selection (operators/selection.grouped_exact_quantiles) for the
    order statistics: Spark's exact ``percentile`` aggregate buffers a
    value→count map per group that grows with the group's DISTINCT
    value count and merges on ONE reducer — near-continuous microsecond
    gaps with a handful of event types is precisely its OOM shape at
    100 TB (SCALE.md documents the same trap for F.median). The
    bucketed plan keeps per-group state at O(buckets) and returns the
    same quantile_cont-interpolated values exactly."""
    from covid_custom_sql_engine_spark.operators.selection import (
        grouped_exact_quantiles,
    )

    e = load_table(spark, sf_dir, "events")
    # exact integer microsecond gaps on both engines (a SECOND-unit
    # diff truncates in Spark but counts boundary crossings in DuckDB);
    # divide to seconds only after the percentile.
    g = e.withColumn(
        "gap_us", F.expr("timestampdiff(MICROSECOND, lag(ts) over (partition by user_id order by ts, event_id), ts)")
    ).filter(F.col("gap_us").isNotNull())
    q = grouped_exact_quantiles(
        g, "event_type", "gap_us", [0.5, 0.9, 0.99], ["_p50", "_p90", "_p99"],
        count_col="n_gaps",
    )
    return q.select(
        "event_type",
        "n_gaps",
        F.round(F.col("_p50") / F.lit(1e6), 6).alias("p50_s"),
        F.round(F.col("_p90") / F.lit(1e6), 6).alias("p90_s"),
        F.round(F.col("_p99") / F.lit(1e6), 6).alias("p99_s"),
    )


@query(
    "event_transitions",
    oracle="""
    WITH x AS (SELECT event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
               FROM events)
    SELECT event_type AS from_state, nxt AS to_state,
           count(*) AS n_transitions
    FROM x WHERE nxt IS NOT NULL GROUP BY 1, 2
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition bigrams
    (operators/composites.event_transitions) — the Markov-chain /
    user-path matrix over the events log."""
    e = load_table(spark, sf_dir, "events")
    return comp.event_transitions(e, "user_id", ["ts", "event_id"], "event_type")


@query(
    "retention_cohorts",
    oracle="""
    WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
               FROM events GROUP BY 1)
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
           date_diff('week', f.cohort, date_trunc('week', e.ts)) AS period_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle
    (operators/composites.retention_cohorts): users bucketed by
    first-active week, distinct-counted per week offset."""
    e = load_table(spark, sf_dir, "events")
    out = comp.retention_cohorts(e, "user_id", "ts", "week")
    return out.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
        "period_offset",
        "n_active",
    )


@query(
    "stat_summary",
    oracle=f"""
    SELECT 'l_quantity' AS metric, CAST(count(*) AS DOUBLE) AS count,
           {_sql_dsum('l_quantity')} AS sum, {_sql_davg('l_quantity')} AS avg,
           min(l_quantity) AS min, max(l_quantity) AS max,
           median(l_quantity) AS median, {_sql_dstd('l_quantity')} AS std
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(count(*) AS DOUBLE),
           {_sql_dsum('l_extendedprice')}, {_sql_davg('l_extendedprice')},
           min(l_extendedprice), max(l_extendedprice),
           median(l_extendedprice), {_sql_dstd('l_extendedprice')}
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(count(*) AS DOUBLE),
           {_sql_dsum('l_discount')}, {_sql_davg('l_discount')},
           min(l_discount), max(l_discount),
           median(l_discount), {_sql_dstd('l_discount')}
    FROM lineitem
    """,
)
def stat_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: multi-metric 7-fn statistical summary, one aggregation pass
    then unpivot (app.py:1343-1379 loops metrics).

    The testdata parquet is a single row group (1-split scan), so the
    exact-median object aggregate would run its partial phase on one
    core; parallelize_small spreads the 3 projected columns across the
    cluster first — measured ~20% faster at sf0.1 despite the extra
    exchange. On a many-row-group production table the scan itself is
    parallel and the repartition is unnecessary."""
    metrics = ["l_quantity", "l_extendedprice", "l_discount"]
    l = parallelize_small(load_table(spark, sf_dir, "lineitem").select(*metrics))
    return comp.stat_summary(l, metrics, deterministic=True)


@query(
    "exact_medians_scalable",
    oracle="""
    SELECT median(l_quantity) AS median_l_quantity,
           median(l_extendedprice) AS median_l_extendedprice,
           median(l_discount) AS median_l_discount
    FROM lineitem
    """,
)
def exact_medians_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column medians via declarative two-phase bucketed
    selection (operators/selection.exact_medians_plan) — the 100 TB path
    for order statistics. F.median/percentile merge every partition's
    value→count map on ONE reducer, so memory grows with the global
    distinct count; this plan's phases are a codegen (n, lo, hi)
    aggregate, a bounded bucket-count hash aggregate, and a sliver scan
    touching ~n/buckets rows — memory O(buckets), values identical to
    the built-in to the last bit (same even-count interpolation)."""
    metrics = ["l_quantity", "l_extendedprice", "l_discount"]
    l = parallelize_small(load_table(spark, sf_dir, "lineitem").select(*metrics))
    from covid_custom_sql_engine_spark.operators.selection import exact_medians_plan

    return exact_medians_plan(l, metrics)


@query(
    "global_rank_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk
    FROM orders
    """,
)
def global_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global 1-based ranking of every order by total price WITHOUT a
    single-partition window (operators/selection.global_rank) — the
    100 TB path for ROW_NUMBER() OVER (ORDER BY ...). A bare
    Window.orderBy funnels the whole table through one task; this plan
    range-partitions, ranks locally in parallel, and broadcast-adds the
    per-partition offsets (an O(num_partitions)-row cumulative window)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    from covid_custom_sql_engine_spark.operators.selection import global_rank

    return global_rank(o, ["o_totalprice", "o_orderkey"], "rnk").select(
        "o_orderkey", "o_totalprice", "rnk"
    )


@query(
    "equidepth_histogram",
    oracle="""
    WITH r AS (SELECT o_totalprice,
                      ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
               FROM orders)
    SELECT bucket, count(*) AS n_rows,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi
    FROM r GROUP BY bucket
    """,
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-depth (NTILE) histogram of order totals WITHOUT the
    single-partition window NTILE needs
    (operators/selection.equidepth_buckets over the distributed
    global_rank): 10 buckets of equal row count, each reporting its
    value range — the quantile-sketch building block expressed exactly."""
    from covid_custom_sql_engine_spark.operators.selection import equidepth_buckets

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = equidepth_buckets(o, ["o_totalprice", "o_orderkey"], 10)
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query(
    "rename_pretty",
    oracle="""
    SELECT n_nationkey AS nation_key, n_name AS nation_name, n_regionkey AS region_key
    FROM nation
    """,
)
def rename_pretty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: display-name projection (PRETTY map, app.py:160-167)."""
    n = load_table(spark, sf_dir, "nation")
    return comp.rename_pretty(
        n,
        {"n_nationkey": "nation_key", "n_name": "nation_name", "n_regionkey": "region_key"},
    )


def _sql_lag_corr(k: int) -> str:
    return f"""
    SELECT {k} AS lag,
           count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) AS n_pairs,
           round({_sql_safe_corr('x', 'y')}, 6) AS corr
    FROM (SELECT value AS x,
                 lag(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
          FROM events)"""


@query(
    "lagged_corr_best",
    oracle=" UNION ALL ".join(_sql_lag_corr(k) for k in range(6)),
)
def lagged_corr_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20: best-lag correlation search over per-user series (the implied
    lagged vaccination-effect analysis; corr primitive dataframe.py:250-273)."""
    e = load_table(spark, sf_dir, "events")
    return comp.lagged_corr_best(e, "user_id", ["ts", "event_id"], "value", "value", max_lag=5)


