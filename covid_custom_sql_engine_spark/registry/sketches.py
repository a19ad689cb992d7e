"""Sublinear-state sketches: frequency / cardinality estimation.

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
from covid_custom_sql_engine_spark.registry._base import ORACLES, QUERIES, _sql_davg, _sql_dsum, query  # noqa: F401,E501
from covid_custom_sql_engine_spark.registry.corpus_prep import _SQL_RECALL_TAIL, _recall_vs_exact  # noqa: F401,E501


# Sketches: sublinear-state frequency / cardinality estimation
# (functions/sketches.py — beyond-reference; the reference has only
# exact aggregates, src/dataframe.py)
# ---------------------------------------------------------------------------


@query(
    "xmr_control_limits",
    oracle=f"""
    WITH mr AS (
        SELECT event_type, value,
               abs(value - lag(value) OVER (PARTITION BY event_type
                                            ORDER BY ts, event_id)) AS moving_range
        FROM events
    ),
    s AS (
        SELECT event_type, count(*) AS n,
               {_sql_davg('value')} AS xbar,
               {_sql_davg('moving_range')} AS mrbar
        FROM mr GROUP BY event_type
    )
    SELECT mr.event_type, max(s.n) AS n,
           round(max(s.xbar), 6) AS xbar,
           round(max(s.mrbar), 6) AS mrbar,
           sum(CASE WHEN mr.value > s.xbar + 2.66 * s.mrbar THEN 1 ELSE 0 END)::BIGINT
             AS n_above_ucl,
           sum(CASE WHEN mr.value < s.xbar - 2.66 * s.mrbar THEN 1 ELSE 0 END)::BIGINT
             AS n_below_lcl
    FROM mr JOIN s USING (event_type)
    GROUP BY mr.event_type
    """,
)
def xmr_control_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals / moving-range) control chart per event type:
    mean, mean consecutive |Δ|, and the count of points breaching the
    ±2.66·mR̄ natural process limits — the SPC screen for metric
    streams. One shuffle on the type key covers the lag window AND the
    per-type stats; the ≤|types|-row limits frame broadcasts back onto
    the same partitioning for the breach count. Decimal-summed means →
    hash-stable limits cross-engine."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    mr = e.select(
        "event_type",
        "value",
        F.abs(F.col("value") - F.lag("value").over(w)).alias("moving_range"),
    )
    s = F.broadcast(
        mr.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            ops.davg(F.col("value")).alias("xbar"),
            ops.davg(F.col("moving_range")).alias("mrbar"),
        )
    )
    return (
        mr.join(s, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.round(F.max("xbar"), 6).alias("xbar"),
            F.round(F.max("mrbar"), 6).alias("mrbar"),
            F.sum(
                F.when(
                    F.col("value") > F.col("xbar") + 2.66 * F.col("mrbar"), 1
                ).otherwise(0)
            ).alias("n_above_ucl"),
            F.sum(
                F.when(
                    F.col("value") < F.col("xbar") - 2.66 * F.col("mrbar"), 1
                ).otherwise(0)
            ).alias("n_below_lcl"),
        )
    )


@query(
    "tpch_q13_order_count_dist",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts (excluding
    one priority class), zero-order customers included. Orders are
    pre-aggregated to per-custkey counts FIRST (map-side-combinable
    shuffle on o_custkey — the join then moves ≤|customers| count rows,
    not raw orders), then LEFT-joined onto customer with COALESCE(…, 0)
    supplying the zero-order customers. Spark cannot build-broadcast
    the row-preserving side of a left outer join, so hinting customer
    would be ignored; the shrunken counts side is the broadcastable one
    and AQE picks that up when it fits. Second aggregate collapses to
    ≤max-orders-per-customer groups."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o_counts = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    per_cust = c.join(
        o_counts, c.c_custkey == o_counts.o_custkey, "left"
    ).select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted (no commitdate in the driver schema): orders
    per priority having at least one line shipped >60 days after
    ordering. The EXISTS is a LEFTSEMI hash join on the order key with
    the date comparison as the join-side filter — one shuffle, no
    correlated re-scan, the decorrelation Catalyst applies to every
    EXISTS at any scale."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAY")),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "conversion_delay_quantiles",
    oracle="""
    WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'view' GROUP BY 1),
    s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY 1),
    d AS (SELECT dayofweek(s0.t0) + 1 AS first_view_dow,
                 CAST(epoch_us(s1.t1) - epoch_us(s0.t0) AS DOUBLE) AS delay_us
          FROM s0 JOIN s1 USING (user_id))
    SELECT CAST(first_view_dow AS INT) AS first_view_dow,
           count(*) AS n,
           round(quantile_cont(delay_us, 0.5) / 1e6, 6) AS p50_s,
           round(quantile_cont(delay_us, 0.9) / 1e6, 6) AS p90_s
    FROM d GROUP BY 1
    """,
)
def conversion_delay_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel LATENCY, not just counts: exact p50/p90 of each user's
    first-view → first-subsequent-click delay, grouped by the weekday
    of first view. The near-continuous second-scale delays are exactly
    the distribution that OOMs Spark's object-path percentile aggregate
    at scale, so the quantiles come from the grouped two-phase bucketed
    selection (O(buckets) state per group) — same values to the last
    bit as DuckDB's quantile_cont."""
    from covid_custom_sql_engine_spark.operators.selection import (
        grouped_exact_quantiles,
    )

    e = load_table(spark, sf_dir, "events")
    s0 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    s1 = (
        e.join(s0, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t0")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    d = (
        s0.join(s1, "user_id")
        .select(
            F.dayofweek("t0").alias("first_view_dow"),
            F.expr("CAST(timestampdiff(MICROSECOND, t0, t1) AS DOUBLE)").alias(
                "delay_us"
            ),
        )
    )
    q = grouped_exact_quantiles(
        d, "first_view_dow", "delay_us", [0.5, 0.9], ["_p50", "_p90"]
    )
    return q.select(
        F.col("first_view_dow").cast("int").alias("first_view_dow"),
        F.col("n"),
        F.round(F.col("_p50") / 1e6, 6).alias("p50_s"),
        F.round(F.col("_p90") / 1e6, 6).alias("p90_s"),
    )


@query(
    "revenue_concentration",
    oracle=f"""
    WITH pc AS (
        SELECT o_custkey, {_sql_dsum('o_totalprice')} AS rev
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev, o_custkey) AS rnk,
               count(*) OVER () AS n
        FROM pc
    )
    SELECT max(n) AS n_customers,
           round(2.0 * {_sql_dsum('rnk * rev')} / (max(n) * {_sql_dsum('rev')})
                 - (max(n) + 1.0) / max(n), 6) AS gini,
           round({_sql_dsum('CASE WHEN rnk > 0.9 * n THEN rev ELSE 0 END')}
                 / {_sql_dsum('rev')}, 6) AS top_decile_share
    FROM r
    """,
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration profile: exact Gini coefficient and the
    top-decile share of per-customer revenue. The rank-weighted Gini
    formula needs a GLOBAL ascending rank — supplied by
    selection.global_rank (pinned range exchange + bit-unpacked local
    ranks, never a single-partition window), then one decimal-summed
    fold. The whale-vs-long-tail report for any metric at any scale."""
    from covid_custom_sql_engine_spark.operators.selection import global_rank

    o = load_table(spark, sf_dir, "orders")
    pc = o.groupBy("o_custkey").agg(ops.dsum(F.col("o_totalprice")).alias("rev"))
    ranked = global_rank(pc, ["rev", "o_custkey"], out_col="rnk")
    cnt = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("n")))
    r = ranked.crossJoin(cnt)
    n = F.max("n")
    return r.agg(
        n.alias("n_customers"),
        F.round(
            2.0 * ops.dsum(F.col("rnk") * F.col("rev")) / (n * ops.dsum(F.col("rev")))
            - (n + 1.0) / n,
            6,
        ).alias("gini"),
        F.round(
            ops.dsum(
                F.when(F.col("rnk") > 0.9 * F.col("n"), F.col("rev")).otherwise(0.0)
            )
            / ops.dsum(F.col("rev")),
            6,
        ).alias("top_decile_share"),
    )


@query(
    "ols_trend_by_type",
    oracle=f"""
    WITH x AS (
        SELECT event_type,
               CAST(datediff('second', TIMESTAMP '2024-01-01', ts) AS DOUBLE) AS xs,
               value AS y
        FROM events
    ),
    s AS (
        SELECT event_type,
               count(*) AS n,
               {_sql_dsum('xs')} AS sx, {_sql_dsum('y')} AS sy,
               {_sql_dsum('xs * xs')} AS sxx, {_sql_dsum('xs * y')} AS sxy
        FROM x GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 12) AS slope_per_sec,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept
    FROM s
    """,
)
def ols_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type least-squares trend of value over event time, from the
    closed-form normal equations — five decimal-summed moments per
    group in ONE hash aggregate (map-side combinable; nothing iterative,
    nothing collected). The decimal sums make the cancellation-prone
    n·Σx²−(Σx)² arithmetic bit-identical cross-engine, so even the
    ~1e-9-scale slope hash-matches. The drift detector for metric
    streams at any scale."""
    e = load_table(spark, sf_dir, "events")
    xs = F.expr("CAST(timestampdiff(SECOND, TIMESTAMP '2024-01-01', ts) AS DOUBLE)")
    x = e.select("event_type", xs.alias("xs"), F.col("value").alias("y"))
    s = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        ops.dsum(F.col("xs")).alias("sx"),
        ops.dsum(F.col("y")).alias("sy"),
        ops.dsum(F.col("xs") * F.col("xs")).alias("sxx"),
        ops.dsum(F.col("xs") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "event_type",
        "n",
        F.round(slope, 12).alias("slope_per_sec"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@query(
    "mad_outliers",
    oracle="""
    WITH med AS (SELECT median(l_quantity) AS m FROM lineitem),
    dev AS (SELECT l_quantity, abs(l_quantity - med.m) AS d, med.m FROM lineitem, med),
    mad AS (SELECT median(d) AS mad, max(m) AS m FROM dev)
    SELECT round(mad.m, 6) AS median_qty,
           round(mad.mad, 6) AS mad_qty,
           sum(CASE WHEN abs(dev.l_quantity - mad.m) > 3 * 1.4826 * mad.mad
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           count(*) AS n_rows
    FROM dev, mad
    GROUP BY mad.m, mad.mad
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier count via Median Absolute Deviation — two chained
    exact medians (quantity, then |quantity − median|), each the
    two-phase bucketed selection (selection.exact_medians_plan:
    O(buckets) state, 1-row broadcast back — never a single-partition
    sort), then one counting pass with the 3·1.4826·MAD fence. The
    robust alternative to z-scores when the metric has heavy tails;
    three scans total at any scale."""
    from covid_custom_sql_engine_spark.operators.selection import exact_medians_plan

    l = load_table(spark, sf_dir, "lineitem").select("l_quantity")
    med = F.broadcast(
        exact_medians_plan(l, ["l_quantity"]).select(
            F.col("median_l_quantity").alias("m")
        )
    )
    dev = l.crossJoin(med).select(
        "l_quantity", F.abs(F.col("l_quantity") - F.col("m")).alias("d"), "m"
    )
    mad = F.broadcast(
        exact_medians_plan(dev.select("d"), ["d"]).select(
            F.col("median_d").alias("mad")
        )
    )
    return (
        dev.crossJoin(mad)
        .groupBy("m", "mad")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("l_quantity") - F.col("m"))
                    > 3 * 1.4826 * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.round("m", 6).alias("median_qty"),
            F.round("mad", 6).alias("mad_qty"),
            "n_outliers",
            "n_rows",
        )
    )


@query(
    "frequent_part_pairs",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, count(*) AS support
    FROM pairs GROUP BY 1, 2
    HAVING count(*) >= 2
    ORDER BY support DESC, part_a, part_b
    LIMIT 20
    """,
)
def frequent_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs bought together.
    The pair blow-up is the per-basket C(items,2) — bounded by basket
    size, never corpus size — generated by a self equi-join on the
    order key (the standard first pass of frequent-itemset mining);
    candidates aggregate with map-side combine, top-20 by
    TakeOrderedAndProject with full tiebreaks. At 100 TB the only
    watch-item is a pathological mega-basket, the same guard class as
    the LSH bucket cap."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(20)
    )


_SQL_SURFACE = f"""
    SELECT l_returnflag,
           count(*) AS n_rows,
           {{dsum}} AS sum_revenue,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship
    FROM lineitem
    WHERE l_quantity >= 10
    GROUP BY l_returnflag
"""


@query(
    "sql_surface",
    oracle=f"""
    SELECT l_returnflag, n_rows, sum_revenue,
           strftime(min_ship, '%Y-%m-%d') AS min_ship_date,
           strftime(max_ship, '%Y-%m-%d') AS max_ship_date
    FROM ({_SQL_SURFACE.format(dsum=_sql_dsum('l_extendedprice * (1 - l_discount)'))})
    """,
)
def sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: register the catalog as temp views and run a
    TEXTUAL SQL query through ``spark.sql`` — proving a reference user
    can bring plain SQL, not just the DataFrame API, and Catalyst plans
    it identically (same pushdown/pruning guards apply). The statement
    text is shared with the DuckDB oracle modulo each engine's
    decimal-sum/strftime rendering."""
    from covid_custom_sql_engine_spark.catalog import register_views

    register_views(spark, sf_dir, ["lineitem"])
    spark_sql = _SQL_SURFACE.format(
        dsum="CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)"
    )
    return spark.sql(spark_sql).select(
        "l_returnflag",
        "n_rows",
        "sum_revenue",
        F.date_format("min_ship", "yyyy-MM-dd").alias("min_ship_date"),
        F.date_format("max_ship", "yyyy-MM-dd").alias("max_ship_date"),
    )


@query(
    "chi_square_flags",
    oracle=f"""
    WITH obs AS (
        SELECT l_returnflag AS rf, l_linestatus AS ls, count(*) AS o
        FROM lineitem GROUP BY 1, 2
    ),
    tot AS (SELECT sum(o) AS n FROM obs),
    margins AS (
        SELECT obs.rf, obs.ls, obs.o,
               sum(obs.o) OVER (PARTITION BY obs.rf) AS row_tot,
               sum(obs.o) OVER (PARTITION BY obs.ls) AS col_tot,
               tot.n
        FROM obs, tot
    )
    SELECT count(*) AS n_cells,
           round(sum(CAST(
               (o - row_tot * col_tot / CAST(n AS DOUBLE))
               * (o - row_tot * col_tot / CAST(n AS DOUBLE))
               / (row_tot * col_tot / CAST(n AS DOUBLE))
               AS DECIMAL(38,18)))::DOUBLE, 6) AS chi2
    FROM margins
    """,
)
def chi_square_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for the (returnflag ×
    linestatus) contingency table: observed cell counts from one hash
    aggregate (bounded by category-pair cardinality), margins from
    windows over those few rows, the statistic folded with a
    DECIMAL(38,18) sum so the result is order-independent. The
    categorical-drift screen for ingest QA — at 100 TB only the tiny
    contingency table ever leaves the scan."""
    l = load_table(spark, sf_dir, "lineitem")
    obs = l.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    ).agg(F.count(F.lit(1)).alias("o"))
    tot = F.broadcast(obs.agg(F.sum("o").alias("n")))
    wr = Window.partitionBy("rf")
    wc = Window.partitionBy("ls")
    m = (
        obs.crossJoin(tot)
        .withColumn("row_tot", F.sum("o").over(wr))
        .withColumn("col_tot", F.sum("o").over(wc))
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n").cast("double")
    term = (F.col("o") - exp) * (F.col("o") - exp) / exp
    return m.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum(term.cast("decimal(38,18)")).cast("double"), 6
        ).alias("chi2"),
    )


_SQL_INT8_NORM = (
    "CASE WHEN list_dot_product(vd, vd) = 0 THEN list_transform(vd, x -> 0.0) "
    "ELSE list_transform(vd, x -> x / sqrt(list_dot_product(vd, vd))) END"
)
_SQL_INT8_SCALE = (
    "CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0 "
    "ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END"
)
_SQL_INT8_QV = (
    "list_transform(v, x -> greatest(-127.0, least(127.0, floor(x / s + 0.5)))::BIGINT)"
)


@query(
    "int8_topk_recall",
    oracle=f"""
    WITH nq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS vd
                FROM embeddings WHERE vec_id <= 4),
    nc AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
    pq0 AS (SELECT query_id, {_SQL_INT8_NORM} AS v FROM nq),
    pq1 AS (SELECT query_id, v, {_SQL_INT8_SCALE} AS s FROM pq0),
    pq AS (SELECT query_id, s AS sq, {_SQL_INT8_QV} AS qq FROM pq1),
    pc0 AS (SELECT vec_id, {_SQL_INT8_NORM} AS v FROM nc),
    pc1 AS (SELECT vec_id, v, {_SQL_INT8_SCALE} AS s FROM pc0),
    pc AS (SELECT vec_id, s AS sc, {_SQL_INT8_QV} AS qc FROM pc1),
    scored AS (SELECT query_id, vec_id,
                      list_dot_product(qq, qc) * sq * sc AS q_cos
               FROM pq CROSS JOIN pc WHERE vec_id != query_id),
    ap AS (SELECT query_id, vec_id FROM scored
           QUALIFY row_number() OVER (PARTITION BY query_id
                                      ORDER BY q_cos DESC, vec_id) <= 5),
    ex AS ({ORACLES['cosine_topk']}),{_SQL_RECALL_TAIL}
    """,
)
def int8_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-retrieval audit: recall@5 of int8 inner-product top-k
    (similarity.int8_topk — 4× smaller vectors, exact bigint hot loop)
    against the float cosine baseline, per query. The evaluation that
    licenses scanning a quantized corpus at 100 TB and re-ranking only
    the survivors in float."""
    e = parallelize_small(load_table(spark, sf_dir, "embeddings"))
    qs = e.filter(F.col("vec_id") <= 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ap = sim.int8_topk(e, qs, k=5).select("query_id", "vec_id")
    ex = QUERIES["cosine_topk"](spark, sf_dir).select("query_id", "vec_id")
    return _recall_vs_exact(ex, ap)




def _kmv_oracle() -> str:
    from covid_custom_sql_engine_spark.functions.sketches import _sql_h60

    two60 = float(1 << 60)
    est = lambda s: (
        f"(CASE WHEN {s}.n >= 64 THEN (63.0 * {two60!r}) / {s}.hk"
        f" ELSE CAST({s}.n AS DOUBLE) END)"
    )
    return f"""
    WITH base AS (SELECT DISTINCT
                    CASE WHEN o_orderpriority = '1-URGENT' THEN 'a'
                         ELSE 'b' END AS g,
                    o_custkey AS key
                  FROM orders
                  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
    dd AS (SELECT DISTINCT g, {_sql_h60('kmv', 'key')} AS h FROM base),
    r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
          FROM dd),
    ka AS (SELECT h FROM r WHERE g = 'a' AND rn <= 64),
    kb AS (SELECT h FROM r WHERE g = 'b' AND rn <= 64),
    ru AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
           FROM (SELECT DISTINCT h FROM
                 (SELECT h FROM ka UNION ALL SELECT h FROM kb))),
    ku AS (SELECT h FROM ru WHERE rn <= 64),
    sa AS (SELECT count(*) AS n, max(h) AS hk FROM ka),
    sb AS (SELECT count(*) AS n, max(h) AS hk FROM kb),
    su AS (SELECT count(*) AS n, max(h) AS hk FROM ku),
    mm AS (SELECT count(*) AS m FROM ku
           JOIN ka ON ka.h = ku.h JOIN kb ON kb.h = ku.h),
    ex AS (SELECT CAST(count(DISTINCT key) AS BIGINT) AS exact_union,
                  CAST(count(DISTINCT CASE WHEN g = 'a' THEN key END)
                       AS BIGINT) AS exact_a,
                  CAST(count(DISTINCT CASE WHEN g = 'b' THEN key END)
                       AS BIGINT) AS exact_b
           FROM base),
    xi AS (SELECT CAST(count(*) AS BIGINT) AS exact_intersect FROM
           (SELECT key FROM base GROUP BY key
            HAVING count(DISTINCT g) = 2))
    SELECT CAST(64 AS BIGINT) AS k,
           round({est('sa')}, 6) AS est_a,
           round({est('sb')}, 6) AS est_b,
           round({est('su')}, 6) AS est_union,
           round((CAST(mm.m AS DOUBLE) / su.n) * {est('su')}, 6)
             AS est_intersect,
           ex.exact_a, ex.exact_b, ex.exact_union, xi.exact_intersect
    FROM sa, sb, su, mm, ex, xi
    """


@query("kmv_setops_orders", oracle=_kmv_oracle())
def kmv_setops_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch SET OPERATIONS
    (sketches.kmv_minima, k=64): estimate the distinct-customer
    cardinalities of the URGENT and HIGH order-priority classes, their
    UNION, and — the operation HLL cannot compose — their
    INTERSECTION, via the merged sketch's Jaccard fraction
    (|A∩B| ≈ ρ·|A∪B|, Bar-Yossef et al. 2002). The sketch is a pure
    function of the key set (shared md5 hash), so estimates are
    bit-identical cross-engine; the oracle replays the identical
    minima selection and estimator arithmetic, and exact counts ride
    along as audit columns (the minhash_accuracy convention). Scale
    shape: one distinct + salted two-level top-k per group (no
    whole-group window, no hot key), then all arithmetic runs on two
    ≤64-element arrays in a 1-row frame."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    base = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", "a")
        .otherwise("b")
        .alias("g"),
        F.col("o_custkey").alias("key"),
    )
    base = base.localCheckpoint(eager=False)  # sketch + exact audits
    k = 64
    sk = sks.kmv_minima(base, "g", "key", k=k)
    a = sk.filter(F.col("g") == "a").select(F.col("hs").alias("hs_a"))
    b = sk.filter(F.col("g") == "b").select(F.col("hs").alias("hs_b"))
    one = a.crossJoin(b).select(
        "hs_a",
        "hs_b",
        F.slice(
            F.array_sort(F.array_distinct(F.concat("hs_a", "hs_b"))), 1, k
        ).alias("hs_u"),
    )
    est_a = sks.kmv_estimate_expr("hs_a", k)
    est_b = sks.kmv_estimate_expr("hs_b", k)
    est_u = sks.kmv_estimate_expr("hs_u", k)
    m = F.size(F.array_intersect(F.array_intersect("hs_u", "hs_a"), "hs_b"))
    ests = one.select(
        F.lit(64).cast("bigint").alias("k"),
        F.round(est_a, 6).alias("est_a"),
        F.round(est_b, 6).alias("est_b"),
        F.round(est_u, 6).alias("est_union"),
        F.round(
            (m.cast("double") / F.size("hs_u")) * est_u, 6
        ).alias("est_intersect"),
    )
    ex = base.agg(
        F.countDistinct(F.when(F.col("g") == "a", F.col("key")))
        .cast("bigint")
        .alias("exact_a"),
        F.countDistinct(F.when(F.col("g") == "b", F.col("key")))
        .cast("bigint")
        .alias("exact_b"),
        F.countDistinct("key").cast("bigint").alias("exact_union"),
    )
    xi = (
        base.groupBy("key")
        .agg(F.countDistinct("g").alias("_ng"))
        .filter(F.col("_ng") == 2)
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersect"))
    )
    return ests.crossJoin(F.broadcast(ex)).crossJoin(F.broadcast(xi))


@query(
    "item_cf_topk",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ci AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1),
    pairs AS (SELECT a.l_partkey AS part, b.l_partkey AS neighbor,
                     count(*) AS support
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey <> b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2),
    sim AS (SELECT p.part, p.neighbor, p.support,
                   CAST(p.support AS DOUBLE)
                   / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS cos
            FROM pairs p
            JOIN ci na ON na.l_partkey = p.part
            JOIN ci nb ON nb.l_partkey = p.neighbor
            WHERE p.part < 100),
    r AS (SELECT part, neighbor, support, cos,
                 row_number() OVER (PARTITION BY part
                     ORDER BY cos DESC, neighbor) AS rn
          FROM sim)
    SELECT part, neighbor, CAST(support AS BIGINT) AS support,
           round(cos, 6) AS cosine, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= 3
    """,
)
def item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for each low-keyed part, its
    top-3 co-purchase neighbors by COSINE similarity
    c_ij / √(c_i·c_j) — the normalized sibling of
    frequent_part_pairs' raw support (support favors popular items;
    cosine surfaces genuinely CORRELATED ones — the classic
    Amazon-style item-to-item recommender primitive, and the
    association screen a training-data pipeline runs over co-citation
    or co-click graphs). Pair generation is the per-basket C(items,2)
    self equi-join on the order key (bounded by basket size, never
    corpus size); marginals join back on the part key; ranking is a
    per-part window (partitioned — never global) with the neighbor id
    as a total-order tiebreak. Integer counts → one sqrt + one divide
    per pair, bit-identical cross-engine."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    li = li.localCheckpoint(eager=False)  # pairs + marginals read it
    ci = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("neighbor")
    )
    pairs = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("part") != F.col("neighbor")))
        .groupBy("part", "neighbor")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter((F.col("support") >= 2) & (F.col("part") < 100))
    )
    na = ci.select(F.col("pk").alias("part"), F.col("n").alias("_na"))
    nb = ci.select(F.col("pk").alias("neighbor"), F.col("n").alias("_nb"))
    sim_df = (
        pairs.join(na, "part")
        .join(nb, "neighbor")
        .select(
            "part",
            "neighbor",
            "support",
            (
                F.col("support").cast("double")
                / F.sqrt((F.col("_na") * F.col("_nb")).cast("double"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("part").orderBy(F.desc("cos"), "neighbor")
    return (
        sim_df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "part",
            "neighbor",
            F.col("support").cast("bigint").alias("support"),
            F.round("cos", 6).alias("cosine"),
            F.col("rn").cast("bigint").alias("rn"),
        )
    )
