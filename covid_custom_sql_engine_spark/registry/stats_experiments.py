"""Survival / inference / relevance statistics: Kaplan-Meier, Adamic-Adar
link prediction, modularity scoring, BH-FDR control, DFT periodicity,
mutual information, log-rank tests, personalized PageRank, conformal
intervals, information-gain splits.

Split from registry/analytics.py in round 12; bodies unchanged.
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
from covid_custom_sql_engine_spark.registry._base import _sql_dsum, query  # noqa: F401,E501
from covid_custom_sql_engine_spark.registry.text_dedup import _SQL_NORM, _SQL_SW_EN, _SQL_TOKS, _sql_minhash_cte  # noqa: F401,E501
from covid_custom_sql_engine_spark.registry.sql_wide import _MINHASH_RECURSIVE_CTE  # noqa: F401,E501
from covid_custom_sql_engine_spark.registry.attribution_drift import _AB_ZEXPR  # noqa: F401,E501


# quality, multiple-testing control, periodicity, and feature relevance
# ---------------------------------------------------------------------------


@query(
    "kaplan_meier_fulfillment",
    oracle=f"""
    WITH per_o AS (
      SELECT datediff('day', o.o_orderdate, max(l.l_shipdate)) AS t,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
      HAVING datediff('day', o.o_orderdate, max(l.l_shipdate)) >= 0),
    g AS (SELECT t, sum(ev) AS d, count(*) AS a FROM per_o GROUP BY t),
    tot AS (SELECT sum(a) AS n FROM g),
    c AS (SELECT t, d, a,
                 tot.n - (sum(a) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - a)
                 AS nrisk
          FROM g, tot),
    s AS (SELECT t, d, a, nrisk,
                 sum(CAST(ln(greatest(
                         1.0 - CAST(d AS DOUBLE) / CAST(nrisk AS DOUBLE),
                         1e-300)) AS DECIMAL(38,6)))
                   OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS ls
          FROM c)
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(nrisk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           CAST(a - d AS BIGINT) AS c_censored,
           round(exp(CAST(ls AS DOUBLE)), 6) AS survival
    FROM s
    """,
)
def kaplan_meier_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve (selection.kaplan_meier) of order
    fulfillment time: per order, duration = days from o_orderdate to
    its LAST lineitem shipment; status 'F' (fulfilled) is the event,
    'O'/'P' orders are right-censored at their last observed shipment
    — the censoring-aware "how long until an order completes" curve
    where a naive average of completed orders is biased optimistic
    (slow orders are exactly the still-open ones). Scale shape: one
    fact⋈fact join collapses to a per-order frame, then to one row
    per distinct duration (calendar-bounded); both cumulative passes
    (at-risk counts, log-survival) run the pinned two-phase
    prefix-sum — no single-partition window. Determinism: exact
    integer d/n, fixed-point log-sum, round(exp, 6) on both sides."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", "o_orderdate", "o_orderstatus")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").isNotNull())
        .select("l_orderkey", "l_shipdate")
    )
    per_o = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(F.max("l_shipdate").alias("_last"))
        .select(
            F.datediff("_last", "o_orderdate").alias("t"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
        )
    )
    return sel.kaplan_meier(per_o, "t", "ev")


@query(
    "adamic_adar_links",
    oracle=f"""
    WITH seeds AS (SELECT c_custkey FROM customer
                   ORDER BY c_acctbal DESC, c_custkey LIMIT 20),
    e AS (SELECT DISTINCT o_custkey AS u, l_suppkey AS w
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL),
    deg AS (SELECT w, count(*) AS dw FROM e GROUP BY 1),
    se AS (SELECT s.c_custkey AS seed, e.w
           FROM e JOIN seeds s ON e.u = s.c_custkey),
    sc AS (SELECT se.seed, e.u AS cand,
                  {_sql_dsum('1.0 / ln(CAST(deg.dw AS DOUBLE))')} AS score
           FROM se JOIN deg ON deg.w = se.w AND deg.dw >= 2
                   JOIN e ON e.w = se.w
           WHERE e.u <> se.seed
           GROUP BY 1, 2),
    r AS (SELECT seed, cand, score,
                 row_number() OVER (PARTITION BY seed
                                    ORDER BY score DESC, cand) AS rank
          FROM sc)
    SELECT CAST(seed AS BIGINT) AS seed,
           CAST(cand AS BIGINT) AS candidate,
           round(score, 6) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 5
    """,
)
def adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Adamic–Adar link prediction (graph.adamic_adar) on the
    customer→supplier bipartite trading graph: for the 20 largest
    accounts (by acctbal, deterministic id tie-break), rank the other
    customers sharing suppliers by Σ 1/ln(deg(supplier)) — common
    counterparties, hubs logarithmically down-weighted; top-5 each.
    The "find accounts that trade like these" screen. Scale posture:
    seeding IS the design — all-pairs AA explodes through hub
    neighbors (Σ deg²), so the API fans out only through the seeds'
    neighborhoods, linear in touched edges; the seed frame itself is
    a 20-row broadcast from a TakeOrdered top-k, never a global sort.
    Fixed-point score fold makes ties exact → (score DESC, candidate
    ASC) ranking is total and cross-engine deterministic."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey")
    )
    aa = gr.adamic_adar(edges, seeds, k=5)
    return aa.select(
        F.col("seed").cast("bigint").alias("seed"),
        F.col("candidate").cast("bigint").alias("candidate"),
        "score",
        "rank",
    )


@query(
    "modularity_nations",
    oracle=f"""
    WITH sp AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
                FROM lineitem
                WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
    ed AS (SELECT DISTINCT a.sk AS s, b.sk AS d
           FROM sp a JOIN sp b ON a.pk = b.pk AND a.sk < b.sk),
    j AS (SELECT ca.s_nationkey AS ca, cb.s_nationkey AS cb
          FROM ed JOIN supplier ca ON ca.s_suppkey = ed.s
                  JOIN supplier cb ON cb.s_suppkey = ed.d),
    m AS (SELECT count(*) AS m FROM j),
    w AS (SELECT ca AS cc, count(*) AS ec FROM j WHERE ca = cb GROUP BY 1),
    dg AS (SELECT cc, count(*) AS dc
           FROM (SELECT ca AS cc FROM j UNION ALL SELECT cb FROM j)
           GROUP BY 1),
    t AS (SELECT dg.cc, coalesce(w.ec, 0) AS ec, dg.dc, m.m
          FROM dg LEFT JOIN w USING (cc), m),
    terms AS (SELECT CAST(ec AS DOUBLE) / CAST(m AS DOUBLE)
                     - (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
                     * (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
                     AS trm, m
              FROM t)
    SELECT round({_sql_dsum('trm')}, 6) AS modularity,
           CAST(first(m) AS BIGINT) AS m_edges,
           CAST(count(*) AS BIGINT) AS n_communities
    FROM terms
    """,
)
def modularity_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity (graph.modularity) of the partition-by-nation
    of the supplier co-sourcing graph (suppliers adjacent iff they
    supply a common part, deduplicated undirected edges): Q = Σ_c
    [e_c/m − (deg_c/2m)²] — the "is this clustering better than
    chance?" score, here grading a schema attribute as a community
    structure (near 0 = nations don't cluster sourcing, the expected
    null on synthetic data; the same function grades
    label_propagation output on one comparable scale). Scale shape:
    edge generation fans through parts with bounded per-part supplier
    count (TPC-H: ~4) — never all-pairs over suppliers; the community
    map is a dim projection joined on both endpoints; m/e_c/deg_c are
    combinable aggregates and Q folds fixed-point over ≤25 rows."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    sp = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull())
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    a = sp.select(F.col("pk"), F.col("sk").alias("s"))
    b = sp.select(F.col("pk"), F.col("sk").alias("d"))
    edges = (
        a.join(b, "pk")
        .filter(F.col("s") < F.col("d"))
        .select("s", "d")
        .distinct()
    )
    cm = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node"),
        F.col("s_nationkey").alias("community"),
    )
    return gr.modularity(
        edges, F.broadcast(cm), src_col="s", dst_col="d"
    )


def _sql_pnorm2(z: str) -> str:
    """Two-sided normal p-value 2·(1−Φ(|z|)) via the Abramowitz–Stegun
    26.2.17 polynomial tail approximation (|error| < 7.5e-8) — pure
    +,·,exp arithmetic, so the TEXT is shared verbatim between the
    Spark expression and the DuckDB oracle and evaluates bit-identically
    (the engine convention for statistics with no closed-form SQL)."""
    az = f"abs({z})"
    t = f"(1.0 / (1.0 + 0.2316419 * {az}))"
    pdf = f"(0.3989422804014327 * exp(-({az} * {az}) / 2.0))"
    poly = (
        f"((((((1.330274429 * {t}) - 1.821255978) * {t} + 1.781477937)"
        f" * {t} - 0.356563782) * {t} + 0.319381530) * {t})"
    )
    return f"(2.0 * {pdf} * {poly})"


# z is pre-rounded to 6dp (cross-engine identical), so the p-value
# arithmetic runs on identical inputs on both engines.
_BH_P = _sql_pnorm2("z6")


@query(
    "bh_fdr_segments",
    oracle=f"""
    WITH j AS (SELECT c.c_mktsegment AS seg,
                      CAST(o.o_orderkey % 2 AS BIGINT) AS arm,
                      CASE WHEN o.o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END AS conv
               FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    a AS (SELECT seg,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x1,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                 CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x2
          FROM j GROUP BY seg),
    zt AS (SELECT seg, round({_AB_ZEXPR}, 6) AS z6 FROM a),
    pt AS (SELECT seg, z6, round({_BH_P}, 8) AS p FROM zt),
    rk AS (SELECT seg, z6, p,
                  row_number() OVER (ORDER BY p, seg) AS rnk,
                  count(*) OVER () AS m
           FROM pt),
    km AS (SELECT max(CASE WHEN p <= 0.05 * rnk / m THEN rnk ELSE 0 END)
                  AS kmax
           FROM rk)
    SELECT seg AS segment, z6 AS z_stat, p AS p_value,
           CAST(rnk AS BIGINT) AS p_rank,
           rnk <= km.kmax AS rejected
    FROM rk, km
    """,
)
def bh_fdr_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over a FAMILY of hypothesis
    tests — the missing closure of the experimentation stack
    (ab_ztest decides ONE test; a per-segment readout runs five, and
    at α=.05 per test the family-wise false-positive rate is ~23%):
    per market segment, the pooled two-proportion z-test of urgent-
    order rate between the id-parity arms, p-values via the shared-
    text Abramowitz–Stegun normal tail, then the BH step-up — sort
    p ascending, find the largest k with p_(k) ≤ k·α/m, reject ranks
    ≤ k. On an A/A split every segment should survive (no rejections)
    — the standard "does the pipeline manufacture lift under multiple
    looks?" audit. Scale shape: ONE fact⋈dim join + per-segment
    conditional aggregate collapses everything; the BH windows run
    over the m=5 segment rows (schema-bounded, like nation).
    Determinism: z from exact integer counts rounded 6dp, p is pure
    shared-text arithmetic on that rounded z, ranking ties broken by
    segment name."""
    j = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .join(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_orderkey") % 2).cast("bigint").alias("arm"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("conv"),
        )
    )
    a = j.groupBy("seg").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x2"),
    )
    pt = a.select(
        "seg", F.round(F.expr(_AB_ZEXPR), 6).alias("z6")
    ).select("seg", "z6", F.round(F.expr(_BH_P), 8).alias("p"))
    # BH step-up over the m-row segment frame (m schema-bounded at 5)
    rk = pt.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.asc("p"), F.asc("seg")))
        .alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .alias("m"),
    )
    rk = rk.localCheckpoint(eager=False)  # rows + kmax read one eval
    km = rk.agg(
        F.max(
            F.when(
                F.col("p") <= 0.05 * F.col("rnk") / F.col("m"), F.col("rnk")
            ).otherwise(0)
        ).alias("kmax")
    )
    return rk.crossJoin(F.broadcast(km)).select(
        F.col("seg").alias("segment"),
        F.col("z6").alias("z_stat"),
        F.col("p").alias("p_value"),
        F.col("rnk").cast("bigint").alias("p_rank"),
        (F.col("rnk") <= F.col("kmax")).alias("rejected"),
    )


@query(
    "dominant_period_dft",
    oracle=f"""
    WITH d AS (SELECT o_orderdate AS t, count(*) AS y FROM orders
               WHERE o_orderdate IS NOT NULL GROUP BY 1),
    m0 AS (SELECT min(t) AS t0 FROM d),
    dx AS (SELECT CAST(datediff('day', m0.t0, d.t) AS DOUBLE) AS x, d.y
           FROM d, m0),
    st AS (SELECT CAST(sum(y) AS DOUBLE) / count(*) AS ybar FROM dx),
    pr AS (SELECT CAST(p AS DOUBLE) AS p FROM generate_series(2, 30) t(p)),
    terms AS (SELECT pr.p,
                     (dx.y - st.ybar) * cos(2.0 * pi() * dx.x / pr.p) AS tc,
                     (dx.y - st.ybar) * sin(2.0 * pi() * dx.x / pr.p) AS ts
              FROM dx CROSS JOIN pr CROSS JOIN st),
    pw AS (SELECT p, {_sql_dsum('tc')} * {_sql_dsum('tc')}
                     + {_sql_dsum('ts')} * {_sql_dsum('ts')} AS power
           FROM terms GROUP BY p),
    r AS (SELECT p, power,
                 row_number() OVER (ORDER BY power DESC, p) AS rank
          FROM pw)
    SELECT CAST(p AS BIGINT) AS period_days,
           round(power, 4) AS power,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def dominant_period_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodicity detection: a Fourier periodogram scan of the daily
    order-count series over candidate periods 2..30 days — power(p) =
    (Σ ŷ·cos 2πx/p)² + (Σ ŷ·sin 2πx/p)² on the mean-centered series,
    top-3 periods reported (the seasonality screen behind
    seasonal_baseline: it DETECTS the cycle length that query assumes;
    flat synthetic data should show no dominant spike, which is itself
    the honest null). Scale shape: the fact table collapses to the
    calendar-bounded daily frame FIRST; the 29-row period spine
    broadcast-crosses the reduced frame (the range_join_bands
    convention), and each period's power is two fixed-point folds —
    map-side combinable, no shuffle wider than the daily frame.
    Determinism: mean/centering from exact integer sums; per-term
    cos/sin are IEEE doubles pre-rounded by the fixed-point fold; the
    top-3 ranking breaks ties by period."""
    d = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.col("o_orderdate").alias("t"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    t0 = d.agg(F.min("t").alias("t0"))
    dx = d.crossJoin(F.broadcast(t0)).select(
        F.datediff("t", "t0").cast("double").alias("x"), "y"
    )
    dx = dx.localCheckpoint(eager=False)  # stats + terms read one eval
    st = dx.agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("ybar")
    )
    pr = spark.range(2, 31).select(F.col("id").cast("double").alias("p"))
    ang = 2.0 * F.lit(math.pi) * F.col("x") / F.col("p")
    terms = (
        dx.crossJoin(F.broadcast(pr))
        .crossJoin(F.broadcast(st))
        .select(
            "p",
            ((F.col("y") - F.col("ybar")) * F.cos(ang)).alias("tc"),
            ((F.col("y") - F.col("ybar")) * F.sin(ang)).alias("ts"),
        )
    )
    pw = terms.groupBy("p").agg(
        (
            ops.dsum(F.col("tc")) * ops.dsum(F.col("tc"))
            + ops.dsum(F.col("ts")) * ops.dsum(F.col("ts"))
        ).alias("power")
    )
    r = pw.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("power"), F.asc("p")))
        .alias("rank"),
    ).filter(F.col("rank") <= 3)
    return r.select(
        F.col("p").cast("bigint").alias("period_days"),
        F.round("power", 4).alias("power"),
        F.col("rank").cast("bigint").alias("rank"),
    )


@query(
    "mutual_info_docs",
    oracle=f"""
    WITH o AS (SELECT lang AS x, source AS y, count(*) AS n
               FROM documents
               WHERE lang IS NOT NULL AND source IS NOT NULL
               GROUP BY 1, 2),
    rx AS (SELECT x, sum(n) AS nx FROM o GROUP BY 1),
    ry AS (SELECT y, sum(n) AS ny FROM o GROUP BY 1),
    nn AS (SELECT sum(n) AS nn FROM o),
    mi AS (SELECT {_sql_dsum('''(CAST(o.n AS DOUBLE) / nn.nn)
                     * ln(CAST(o.n AS DOUBLE) * nn.nn
                          / (CAST(rx.nx AS DOUBLE) * ry.ny))''')} AS mi
           FROM o JOIN rx USING (x) JOIN ry USING (y), nn),
    hx AS (SELECT {_sql_dsum('''-(CAST(nx AS DOUBLE) / nn.nn)
                     * ln(CAST(nx AS DOUBLE) / nn.nn)''')} AS hx
           FROM rx, nn),
    hy AS (SELECT {_sql_dsum('''-(CAST(ny AS DOUBLE) / nn.nn)
                     * ln(CAST(ny AS DOUBLE) / nn.nn)''')} AS hy
           FROM ry, nn)
    SELECT round(mi.mi, 6) AS mi_nats,
           round(hx.hx, 6) AS h_lang,
           round(hy.hy, 6) AS h_source,
           CASE WHEN hx.hx * hy.hy > 0
                THEN round(mi.mi / sqrt(hx.hx * hy.hy), 6) END AS nmi
    FROM mi, hx, hy
    """,
)
def mutual_info_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) over the documents table —
    Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) in nats, with the marginal
    entropies and the normalized MI (I/√(H_x·H_y)) — the feature-
    relevance / redundancy screen between two categorical columns
    that chi2_drift tests for DEPENDENCE but doesn't QUANTIFY in
    information units (near 0 = knowing the source tells you nothing
    about language; near 1 = duplicated columns — both are curation
    signals for stratification design). Scale shape: ONE (x,y) hash
    aggregate collapses the corpus; margins and all three information
    folds run on the ≤|langs|×|sources| reduced grid with the total
    broadcast back — the chi2_statistic discipline. Per-cell terms
    are IEEE ln/division on exact integer counts; folds are
    fixed-point — cross-engine bit-identical before the final round."""
    o = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull() & F.col("source").isNotNull())
        .groupBy(F.col("lang").alias("x"), F.col("source").alias("y"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    o = o.localCheckpoint(eager=False)  # margins + joint read one eval
    rx = o.groupBy("x").agg(F.sum("n").alias("nx"))
    ry = o.groupBy("y").agg(F.sum("n").alias("ny"))
    nn = o.agg(F.sum("n").alias("nn"))
    joint = (
        o.join(rx, "x")
        .join(F.broadcast(ry), "y")
        .crossJoin(F.broadcast(nn))
    )
    mi_term = (F.col("n").cast("double") / F.col("nn")) * F.log(
        F.col("n").cast("double")
        * F.col("nn")
        / (F.col("nx").cast("double") * F.col("ny"))
    )
    mi = joint.agg(ops.dsum(mi_term).alias("mi"))
    hx_term = -(F.col("nx").cast("double") / F.col("nn")) * F.log(
        F.col("nx").cast("double") / F.col("nn")
    )
    hx = rx.crossJoin(F.broadcast(nn)).agg(ops.dsum(hx_term).alias("hx"))
    hy_term = -(F.col("ny").cast("double") / F.col("nn")) * F.log(
        F.col("ny").cast("double") / F.col("nn")
    )
    hy = ry.crossJoin(F.broadcast(nn)).agg(ops.dsum(hy_term).alias("hy"))
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.round("mi", 6).alias("mi_nats"),
            F.round("hx", 6).alias("h_lang"),
            F.round("hy", 6).alias("h_source"),
            F.when(
                F.col("hx") * F.col("hy") > 0,
                F.round(F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6),
            ).alias("nmi"),
        )
    )


# shared log-rank term text: d = d1+d2, n = r1+r2 at each event time
_LR_D = "CAST(d1 + d2 AS DOUBLE)"
_LR_N = "CAST(r1 + r2 AS DOUBLE)"
_LR_R1 = "CAST(r1 AS DOUBLE)"
_LR_R2 = "CAST(r2 AS DOUBLE)"
_LR_OME = f"(CAST(d1 AS DOUBLE) - {_LR_D} * {_LR_R1} / {_LR_N})"
_LR_VAR = (
    f"(CASE WHEN r1 + r2 > 1 THEN {_LR_D} * ({_LR_R1} / {_LR_N})"
    f" * ({_LR_R2} / {_LR_N}) * ({_LR_N} - {_LR_D}) / ({_LR_N} - 1.0)"
    f" ELSE 0.0 END)"
)
_LR_CHI2 = "(CASE WHEN v > 0 THEN round(o * o / v, 6) END)"


@query(
    "logrank_priority",
    oracle=f"""
    WITH per_o AS (
      SELECT datediff('day', o.o_orderdate, max(l.l_shipdate)) AS t,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS ga
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus,
               o.o_orderpriority
      HAVING datediff('day', o.o_orderdate, max(l.l_shipdate)) >= 0),
    g AS (SELECT t, sum(ev * ga) AS d1, sum(ev * (1 - ga)) AS d2,
                 sum(ga) AS a1, sum(1 - ga) AS a2
          FROM per_o GROUP BY t),
    tot AS (SELECT sum(a1) AS n1t, sum(a2) AS n2t FROM g),
    c AS (SELECT d1, d2,
                 tot.n1t - (sum(a1) OVER w - a1) AS r1,
                 tot.n2t - (sum(a2) OVER w - a2) AS r2
          FROM g, tot WINDOW w AS (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    s AS (SELECT {_sql_dsum(_LR_OME)} AS o, {_sql_dsum(_LR_VAR)} AS v
          FROM c)
    SELECT CAST(tot.n1t AS BIGINT) AS n_a,
           CAST(tot.n2t AS BIGINT) AS n_b,
           {_LR_CHI2} AS chi2_logrank,
           {_LR_CHI2} > 3.841459 AS significant
    FROM s, tot
    """,
)
def logrank_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test (selection.logrank_test) between the
    fulfillment survival curves of high-priority ('1-URGENT'/'2-HIGH')
    and other orders — the hypothesis-test companion of
    kaplan_meier_fulfillment: do rush orders actually complete faster,
    counting censored (still-open) orders correctly, where a t-test on
    completed durations drops exactly the slow open ones? On synthetic
    data with priority assigned independently of dates the verdict
    should be NOT significant — the A/A-test discipline of
    ab_ztest_conversion applied to durations. Scale shape: the same
    per-order collapse as the KM curve, both groups' at-risk counts on
    ONE pinned two-phase prefix-sum pass, fixed-point folds of the
    observed-minus-expected and variance terms over the
    calendar-bounded frame."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").isNotNull())
        .select("l_orderkey", "l_shipdate")
    )
    per_o = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority")
        .agg(F.max("l_shipdate").alias("_last"))
        .select(
            F.datediff("_last", "o_orderdate").alias("t"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hi"
            )
            .otherwise("lo")
            .alias("grp"),
        )
    )
    return sel.logrank_test(per_o, "t", "ev", "grp", "hi", "lo")


def _ppr_oracle(iterations: int = 3) -> str:
    """Statically-unrolled personalized-PageRank oracle matching
    functions/graph.personalized_pagerank: identical IEEE expression
    tree ((1.0 - 0.85) evaluated in DOUBLE on both engines), identical
    DECIMAL(38,18) contribution folding, seed-restart teleport."""
    base = """
    WITH pairs AS (
        SELECT DISTINCT 'c:' || o.o_custkey AS c, 's:' || l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
    ew AS (SELECT e.src, e.dst, 1.0::DOUBLE / d.out_deg AS w
           FROM edges e JOIN deg d USING (src)),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    seeds AS (SELECT 'c:' || c_custkey AS node FROM customer
              ORDER BY c_acctbal DESC, c_custkey LIMIT 5),
    ns AS (SELECT count(*) AS _ns FROM seeds),
    sd AS (SELECT nodes.node,
                  CASE WHEN seeds.node IS NOT NULL
                       THEN 1.0::DOUBLE / ns._ns ELSE 0.0 END AS s
           FROM nodes LEFT JOIN seeds USING (node), ns),
    r0 AS (SELECT node, s AS pr FROM sd)"""
    for i in range(1, iterations + 1):
        base += f""",
    r{i} AS (
        SELECT sd.node,
               (1.0::DOUBLE - 0.85::DOUBLE) * sd.s
               + 0.85::DOUBLE * coalesce(ag{i}.c, 0.0) AS pr
        FROM sd LEFT JOIN (
            SELECT ew.dst AS node,
                   CAST(sum(CAST(r{i-1}.pr * ew.w AS DECIMAL(38,18)))
                        AS DOUBLE) AS c
            FROM r{i-1} JOIN ew ON r{i-1}.node = ew.src
            GROUP BY ew.dst) ag{i} USING (node)
    )"""
    # round(10): same double→DECIMAL(38,18) half-way-rounding rationale
    # as the global-PageRank oracle.
    return base + f"\n    SELECT node, round(pr, 10) AS pr FROM r{iterations}"


@query("ppr_trusted_sources", oracle=_ppr_oracle(3))
def ppr_trusted_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (graph.personalized_pagerank, 3 unrolled
    rounds, d = 0.85) over the customer↔supplier trading graph with
    the teleport restarting at the 5 largest accounts — random walks
    with restart rank every node by proximity to the TRUSTED set
    (TrustRank), where global pagerank_bipartite ranks by popularity
    alone; the "expand this whitelist of curated sources" primitive
    of corpus curation. Same per-round shape as PageRank (ONE rank⋈
    edge join + ONE combinable DECIMAL(38,18) fold + the damping
    projection against the broadcast seed distribution); seeds are a
    5-row TakeOrdered broadcast. The oracle replays the identical
    unrolled iterations (the pagerank/label_propagation convention)."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        # distinct on the INTEGER key pair; the typed 'c:'/'s:' ids are
        # then packed into ONE order-preserving bigint (optimization
        # r13, guide §2.3 — graph.encode_typed_key): every per-round
        # exchange of the iterative algorithm shuffles/hashes 8-byte
        # longs instead of strings, and the decorated string is rebuilt
        # once in the final projection (decode_typed_node) — same
        # min/tie-break winners by the codec's order proof
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            gr.encode_typed_key(F.col("o_custkey"), 0).alias("c"),
            gr.encode_typed_key(F.col("l_suppkey"), 1).alias("s"),
        )
    )
    # EAGER pin (optimization r12): both union orientations below (and
    # every per-round pin a graph function takes internally) read ONE
    # evaluation of the orders-x-lineitem distinct. Lazy pinning is not
    # enough here - the union puts both branches in one job, whose
    # concurrent tasks each compute the unmaterialized subtree (the
    # measured double lineitem scan + 'Block rdd already exists' race);
    # the eager pin materializes once, before the consumers plan.
    pairs = pairs.localCheckpoint(eager=True)
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    seeds = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(5)
        .select(gr.encode_typed_key(F.col("c_custkey"), 0).alias("node"))
    )
    pr = gr.personalized_pagerank(edges, seeds, iterations=3)
    return pr.select(
        gr.decode_typed_node("node").alias("node"),
        F.round("rank", 10).alias("pr"),
    )


@query(
    "conformal_interval",
    oracle=f"""
    WITH f AS (SELECT o.o_orderkey AS k, CAST(count(*) AS DOUBLE) AS x,
                      o.o_totalprice AS y
               FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
               WHERE o.o_totalprice IS NOT NULL
               GROUP BY o.o_orderkey, o.o_totalprice),
    tr AS (SELECT * FROM f WHERE k % 2 = 0),
    st AS (SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
                  {_sql_dsum('y')} AS sy, {_sql_dsum('x * y')} AS sxy
           FROM tr),
    co AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
                  n, sx, sy
           FROM st),
    co2 AS (SELECT slope, (sy - slope * sx) / n AS icept, n FROM co),
    cal AS (SELECT abs(f.y - (co2.slope * f.x + co2.icept)) AS r
            FROM f, co2 WHERE k % 2 = 1),
    q AS (SELECT round(quantile_cont(r, 0.9), 6) AS q90 FROM cal),
    cv AS (SELECT count(*) AS nc,
                  sum(CASE WHEN cal.r <= q.q90 THEN 1 ELSE 0 END) AS inq
           FROM cal, q)
    SELECT round(co2.slope, 6) AS slope,
           round(co2.icept, 6) AS intercept,
           q.q90 AS q90_resid,
           CAST(co2.n AS BIGINT) AS n_train,
           CAST(cv.nc AS BIGINT) AS n_cal,
           round(CAST(cv.inq AS DOUBLE) / cv.nc, 6) AS cal_coverage
    FROM co2, q, cv
    """,
)
def conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval around a closed-form OLS
    fit: predict order value from its lineitem count, train on the
    even-orderkey half, then calibrate the 90% interval half-width as
    the empirical 90th percentile of |residual| on the held-out odd
    half — the distribution-free calibration step every "model score
    + guarantee" serving pipeline runs after training, with the
    reported cal_coverage (≈0.9 by construction) as its self-check.
    Scale shape: ONE fact⋈fact collapse to the per-order frame (the
    kaplan_meier join), exact-sum OLS (no iteration), the 1-row
    coefficient frame broadcast onto the calibration half, one exact
    percentile and one coverage aggregate. Determinism: x-sums are
    exact integers, y-folds fixed-point, slope/intercept shared
    left-to-right expression order (the theil_sen convention), and
    the coverage comparison uses the ROUNDED quantile on both engines
    so the boundary row can't flip."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select("o_orderkey", "o_totalprice")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    f = (
        o.join(l, o.o_orderkey == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .select(
            F.col("o_orderkey").alias("k"),
            "x",
            F.col("o_totalprice").alias("y"),
        )
    )
    f = f.localCheckpoint(eager=False)  # train + calibration read one eval
    tr = f.filter(F.col("k") % 2 == 0)
    st = tr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        ops.dsum(F.col("y")).alias("sy"),
        ops.dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    co = st.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope"),
        "n",
        "sx",
        "sy",
    )
    co2 = co.select(
        "slope",
        ((F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n")).alias(
            "icept"
        ),
        "n",
    )
    cal = (
        f.filter(F.col("k") % 2 == 1)
        .crossJoin(F.broadcast(co2))
        .select(
            F.abs(
                F.col("y") - (F.col("slope") * F.col("x") + F.col("icept"))
            ).alias("r")
        )
    )
    cal = cal.localCheckpoint(eager=False)  # quantile + coverage read one eval
    q = cal.agg(F.round(F.percentile("r", F.lit(0.9)), 6).alias("q90"))
    cv = cal.crossJoin(F.broadcast(q)).agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum(F.when(F.col("r") <= F.col("q90"), 1).otherwise(0)).alias(
            "inq"
        ),
    )
    return (
        co2.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(cv))
        .select(
            F.round("slope", 6).alias("slope"),
            F.round("icept", 6).alias("intercept"),
            F.col("q90").alias("q90_resid"),
            F.col("n").cast("bigint").alias("n_train"),
            F.col("nc").cast("bigint").alias("n_cal"),
            F.round(F.col("inq").cast("double") / F.col("nc"), 6).alias(
                "cal_coverage"
            ),
        )
    )


def _sql_binent(a: str, b: str) -> str:
    """Binary entropy −p·ln p − q·ln q over two exact counts, with the
    0·ln 0 = 0 convention — shared-text arithmetic (both engines see
    identical expression trees, the _sql_pnorm2 convention)."""
    t = f"CAST({a} + {b} AS DOUBLE)"
    pa = f"(CAST({a} AS DOUBLE) / {t})"
    pb = f"(CAST({b} AS DOUBLE) / {t})"
    return (
        f"(CASE WHEN {a} + {b} = 0 THEN 0.0 ELSE "
        f"(CASE WHEN {a} = 0 THEN 0.0 ELSE -{pa} * ln({pa}) END)"
        f" + (CASE WHEN {b} = 0 THEN 0.0 ELSE -{pb} * ln({pb}) END) END)"
    )


_IG_EXPR = (
    f"({_sql_binent('tp', 'tn')}"
    f" - (CAST(lp + ln_ AS DOUBLE) / CAST(tp + tn AS DOUBLE))"
    f" * {_sql_binent('lp', 'ln_')}"
    f" - (CAST(rp + rn AS DOUBLE) / CAST(tp + tn AS DOUBLE))"
    f" * {_sql_binent('rp', 'rn')})"
)


@query(
    "info_gain_split",
    oracle=f"""
    WITH base AS (SELECT l_discount AS d,
                         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                  FROM lineitem
                  WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL),
    g AS (SELECT d, sum(y) AS pos, count(*) - sum(y) AS neg
          FROM base GROUP BY d),
    tot AS (SELECT sum(pos) AS tp, sum(neg) AS tn FROM g),
    sp AS (SELECT c.d AS c,
                  sum(CASE WHEN g.d <= c.d THEN pos ELSE 0 END) AS lp,
                  sum(CASE WHEN g.d <= c.d THEN neg ELSE 0 END) AS ln_
           FROM (SELECT DISTINCT d FROM g) c CROSS JOIN g
           GROUP BY c.d),
    w AS (SELECT sp.c, sp.lp, sp.ln_,
                 tot.tp - sp.lp AS rp, tot.tn - sp.ln_ AS rn,
                 tot.tp, tot.tn
          FROM sp, tot),
    ig AS (SELECT c, lp, ln_, round({_IG_EXPR}, 9) AS gain FROM w),
    r AS (SELECT c, lp, ln_, gain,
                 row_number() OVER (ORDER BY gain DESC, c) AS rank
          FROM ig)
    SELECT round(c, 2) AS split_at,
           CAST(lp AS BIGINT) AS pos_left,
           CAST(ln_ AS BIGINT) AS neg_left,
           gain AS info_gain,
           CAST(rank AS BIGINT) AS rank
    FROM r
    """,
)
def info_gain_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search by information gain: for every
    candidate threshold c over l_discount, the gain
    H(parent) − Σ weight·H(child) of splitting the binary label
    (returned vs not) at discount ≤ c — the single-feature screen
    behind tree induction AND the feature-audit companion of
    mutual_info_docs for a NUMERIC feature (near-zero best gain =
    the feature doesn't separate the label; the honest null on
    synthetic data). Every candidate row is emitted with its gain and
    rank, so the argmax is auditable, not asserted. Scale shape: ONE
    (value, label) hash aggregate collapses the fact table to the
    ≤|distinct discounts| grid; the candidate×grid cross runs on that
    reduced frame (the theta-join-on-reduced-frame convention);
    entropies are shared-text arithmetic on exact integer counts —
    bit-identical cross-engine, ranking tie-broken by threshold."""
    base = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_discount").isNotNull() & F.col("l_returnflag").isNotNull()
        )
        .select(
            F.col("l_discount").alias("d"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
    )
    g = base.groupBy("d").agg(
        F.sum("y").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
    )
    g = g.localCheckpoint(eager=False)  # totals + candidates + grid
    tot = g.agg(F.sum("pos").alias("tp"), F.sum("neg").alias("tn"))
    cand = g.select(F.col("d").alias("c")).distinct()
    sp = (
        cand.crossJoin(g)
        .groupBy("c")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("c"), F.col("pos")).otherwise(0))
            .alias("lp"),
            F.sum(F.when(F.col("d") <= F.col("c"), F.col("neg")).otherwise(0))
            .alias("ln_"),
        )
    )
    w = sp.crossJoin(F.broadcast(tot)).select(
        "c",
        "lp",
        "ln_",
        (F.col("tp") - F.col("lp")).alias("rp"),
        (F.col("tn") - F.col("ln_")).alias("rn"),
        "tp",
        "tn",
    )
    ig = w.select(
        "c", "lp", "ln_", F.round(F.expr(_IG_EXPR), 9).alias("gain")
    )
    r = ig.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("gain"), F.asc("c")))
        .alias("rank"),
    )
    return r.select(
        F.round("c", 2).alias("split_at"),
        F.col("lp").cast("bigint").alias("pos_left"),
        F.col("ln_").cast("bigint").alias("neg_left"),
        F.col("gain").alias("info_gain"),
        F.col("rank").cast("bigint").alias("rank"),
    )
