"""Attribution and drift/experimentation analytics: Markov removal-effect
and Shapley attribution, bounded SSSP, chi-square / Wasserstein / CUSUM
drift, k-core cohesion, inclusion-dependency and t-closeness audits,
Wilson/z-test A/B readouts, Theil-Sen trend.

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


# --- Markov removal-effect attribution --------------------------------
# Channel states (alphabetical), absorbing CONV (purchase) and NULL
# (session ends unconverted). ONE expression builder feeds BOTH
# engines, so the floating-point evaluation order is identical
# opcode-for-opcode (the mmr_topk unroll convention).
_MKV_CH = ["click", "error", "signup", "view"]
_MKV_SRC = ["START"] + _MKV_CH
_MKV_STEPS = 4


def _mkv_absorb_expr(removed: str | None) -> str:
    """Truncated-absorption expression over the p_{src}_{dst} columns:
    P(reach CONV within _MKV_STEPS transitions from START), with the
    ``removed`` channel's OUTGOING probabilities zeroed (mass entering
    it dies — the classic removal effect, no renormalization)."""
    v = {"START": "1.0"}
    conv = "0.0"
    for step in range(_MKV_STEPS):
        srcs = [
            s
            for s in (_MKV_SRC if step == 0 else _MKV_CH)
            if s != removed and v.get(s, "0.0") != "0.0"
        ]
        conv = (
            "(" + conv + " + "
            + " + ".join(f"({v[s]} * p_{s}_CONV)" for s in srcs)
            + ")"
        )
        v = {
            t: "(" + " + ".join(f"({v[s]} * p_{s}_{t})" for s in srcs) + ")"
            for t in _MKV_CH
        }
    return conv


def _mkv_variant_exprs() -> list[tuple[str, str, str, str]]:
    """(channel, base, removal, effect) expression texts per channel."""
    base = _mkv_absorb_expr(None)
    out = []
    for c in _MKV_CH:
        rm = _mkv_absorb_expr(c)
        eff = (
            f"CASE WHEN ({base}) > 0 "
            f"THEN (({base}) - ({rm})) / ({base}) END"
        )
        out.append((c, base, rm, eff))
    return out


def _mkv_p_sql() -> str:
    cols = []
    for s in _MKV_SRC:
        tot = f"sum(CASE WHEN src = '{s}' THEN 1 ELSE 0 END)"
        for d in _MKV_CH + ["CONV"]:
            n = f"sum(CASE WHEN src = '{s}' AND dst = '{d}' THEN 1 ELSE 0 END)"
            cols.append(
                f"CASE WHEN {tot} > 0 THEN CAST({n} AS DOUBLE) / {tot} "
                f"ELSE 0.0 END AS p_{s}_{d}"
            )
    return ",\n           ".join(cols)


def _markov_oracle() -> str:
    variants = "\n    UNION ALL\n    ".join(
        f"SELECT '{c}' AS channel, round({b}, 6) AS base_p,"
        f" round({r}, 6) AS removal_p, round({e}, 6) AS removal_effect"
        f" FROM pr"
        for c, b, r, e in _mkv_variant_exprs()
    )
    return f"""
    WITH o AS (SELECT event_id, user_id, ts, event_type,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
               FROM events),
    m AS (SELECT *, CASE WHEN pts IS NULL OR ts >= pts + INTERVAL '15 minutes'
                         THEN 1 ELSE 0 END AS new_s FROM o),
    s AS (SELECT event_id, user_id, ts, event_type,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM m),
    r AS (SELECT user_id, session_id, ts, event_id,
                 CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS st,
                 row_number() OVER (PARTITION BY user_id, session_id
                                    ORDER BY ts, event_id) AS rn
          FROM s),
    pz AS (SELECT user_id, session_id,
                  min(CASE WHEN st = 'CONV' THEN rn END) AS prn,
                  max(rn) AS mrn
           FROM r GROUP BY 1, 2),
    k AS (SELECT r.*, pz.prn, pz.mrn FROM r
          JOIN pz ON pz.user_id = r.user_id AND pz.session_id = r.session_id
          WHERE pz.prn IS NULL OR r.rn <= pz.prn),
    t1 AS (SELECT coalesce(lag(st) OVER (PARTITION BY user_id, session_id
                                         ORDER BY rn), 'START') AS src,
                  st AS dst FROM k),
    t2 AS (SELECT st AS src, 'NULL' AS dst FROM k
           WHERE prn IS NULL AND rn = mrn),
    tr AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2),
    pr AS (SELECT {_mkv_p_sql()} FROM tr)
    {variants}
    """


@query("markov_attribution", oracle=_markov_oracle())
def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution — the data-driven alternative
    to last-touch: sessionize (15-minute gaps), map 'purchase' to the
    absorbing CONV state and truncate each journey at its first
    conversion (unconverted sessions absorb into NULL), estimate the
    first-order channel transition matrix, then for every channel
    compare P(convert within 4 transitions from START) with that
    channel's outgoing edges removed — mass that enters a removed
    channel dies, the classic removal effect. The absorption
    polynomial is generated ONCE as expression text and fed verbatim
    to both engines (F.expr here, the same string in the oracle), so
    the float evaluation order is identical opcode-for-opcode — an
    inherently iterative metric with an exact value oracle (the
    mmr_topk convention).

    Scale shape: sessionization + journey truncation ride ONE user_id
    exchange (three window passes over the same sort); the transition
    aggregate collapses the data to a ONE-ROW frame of |states|²
    conditional probabilities, and all 5 absorption variants are pure
    column arithmetic on that single row — whole-stage-codegen'd,
    zero further data motion at any corpus size."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") >= F.lag("ts").over(w) + F.expr("INTERVAL 15 MINUTES")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    s = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type"))
        .alias("st"),
        F.sum(new_s).over(run).alias("session_id"),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    wsz = Window.partitionBy("user_id", "session_id")
    r = s.select(
        "user_id",
        "session_id",
        "st",
        F.row_number().over(ws).alias("rn"),
    ).select(
        "*",
        F.min(F.when(F.col("st") == "CONV", F.col("rn"))).over(wsz).alias("prn"),
        F.max("rn").over(wsz).alias("mrn"),
    )
    k = r.filter(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
    wk = Window.partitionBy("user_id", "session_id").orderBy("rn")
    t1 = k.select(
        F.coalesce(F.lag("st").over(wk), F.lit("START")).alias("src"),
        F.col("st").alias("dst"),
    )
    t2 = k.filter(
        F.col("prn").isNull() & (F.col("rn") == F.col("mrn"))
    ).select(F.col("st").alias("src"), F.lit("NULL").alias("dst"))
    tr = t1.unionAll(t2)
    p_cols = []
    for src in _MKV_SRC:
        tot = F.sum(F.when(F.col("src") == src, 1).otherwise(0))
        for dst in _MKV_CH + ["CONV"]:
            n = F.sum(
                F.when(
                    (F.col("src") == src) & (F.col("dst") == dst), 1
                ).otherwise(0)
            )
            p_cols.append(
                F.when(tot > 0, n.cast("double") / tot)
                .otherwise(F.lit(0.0))
                .alias(f"p_{src}_{dst}")
            )
    # ONE pin: the five absorption variants below each re-reference
    # this 1-row frame, and without the checkpoint every union branch
    # re-runs the whole sessionize→truncate→aggregate pipeline (5× the
    # work and 5× the plan text)
    pr = tr.agg(*p_cols).localCheckpoint(eager=False)
    out = None
    for c, b, rm, eff in _mkv_variant_exprs():
        row = pr.select(
            F.lit(c).alias("channel"),
            F.round(F.expr(b), 6).alias("base_p"),
            F.round(F.expr(rm), 6).alias("removal_p"),
            F.round(F.expr(eff), 6).alias("removal_effect"),
        )
        out = row if out is None else out.unionAll(row)
    return out




def _sssp_oracle(rounds: int = 3) -> str:
    """Unrolled Bellman-Ford rounds over the weighted trading graph —
    each round the same relax-join + min aggregate the engine runs
    (graph.sssp_bounded); all-integer arithmetic, exact comparison."""
    ctes = [
        """WITH pairs AS (
      SELECT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s,
             CAST(min(l_quantity) AS BIGINT) AS w
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    edges AS (SELECT c AS src, s AS dst, w FROM pairs
              UNION ALL SELECT s, c, w FROM pairs),
    d0 AS (SELECT 'c:' || c_custkey AS node, CAST(0 AS BIGINT) AS dist
           FROM customer WHERE c_custkey <= 3)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""d{r} AS (SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{p}
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d{p} d JOIN edges e ON e.src = d.node) GROUP BY node)"""
        )
    return (
        ",\n    ".join(ctes)
        + f"\n    SELECT node, dist FROM d{rounds}"
    )


@query("sssp_bounded_costs", oracle=_sssp_oracle(3))
def sssp_bounded_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop WEIGHTED shortest paths (graph.sssp_bounded —
    Bellman-Ford, 3 relaxation rounds) over the customer↔supplier
    trading graph, edge weight = the pair's minimum order quantity
    (integral doubles cast to BIGINT — truncation and rounding agree
    on integral values, so the cast is engine-identical). The weighted
    sibling of bfs_distances: same per-round join + combinable min
    aggregate with eagerly pinned state, exact integer arithmetic, and
    an oracle that unrolls the identical rounds. Multi-source from the
    c_custkey ≤ 3 customers (the BFS convention)."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        # aggregate on the INTEGER key pair; typed ids packed into
        # order-preserving bigints (optimization r13, guide §2.3 —
        # graph.encode_typed_key; decoded once at the end)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.min("l_quantity").cast("bigint").alias("w"))
        .select(
            gr.encode_typed_key(F.col("o_custkey"), 0).alias("c"),
            gr.encode_typed_key(F.col("l_suppkey"), 1).alias("s"),
            "w",
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
        F.col("c").alias("src"), F.col("s").alias("dst"), "w"
    ).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
    )
    srcs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 3)
        .select(gr.encode_typed_key(F.col("c_custkey"), 0).alias("node"))
    )
    return gr.sssp_bounded(edges, srcs, rounds=3).select(
        gr.decode_typed_node("node").alias("node"), "dist"
    )


@query(
    "chi2_drift_source",
    oracle=f"""
    WITH d AS (SELECT doc_id % 2 AS grp, source AS cat FROM documents
               WHERE source IS NOT NULL),
    o AS (SELECT grp, cat, count(*) AS o FROM d GROUP BY 1, 2),
    rt AS (SELECT grp, sum(o) AS nr FROM o GROUP BY 1),
    ct AS (SELECT cat, sum(o) AS nc FROM o GROUP BY 1),
    nn AS (SELECT sum(o) AS nn FROM o),
    grid AS (SELECT rt.grp, ct.cat, rt.nr, ct.nc, coalesce(o.o, 0) AS o
             FROM rt CROSS JOIN ct
             LEFT JOIN o ON o.grp = rt.grp AND o.cat = ct.cat),
    terms AS (SELECT (o - (nr * nc / nn.nn)) * (o - (nr * nc / nn.nn))
                     / (nr * nc / nn.nn) AS t,
                     grp, cat, nn.nn
              FROM grid CROSS JOIN nn)
    SELECT round({_sql_dsum('t')}, 6) AS chi2,
           CAST((count(DISTINCT grp) - 1) * (count(DISTINCT cat) - 1)
                AS BIGINT) AS dof,
           CAST(first(nn) AS BIGINT) AS n
    FROM terms
    """,
)
def chi2_drift_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact χ² homogeneity drift test (selection.chi2_statistic) over
    the documents source distribution between the doc_id-parity splits
    — the CATEGORICAL member of the drift family (PSI/KL = binned
    numeric, KS = exact ordered, χ² = exact categorical). One
    (group, category) aggregate collapses the input; margins and the
    full-grid expected counts run on the reduced frame; the cell-term
    sum is a fixed-point decimal fold, so the statistic is
    bit-identical cross-engine."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    d = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("grp"), F.col("source")
    )
    return sel.chi2_statistic(d, "grp", "source")


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled k-core peeling rounds over the trading graph — each
    round the same degree→filter→restrict block the engine runs
    (graph.kcore_peel)."""
    ctes = [
        """WITH pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    e0 AS (SELECT c AS src, s AS dst FROM pairs
           UNION ALL SELECT s, c FROM pairs)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""s{r} AS (SELECT src FROM e{p} GROUP BY src
           HAVING count(*) >= {k}),
    e{r} AS (SELECT e.src, e.dst FROM e{p} e
           JOIN s{r} a ON a.src = e.src JOIN s{r} b ON b.src = e.dst)"""
        )
    return (
        ",\n    ".join(ctes)
        + f"""
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY src"""
    )


@query("kcore_trading_graph", oracle=_kcore_oracle(4, 3))
def kcore_trading_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling (graph.kcore_peel, k=4, 3 rounds) over
    the customer↔supplier trading graph: iteratively drop nodes with
    degree < 4 and restrict edges to survivors — the standard dense-
    subgraph / spam-cluster screen (a k-core survivor trades with ≥4
    counterparties who EACH trade with ≥4 others). The round count is
    a hyper-parameter, so the oracle unrolls the identical rounds
    (the label_propagation convention). Per round: one combinable
    degree aggregate + two semi-joins, all keyed on the node — and
    the frame only SHRINKS, so unlike frontier algorithms the
    per-round cost is monotonically decreasing at any scale."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
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
    return gr.kcore_peel(edges, k=4, rounds=3).select(
        gr.decode_typed_node("node").alias("node"), "degree"
    )


@query(
    "wasserstein_drift_promo",
    oracle=f"""
    WITH j AS (SELECT l.l_extendedprice AS v,
                      CASE WHEN p.p_type LIKE 'PROMO%' THEN 'promo'
                           ELSE 'other' END AS g
               FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
               WHERE l.l_extendedprice IS NOT NULL),
    pv AS (SELECT v,
                  sum(CASE WHEN g = 'promo' THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN g = 'other' THEN 1 ELSE 0 END) AS cb
           FROM j GROUP BY v),
    c AS (SELECT sum(ca) OVER w AS fa, sum(cb) OVER w AS fb,
                 lead(v) OVER (ORDER BY v) - v AS gap
          FROM pv WINDOW w AS (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    t AS (SELECT CAST(sum(CASE WHEN g = 'promo' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN g = 'other' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM j),
    terms AS (SELECT abs(c.fa::DOUBLE / t.n_a - c.fb::DOUBLE / t.n_b)
                     * c.gap AS trm, t.n_a, t.n_b
              FROM c, t)
    SELECT n_a, n_b, round({_sql_dsum('trm')}, 6) AS w1
    FROM terms GROUP BY n_a, n_b
    """,
)
def wasserstein_drift_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein drift distance (selection.wasserstein_1)
    between promo-part and other-part extended prices — the AREA
    between the two ECDFs where ks_drift_promo takes their supremum.
    KS answers "did the distribution shift?"; W1 answers "by how many
    DOLLARS did mass move?" — the drift magnitude in the value's own
    units, robust to saturation when distributions barely overlap.
    Same reduced-frame two-phase prefix-sum as KS (per-distinct-value
    counts, pinned range exchange, ≤num_partitions-row carry — which
    here also ships each partition's min value leftward so the
    ECDF-step widths cross partition boundaries without a second
    exchange); the term sum is fixed-point, so the statistic is
    bit-identical cross-engine."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = (
        l.join(F.broadcast(pt), l.l_partkey == pt.p_partkey)
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            F.col("l_extendedprice").alias("v"),
            F.when(F.col("p_type").startswith("PROMO"), "promo")
            .otherwise("other")
            .alias("g"),
        )
    )
    return sel.wasserstein_1(j, "v", "g", "promo", "other")


@query(
    "cusum_changepoint_revenue",
    oracle=f"""
    WITH d AS (SELECT o_orderdate AS t, {_sql_dsum('o_totalprice')} AS x
               FROM orders
               WHERE o_orderdate IS NOT NULL GROUP BY 1),
    c AS (SELECT t,
                 sum(CAST(x AS DECIMAL(38,6))) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx,
                 row_number() OVER (ORDER BY t) AS rn
          FROM d),
    tot AS (SELECT {_sql_dsum('x')} AS tt, count(*) AS n FROM d),
    s AS (SELECT c.t,
                 CAST(c.cx AS DOUBLE)
                 - CAST(c.rn AS DOUBLE) * (tot.tt / tot.n) AS s
          FROM c, tot),
    m AS (SELECT max(abs(s)) AS m FROM s)
    SELECT CAST(s.t AS VARCHAR) AS day, round(s.s, 6) + 0.0 AS cusum,
           abs(s.s) = m.m AS is_peak
    FROM s, m
    """,
)
def cusum_changepoint_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint scan (selection.cusum_series, Page
    1954) over the daily order-revenue series: S_t = Σ_{i≤t} x_i −
    t·μ peaks exactly where the series' level shifts, so the flagged
    row is the single-changepoint estimate — the LEVEL-SHIFT member
    of the drift family (PSI/KL/χ²/KS/W1 compare two snapshots; CUSUM
    localizes WHEN the shift happened inside one series). Emits the
    full series with the peak flagged, so every cumulative value is
    driver-audited, not just the argmax. The daily frame is
    calendar-reduced, but the cumulative sum still runs the pinned
    two-phase prefix-sum — nothing funnels through one task at finer
    grains; fixed-point accumulation keeps S_t bit-identical
    cross-engine."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderdate", "o_totalprice")
    )
    daily = o.groupBy(F.col("o_orderdate").alias("t")).agg(
        ops.dsum(F.col("o_totalprice")).alias("x")
    )
    out = sel.cusum_series(daily, "t", "x")
    return out.select(
        F.col("t").cast("string").alias("day"), "cusum", "is_peak"
    )


_IND_CANDIDATES = [
    # (label, child table, child col, parent table, parent col)
    ("orders.o_custkey in customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_partkey in part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey in supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.c_nationkey in nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("part.p_size in nation.n_nationkey", "part", "p_size", "nation", "n_nationkey"),
    ("events.user_id in customer.c_custkey", "events", "user_id", "customer", "c_custkey"),
]


def _ind_oracle() -> str:
    blocks = []
    for label, ct, cc, pt, pc in _IND_CANDIDATES:
        blocks.append(
            f"""SELECT '{label}' AS candidate,
           CAST(count(*) AS BIGINT) AS n_lhs_distinct,
           CAST(sum(CASE WHEN r.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unmatched,
           sum(CASE WHEN r.v IS NULL THEN 1 ELSE 0 END) = 0 AS holds
    FROM (SELECT DISTINCT {cc} AS v FROM {ct} WHERE {cc} IS NOT NULL) l
    LEFT JOIN (SELECT DISTINCT {pc} AS v FROM {pt}
               WHERE {pc} IS NOT NULL) r ON r.v = l.v"""
        )
    return "\n    UNION ALL\n    ".join(blocks)


@query("ind_audit", oracle=_ind_oracle())
def ind_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency discovery (quality.inclusion_audit): test
    six candidate foreign keys across the star schema — the four real
    FK edges (orders→customer, lineitem→part, lineitem→supplier,
    customer→nation), one decoy with overlapping domains
    (part.p_size vs nation keys — 1..50 vs 0..24, so it VIOLATES with
    a measurable unmatched count), and the cross-dataset probe
    events.user_id vs customer keys. The BETWEEN-tables sibling of
    fd_audit's within-table profiling: both distill to "does a
    combinable distinct + one value-keyed join say the constraint
    holds?", the shape that survives any scale because the fact table
    collapses to distinct values before any join."""
    from covid_custom_sql_engine_spark.operators import quality as ql

    cands = [
        (label, load_table(spark, sf_dir, ct), cc, load_table(spark, sf_dir, pt), pc)
        for label, ct, cc, pt, pc in _IND_CANDIDATES
    ]
    return ql.inclusion_audit(cands)


# Exact Shapley attribution: channels and bit assignments shared by the
# engine and the generated oracle. weight(|S|) = |S|!·(n−1−|S|)! — the
# integer numerator of the Shapley kernel; Σ_S weight = n! = 24.
_SHAP_CH = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
_SHAP_WGT = {0: 6, 1: 2, 2: 2, 3: 6}  # s!·(3−s)! for n = 4


def _shap_rows() -> list[tuple[str, int, int, int]]:
    rows = []
    for ch, bit in _SHAP_CH:
        for s in range(16):
            if s & bit == 0:
                rows.append((ch, s, s | bit, _SHAP_WGT[bin(s).count("1")]))
    return rows


def _shapley_oracle() -> str:
    wvals = ", ".join(f"('{c}', {s}, {si}, {w})" for c, s, si, w in _shap_rows())
    coal = ", ".join(f"({s})" for s in range(16))
    maskexpr = " + ".join(
        f"max(CASE WHEN ch = '{c}' THEN {b} ELSE 0 END)" for c, b in _SHAP_CH
    )
    chans = ", ".join(f"'{c}'" for c, _ in _SHAP_CH)
    return f"""
    WITH fp AS (SELECT user_id, min(ts) AS fpt FROM events
                WHERE event_type = 'purchase' GROUP BY 1),
    tc AS (SELECT DISTINCT e.user_id, e.event_type AS ch
           FROM events e JOIN fp ON fp.user_id = e.user_id
           WHERE e.ts < fp.fpt AND e.event_type IN ({chans})),
    um AS (SELECT user_id, {maskexpr} AS mask FROM tc GROUP BY user_id),
    cnt AS (SELECT mask, count(*) AS c FROM um GROUP BY mask),
    coal AS (SELECT * FROM (VALUES {coal}) t(s)),
    v AS (SELECT coal.s, coalesce(sum(cnt.c), 0) AS v
          FROM coal LEFT JOIN cnt ON (cnt.mask & coal.s) = cnt.mask
          GROUP BY coal.s),
    w AS (SELECT * FROM (VALUES {wvals}) t(channel, s, si, wgt))
    SELECT w.channel, round(sum(w.wgt * (vi.v - vs.v)) / 24.0, 6) AS shapley
    FROM w JOIN v vs ON vs.s = w.s JOIN v vi ON vi.s = w.si
    GROUP BY w.channel
    """


@query("shapley_attribution", oracle=_shapley_oracle())
def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution over pre-conversion
    touchpoints — the axiomatic counterpart of markov_attribution's
    removal effects: each channel's credit is its average marginal
    contribution across all 2^(n−1) coalitions of the other channels,
    the unique allocation satisfying efficiency/symmetry/dummy. Per
    converted user (first 'purchase'), the touch SET is the distinct
    channels seen strictly before that purchase; coalition value
    v(S) = conversions whose touch set ⊆ S. With n = 4 channels the
    kernel is fully enumerable: 16 coalition masks, 32 (channel,
    S∌channel) terms with INTEGER weights |S|!(3−|S|)! (Σ = 4! = 24),
    so φ = Σ w·(v(S∪i)−v(S))/24 is exact rational arithmetic —
    bit-identical cross-engine, the markov exact-value convention.
    Scale shape: the only full-width work is the first-purchase
    aggregate and one user-keyed join + distinct; everything after
    runs on a ≤15-row mask-count frame joined against 16-row literal
    coalition tables (broadcast crosses of literals — never data)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    chans = [c for c, _ in _SHAP_CH]
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fpt"))
    )
    tc = (
        ev.join(fp, "user_id")
        .filter((F.col("ts") < F.col("fpt")) & F.col("event_type").isin(chans))
        .select("user_id", F.col("event_type").alias("ch"))
        .distinct()
    )
    mask = None
    for c, b in _SHAP_CH:
        term = F.max(F.when(F.col("ch") == c, b).otherwise(0))
        mask = term if mask is None else mask + term
    um = tc.groupBy("user_id").agg(mask.alias("mask"))
    cnt = um.groupBy("mask").agg(F.count(F.lit(1)).alias("c"))
    spark_sess = ev.sparkSession
    coal = spark_sess.range(16).select(F.col("id").cast("int").alias("s"))
    v = (
        coal.join(
            F.broadcast(cnt),
            F.expr("mask & s") == F.col("mask"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("v"))
    )
    v = v.localCheckpoint(eager=False)  # both coalition branches read one eval
    w = parallelize_small(
        spark_sess.createDataFrame(
            _shap_rows(), "channel string, s int, si int, wgt int"
        )
    )
    vs = v.select(F.col("s").alias("s"), F.col("v").alias("v_s"))
    vi = v.select(F.col("s").alias("si"), F.col("v").alias("v_si"))
    return (
        w.join(F.broadcast(vs), "s")
        .join(F.broadcast(vi), "si")
        .groupBy("channel")
        .agg(
            F.round(
                F.sum(F.col("wgt") * (F.col("v_si") - F.col("v_s"))) / 24.0, 6
            ).alias("shapley")
        )
    )


@query(
    "t_closeness_audit",
    oracle=f"""
    WITH d AS (SELECT c_nationkey AS g1, c_mktsegment AS g2,
                      CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
               FROM customer),
    o AS (SELECT g1, g2, band, count(*) AS c FROM d GROUP BY 1, 2, 3),
    gt AS (SELECT g1, g2, sum(c) AS ng FROM o GROUP BY 1, 2),
    bt AS (SELECT band, sum(c) AS nb FROM o GROUP BY 1),
    nn AS (SELECT sum(c) AS n FROM o),
    grid AS (SELECT gt.g1, gt.g2, gt.ng, bt.band, bt.nb,
                    coalesce(o.c, 0) AS c
             FROM gt CROSS JOIN bt
             LEFT JOIN o ON o.g1 = gt.g1 AND o.g2 = gt.g2
                        AND o.band = bt.band),
    tg AS (SELECT g1, g2,
                  0.5 * {_sql_dsum('abs(CAST(c AS DOUBLE) / ng'
                                   ' - CAST(nb AS DOUBLE) / nn.n)')} AS t
           FROM grid CROSS JOIN nn GROUP BY g1, g2)
    SELECT CAST(0.2 AS DOUBLE) AS threshold,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN t > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           round(max(t), 6) AS max_t
    FROM tg
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third privacy gate, completing the triad: k-anonymity
    bounds group SIZE, l-diversity bounds sensitive-value VARIETY,
    t-closeness bounds sensitive-value DISTRIBUTION — a group whose
    account-balance bands skew far from the table-wide distribution
    leaks attribute information even when large and diverse. Per
    quasi-identifier group (nation × market segment), t = total-
    variation distance ½·Σ_band |p_group − p_global| (the categorical
    Earth-Mover's distance the t-closeness paper defaults to — the
    same ECDF-area idea as wasserstein_drift_promo, specialized to
    categories). One (group, band) aggregate collapses the table;
    margins and the zero-filled grid run on the reduced frame (the
    chi2 discipline); per-group sums are fixed-point so max_t is
    bit-identical cross-engine. Flags groups with t > 0.2."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("g1"),
        F.col("c_mktsegment").alias("g2"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("band"),
    )
    o = c.groupBy("g1", "g2", "band").agg(F.count(F.lit(1)).alias("c"))
    o = o.localCheckpoint(eager=False)  # grid + three margins read it
    gt = o.groupBy("g1", "g2").agg(F.sum("c").alias("ng"))
    bt = o.groupBy("band").agg(F.sum("c").alias("nb"))
    nn = o.agg(F.sum("c").alias("n"))
    grid = (
        gt.crossJoin(F.broadcast(bt))
        .join(o, ["g1", "g2", "band"], "left")
        .select(
            "g1",
            "g2",
            "ng",
            "nb",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .crossJoin(F.broadcast(nn))
    )
    term = F.abs(
        F.col("c").cast("double") / F.col("ng")
        - F.col("nb").cast("double") / F.col("n")
    )
    tg = grid.groupBy("g1", "g2").agg((0.5 * ops.dsum(term)).alias("t"))
    return tg.agg(
        F.lit(0.2).alias("threshold"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("t") > 0.2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.round(F.max("t"), 6).alias("max_t"),
    )


# A/B experimentation readout: the Wilson/z formulas are generated ONCE
# as SQL text and fed verbatim to both engines (F.expr + the oracle) —
# identical opcode order, so sqrt (correctly rounded per IEEE-754) and
# arithmetic give bit-identical doubles with no decimal folds needed.
_AB_P = "(CAST(x AS DOUBLE) / n)"
_AB_Z2 = "(1.96 * 1.96)"
_AB_MARG = (
    f"(1.96 * sqrt({_AB_P} * (1.0 - {_AB_P}) / n"
    f" + {_AB_Z2} / (4.0 * n * n)))"
)


def _ab_wilson(sign: str) -> str:
    return (
        f"(({_AB_P} + {_AB_Z2} / (2.0 * n) {sign} {_AB_MARG})"
        f" / (1.0 + {_AB_Z2} / n))"
    )


# outcome: a HIGH-VALUE purchase (value >= 100) — plain "any purchase"
# saturates at 100% on the synthetic log, which degenerates the pooled
# z denominator (p(1-p) = 0)
_AB_ARMS = """(SELECT user_id,
                      CAST(user_id % 2 AS BIGINT) AS arm,
                      max(CASE WHEN event_type = 'purchase'
                               AND value >= 100.0
                               THEN 1 ELSE 0 END) AS conv
               FROM events GROUP BY user_id)"""


@query(
    "ab_wilson_bounds",
    oracle=f"""
    WITH u AS {_AB_ARMS},
    a AS (SELECT arm, count(*) AS n, sum(conv) AS x FROM u GROUP BY arm)
    SELECT arm, CAST(n AS BIGINT) AS n_users, CAST(x AS BIGINT) AS n_converted,
           round({_AB_P}, 6) AS cvr,
           round({_ab_wilson('-')}, 6) AS wilson_low,
           round({_ab_wilson('+')}, 6) AS wilson_high
    FROM a
    """,
)
def ab_wilson_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into two arms by id parity
    (the split_divergence convention), outcome = converted (any
    'purchase' event); per arm the conversion rate with its Wilson
    95% score interval — the binomial CI that stays inside [0,1] and
    behaves at small n where the normal approximation fails, i.e.
    what an experimentation dashboard should actually print. Scale
    shape: ONE per-user max aggregate collapses the event log, then a
    two-row arm aggregate; the interval is pure per-row arithmetic on
    (n, x) — sqrt is correctly rounded per IEEE-754, and the formula
    text is shared verbatim with the oracle, so the bounds are
    bit-identical cross-engine."""
    u = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "value")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 100.0),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("arm"), "conv")
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    return a.select(
        "arm",
        F.col("n").cast("bigint").alias("n_users"),
        F.col("x").cast("bigint").alias("n_converted"),
        F.round(F.expr(_AB_P), 6).alias("cvr"),
        F.round(F.expr(_ab_wilson("-")), 6).alias("wilson_low"),
        F.round(F.expr(_ab_wilson("+")), 6).alias("wilson_high"),
    )


_AB_ZEXPR = (
    "((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)"
    " / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
    " * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
    " * (1.0 / n1 + 1.0 / n2)))"
)


@query(
    "ab_ztest_conversion",
    oracle=f"""
    WITH u AS {_AB_ARMS},
    a AS (SELECT arm, count(*) AS n, sum(conv) AS x FROM u GROUP BY arm),
    p AS (SELECT CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS x1,
                 CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n2,
                 CAST(sum(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS x2
          FROM a)
    SELECT n1, x1, n2, x2,
           round({_AB_ZEXPR}, 6) AS z_stat,
           abs({_AB_ZEXPR}) > 1.96 AS significant
    FROM p
    """,
)
def ab_ztest_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision companion to ab_wilson_bounds: the pooled
    two-proportion z-test between the arms' conversion rates, with
    the 5%-level verdict — the "is the difference real?" gate an
    experiment readout ends with. Same collapsed per-user frame; the
    two-arm aggregate pivots to one row and the statistic is shared-
    text arithmetic (IEEE sqrt), bit-identical cross-engine. On the
    id-parity split of synthetic data the verdict should be NOT
    significant — a seeded A/A test, which is itself the standard
    sanity check that the pipeline doesn't manufacture lift."""
    u = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "value")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 100.0),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("arm"), "conv")
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    p = a.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("x"))).cast("bigint").alias("x1"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("arm") == 1, F.col("x"))).cast("bigint").alias("x2"),
    )
    return p.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.round(F.expr(_AB_ZEXPR), 6).alias("z_stat"),
        (F.abs(F.expr(_AB_ZEXPR)) > 1.96).alias("significant"),
    )


@query(
    "theil_sen_trend",
    oracle=f"""
    WITH d AS (SELECT o_orderdate AS t, {_sql_dsum('o_totalprice')} AS y
               FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
    m AS (SELECT min(t) AS t0 FROM d),
    dx AS (SELECT datediff('day', m.t0, d.t) AS x, d.y FROM d, m),
    s AS (SELECT (b.y - a.y) / (b.x - a.x) AS sl
          FROM dx a JOIN dx b ON a.x < b.x),
    o AS (SELECT count(*) AS n,
                 sum(x) AS sx, sum(CAST(x AS BIGINT) * x) AS sxx,
                 {_sql_dsum('y')} AS sy, {_sql_dsum('x * y')} AS sxy
          FROM dx),
    ms AS (SELECT median(sl) AS med FROM s)
    SELECT round(ms.med, 6) AS slope_theil_sen,
           round((o.n * o.sxy - o.sx * o.sy)
                 / (o.n * CAST(o.sxx AS DOUBLE) - CAST(o.sx AS DOUBLE) * o.sx),
                 6) AS slope_ols,
           CAST(o.n AS BIGINT) AS n_days
    FROM o, ms
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily order revenue — the MEDIAN of
    all pairwise slopes (y_j−y_i)/(x_j−x_i), the estimator with a 29%
    breakdown point where OLS has 0% (one corrupted day can move OLS
    arbitrarily; Theil–Sen shrugs off outliers) — reported next to
    the OLS slope so the gap itself is the outlier diagnostic. Scale
    shape: the fact table collapses to the calendar-bounded daily
    frame FIRST, so the quadratic pair generation is over days, not
    rows — bounded at any data scale (the deliberate reduced-frame
    broadcast cross, the range_join_bands convention); the slope
    median runs the two-phase distributed selection
    (selection.exact_median — never a global sort), and the OLS side
    is exact fixed-point/integer sums. Per-pair slope arithmetic is
    IEEE-deterministic; median picks/averages two exact order
    statistics, matching the oracle's median() semantics."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderdate", "o_totalprice")
    )
    d = o.groupBy(F.col("o_orderdate").alias("t")).agg(
        ops.dsum(F.col("o_totalprice")).alias("y")
    )
    t0 = d.agg(F.min("t").alias("t0"))
    dx = d.crossJoin(F.broadcast(t0)).select(
        F.datediff("t", "t0").alias("x"), "y"
    )
    dx = dx.localCheckpoint(eager=False)  # pairs (x4 median passes) + OLS
    a = dx.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = dx.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    # try_divide, not /: Catalyst merges downstream isNotNull(sl)
    # filters into the join condition, where ANSI division would
    # evaluate on the xa == xb rows the join itself excludes
    slopes = a.join(b, F.col("xa") < F.col("xb")).select(
        F.try_divide(
            F.col("yb") - F.col("ya"),
            (F.col("xb") - F.col("xa")).cast("double"),
        ).alias("sl")
    )
    # Optimization r12 note: a declarative exact_medians_plan variant
    # (one action instead of exact_median's three) was built and
    # A/B-measured — it LOST (best-of-4 wall 3.8 s eager vs 6.4 s
    # declarative; executor CPU 1.9 s vs 4.2 s): the plan-side median
    # explodes (metric, value) structs and joins broadcast bounds per
    # row, costing more than the three cheap bounded actions it
    # saves. Kept the eager two-phase selection deliberately.
    med = sel.exact_median(slopes, "sl")
    ols = dx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("bigint") * F.col("x")).alias("sxx"),
        ops.dsum(F.col("y")).alias("sy"),
        ops.dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return ols.select(
        F.round(F.lit(float(med)), 6).alias("slope_theil_sen"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            ),
            6,
        ).alias("slope_ols"),
        F.col("n").cast("bigint").alias("n_days"),
    )
