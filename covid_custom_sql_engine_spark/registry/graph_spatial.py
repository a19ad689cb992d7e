"""Graph continuations and spatial clustering over the testdata star
schema (round-10 continuation, split from stats_ml.py in round 11).

Shortest-path counting, k-truss cohesion, seeded Brandes dependency,
time-respecting reachability, degree assortativity, local clustering
coefficients, the grid-bucketed spatial join, and grid-pruned DBSCAN.
Same conventions as every family module (see _base).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid_custom_sql_engine_spark.catalog import load_table
from covid_custom_sql_engine_spark.operators import core as ops
from covid_custom_sql_engine_spark.registry._base import (
    _sql_dsum,
    _sql_dsum12,
    query,
)


# ---------------------------------------------------------------------------
# Graph: shortest-path counting and k-truss cohesion
# ---------------------------------------------------------------------------


@query(
    "bfs_path_counts",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    walks AS (
      SELECT 'c:' || c_custkey AS node, 0 AS d
      FROM customer WHERE c_custkey <= 3
      UNION ALL
      SELECT e.dst, w.d + 1
      FROM walks w JOIN edges e ON e.src = w.node
      WHERE w.d < 3),
    md AS (SELECT node, min(d) AS dist FROM walks GROUP BY node)
    SELECT w.node, CAST(md.dist AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM walks w JOIN md ON md.node = w.node AND w.d = md.dist
    GROUP BY w.node, md.dist
    """,
)
def bfs_path_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-path COUNTS from the seed customers over the trading
    graph (graph.bfs_path_counts) — bfs_distances upgraded with Brandes'
    σ DP: how MANY minimum-hop routes reach each node, the
    reachable-vs-robustly-reachable distinction and the betweenness
    building block.  Same per-level join + combinable σ-sum + anti-join
    discipline as bfs_layers (eager-pinned state, fixed depth 3, empty-
    frontier early exit).  The oracle counts bounded walks at each
    node's minimal depth — provably equal to σ because a length-dist(v)
    walk cannot contain a non-shortest prefix.  All integers — exact."""
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
    srcs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 3)
        .select(gr.encode_typed_key(F.col("c_custkey"), 0).alias("node"))
    )
    return gr.bfs_path_counts(edges, srcs, max_depth=3).select(
        gr.decode_typed_node("node").alias("node"), "dist", "n_paths"
    )


def _ktruss_oracle(k: int, rounds: int) -> str:
    """Unrolled k-truss rounds (the kcore/label_propagation generated-
    oracle convention): each round recomputes per-edge triangle support
    over the surviving edges and keeps support ≥ k−2."""
    parts = [
        """
    e_0 AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY pa, pb HAVING count(*) >= 2
    )"""
    ]
    for r in range(rounds):
        parts.append(
            f"""
    a_{r} AS MATERIALIZED (SELECT pa AS x, pb AS y FROM e_{r}
              UNION ALL SELECT pb, pa FROM e_{r}),
    s_{r} AS MATERIALIZED (SELECT e.pa, e.pb, count(*) AS sup
              FROM e_{r} e
              JOIN a_{r} w1 ON w1.x = e.pa
              JOIN a_{r} w2 ON w2.x = e.pb AND w2.y = w1.y
              GROUP BY e.pa, e.pb),
    e_{r + 1} AS MATERIALIZED (SELECT e.pa, e.pb FROM e_{r} e
                  JOIN s_{r} s ON s.pa = e.pa AND s.pb = e.pb
                  WHERE s.sup >= {k - 2})"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CAST(pa AS BIGINT) AS src, CAST(pb AS BIGINT) AS dst
    FROM e_{rounds}
    """
    )


@query("ktruss_copurchase", oracle=_ktruss_oracle(3, 3))
def ktruss_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 3-truss peeling (graph.ktruss_edges, 3 rounds) of the
    part co-purchase graph — every surviving edge sits in ≥ 1 triangle
    among survivors, the edge-level cohesion screen that is strictly
    stronger than `kcore_trading_graph`'s degree test and the standard
    community-backbone extraction (`triangle_counts`' graph, upgraded
    from counting to peeling).  Per round ONE wedge join over the
    shrinking edge frame + a combinable support count + an inner join
    back; state eagerly pinned per round; the oracle unrolls the
    identical rounds.  All-integer — exact."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("ea"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("eb")
    )
    edges = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("ea") < F.col("eb")))
        .groupBy(F.col("ea").alias("src"), F.col("eb").alias("dst"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("src", "dst")
    )
    out = gr.ktruss_edges(edges, k=3, rounds=3)
    return out.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )


@query(
    "seed_betweenness",
    oracle="""
    WITH RECURSIVE pairs AS MATERIALIZED (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    walks AS (
      SELECT 'c:' || c_custkey AS node, 0 AS d
      FROM customer WHERE c_custkey <= 3
      UNION ALL
      SELECT e.dst, w.d + 1
      FROM walks w JOIN edges e ON e.src = w.node
      WHERE w.d < 3),
    md AS MATERIALIZED (SELECT node, min(d) AS dist FROM walks GROUP BY node),
    sig AS MATERIALIZED (
      SELECT w.node, md.dist, count(*) AS np
      FROM walks w JOIN md ON md.node = w.node AND w.d = md.dist
      GROUP BY w.node, md.dist),
    c2 AS (SELECT v.node,
                  CAST(sum(CAST(v.np::DOUBLE / w.np * (1 + 0.0)
                                AS DECIMAL(38,12))) AS DOUBLE) AS delta
           FROM sig v JOIN edges e ON e.src = v.node
           JOIN sig w ON w.node = e.dst AND w.dist = 3
           WHERE v.dist = 2 GROUP BY v.node),
    l2 AS MATERIALIZED (
      SELECT v.node, coalesce(c2.delta, 0.0) AS delta
      FROM sig v LEFT JOIN c2 USING (node) WHERE v.dist = 2),
    c1 AS (SELECT v.node,
                  CAST(sum(CAST(v.np::DOUBLE / w.np * (1 + l2.delta)
                                AS DECIMAL(38,12))) AS DOUBLE) AS delta
           FROM sig v JOIN edges e ON e.src = v.node
           JOIN sig w ON w.node = e.dst AND w.dist = 2
           JOIN l2 ON l2.node = w.node
           WHERE v.dist = 1 GROUP BY v.node),
    l1 AS (SELECT v.node, coalesce(c1.delta, 0.0) AS delta
           FROM sig v LEFT JOIN c1 USING (node) WHERE v.dist = 1)
    SELECT node, CAST(2 AS BIGINT) AS dist, round(delta, 6) AS dependency
    FROM l2
    UNION ALL
    SELECT node, CAST(1 AS BIGINT) AS dist, round(delta, 6) AS dependency
    FROM l1
    """,
)
def seed_betweenness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brandes dependency accumulation from the seed customers over the
    trading graph (graph.seed_betweenness) — the backward pass paired
    with `bfs_path_counts`' forward σ DP: how much of the seeds'
    shortest-path traffic each intermediate node carries, i.e. the
    exact betweenness CONTRIBUTION of this seed set (sampled-seed
    averaging is the standard betweenness approximation at scale).
    Per level one equi-join against the pinned forward frame +
    a DECIMAL(38,12) fold of σ-ratio terms; levels descend with
    eagerly pinned δ state.  round(6) on the reported dependency."""
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
    srcs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 3)
        .select(gr.encode_typed_key(F.col("c_custkey"), 0).alias("node"))
    )
    out = gr.seed_betweenness(edges, srcs, max_depth=3)
    return out.select(
        gr.decode_typed_node("node").alias("node"),
        "dist",
        F.round(F.col("delta"), 6).alias("dependency"),
    )


# ---------------------------------------------------------------------------
# Temporal reachability and quantile normalization
# ---------------------------------------------------------------------------


def _temporal_reach_oracle(rounds: int = 3) -> str:
    """Unrolled earliest-arrival relaxation rounds (the sssp_bounded
    generated-oracle convention); date comparisons are exact."""
    ctes = [
        """WITH pairs AS MATERIALIZED (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s,
             CAST(o_orderdate AS DATE) AS d
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS MATERIALIZED (SELECT c AS src, s AS dst, d FROM pairs
              UNION ALL SELECT s, c, d FROM pairs),
    t0 AS (SELECT 'c:' || c_custkey AS node, DATE '1970-01-01' AS ea
           FROM customer WHERE c_custkey <= 3)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""t{r} AS MATERIALIZED (SELECT node, min(ea) AS ea FROM (
        SELECT node, ea FROM t{p}
        UNION ALL
        SELECT e.dst AS node, e.d AS ea
        FROM t{p} t JOIN edges e ON e.src = t.node AND e.d >= t.ea)
        GROUP BY node)"""
        )
    return (
        ",\n    ".join(ctes)
        + f"""
    SELECT node, strftime(t{rounds}.ea, '%Y-%m-%d') AS earliest
    FROM t{rounds}"""
    )


@query("temporal_reachability", oracle=_temporal_reach_oracle(3))
def temporal_reachability_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest time-respecting arrival from the seed customers over
    the DATED trading graph (graph.temporal_reachability, 3
    interaction rounds): each hop must depart no earlier than the
    node's own earliest arrival — the contact-tracing/diffusion
    primitive static BFS gets wrong.  Per round one time-gated relax
    join + a combinable MIN; monotone state, eagerly pinned; unrolled
    identically in the oracle.  Dates compare exactly and are emitted
    as formatted strings on both sides (the house timestamp rule)."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        # distinct on the INTEGER key pair + date; typed ids packed
        # into order-preserving bigints (optimization r13, guide §2.3 —
        # see bfs_path_counts above)
        .select("o_custkey", "l_suppkey", "d")
        .distinct()
        .select(
            gr.encode_typed_key(F.col("o_custkey"), 0).alias("c"),
            gr.encode_typed_key(F.col("l_suppkey"), 1).alias("s"),
            "d",
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
        F.col("c").alias("src"), F.col("s").alias("dst"), F.col("d").alias("edate")
    ).unionAll(
        pairs.select(
            F.col("s").alias("src"), F.col("c").alias("dst"), F.col("d").alias("edate")
        )
    )
    srcs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 3)
        .select(gr.encode_typed_key(F.col("c_custkey"), 0).alias("node"))
    )
    out = gr.temporal_reachability(edges, srcs, rounds=3)
    return out.select(
        gr.decode_typed_node("node").alias("node"),
        F.date_format("earliest", "yyyy-MM-dd").alias("earliest"),
    )


@query(
    "degree_assortativity",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY pa, pb HAVING count(*) >= 2),
    und AS (SELECT pa AS u, pb AS v FROM e0
            UNION ALL SELECT pb, pa FROM e0),
    deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
    pairs AS (SELECT du.d AS dx, dv.d AS dy
              FROM und JOIN deg du ON du.u = und.u
                       JOIN deg dv ON dv.u = und.v),
    s AS (SELECT count(*) AS m,
                 CAST(sum(dx) AS DOUBLE) AS sx, CAST(sum(dy) AS DOUBLE) AS sy,
                 CAST(sum(CAST(dx AS BIGINT) * dx) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(dy AS BIGINT) * dy) AS DOUBLE) AS syy,
                 CAST(sum(CAST(dx AS BIGINT) * dy) AS DOUBLE) AS sxy
          FROM pairs),
    nn AS (SELECT count(*) AS n_nodes FROM deg)
    SELECT CAST(s.m / 2 AS BIGINT) AS n_edges,
           CAST(nn.n_nodes AS BIGINT) AS n_nodes,
           round((s.m * s.sxy - s.sx * s.sy)
                 / sqrt((s.m * s.sxx - s.sx * s.sx)
                        * (s.m * s.syy - s.sy * s.sy)), 6)
             AS assortativity
    FROM s, nn
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — the Pearson
    correlation of endpoint degrees across (both-orientation) edges:
    do popular parts co-occur with other popular parts (r > 0, social-
    network-like) or with niche ones (r < 0, hub-and-spoke)?  The
    one-number structural summary next to `modularity_nations` and
    `triangle_counts`.  Scale shape: degrees are one hash aggregate,
    endpoint-degree pairs one double equi-join of the edge list
    against it, and the correlation exact-integer one-row arithmetic.
    round(6)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("pa"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pb")
    )
    e0 = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("pa", "pb")
    )
    und = e0.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        e0.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    und = und.localCheckpoint(eager=False)  # degree agg + pair join
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    pairs = und.join(
        deg.select(F.col("u").alias("_du"), F.col("d").alias("dx")),
        F.col("_du") == F.col("u"),
    ).join(
        deg.select(F.col("u").alias("_dv"), F.col("d").alias("dy")),
        F.col("_dv") == F.col("v"),
    )
    s = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").cast("double").alias("sx"),
        F.sum("dy").cast("double").alias("sy"),
        F.sum(F.col("dx").cast("bigint") * F.col("dx")).cast("double").alias("sxx"),
        F.sum(F.col("dy").cast("bigint") * F.col("dy")).cast("double").alias("syy"),
        F.sum(F.col("dx").cast("bigint") * F.col("dy")).cast("double").alias("sxy"),
    )
    nn = F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
    return s.crossJoin(nn).select(
        (F.col("m") / 2).cast("bigint").alias("n_edges"),
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Clustering coefficient, grid DBSCAN, readability
# ---------------------------------------------------------------------------


@query(
    "clustering_coefficient",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY pa, pb HAVING count(*) >= 2),
    und AS (SELECT pa AS u, pb AS v FROM e0
            UNION ALL SELECT pb, pa FROM e0),
    deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
    tri AS (SELECT x.u, count(*) AS t2
            FROM und x JOIN und y ON y.u = x.v
            JOIN e0 z ON z.pa = least(x.u, y.v) AND z.pb = greatest(x.u, y.v)
            WHERE x.u != y.v
            GROUP BY x.u),
    cc AS (SELECT deg.u, deg.d,
                  CASE WHEN deg.d >= 2
                       THEN coalesce(tri.t2, 0)
                            / (CAST(deg.d AS DOUBLE) * (deg.d - 1))
                       ELSE 0.0 END AS c
           FROM deg LEFT JOIN tri ON tri.u = deg.u)
    SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_eligible,
           round(CAST(sum(CAST((c) AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 6) AS avg_clustering
    FROM cc
    """,
)
def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average LOCAL clustering coefficient of the co-purchase graph —
    per node, the fraction of its neighbor pairs that are themselves
    connected (wedges closed into triangles, counted as ordered
    neighbor pairs over d·(d−1)), averaged over all nodes (Watts–
    Strogatz).  The "how cliquish is each neighborhood" companion of
    the global `triangle_counts` / `degree_assortativity` statistics.
    Scale shape: one wedge join anchored at each node (the adjacency
    joined to itself on the shared neighbor) closed by an equi-join
    against the canonical edge list, then one combinable aggregate;
    per-node ratios fold fixed-point for the average.  round(6)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("pa"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pb")
    )
    e0 = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("pa", "pb")
        .localCheckpoint(eager=False)  # adjacency + closure joins
    )
    und = e0.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        e0.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    x = und.select(F.col("u").alias("xu"), F.col("v").alias("xv"))
    y = und.select(F.col("u").alias("yu"), F.col("v").alias("yv"))
    tri = (
        x.join(y, F.col("yu") == F.col("xv"))
        .filter(F.col("xu") != F.col("yv"))
        .join(
            e0,
            (F.col("pa") == F.least(F.col("xu"), F.col("yv")))
            & (F.col("pb") == F.greatest(F.col("xu"), F.col("yv"))),
        )
        .groupBy(F.col("xu").alias("u"))
        .agg(F.count(F.lit(1)).alias("t2"))
    )
    cc = deg.join(tri, "u", "left").select(
        "d",
        F.when(
            F.col("d") >= 2,
            F.coalesce(F.col("t2"), F.lit(0))
            / (F.col("d").cast("double") * (F.col("d") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("c"),
    )
    return cc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.when(F.col("d") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_eligible"),
        F.round(ops.dsum12(F.col("c")) / F.count(F.lit(1)), 6).alias(
            "avg_clustering"
        ),
    )


# ---------------------------------------------------------------------------
# Spatial blocking join and pseudo-relevance-feedback retrieval
# ---------------------------------------------------------------------------

# Shared float-sensitive expression text (verbatim both engines).
_SP_D2 = (
    "((lat_a - lat_b) * (lat_a - lat_b)"
    " + (lon_a - lon_b) * (lon_a - lon_b))"
)

_SP_COORDS_SQL = """
    pts AS (SELECT c_custkey AS ck,
                   ('0x' || substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                     % 1200000 / 10000.0 - 60 AS lat,
                   ('0x' || substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                     % 3600000 / 10000.0 - 180 AS lon
            FROM customer)
"""


@query(
    "spatial_grid_join",
    oracle=f"""
    WITH {_SP_COORDS_SQL},
    cells AS (SELECT ck, lat, lon,
                     CAST(floor(lon) AS BIGINT) AS cx,
                     CAST(floor(lat) AS BIGINT) AS cy
              FROM pts),
    offs AS (SELECT a.dx, b.dy
             FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
                  (SELECT unnest([-1, 0, 1]) AS dy) b),
    repl AS (SELECT ck AS ck_a, lat AS lat_a, lon AS lon_a,
                    cx + dx AS jx, cy + dy AS jy
             FROM cells CROSS JOIN offs),
    cand AS (SELECT r.ck_a, r.lat_a, r.lon_a,
                    c.ck AS ck_b, c.lat AS lat_b, c.lon AS lon_b
             FROM repl r JOIN cells c ON c.cx = r.jx AND c.cy = r.jy
             WHERE r.ck_a < c.ck)
    SELECT CAST(ck_a AS BIGINT) AS cust_a, CAST(ck_b AS BIGINT) AS cust_b,
           round(sqrt({_SP_D2}), 6) AS dist_deg
    FROM cand
    WHERE {_SP_D2} <= 1.0
    """,
)
def spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join by GRID BLOCKING: deterministic synthetic
    coordinates per customer (md5-hash arithmetic — the dataset_split
    convention, identical on both engines), 1°×1° grid cells, each
    point replicated to its 3×3 neighborhood so every ≤1°-radius pair
    co-locates in at least one cell, then the exact planar-degree
    distance filter keeps true neighbors — the classic distributed
    spatial-join shape (replicate-left, partition-right equi-join on
    the cell key; never an all-pairs cross).  At 100 TB the cell key IS
    the shuffle/bucketing key and the 9× replication is the bounded
    price of single-pass blocking; skewed cells (cities) ride AQE's
    skew-join split.  Pair dedup by ck_a < ck_b keeps each unordered
    pair exactly once (a pair is found in the left point's replica cell
    that contains the right point, and the mirrored candidate fails the
    id inequality).  Distance arithmetic is ONE shared expression
    string; coordinates are md5-derived exact integers / 1e4 — bit-
    identical cross-engine; round(6) on the reported distance."""
    ck = F.col("c_custkey").cast("string")

    def h(salt: str) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), ck)), 1, 15), 16, 10
        ).cast("bigint")

    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        (h("lat:") % 1200000 / 10000.0 - 60).alias("lat"),
        (h("lon:") % 3600000 / 10000.0 - 180).alias("lon"),
    )
    cells = pts.select(
        "ck",
        "lat",
        "lon",
        F.floor("lon").cast("bigint").alias("cx"),
        F.floor("lat").cast("bigint").alias("cy"),
    ).localCheckpoint(eager=False)  # both join sides
    offs = F.broadcast(
        spark.createDataFrame(
            [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
            "dx int, dy int",
        )
    )
    repl = cells.crossJoin(offs).select(
        F.col("ck").alias("ck_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    right = cells.select(
        F.col("ck").alias("ck_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
    )
    cand = repl.join(
        right,
        (F.col("bx") == F.col("jx"))
        & (F.col("by") == F.col("jy"))
        & (F.col("ck_a") < F.col("ck_b")),
    )
    return cand.filter(F.expr(_SP_D2) <= 1.0).select(
        F.col("ck_a").cast("bigint").alias("cust_a"),
        F.col("ck_b").cast("bigint").alias("cust_b"),
        F.round(F.sqrt(F.expr(_SP_D2)), 6).alias("dist_deg"),
    )


_DB_D2 = (
    "((ax - bx) * (ax - bx) + (ay - by) * (ay - by))"
)
_DB_N = 5000  # synthesized point-universe size (SF-independent)
_DB_CC_ROUNDS = 16  # hook+jump rounds: reach ≥ 2^16 hops, any diameter


def _dbscan_oracle() -> str:
    """All-pairs DBSCAN spec with the cluster step as UNROLLED
    min-label hooking + pointer jumping (the ktruss_edges convention)
    instead of a recursive reachability CTE: the recursion
    materializes (id, reachable) — quadratic in the giant component
    (686 s at 2000 points near percolation, SCALE.md round-10) —
    while each unrolled round here is two linear joins over the
    core-core edge list, and the jump (lbl := lbl[lbl]) doubles label
    reach per round, so {_DB_CC_ROUNDS} rounds converge for any
    diameter ≤ 2^{_DB_CC_ROUNDS}. Same fixpoint as the engine's
    dedup.connected_components (min core id per component)."""
    rounds = []
    prev = "l0"
    for i in range(1, _DB_CC_ROUNDS + 1):
        rounds.append(
            f"""h{i} AS MATERIALIZED (
      SELECT l.id, least(min(l.lbl), coalesce(min(nl.lbl), min(l.lbl))) AS lbl
      FROM {prev} l LEFT JOIN ce ON ce.ia = l.id
           LEFT JOIN {prev} nl ON nl.id = ce.ib
      GROUP BY l.id),
    l{i} AS MATERIALIZED (
      SELECT h.id, j.lbl FROM h{i} h JOIN h{i} j ON j.id = h.lbl)"""
        )
        prev = f"l{i}"
    unrolled = ",\n    ".join(rounds)
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT i AS id,
             ('0x' || substr(md5('dbx:' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
               % 80000 / 1000.0 - 40 AS x,
             ('0x' || substr(md5('dby:' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
               % 80000 / 1000.0 - 40 AS y
      FROM generate_series(1, {_DB_N}) AS t(i)),
    nb AS MATERIALIZED (
      SELECT a.id AS ia, b.id AS ib
      FROM (SELECT id, x AS ax, y AS ay FROM pts) a
      JOIN (SELECT id, x AS bx, y AS by FROM pts) b
        ON a.id != b.id AND {_DB_D2} <= 1.0),
    core AS MATERIALIZED (
      SELECT ia AS id FROM nb GROUP BY ia HAVING count(*) + 1 >= 4),
    ce AS MATERIALIZED (
      SELECT nb.ia, nb.ib FROM nb
      JOIN core ca ON ca.id = nb.ia
      JOIN core cb ON cb.id = nb.ib),
    l0 AS MATERIALIZED (
      SELECT c.id, least(c.id, coalesce(min(ce.ib), c.id)) AS lbl
      FROM core c LEFT JOIN ce ON ce.ia = c.id GROUP BY c.id),
    {unrolled},
    comp AS MATERIALIZED (
      SELECT id, lbl AS cluster FROM l{_DB_CC_ROUNDS}),
    border AS MATERIALIZED (
      SELECT nb.ia AS id, min(comp.cluster) AS cluster
      FROM nb JOIN comp ON comp.id = nb.ib
      WHERE nb.ia NOT IN (SELECT id FROM core)
      GROUP BY nb.ia),
    agg AS (
      SELECT comp.cluster, count(*) AS n_core FROM comp GROUP BY 1),
    bagg AS (
      SELECT cluster, count(*) AS n_border FROM border GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM pts),
    lab AS (SELECT agg.cluster, agg.n_core,
                   coalesce(bagg.n_border, 0) AS n_border
            FROM agg LEFT JOIN bagg USING (cluster))
    SELECT CAST(cluster AS BIGINT) AS cluster_id,
           CAST(n_core AS BIGINT) AS n_core,
           CAST(n_border AS BIGINT) AS n_border
    FROM lab
    UNION ALL
    SELECT -1, 0,
           CAST(tot.n - (SELECT coalesce(sum(n_core + n_border), 0) FROM lab)
                AS BIGINT)
    FROM tot
    """


@query("dbscan_spatial", oracle=_dbscan_oracle())
def dbscan_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over deterministic synthetic planar points (md5
    coordinates on [−40, 40]², ε = 1, minPts = 4): core points by
    ε-neighborhood count, clusters as CONNECTED COMPONENTS of the
    core-core adjacency (dedup.connected_components — the pointer-
    jumping min-label machinery), borders assigned to their smallest
    adjacent core cluster, the rest noise — density clustering built
    ENTIRELY from pieces this engine already ships at scale: the grid-
    blocked spatial join (`spatial_grid_join`'s replicate-to-3×3-cells
    shape, cells of ε) for neighbor pairs, and the dedup CC loop for
    cluster formation.  The universe is 5000 ids synthesized inside
    both engines (range/generate_series — SF-independent, 3.3× the
    round-10 oracle cap, which protected the old RECURSIVE-closure
    oracle, not the engine; the unrolled hook+jump oracle is linear
    per round so the cap is gone).  Output: per-cluster core/border
    counts + the noise row (−1)."""
    from covid_custom_sql_engine_spark.functions import dedup as dd

    sid = F.col("id").cast("string")

    def h(salt: str) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), sid)), 1, 15), 16, 10
        ).cast("bigint")

    pts = spark.range(1, _DB_N + 1).select(
        F.col("id"),
        (h("dbx:") % 80000 / 1000.0 - 40).alias("x"),
        (h("dby:") % 80000 / 1000.0 - 40).alias("y"),
    )
    cells = pts.select(
        "id",
        "x",
        "y",
        F.floor("x").cast("bigint").alias("cx"),
        F.floor("y").cast("bigint").alias("cy"),
    ).localCheckpoint(eager=False)  # both sides of the blocking join
    offs = F.broadcast(
        spark.createDataFrame(
            [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
            "dx int, dy int",
        )
    )
    left = cells.crossJoin(offs).select(
        F.col("id").alias("ia"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    right = cells.select(
        F.col("id").alias("ib"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("rx"),
        F.col("cy").alias("ry"),
    )
    nb = (
        left.join(
            right,
            (F.col("rx") == F.col("jx"))
            & (F.col("ry") == F.col("jy"))
            & (F.col("ia") != F.col("ib")),
        )
        .filter(F.expr(_DB_D2) <= 1.0)
        .select("ia", "ib")
        .localCheckpoint(eager=False)  # core count + core edges + border
    )
    core = (
        nb.groupBy("ia")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") + 1 >= 4)
        .select(F.col("ia").alias("id"))
        .localCheckpoint(eager=False)  # CC seed + border anti-join
    )
    ce = nb.join(
        core.select(F.col("id").alias("ia")), "ia"
    ).join(core.select(F.col("id").alias("ib")), "ib")
    # CC over core-core edges; isolated cores keep their own label via
    # the union with self-pairs
    pairs = ce.select(
        F.col("ia").alias("id_a"), F.col("ib").alias("id_b")
    ).unionByName(
        core.select(F.col("id").alias("id_a"), F.col("id").alias("id_b"))
    )
    comp = dd.connected_components(pairs).select(
        F.col("id"), F.col("component").alias("cluster")
    )
    comp = comp.localCheckpoint(eager=False)  # agg + border join
    border = (
        nb.join(core.select(F.col("id").alias("ia")), "ia", "left_anti")
        .join(
            comp.select(F.col("id").alias("ib"), F.col("cluster")), "ib"
        )
        .groupBy(F.col("ia").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    agg = comp.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_core"))
    bagg = border.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_border")
    )
    lab = agg.join(bagg, "cluster", "left").select(
        "cluster",
        "n_core",
        F.coalesce(F.col("n_border"), F.lit(0)).alias("n_border"),
    )
    lab = lab.localCheckpoint(eager=False)  # output + noise total
    tot = pts.agg(F.count(F.lit(1)).alias("n"))
    assigned = lab.agg(
        F.coalesce(F.sum(F.col("n_core") + F.col("n_border")), F.lit(0)).alias(
            "a"
        )
    )
    noise = tot.crossJoin(F.broadcast(assigned)).select(
        F.lit(-1).cast("bigint").alias("cluster_id"),
        F.lit(0).cast("bigint").alias("n_core"),
        (F.col("n") - F.col("a")).cast("bigint").alias("n_border"),
    )
    return lab.select(
        F.col("cluster").cast("bigint").alias("cluster_id"),
        F.col("n_core").cast("bigint").alias("n_core"),
        F.col("n_border").cast("bigint").alias("n_border"),
    ).unionByName(noise)


# ---------------------------------------------------------------------------
# Graph: one-level Louvain modularity ascent (round 12)
# ---------------------------------------------------------------------------


def _louvain_oracle(rounds: int = 2) -> str:
    """Unrolled one-level Louvain rounds over the bipartite trading
    graph — each round is the same Σ_tot → k_{i,c} → exact-integer
    score → max-score → min-label-at-max block the engine runs
    (graph.louvain_one_level). All-integer arithmetic, so the
    cross-engine comparison is exact with no decimal folds."""
    ctes = [
        """WITH pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS k
            FROM edges GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS e2 FROM edges),
    l0 AS (SELECT node, node AS label FROM deg)"""
    ]
    final = 0
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""sg{r} AS (SELECT l.label, sum(d.k) AS sig
           FROM l{p} l JOIN deg d ON d.node = l.node GROUP BY 1),
    cd{r} AS (SELECT node, label, sum(one) AS kic FROM (
          SELECT e.src AS node, l.label, CAST(1 AS BIGINT) AS one
          FROM edges e JOIN l{p} l ON l.node = e.dst
          UNION ALL
          SELECT node, label, CAST(0 AS BIGINT) FROM l{p}) u
       GROUP BY 1, 2),
    sc{r} AS (SELECT c.node, c.label,
          tot.e2 * c.kic
          - (s.sig - CASE WHEN c.label = cur.label THEN d.k
                          ELSE CAST(0 AS BIGINT) END) * d.k AS score
       FROM cd{r} c
       JOIN sg{r} s ON s.label = c.label
       JOIN deg d ON d.node = c.node
       JOIN l{p} cur ON cur.node = c.node
       CROSS JOIN tot),
    tp{r} AS (SELECT node, max(score) AS m FROM sc{r} GROUP BY 1),
    l{r} AS (SELECT s.node, min(s.label) AS label
       FROM sc{r} s JOIN tp{r} t ON t.node = s.node AND s.score = t.m
       GROUP BY 1)"""
        )
        final = r
    return ",\n    ".join(ctes) + f"\nSELECT node, label FROM l{final}"


@query("louvain_communities", oracle=_louvain_oracle(2))
def louvain_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by one-level Louvain modularity ascent over
    the customer↔supplier trading graph (graph.louvain_one_level, 2
    rounds) — label_propagation's degree-aware sibling: each node moves
    to the candidate community with maximum modularity gain ΔQ, where a
    community is penalized by its total-degree mass Σ_tot, so a
    high-degree hub cannot glue two dense communities the way LPA's
    most-frequent-label vote does (tested head-to-head on the planted
    two-clique fixture in test_graph). Gains are compared as the EXACT
    integer 2m·k_{i,c} − Σ'_tot(c)·k_i (= ΔQ·2m²) — no float ties to
    diverge across engines. Per round: one O(nodes) Σ_tot aggregate,
    one edges⋈labels join + (node, community) hash aggregate for
    k_{i,c}, and ONE combinable min-of-struct (−score, label) argmax
    aggregate (never a window); labels eagerly pinned per round.
    The oracle unrolls the identical rounds (the label_propagation /
    pagerank convention)."""
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
    return gr.louvain_one_level(edges, rounds=2).select(
        gr.decode_typed_node("node").alias("node"),
        gr.decode_typed_node("label").alias("label"),
    )
