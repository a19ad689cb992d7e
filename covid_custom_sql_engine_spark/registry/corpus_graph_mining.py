"""Corpus statistics and graph/pattern mining: collocation PMI, source
overlap, the end-to-end curation pipeline, BFS families, skyline,
a-priori itemsets, session paths, lossless PPJoin similarity joins,
label propagation, privacy/dependency audits, KS drift.

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


@query(
    "collocation_pmi",
    oracle=f"""
    WITH t AS (SELECT {_SQL_TOKS} AS toks FROM documents WHERE len({_SQL_TOKS}) >= 2),
    bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
           FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)),
    big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    l AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
    r AS (SELECT w2, sum(c12) AS c2 FROM big GROUP BY 1),
    n AS (SELECT sum(c12) AS n FROM big)
    SELECT big.w1, big.w2, big.c12::BIGINT AS c12,
           round(ln(big.c12::DOUBLE * n.n / (l.c1::DOUBLE * r.c2)), 6) AS pmi
    FROM big JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
    WHERE big.c12 >= 5
    ORDER BY pmi DESC, w1 ASC, w2 ASC
    LIMIT 50
    """,
)
def collocation_pmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by PMI with a min-support floor
    (corpus.collocation_pmi) — the multi-word-expression detector where
    raw pair counts just resurface stopword pairs. Vocabulary-bounded
    aggregates, slot-marginal equi-joins, 1-row N broadcast, top-k via
    TakeOrdered."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return cp.collocation_pmi(d)


@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH toks AS (SELECT source, string_split({_SQL_NORM}, ' ') AS toks FROM documents),
    sh AS (SELECT source,
                  unnest(list_distinct(CASE WHEN len(toks) >= 3
                    THEN list_transform(range(0, len(toks) - 2),
                                        i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
                    ELSE [array_to_string(toks, ' ')] END)) AS g
           FROM toks),
    f AS (SELECT DISTINCT source, g FROM sh),
    p AS (SELECT a.g, a.source AS source_a, b.source AS source_b
          FROM f a JOIN f b ON a.g = b.g AND a.source < b.source)
    SELECT source_a, source_b, count(*)::BIGINT AS shared_shingles
    FROM p GROUP BY 1, 2
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content-overlap matrix: for every source pair, how
    many distinct word 3-gram shingles both emit — the mirror-site/
    syndication detector that tells a curation pipeline which
    "independent" sources are actually reprinting each other (dedup
    them jointly, or downweight one; exact-dup fingerprints are the
    degenerate all-or-nothing case — shingle overlap grades partial
    reuse too). Same single-shuffle formulation as
    candidate_pairs_from_bands: hash-partition once on the shingle,
    gather each shingle's distinct sources with collect_set, emit
    sorted-array pair combinations with higher-order functions — no
    self-join, and per-shingle state is bounded by |sources|, so a
    boilerplate phrase present in millions of docs still contributes
    O(|sources|²) rows, never O(docs²)."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    fps = d.select(
        "source", F.explode(dd.word_shingles("text")).alias("g")
    ).distinct()
    buckets = (
        fps.groupBy("g")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    return (
        buckets.select(
            F.explode(dd.pair_combinations("srcs", "source_a", "source_b")).alias("p")
        )
        .groupBy("p.source_a", "p.source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_shingles"))
    )


_CURATION_Q_THRESHOLD = 0.45


def _curation_pipeline_oracle() -> str:
    """End-to-end curation pipeline oracle: quality gate → exact dedup
    (min-id per fingerprint) → near-dup CC keep, every input doc
    labeled with the stage that dropped it. The minhash/band chain is
    the shared generator embedded over the post-exact-dedup survivors
    (source='s2'); the corpus is doubled with offset clones (the
    simhash fixture pattern) so the exact-dup stage has real work."""
    thr = _CURATION_Q_THRESHOLD
    mh = _sql_minhash_cte("s2", ", ")
    return f"""
    WITH RECURSIVE d2 AS (SELECT doc_id, text FROM documents
                          UNION ALL
                          SELECT doc_id + 1000000, text FROM documents),
    t0 AS (SELECT doc_id, text, length(text) AS n,
                  list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                              x -> x != '') AS toks
           FROM d2),
    q AS (SELECT doc_id, text,
                 (least(n / 500.0, 1.0)
                  + (1.0 - CASE WHEN n > 0
                                THEN (n - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / n
                                ELSE 0.0 END)
                  + least((CASE WHEN len(toks) > 0
                                THEN len(list_filter(toks, t -> list_contains({_SQL_SW_EN}, t)))
                                     / len(toks)
                                ELSE 0.0 END) * 5.0, 1.0)) / 3.0 AS q
          FROM t0),
    s1 AS (SELECT doc_id, text FROM q WHERE q >= {thr}),
    f AS (SELECT doc_id, text, md5({_SQL_NORM}) AS fp FROM s1),
    k2 AS (SELECT fp, min(doc_id) AS keep_id FROM f GROUP BY fp),
    s2 AS (SELECT f.doc_id, f.text FROM f
           JOIN k2 ON f.fp = k2.fp AND f.doc_id = k2.keep_id)
    {mh},
    edges AS (SELECT id_a AS src, id_b AS dst FROM cand
              UNION SELECT id_b, id_a FROM cand),
    reach(id, r) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
    ),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
    SELECT d2.doc_id,
           CASE WHEN q.q < {thr} THEN 'quality'
                WHEN s2x.doc_id IS NULL THEN 'exact_dup'
                WHEN coalesce(c.component, d2.doc_id) = d2.doc_id THEN 'kept'
                ELSE 'near_dup' END AS stage
    FROM d2
    JOIN q USING (doc_id)
    LEFT JOIN s2 s2x ON d2.doc_id = s2x.doc_id
    LEFT JOIN comp c ON d2.doc_id = c.id
    """


@query("corpus_curation_pipeline", oracle=_curation_pipeline_oracle())
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline END-TO-END, one query: heuristic quality
    gate → exact dedup (min-id representative per normalized
    fingerprint) → MinHash/LSH near-dup clustering with min-id keep —
    every input document labeled with the stage that removed it
    ('quality' | 'exact_dup' | 'near_dup' | 'kept'). The input corpus
    is doubled with offset clones (the simhash fixture pattern;
    documents is fixed-size at driver scale, so the offset cannot
    alias) so the exact-dup stage does real work.

    Stage plans compose exactly as the standalone queries do: the
    quality gate is per-row codegen, exact dedup is one fingerprint
    hash aggregate + equi-join, near-dup is the banded LSH equi-join →
    iterative min-label CC — each stage's input strictly shrinks, and
    nothing in the composition introduces a shuffle the standalone ops
    don't have. This is the flagship composition a user of the
    standalone pieces would actually run nightly."""
    d0 = parallelize_small(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    d2 = d0.unionByName(
        d0.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    # the composition itself is the engine API corpus.curation_pipeline
    # (extracted r6 so it is property-testable on arbitrary corpora);
    # stage pinning lives inside it
    return cp.curation_pipeline(d2, q_threshold=_CURATION_Q_THRESHOLD)


@query(
    "bfs_distances",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    bfs AS (
      SELECT 'c:' || c_custkey AS node, 0 AS dist
      FROM customer WHERE c_custkey <= 3
      UNION
      SELECT e.dst AS node, b.dist + 1 AS dist
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.dist < 3)
    SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM bfs GROUP BY node
    """,
)
def bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the customer↔supplier trading graph — the
    engine's recursive-query surface (graph.bfs_layers; the oracle IS
    a WITH RECURSIVE CTE, and frontier BFS's first-touch distance
    equals the recursion's min(dist) by construction). Sources are the
    customers with c_custkey ≤ 3; edges are the distinct trading pairs
    both directions with the typed 'c:'/'s:' node prefixes
    (pagerank_bipartite's aliasing-proof convention); depth capped at
    3. Per level the engine pays one frontier⋈edges equi-join, one
    distinct, and one anti-join against the visited set — frontier and
    visited eagerly pinned so lineage stays flat (the
    connected-components discipline with a FIXED round count). All
    integer arithmetic: the comparison is exact."""
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
    return gr.bfs_layers(edges, srcs, max_depth=3).select(
        gr.decode_typed_node("node").alias("node"), "dist"
    )


@query(
    "skyline_parts",
    oracle="""
    WITH pp AS (SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
                       p_retailprice + 0.0 AS p_retailprice,
                       CAST(p_size AS BIGINT) AS p_size
                FROM part
                WHERE p_brand = 'Brand#23'
                  AND p_retailprice IS NOT NULL AND p_size IS NOT NULL)
    SELECT p_partkey, p_retailprice, p_size FROM pp p
    WHERE NOT EXISTS (
      SELECT 1 FROM pp q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of one brand's parts — no part in
    the result is both cheaper AND larger than another
    (selection.skyline_2d: minimize p_retailprice, maximize p_size).
    The oracle states the dominance semantics directly (NOT EXISTS, a
    deliberate O(n²) spec); the engine instead runs the distributed
    sort-order sweep — collapse to (distinct price, max size) with one
    combinable hash aggregate, strict prefix-max over price order via
    the two-phase global_rank discipline (range partition + pinned
    exchange + per-physical-partition window keyed on partition id +
    a ≤num_partitions-row carry), then one join back — O(n log n)
    work, never a pairwise comparison, the shape that survives a
    100 TB candidate table where the quadratic spec cannot."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    pt = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select(
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            (F.col("p_retailprice") + F.lit(0.0)).alias("p_retailprice"),
            F.col("p_size").cast("bigint").alias("p_size"),
        )
    )
    return sel.skyline_2d(pt, "p_retailprice", "p_size")


@query(
    "apriori_triples",
    oracle="""
    WITH it AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    fp AS (SELECT a.p AS p1, b.p AS p2 FROM it a JOIN it b ON a.o = b.o AND a.p < b.p
           GROUP BY 1, 2 HAVING count(*) >= 2),
    tri AS (SELECT a.p AS p1, b.p AS p2, c.p AS p3, count(*) AS n_orders
            FROM it a JOIN it b ON a.o = b.o AND a.p < b.p
                      JOIN it c ON a.o = c.o AND b.p < c.p
            JOIN fp f1 ON f1.p1 = a.p AND f1.p2 = b.p
            JOIN fp f2 ON f2.p1 = b.p AND f2.p2 = c.p
            JOIN fp f3 ON f3.p1 = a.p AND f3.p2 = c.p
            GROUP BY 1, 2, 3)
    SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
           CAST(p3 AS BIGINT) AS p3, n_orders
    FROM tri
    ORDER BY n_orders DESC, p1, p2, p3 LIMIT 20
    """,
)
def apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets with A-PRIORI candidate pruning — the
    market-basket step beyond frequent_part_pairs: a part triple
    qualifies only if EVERY cohabiting pair inside it is itself
    frequent (support ≥ 2 orders) — the downward-closure property that
    makes frequent-itemset mining tractable at scale. The engine
    prunes EARLY: the (p1, p2) leg is gated on the broadcast frequent-
    pair set BEFORE the third self-join fans out (at sf0.01 that cuts
    the candidate stream from ~157k raw triples to the ~3% whose
    first pair is frequent), then the (p1, p3)/(p2, p3) gates run as
    two more broadcast semi-joins before the counting aggregate — the
    oracle applies the same three gates after generation, same final
    set. Top 20 by (support, keys): a total order, so the row set is
    deterministic. At 100 TB the frequent-pair set is the small side
    by construction (HAVING ≥ minsup) and broadcasts; the self-joins
    shuffle on the order key only."""
    it = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"),
            F.col("l_partkey").cast("bigint").alias("p"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = it.select(F.col("o").alias("oa"), F.col("p").alias("p1"))
    b = it.select(F.col("o").alias("ob"), F.col("p").alias("p2"))
    c = it.select(F.col("o").alias("oc"), F.col("p").alias("p3"))
    prs = a.join(
        b, (F.col("oa") == F.col("ob")) & (F.col("p1") < F.col("p2"))
    ).select("oa", "p1", "p2")
    fp = (
        prs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("p1", "p2")
        .localCheckpoint(eager=False)
    )
    # gate 1 BEFORE the fan-out join: only frequent first-pairs expand
    pruned = prs.join(F.broadcast(fp), ["p1", "p2"], "left_semi")
    tri = pruned.join(
        c, (F.col("oa") == F.col("oc")) & (F.col("p2") < F.col("p3"))
    ).select("oa", "p1", "p2", "p3")
    # gates 2+3: the remaining sub-pairs must be frequent too
    tri = tri.join(
        F.broadcast(fp.select(F.col("p1").alias("p2"), F.col("p2").alias("p3"))),
        ["p2", "p3"],
        "left_semi",
    ).join(
        F.broadcast(fp.select("p1", F.col("p2").alias("p3"))),
        ["p1", "p3"],
        "left_semi",
    )
    counted = tri.groupBy("p1", "p2", "p3").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return counted.orderBy(
        F.col("n_orders").desc(), "p1", "p2", "p3"
    ).limit(20)


@query(
    "top_session_paths",
    oracle="""
    WITH o AS (SELECT event_id, user_id, ts, event_type,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
               FROM events),
    m AS (SELECT *, CASE WHEN pts IS NULL OR ts >= pts + INTERVAL '15 minutes'
                         THEN 1 ELSE 0 END AS new_s FROM o),
    s AS (SELECT event_id, user_id, ts, event_type,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM m),
    r AS (SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                                       ORDER BY ts, event_id) AS rn FROM s),
    paths AS (SELECT user_id, session_id,
                     string_agg(event_type, '>' ORDER BY rn) AS path
              FROM r WHERE rn <= 5 GROUP BY user_id, session_id)
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 15
    """,
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream sequence mining: the most common session PATHS —
    each session's first ≤5 event types in time order, joined into one
    'a>b>c' string — ranked by session count (the funnel-discovery
    complement of event_transitions' pairwise matrix: paths show WHOLE
    journeys, transitions show edges). Sessionization is the 15-minute
    gaps-and-islands rule of session_ids, re-derived here so the query
    is self-contained.

    Plan: ONE shuffle on user_id serves the lag pass, the running-sum
    pass, the per-session row_number, AND the per-session path
    aggregate (grouping on (user_id, session_id) is satisfied by the
    existing user_id hash distribution — no second exchange; the
    order-sensitive collect is made deterministic by sorting the
    collected (rn, type) structs, never by collect order). The path
    histogram then shuffles ≤ distinct-path rows, and top-15 by
    (count, path) — a total order — is a TakeOrdered, never a global
    sort. Path length is capped at 5 so the path string is bounded
    state per session at any scale."""
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
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.sum(new_s).over(run).alias("session_id"),
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    )
    paths = (
        s.withColumn("rn", rn)
        .filter(F.col("rn") <= 5)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda t: t["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(15)
    )


@query(
    "prefix_jaccard_pairs",
    oracle=f"""
    WITH t0 AS (SELECT doc_id, list_distinct({_SQL_TOKS}) AS t
                FROM documents WHERE doc_id < 1000),
    t AS (SELECT doc_id, t FROM t0 WHERE len(t) > 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.t, b.t))), 6) AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
          / len(list_distinct(list_concat(a.t, b.t))) >= 0.95
    """,
)
def prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard similarity join via prefix filtering
    (dedup.prefix_filter_pairs — the AllPairs/PPJoin candidate rule,
    Bayardo et al. 2007): every pair of documents with token-set
    Jaccard ≥ 0.95, found WITHOUT an all-pairs product. Unlike the
    df-capped shingle index (ngram_jaccard_pairs, which can MISS pairs
    whose shared shingles are all frequent) or MinHash banding
    (probabilistic), prefix filtering is provably lossless: a
    qualifying pair's smallest-global-order shared token always lands
    in both documents' rarity-ordered prefixes — so the ORACLE is the
    pure all-pairs SPEC with no algorithm mirrored, the strongest
    oracle shape in the registry. Each document contributes only
    ~|T|·(1−τ)+1 of its RAREST tokens to the posting join, so per-token
    fan-out is small by construction at any corpus size. Corpus capped
    at doc_id < 1000 so the oracle's quadratic spec stays cheap; the
    engine path has no such need (SCALE.md measures it uncapped)."""
    d = parallelize_small(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") < 1000
    )
    out = dd.prefix_filter_pairs(d, threshold=0.95)
    return out.select("id_a", "id_b", "jaccard")


@query(
    "prefix_jaccard_zipf",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 2000),
    t0 AS (SELECT doc_id,
                  ['t' || k for k in range(2, 50) if doc_id % k = 0] AS t
           FROM d),
    t AS (SELECT doc_id, t FROM t0 WHERE len(t) >= 2)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.t, b.t))), 6) AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
          / len(list_distinct(list_concat(a.t, b.t))) >= 0.7
    """,
)
def prefix_jaccard_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prefix_filter_pairs on a ZIPFIAN-vocabulary corpus — the regime
    prefix filtering is built for, driver-verified uncapped through all
    three lossless prunes (prefix + length + positional). The real
    sf* documents corpus has a tiny uniform vocabulary (~24% of all
    pairs qualify — no index can prune that), so prefix_jaccard_pairs
    caps at 1k docs to keep its quadratic spec oracle cheap. Here the
    corpus is synthesized deterministically INSIDE both engines from
    doc_id arithmetic: token ``t{k}`` (k in 2..49) appears in doc i iff
    k divides i, so token k's document frequency is N/k — an exact
    harmonic (Zipf slope −1) profile, integer-only and bit-identical
    across engines. The TRUE pair set at τ=0.7 is small, so the oracle
    stays the pure all-pairs SPEC with no cap and no algorithm
    mirrored (~500 pairs at sf0.01, ~13k at sf0.1)."""
    d = parallelize_small(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    )
    toks = F.filter(
        F.transform(
            F.sequence(F.lit(2), F.lit(49)),
            lambda k: F.when(
                F.col("doc_id") % k == 0, F.concat(F.lit("t"), k)
            ),
        ),
        lambda x: x.isNotNull(),
    )
    corp = (
        d.select("doc_id", toks.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select("doc_id", F.array_join("tk", " ").alias("text"))
    )
    out = dd.prefix_filter_pairs(corp, threshold=0.7)
    return out.select("id_a", "id_b", "jaccard")


def _label_prop_oracle(rounds: int = 2) -> str:
    """Unrolled label-propagation rounds over the bipartite trading
    graph — each round is the same vote→max-count→min-label→left-join
    block the engine runs (graph.label_propagation)."""
    ctes = [
        """WITH pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    l0 AS (SELECT node, node AS label FROM
           (SELECT src AS node FROM edges UNION SELECT dst FROM edges))"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""v{r} AS (SELECT e.dst AS node, l.label, count(*) AS n
           FROM l{p} l JOIN edges e ON e.src = l.node GROUP BY 1, 2),
    t{r} AS (SELECT node, max(n) AS m FROM v{r} GROUP BY node),
    b{r} AS (SELECT v{r}.node, min(v{r}.label) AS new
           FROM v{r} JOIN t{r} ON t{r}.node = v{r}.node AND v{r}.n = t{r}.m
           GROUP BY v{r}.node),
    l{r} AS (SELECT l{p}.node, coalesce(b{r}.new, l{p}.label) AS label
           FROM l{p} LEFT JOIN b{r} ON b{r}.node = l{p}.node)"""
        )
        final = r
    return ",\n    ".join(ctes) + f"\nSELECT node, label FROM l{final}"


@query("label_propagation_communities", oracle=_label_prop_oracle(2))
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    customer↔supplier trading graph (graph.label_propagation, 2
    rounds): every node starts as its own community, then adopts the
    most frequent in-neighbor label, ties toward the smaller label —
    the deterministic variant of an algorithm usually run with random
    tie-breaks, so the oracle unrolls the identical rounds (the
    k-means/pagerank convention). Per round: one O(nodes)⋈edges
    equi-join, one (node, label) hash aggregate, one combinable
    max-count + min-label argmax (never a window), one left join back
    — the connected-components shuffle profile with a FIXED round
    count, labels eagerly pinned per round."""
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
    return gr.label_propagation(edges, rounds=2).select(
        gr.decode_typed_node("node").alias("node"),
        gr.decode_typed_node("label").alias("label"),
    )


@query(
    "l_diversity_audit",
    oracle="""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               count(*) AS sz,
               count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS l
        FROM customer GROUP BY 1, 2
    )
    SELECT 3 AS l,
           count(*) AS n_groups,
           sum(CASE WHEN l < 3 THEN 1 ELSE 0 END)::BIGINT AS n_homogeneous_groups,
           sum(CASE WHEN l < 3 THEN sz ELSE 0 END)::BIGINT AS n_exposed_rows,
           round(sum(CASE WHEN l < 3 THEN sz ELSE 0 END)::DOUBLE / sum(sz), 6)
             AS exposed_row_frac,
           CAST(min(l) AS BIGINT) AS min_l
    FROM g
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second privacy gate after k_anonymity_audit: k-anonymity
    stops re-identification of a ROW but not attribute disclosure — a
    quasi-identifier group where everyone shares the same sensitive
    value leaks it to anyone who can place a person in the group.
    ℓ-diversity requires ≥ ℓ distinct sensitive values (here the
    coarse account-balance band, floor(acctbal/1000)) per
    (nation, segment) equivalence class; reported: groups below ℓ=3,
    rows exposed by them, and the corpus-wide minimum ℓ. Same plan
    economics as the k gate — one hash aggregate bounded by QI
    cardinality (count DISTINCT inside the group is a per-group
    shuffle-free partial) + a ≤groups fold."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct(band).alias("l"),
    )
    exposed = F.when(F.col("l") < 3, F.col("sz")).otherwise(0)
    return g.agg(
        F.lit(3).alias("l"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0)).alias(
            "n_homogeneous_groups"
        ),
        F.sum(exposed).cast("bigint").alias("n_exposed_rows"),
        F.round(
            F.sum(exposed).cast("double") / F.sum("sz"), 6
        ).alias("exposed_row_frac"),
        F.min("l").cast("bigint").alias("min_l"),
    )


@query(
    "fd_audit",
    oracle="""
    WITH f1 AS (SELECT c_name AS lhs, CAST(c_nationkey AS VARCHAR) AS rhs
                FROM customer),
    f2 AS (SELECT CAST(c_nationkey AS VARCHAR) AS lhs, c_mktsegment AS rhs
           FROM customer),
    f3 AS (SELECT p_type AS lhs, p_brand AS rhs FROM part),
    a AS (SELECT 'c_name->c_nationkey' AS fd, lhs, count(DISTINCT rhs) AS k,
                 count(*) AS sz FROM f1 GROUP BY lhs
          UNION ALL
          SELECT 'c_nationkey->c_mktsegment', lhs, count(DISTINCT rhs), count(*)
          FROM f2 GROUP BY lhs
          UNION ALL
          SELECT 'p_type->p_brand', lhs, count(DISTINCT rhs), count(*)
          FROM f3 GROUP BY lhs)
    SELECT fd,
           count(*) AS n_lhs_groups,
           sum(CASE WHEN k > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating_groups,
           sum(CASE WHEN k > 1 THEN sz ELSE 0 END)::BIGINT AS n_violating_rows,
           CAST(max(k) AS BIGINT) AS max_rhs_distinct,
           CAST(max(k) AS BIGINT) = 1 AS holds
    FROM a GROUP BY fd
    """,
)
def fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — the schema-inference side of data
    profiling: for each candidate FD lhs→rhs, count the lhs groups
    carrying more than one distinct rhs (violations), the rows inside
    them, and whether the dependency HOLDS exactly. Candidates here:
    c_name→c_nationkey (holds — names are unique, so every key FD
    passes), c_nationkey→c_mktsegment and p_type→p_brand (both
    violated — the counter-examples prove the audit distinguishes).
    Per candidate: one hash aggregate on the lhs (count-distinct rhs is
    a per-group partial) + a ≤groups fold — the k_anonymity_audit plan
    economics, unioned across candidates so one scan pass per FD."""
    pt = load_table(spark, sf_dir, "part")
    cu = load_table(spark, sf_dir, "customer")
    parts = [
        cu.select(
            F.lit("c_name->c_nationkey").alias("fd"),
            F.col("c_name").alias("lhs"),
            F.col("c_nationkey").cast("string").alias("rhs"),
        ),
        cu.select(
            F.lit("c_nationkey->c_mktsegment").alias("fd"),
            F.col("c_nationkey").cast("string").alias("lhs"),
            F.col("c_mktsegment").alias("rhs"),
        ),
        pt.select(
            F.lit("p_type->p_brand").alias("fd"),
            F.col("p_type").alias("lhs"),
            F.col("p_brand").alias("rhs"),
        ),
    ]
    a = (
        parts[0]
        .unionAll(parts[1])
        .unionAll(parts[2])
        .groupBy("fd", "lhs")
        .agg(
            F.countDistinct("rhs").alias("k"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    viol = F.when(F.col("k") > 1, 1).otherwise(0)
    return a.groupBy("fd").agg(
        F.count(F.lit(1)).alias("n_lhs_groups"),
        F.sum(viol).cast("bigint").alias("n_violating_groups"),
        F.sum(F.when(F.col("k") > 1, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_violating_rows"),
        F.max("k").cast("bigint").alias("max_rhs_distinct"),
        (F.max("k").cast("bigint") == 1).alias("holds"),
    )


@query(
    "ks_drift_promo",
    oracle="""
    WITH j AS (SELECT l.l_extendedprice AS v,
                      CASE WHEN p.p_type LIKE 'PROMO%' THEN 'promo'
                           ELSE 'other' END AS g
               FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
               WHERE l.l_extendedprice IS NOT NULL),
    pv AS (SELECT v,
                  sum(CASE WHEN g = 'promo' THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN g = 'other' THEN 1 ELSE 0 END) AS cb
           FROM j GROUP BY v),
    c AS (SELECT sum(ca) OVER w AS fa, sum(cb) OVER w AS fb
          FROM pv WINDOW w AS (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    t AS (SELECT CAST(sum(CASE WHEN g = 'promo' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN g = 'other' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM j)
    SELECT t.n_a, t.n_b,
           round(max(abs(c.fa::DOUBLE / t.n_a - c.fb::DOUBLE / t.n_b)), 6)
             AS d_stat
    FROM c, t GROUP BY t.n_a, t.n_b
    """,
)
def ks_drift_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift test
    (selection.ks_statistic): D = sup|ECDF_promo − ECDF_other| over
    lineitem extended prices, promo-typed parts vs the rest — the
    non-bucketed, bin-free counterpart of split_divergence's PSI/KL
    monitors (sensitive to any distributional shift, no edge choices
    to defend). The supremum needs a GLOBAL cumulative count, which
    the oracle writes as the single-partition window it semantically
    is; the engine instead collapses to per-distinct-value counts and
    runs the pinned two-phase prefix-sum (the global_rank/skyline
    discipline) — the reduced frame shuffles once, the carry is
    ≤num_partitions rows, and no stage ever funnels the data through
    one task."""
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
    return sel.ks_statistic(j, "v", "g", "promo", "other")


@query(
    "bfs_shortest_path_tree",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    bfs AS (
      SELECT 'c:' || c_custkey AS node, 0 AS dist,
             CAST(NULL AS VARCHAR) AS parent
      FROM customer WHERE c_custkey <= 3
      UNION
      SELECT e.dst AS node, b.dist + 1 AS dist, b.node AS parent
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.dist < 3),
    mn AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY node)
    SELECT mn.node, CAST(mn.dist AS BIGINT) AS dist, min(b.parent) AS parent
    FROM mn JOIN bfs b ON b.node = mn.node AND b.dist = mn.dist
    GROUP BY mn.node, mn.dist
    """,
)
def bfs_shortest_path_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bfs_distances with PATH RECONSTRUCTION (graph.bfs_tree): every
    reached node also carries its tree parent — the smallest frontier
    node that first touched it (deterministic min-label tie-break,
    NULL for sources) — so any node's actual route back to a source
    is walkable ("HOW is this supplier 3 hops from customer 2?"). The
    oracle extends the recursive CTE with an arg-min parent selection
    at each node's minimum distance; a parent recorded at a node's
    first-touch level provably has minimum distance exactly one less
    (any shorter parent would have touched the node earlier), so the
    two formulations agree exactly. Same per-level plan as bfs_layers
    plus one combinable min aggregate on the frontier join."""
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
    return gr.bfs_tree(edges, srcs, max_depth=3).select(
        gr.decode_typed_node("node").alias("node"),
        "dist",
        gr.decode_typed_node("parent").alias("parent"),
    )
