"""Iterative graph algorithms beyond connected components.

The reference engine (src/dataframe.py — batch relational ops only) has
no graph surface; at training-data scale, link analysis over derived
graphs (domain→domain, doc→doc citation, user→item) ranks sources for
curation. PageRank here is the representative: the per-iteration work
is ONE equi-join (ranks ⋈ edges on src) plus ONE hash aggregate (sum of
contributions by dst) — exactly the shuffle profile of connected
components' min-label rounds (functions/dedup.py), so everything said
there about 100 TB behavior carries over: state is O(nodes), each round
shuffles O(edges) grouped rows with map-side combine, and iteration
count is a fixed hyper-parameter (not data-dependent like CC's
diameter).

Determinism: rank updates fold contributions through DECIMAL(38,18)
(order-independent sums — same convention as BM25's score fold), and
every other arithmetic step is per-row IEEE double, so ranks are
bit-identical across partitionings, cluster sizes, and engines — the
DuckDB oracle unrolls the same iterations and hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

PR_DECIMAL = "decimal(38,18)"

# ---------------------------------------------------------------------------
# Order-preserving typed-node codec (optimization r13, guide §2.3)
#
# The trading-graph queries decorate integer keys as 'c:<custkey>' /
# 's:<suppkey>' strings so the two key spaces can never alias. Those
# strings used to ride EVERY per-round exchange of the iterative
# algorithms (~150 MB of key bytes per query at sf0.1; string hashing +
# comparison on every shuffle). The codec below packs the decorated id
# into ONE bigint whose numeric order equals the decorated string's
# lexicographic order, so the rounds shuffle/hash/compare 8-byte longs
# and the string is rebuilt ONCE in the final projection:
#
#   enc(side, k) = side·2^50 + pad(k)·16 + digits(k)
#   pad(k)       = k · 10^(12 − digits(k))      (k right-padded to 12
#                                                decimal digits)
#
# Order proof: (a) 'c:…' < 's:…' for every key pair, and side 0 < 1
# dominates the encoding. (b) Within a side, comparing decimal strings
# lexicographically equals comparing them right-padded with zeros to a
# common width — except when the padded forms tie, where the SHORTER
# string sorts first ('2' < '20' but both pad to '20'); pad() is the
# padded form as an integer and the digit count breaks exactly those
# ties (digits < 16, so it never disturbs the pad·16 ordering).
# Injectivity follows from (pad, digits) ⇒ k. MIN/MAX aggregates and
# lexicographic struct tie-breaks over encoded ids therefore pick the
# same winners as over the decorated strings, and decode(encode(k)) is
# the identity — results are bit-identical.
#
# Preconditions (asserted by the key domain, not checked per row):
# keys are non-negative integers < 10^12 (TPC-H custkey at that bound
# is scale factor ~6.6M ≈ 660 PB) — pad < 10^12, pad·16 < 2^44 < 2^50.
# ---------------------------------------------------------------------------

_NODE_MAXD = 12
_SIDE_BASE = 1 << 50
# element_at is 1-based: element_at(_POW10, i) == 10^(i-1)
_POW10 = [10**i for i in range(_NODE_MAXD + 1)]


def encode_typed_key(key: Column | str, side: int) -> Column:
    """Encode integer ``key`` of key-space ``side`` (0 = 'c:', 1 = 's:')
    into the order-preserving bigint described above. NULL keys encode
    to NULL (matching ``concat('c:', NULL)``)."""
    c = F.col(key) if isinstance(key, str) else key
    k = c.cast("bigint")
    d = F.length(k.cast("string"))
    pow10 = F.array(*[F.lit(p).cast("bigint") for p in _POW10])
    pad = k * F.element_at(pow10, (F.lit(_NODE_MAXD + 1) - d).cast("int"))
    return F.shiftleft(pad, 4) + d.cast("bigint") + F.lit(side * _SIDE_BASE)


def decode_typed_node(
    enc: Column | str, prefixes: tuple[str, str] = ("c:", "s:")
) -> Column:
    """Inverse of :func:`encode_typed_key`: rebuild the decorated
    '<prefix><key>' string from an encoded node id (NULL → NULL). The
    digit count recovers the key as the first ``d`` characters of the
    padded integer's decimal string — no division, pure projection."""
    c = F.col(enc) if isinstance(enc, str) else enc
    f = c.bitwiseAND(F.lit(_SIDE_BASE - 1))
    d = f.bitwiseAND(F.lit(15)).cast("int")
    pad = F.shiftright(f, 4)
    key_str = F.left(pad.cast("string"), d)
    pfx = F.when(
        c.bitwiseAND(F.lit(_SIDE_BASE)) != 0, F.lit(prefixes[1])
    ).otherwise(F.lit(prefixes[0]))
    return F.concat(pfx, key_str)


def _dsum18(c) -> F.Column:
    return F.sum(c.cast(PR_DECIMAL)).cast("double")


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list, statically unrolled.

    ``edges`` must contain every node as a source at least once, i.e.
    out-degree ≥ 1 — so no dangling-node redistribution term is needed
    (for an undirected graph, pass both directions; this is the
    contract, not a checked precondition, because checking costs a
    scan). Zero IN-degree is fine: a source-only node keeps its
    (1−d)/N teleport mass each round via the node-list left join.

    Plan shape per iteration: ranks ⋈ edges equi-join on src (ranks is
    O(nodes); at 100 TB both sides shuffle on the key — or ranks
    broadcasts while it fits), then a hash aggregate of contributions
    keyed by dst with map-side combine, then the damping projection
    against the 1-row node-count broadcast. The edge list and its
    degree table feed every iteration, so both are pinned once
    (lazy localCheckpoint — the multi-consumer-subtree pattern used by
    semdedup_prune and bm25_topk).

    Returns (node, rank) with Σ rank = 1 up to fold precision.
    """
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # weight each edge once: contribution factor 1/out_deg travels WITH
    # the edge so the per-iteration join needs no second degree join
    ew = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .localCheckpoint(eager=False)
    )
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=False
    )
    cnt = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("_n")))
    ranks = nodes.crossJoin(cnt).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(iterations):
        contribs = ranks.join(ew, ranks.node == ew.src).select(
            F.col("dst"), (F.col("rank") * F.col("w")).alias("_c")
        )
        agg = contribs.groupBy(F.col("dst").alias("node")).agg(
            _dsum18(F.col("_c")).alias("_s")
        )
        # LEFT join from the node list: a node with zero in-degree (a
        # directed graph's source-only node) receives no contributions
        # but must keep its (1−d)/N teleport mass — a bare groupBy on
        # dst would silently drop it from the vector and leak its
        # outgoing mass from every later iteration.
        ranks = (
            nodes.join(agg, "node", "left")
            .crossJoin(cnt)
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("_n")
                    + damping * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def triangle_counts(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Per-vertex triangle counts over an undirected simple graph given
    as canonical distinct edges (a < b, one row per edge).

    Uses the degree-ordered orientation (the classical trick behind
    every at-scale triangle counter): orient each edge from the
    endpoint that is smaller in the total order (degree, vertex-id) to
    the larger. Every wedge is then generated only at its
    smallest-ordered vertex, so a vertex of degree d contributes
    C(out_deg, 2) wedges with out_deg ≤ O(√m) on any graph — a heavy
    hub's fan-out is bounded by construction instead of exploding
    quadratically. Each triangle is emitted exactly once (at its
    ordering-minimal vertex) and closed by ONE equi-join against the
    oriented edge list on (v, w).

    Every step is an equi-join or hash aggregate; the oriented edge
    list has three consumers (both wedge branches and the closing join)
    so it is pinned once. Output: (vertex, n_triangles) for every
    vertex in ≥1 triangle; the global count is sum/3.
    """
    e = edges.select(F.col(a_col).alias("pa"), F.col(b_col).alias("pb"))
    und = e.select(
        F.explode(
            F.array(
                F.struct(F.col("pa").alias("src"), F.col("pb").alias("dst")),
                F.struct(F.col("pb").alias("src"), F.col("pa").alias("dst")),
            )
        ).alias("x")
    ).select("x.src", "x.dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("src").alias("_a"), F.col("d").alias("_da"))
    db = deg.select(F.col("src").alias("_b"), F.col("d").alias("_db"))
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("pa") < F.col("pb"))
    )
    orient = (
        e.join(da, F.col("pa") == F.col("_a"))
        .join(db, F.col("pb") == F.col("_b"))
        .select(
            F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
            F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
            F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("dd"),
        )
        .localCheckpoint(eager=False)
    )
    o1 = orient.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("dd").alias("dv")
    )
    o2 = orient.select(
        F.col("src").alias("u2"), F.col("dst").alias("w"), F.col("dd").alias("dw")
    )
    wedges = o1.join(o2, F.col("u") == F.col("u2")).filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    tri = wedges.join(
        orient.select("src", "dst"),
        (F.col("v") == F.col("src")) & (F.col("w") == F.col("dst")),
        "left_semi",
    ).select("u", "v", "w")
    return (
        tri.select(
            F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias(
                "vertex"
            )
        )
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities, statically unrolled.

    ``edges`` is the directed hub→authority list (for a bipartite
    purchase graph: customer→supplier). Each iteration: authority(v) =
    Σ hub(u) over in-edges, hub(u) = Σ authority(v) over out-edges —
    two equi-join + combinable-aggregate rounds, the same shuffle
    profile as :func:`pagerank` — then each score vector is L1-
    normalized against its 1-row fold (the whitelisted scalar-broadcast
    pattern). All sums fold through DECIMAL(38,18); the normalizing
    division is one IEEE op on identical doubles, so scores are
    bit-identical across engines and partitionings.

    Returns (node, side ∈ {'hub','authority'}, score).
    """
    if iterations < 1:
        raise ValueError(
            "hits needs iterations >= 1 (authority scores only exist "
            f"after a propagation round), got {iterations}"
        )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)

    def normalize(df, col):
        tot = F.broadcast(df.agg(_dsum18(F.col(col)).alias("_t")))
        return df.crossJoin(tot).select(
            "node", (F.col(col) / F.col("_t")).alias(col)
        )

    hubs = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("h")
    )
    for _ in range(iterations):
        # pin each round: hubs_i feeds auth_{i+1}; auth_i feeds BOTH
        # hubs_{i+1} and (on the last round) the output union — without
        # the pin the shared chain re-executes per consumer and the
        # plan doubles per iteration (same idiom as
        # dedup.connected_components' per-round checkpoint)
        auth = normalize(
            e.join(hubs, e.src == hubs.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(_dsum18(F.col("h")).alias("a")),
            "a",
        ).localCheckpoint(eager=False)
        hubs = normalize(
            e.join(auth, e.dst == auth.node)
            .groupBy(F.col("src").alias("node"))
            .agg(_dsum18(F.col("a")).alias("h")),
            "h",
        ).localCheckpoint(eager=False)
    return hubs.select(
        "node", F.lit("hub").alias("side"), F.col("h").alias("score")
    ).unionAll(
        auth.select(
            "node", F.lit("authority").alias("side"), F.col("a").alias("score")
        )
    )


def bfs_layers(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Multi-source breadth-first search over a directed edge list:
    returns (node, dist) where dist is the minimum hop count from ANY
    source node, expanded level-by-level up to ``max_depth`` — the
    engine's recursive-query surface (a SQL engine would write this as
    a WITH RECURSIVE CTE; the DuckDB oracle does exactly that, and
    frontier-BFS's first-touch distance equals the recursion's
    ``min(dist)`` by construction). Reachability radius, contamination
    blast-zones ("everything within 2 hops of a flagged domain"), and
    curation link-depth caps are all this query shape.

    Plan shape per level — the connected-components discipline
    (dedup.connected_components), NOT its data-dependent round count:
    one equi-join of the current frontier against the edge list on the
    source key (frontier is O(new nodes); at 100 TB it broadcasts
    while small, shuffles on the key once it isn't — AQE's call), one
    distinct (hash aggregate with map-side combine), and one LEFT ANTI
    join against the visited set to drop already-reached nodes. Both
    the frontier and the visited set are pinned with an eager
    localCheckpoint every level, so lineage stays flat across levels
    and no subtree is ever re-evaluated under a different partitioning
    (the iterative-state convention everywhere in this repo). Levels
    are a FIXED hyper-parameter, with an early exit the moment a
    frontier comes back empty — one take(1) against an
    already-materialized checkpoint, not an extra job.

    ``sources`` rows need not appear in ``edges``: an isolated source
    sits in the result at dist 0, matching the recursive CTE's anchor
    member. Every distance is exact integer arithmetic — no float
    folds — so the oracle comparison is exact.
    """
    e = edges.select(
        F.col(src_col).alias("_esrc"), F.col(dst_col).alias("_edst")
    ).localCheckpoint(eager=False)
    visited = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.node == F.col("_esrc"))
            .select(F.col("_edst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(d).cast("bigint"))
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def label_propagation(
    edges: DataFrame,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts as its own community (label = node id's min over... itself),
    and each round every node adopts the most frequent label among its
    IN-neighbors, ties broken toward the smaller label; nodes with no
    in-edges keep their current label. ``rounds`` is a fixed
    hyper-parameter, so a SQL oracle unrolls the identical rounds —
    the deterministic-by-construction variant of an algorithm usually
    run with random tie-breaks (same design choice as the id-seeded
    k-means family).

    Per-round plan: ONE equi-join of the O(nodes) label vector against
    the edge list on src, ONE (dst, label) hash aggregate with
    map-side combine, ONE per-dst argmax via min-of-struct
    (−count, label) — a single combinable aggregate, no window, no
    max/join/filter re-aggregate — and a LEFT join back to the node
    list so isolated-in-degree nodes persist. Labels are pinned per
    round (eager localCheckpoint) — flat lineage, single evaluation,
    the iterative-state convention. Tie-breaks compare label order:
    string labels order lexicographically identically in Spark and the
    oracle (plain ASCII node ids), and the r13 encoded-long ids
    (:func:`encode_typed_key`) preserve exactly that order by
    construction, so the comparison is exact either way.

    Returns (node, label) — nodes sharing a label share a community.
    """
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionAll(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(rounds):
        votes = (
            labels.join(e, labels.node == F.col("_s"))
            .groupBy(F.col("_d").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        # per-node argmax: ONE combinable min aggregate over
        # (−count, label) structs — lexicographic struct comparison
        # gives max count first, then MIN label among ties (counts are
        # positive bigints, so the negation is exact), replacing the
        # former max-count aggregate + equi-join + min-at-max
        # re-aggregate (optimization r12: one shuffle and one join
        # fewer per round; votes now has a single consumer, so its
        # pin is gone too). Never a window, never float equality.
        best = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_n")).alias("_nn"),
                        F.col("label").alias("_l"),
                    )
                ).alias("_b")
            )
            .select("node", F.col("_b._l").alias("_new"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_new"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def sssp_bounded(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    node_col: str = "node",
) -> DataFrame:
    """Bounded-hop multi-source shortest paths — Bellman-Ford with a
    FIXED number of relaxation rounds: after round k every node holds
    the exact minimum-cost path using ≤ k edges (the weighted sibling
    of :func:`bfs_layers`, which this reduces to at unit weights).
    ``rounds`` is a hyper-parameter, so a SQL oracle unrolls the
    identical rounds — the label_propagation convention; full SSSP is
    the same loop run to the graph diameter with the BFS early-exit.

    Per-round plan: ONE equi-join of the O(reached-nodes) distance
    vector against the edge list on src, then ONE min hash aggregate
    over (current ∪ relaxed) — every shuffle on the node key,
    map-side combinable. Distances are pinned per round (eager
    localCheckpoint, flat lineage). Integer weights → exact
    cross-engine comparison, no float-sum ordering anywhere.

    Returns (node, dist) for every node reachable within ``rounds``
    edges; unreached nodes are absent (the BFS convention).
    """
    e = edges.select(
        F.col(src_col).alias("_s"),
        F.col(dst_col).alias("_d"),
        F.col(weight_col).alias("_w"),
    ).localCheckpoint(eager=False)
    dist = sources.select(
        F.col(node_col).alias("node"),
        F.lit(0).cast("bigint").alias("dist"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = dist.join(e, dist.node == F.col("_s")).select(
            F.col("_d").alias("node"),
            (F.col("dist") + F.col("_w")).alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def bfs_tree(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """:func:`bfs_layers` with PATH RECONSTRUCTION: returns
    (node, dist, parent) where ``parent`` is the smallest frontier
    node that first reached this node (deterministic tie-break, the
    min-label convention) and NULL for sources — the shortest-path
    tree, enough to walk any node's actual route back to its source
    ("HOW is this domain 2 hops from the flagged one?", not just that
    it is). Identical plan shape per level as bfs_layers plus one
    min-aggregate on the frontier join's output; the oracle unrolls as
    the same recursive CTE extended with arg-min parent selection at
    each node's minimum distance.
    """
    e = edges.select(
        F.col(src_col).alias("_esrc"), F.col(dst_col).alias("_edst")
    ).localCheckpoint(eager=False)
    # the NULL source-parent takes the NODE column's own type (string
    # ids and the r13 encoded-long ids both work)
    node_type = sources.select(F.col(node_col).alias("node")).schema[
        "node"
    ].dataType
    visited = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .withColumn("parent", F.lit(None).cast(node_type))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.node == F.col("_esrc"))
            .groupBy(F.col("_edst").alias("node"))
            .agg(F.min(F.col("_esrc")).alias("parent"))
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(d).cast("bigint"))
            .select("node", "dist", "parent")
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` synchronous rounds of
    "drop every node with degree < k, restrict edges to survivors".
    After enough rounds this converges to the exact k-core (the
    maximal subgraph where every node has degree ≥ k); with a FIXED
    round count the result is a deterministic over-approximation
    whose SQL oracle unrolls the identical rounds — the
    label_propagation / sssp_bounded convention. The bounded form is
    also what a 100 TB run would ship: each peel is one combinable
    degree aggregate plus two semi-joins, and the frame only ever
    SHRINKS, so round cost is monotonically decreasing (unlike
    frontier algorithms whose state grows).

    ``edges`` must be symmetric (both directions present — the
    bipartite-graph convention used by pagerank/bfs here), so degree
    is the out-degree on ``src``. Per round: ONE groupBy(src).count
    (map-side combinable), a filter to ``deg >= k``, and two
    semi-joins restricting the edge list on src and dst; the shrunken
    edge list is pinned (eager localCheckpoint) so the next round's
    degree count and the joins read one frozen evaluation.

    Returns (node, degree) for nodes surviving all rounds, with their
    residual degree (which can be < k until the peel has converged —
    exactly what the unrolled oracle computes).
    """
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        keep = (
            e.groupBy("_s")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") >= k)
            .select("_s")
        )
        e = (
            e.join(keep, "_s", "left_semi")
            .join(keep.withColumnRenamed("_s", "_d"), "_d", "left_semi")
            .select("_s", "_d")
            .localCheckpoint(eager=True)
        )
    return e.groupBy(F.col("_s").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )


def adamic_adar(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Seeded Adamic–Adar link prediction over a bipartite graph:
    for each seed node u (left side), score every other left node v
    sharing at least one right-side neighbor w by
    AA(u,v) = Σ_{w ∈ Γ(u)∩Γ(v)} 1 / ln(deg(w)) — common neighbors,
    down-weighting promiscuous hubs logarithmically (Adamic & Adar
    2003). The standard "who else behaves like these accounts /
    which documents co-cite like this set" screen; in a training-data
    pipeline it ranks candidate near-duplicate SOURCES sharing many
    low-fanout mirrors.

    Seeding is the scale posture: the all-pairs AA join explodes
    through hub neighbors (Σ_w deg(w)²), so the API takes an explicit
    (small, broadcastable) seed frame and fans out ONLY through the
    seeds' neighborhoods — cost Σ_{w ∈ Γ(seeds)} deg(w), linear in
    the touched edges at any graph size. Hubs with deg(w) < 2 cannot
    contribute (ln 1 = 0 would divide by zero; a degree-1 neighbor is
    touched by one node only, so it never witnesses a PAIR anyway) and
    are filtered. The edge list is deduplicated and pinned so the
    degree count and both fan-out joins read one evaluation.

    Returns the top-``k`` candidates per seed as
    (seed, candidate, score round 6, rank), rank deterministic via
    (score DESC, candidate ASC) — the fixed-point score sum
    (:func:`~covid_custom_sql_engine_spark.operators.core.dsum`
    semantics) makes score ties exact, so the tie-break is total.
    """
    from covid_custom_sql_engine_spark.operators.core import dsum
    from pyspark.sql import Window

    e = (
        edges.select(F.col(src_col).alias("_u"), F.col(dst_col).alias("_w"))
        .filter(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
        .distinct()
        .localCheckpoint(eager=False)  # deg + both fan-out joins
    )
    deg = e.groupBy("_w").agg(F.count(F.lit(1)).alias("_deg"))
    s = seeds.select(F.col(seeds.columns[0]).alias("_seed")).distinct()
    se = e.join(
        F.broadcast(s), e["_u"] == F.col("_seed"), "inner"
    ).select("_seed", "_w")
    scored = (
        se.join(deg.filter(F.col("_deg") >= 2), "_w")
        .join(e, "_w")
        .filter(F.col("_u") != F.col("_seed"))
        .groupBy("_seed", F.col("_u").alias("_cand"))
        .agg(dsum(F.lit(1.0) / F.log(F.col("_deg").cast("double"))).alias("_sc"))
    )
    w = Window.partitionBy("_seed").orderBy(
        F.desc("_sc"), F.asc("_cand")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_seed").alias("seed"),
            F.col("_cand").alias("candidate"),
            F.round("_sc", 6).alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    comm_col: str = "community",
) -> DataFrame:
    """Newman modularity Q of a node partition on an undirected simple
    graph given as UNIQUE undirected edges (one row per pair, either
    orientation): Q = Σ_c [ e_c/m − (deg_c / 2m)² ], where m is the
    edge count, e_c the edges with both endpoints in community c, and
    deg_c the total degree of c's nodes — the standard "is this
    clustering better than chance?" score that grades the OUTPUT of
    label_propagation / connected-components / attribute partitions
    on one comparable scale. Nodes missing from ``communities`` drop
    (their edges leave m too — Q is computed on the labeled subgraph).

    Shape: one broadcast-sized community map joined onto both edge
    endpoints (the map is O(nodes) — for attribute partitions it is a
    dim-table projection; hint it broadcast at the call site when
    small), then m / e_c / deg_c are three combinable aggregates of
    the labeled edge list, and Q folds over the ≤|communities| reduced
    frame in fixed point. Returns one row
    (modularity round 6, m_edges, n_communities).
    """
    from covid_custom_sql_engine_spark.operators.core import dsum

    cm = communities.select(
        F.col(node_col).alias("_n"), F.col(comm_col).alias("_c")
    ).filter(F.col(node_col).isNotNull() & F.col(comm_col).isNotNull())
    j = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .join(cm.select(F.col("_n").alias("_s"), F.col("_c").alias("_ca")), "_s")
        .join(cm.select(F.col("_n").alias("_d"), F.col("_c").alias("_cb")), "_d")
        .select("_ca", "_cb")
        .localCheckpoint(eager=False)  # m + within + degrees read one eval
    )
    m = j.agg(F.count(F.lit(1)).alias("_m"))
    within = j.filter(F.col("_ca") == F.col("_cb")).groupBy(
        F.col("_ca").alias("_cc")
    ).agg(F.count(F.lit(1)).alias("_ec"))
    # degree contribution: each edge adds 1 to both endpoints' communities
    deg = (
        j.select(F.col("_ca").alias("_cc"))
        .unionAll(j.select(F.col("_cb").alias("_cc")))
        .groupBy("_cc")
        .agg(F.count(F.lit(1)).alias("_dc"))
    )
    per_c = deg.join(within, "_cc", "left").select(
        "_cc",
        F.coalesce("_ec", F.lit(0)).alias("_ec"),
        "_dc",
    )
    term = (
        F.col("_ec").cast("double") / F.col("_m").cast("double")
        - (F.col("_dc").cast("double") / (2.0 * F.col("_m").cast("double")))
        * (F.col("_dc").cast("double") / (2.0 * F.col("_m").cast("double")))
    )
    return per_c.crossJoin(F.broadcast(m)).agg(
        F.round(dsum(term), 6).alias("modularity"),
        F.first("_m").cast("bigint").alias("m_edges"),
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Personalized PageRank: identical per-iteration shape to
    :func:`pagerank` (ranks ⋈ weighted edges on src, contribution
    aggregate by dst, damping projection), but the teleport mass
    (1−d) restarts at a SEED distribution — 1/|S| on each seed node,
    0 elsewhere — instead of uniformly. Rank then measures proximity
    to the seed set under random walks with restart: the standard
    "expand this whitelist / find sources similar to these trusted
    domains" primitive (TrustRank), where global PageRank measures
    popularity regardless of whom you trust.

    The seed frame is small by contract (a whitelist) — broadcast
    into the per-iteration projection as a left join; the r0 vector
    IS the seed distribution (the walk starts at the seeds). Same
    pinning (edge weights and node list checkpointed once), same
    DECIMAL(38,18) contribution folds, same statically-unrolled
    round count so the oracle can replay the identical iterations.

    Returns (node, rank) over nodes with out-degree ≥ 1 (the same
    every-node-a-source contract as :func:`pagerank`); Σ rank ≤ 1,
    with the deficit = mass teleported from non-seed dead weight.
    """
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ew = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .localCheckpoint(eager=False)
    )
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=False
    )
    s = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    scnt = F.broadcast(s.agg(F.count(F.lit(1)).alias("_ns")))
    # seed indicator rides the node list: 1/|S| for seeds, 0.0 otherwise
    seeded = (
        nodes.join(F.broadcast(s.withColumn("_is", F.lit(1))), "node", "left")
        .crossJoin(scnt)
        .select(
            "node",
            F.when(
                F.col("_is").isNotNull(), F.lit(1.0) / F.col("_ns")
            )
            .otherwise(F.lit(0.0))
            .alias("s"),
        )
        .localCheckpoint(eager=False)
    )
    ranks = seeded.select("node", F.col("s").alias("rank"))
    for _ in range(iterations):
        contribs = ranks.join(ew, ranks.node == ew.src).select(
            F.col("dst"), (F.col("rank") * F.col("w")).alias("_c")
        )
        agg = contribs.groupBy(F.col("dst").alias("node")).agg(
            _dsum18(F.col("_c")).alias("_s")
        )
        ranks = (
            seeded.join(agg, "node", "left")
            .select(
                "node",
                (
                    (1.0 - damping) * F.col("s")
                    + damping * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("rank"),
            )
            # per-round pin (the label_propagation convention): at
            # TrustRank-scale iteration counts (20+) an unpinned chain
            # grows plan depth — and AQE re-optimization cost —
            # linearly per round; the lazy checkpoint keeps each
            # round's plan one join deep.
            .localCheckpoint(eager=False)
        )
    return ranks


def bfs_path_counts(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Multi-source shortest-path COUNTING — :func:`bfs_layers` upgraded
    with the σ (number-of-shortest-paths) DP from Brandes' betweenness
    forward pass: σ(v) = Σ σ(u) over in-neighbors u with
    dist(u) = dist(v) − 1.  Returns (node, dist, n_paths).  Path
    multiplicity is what separates "reachable" from "robustly
    reachable" (one bridge vs many parallel routes) and is the building
    block for centrality estimation.

    Per level the plan is bfs_layers' join + anti-join with the
    distinct swapped for a combinable SUM of σ (map-side combine keeps
    hub fan-in cheap), frontier and visited eagerly pinned per round —
    flat lineage at a FIXED depth cap with the empty-frontier early
    exit.  Equivalence with the oracle's bounded walk enumeration:
    every length-dist(v) walk to v is a shortest path (any shortcut
    prefix would shorten the whole walk), so counting walks at the
    minimal depth IS σ.  All-integer arithmetic — exact comparison.
    """
    e = edges.select(
        F.col(src_col).alias("_esrc"), F.col(dst_col).alias("_edst")
    ).localCheckpoint(eager=False)
    visited = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .withColumn("n_paths", F.lit(1).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.node == F.col("_esrc"))
            .groupBy(F.col("_edst").alias("node"))
            .agg(F.sum("n_paths").cast("bigint").alias("n_paths"))
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(d).cast("bigint"))
            .select("node", "dist", "n_paths")
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def ktruss_edges(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded k-truss peeling over an undirected, canonically-oriented
    (src < dst) edge list: iteratively drop every edge supported by
    fewer than k−2 triangles, re-count, repeat — the EDGE analog of
    :func:`kcore_peel` and a strictly stronger cohesion screen (every
    edge in a k-truss joins two vertices with ≥ k−2 common neighbors;
    spam/collusion rings survive k-core but rarely k-truss).  The round
    count is a hyper-parameter; the oracle unrolls identical rounds
    (the kcore/label_propagation convention).

    Per round: ONE wedge join (edge list against the both-directions
    adjacency on each endpoint, closing on the shared neighbor) + a
    combinable count aggregate + one inner join back onto the edge
    list — and the edge frame only SHRINKS, so per-round cost is
    monotonically decreasing at any scale.  Support counting here is
    per-EDGE (both wedge sides anchored at the edge's own endpoints),
    so no degree-orientation is needed for correctness; hub cost is
    bounded by the same adjacency the consumer graph already has.
    Returns the surviving (src, dst) edges.  All-integer — exact.
    """
    e = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        adj1 = e.select(F.col("_u").alias("_a1"), F.col("_v").alias("_b1")).unionAll(
            e.select(F.col("_v").alias("_a1"), F.col("_u").alias("_b1"))
        )
        adj2 = adj1.select(
            F.col("_a1").alias("_a2"), F.col("_b1").alias("_b2")
        )
        sup = (
            e.join(adj1, F.col("_a1") == F.col("_u"))
            .join(
                adj2,
                (F.col("_a2") == F.col("_v"))
                & (F.col("_b2") == F.col("_b1")),
            )
            .groupBy("_u", "_v")
            .agg(F.count(F.lit(1)).alias("_sup"))
            .filter(F.col("_sup") >= k - 2)
            .select(
                F.col("_u").alias("_ku"), F.col("_v").alias("_kv")
            )
        )
        e = (
            e.join(
                sup,
                (F.col("_ku") == F.col("_u")) & (F.col("_kv") == F.col("_v")),
            )
            .select("_u", "_v")
            .localCheckpoint(eager=True)
        )
    return e.select(F.col("_u").alias(src_col), F.col("_v").alias(dst_col))


def seed_betweenness(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Brandes dependency accumulation (the BACKWARD pass paired with
    :func:`bfs_path_counts`' forward σ DP) from a seed set, bounded at
    ``max_depth``: δ(v) = Σ_{w : v→w, dist(w)=dist(v)+1}
    (σ(v)/σ(w))·(1 + δ(w)) — how much of the seed set's shortest-path
    traffic flows THROUGH each node, the exact per-node betweenness
    contribution of these sources (full betweenness is the average of
    this over a seed sample — the standard approximation at scale,
    Brandes & Pich 2007).  Returns (node, dist, dependency) for
    intermediate nodes (1 ≤ dist < max_depth); frontier-depth nodes
    have δ = 0 by construction and are omitted.

    Plan shape: the forward pass is bfs_path_counts (per-level join +
    combinable σ sums, pinned state); the backward pass is one
    level-filtered equi-join per depth, descending, each a combinable
    DECIMAL(38,12) fold of per-edge ratio terms — the per-level state
    is joined from the SAME pinned forward frame, so no recomputation
    and flat lineage.  σ ratios are exact-integer-derived IEEE doubles;
    folds are fixed-point → cross-engine deterministic."""
    if max_depth < 2:
        raise ValueError(
            "seed_betweenness needs max_depth >= 2 (dependency only "
            "accumulates onto intermediate nodes, which first exist at "
            f"depth 1 below a depth-2 frontier), got {max_depth}"
        )
    sig = bfs_path_counts(
        edges, sources, max_depth=max_depth,
        src_col=src_col, dst_col=dst_col, node_col=node_col,
    )  # already an eager-checkpoint leaf
    e = edges.select(
        F.col(src_col).alias("_bsrc"), F.col(dst_col).alias("_bdst")
    ).localCheckpoint(eager=False)
    from covid_custom_sql_engine_spark.operators.core import dsum12

    delta_next = None  # (node, delta) at depth d+1
    out = None
    for d in range(max_depth - 1, 0, -1):
        v = sig.filter(F.col("dist") == d).select(
            F.col("node").alias("_vn"), F.col("n_paths").alias("_vs")
        )
        w = sig.filter(F.col("dist") == d + 1).select(
            F.col("node").alias("_wn"), F.col("n_paths").alias("_ws")
        )
        if delta_next is not None:
            w = w.join(
                delta_next.select(
                    F.col("node").alias("_dn"), F.col("delta").alias("_dd")
                ),
                F.col("_dn") == F.col("_wn"),
                "left",
            ).select(
                "_wn", "_ws", F.coalesce(F.col("_dd"), F.lit(0.0)).alias("_wd")
            )
        else:
            w = w.select("_wn", "_ws", F.lit(0.0).alias("_wd"))
        contrib = (
            v.join(e, F.col("_bsrc") == F.col("_vn"))
            .join(w, F.col("_bdst") == F.col("_wn"))
            .groupBy(F.col("_vn").alias("node"))
            .agg(
                dsum12(
                    F.col("_vs").cast("double")
                    / F.col("_ws")
                    * (1 + F.col("_wd"))
                ).alias("delta")
            )
        )
        lvl = (
            v.select(F.col("_vn").alias("node"))
            .join(contrib, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta"),
            )
            .withColumn("dist", F.lit(d).cast("bigint"))
            .localCheckpoint(eager=True)
        )
        delta_next = lvl
        out = lvl if out is None else out.unionByName(lvl)
    return out.select("node", "dist", "delta")


def temporal_reachability(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    time_col: str = "edate",
    node_col: str = "node",
) -> DataFrame:
    """Earliest-arrival TIME-RESPECTING reachability over a temporal
    edge list: a node is reached at time t if some edge (u, v, t)
    departs at t ≥ u's own earliest arrival — paths must move forward
    in time, which static BFS (:func:`bfs_layers`) gets wrong (it
    happily chains a Monday edge after a Friday one).  The
    contact-tracing / information-diffusion / fraud-flow primitive.
    Bounded at ``rounds`` interactions (the sssp_bounded convention:
    rounds are a hyper-parameter, the oracle unrolls them).

    Per round ONE relax join (state ⋈ edges on the source key with the
    time gate in the join condition) + a combinable MIN aggregate over
    the union with the carried state — monotone (arrivals only
    decrease), so the fixpoint is order-independent; state eagerly
    pinned per round.  All date comparisons exact.  Returns
    (node, earliest) with seeds at the sentinel epoch."""
    e = edges.select(
        F.col(src_col).alias("_tsrc"),
        F.col(dst_col).alias("_tdst"),
        F.col(time_col).alias("_td"),
    ).localCheckpoint(eager=False)
    state = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("earliest", F.to_date(F.lit("1970-01-01")))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        cand = state.join(
            e,
            (F.col("_tsrc") == F.col("node"))
            & (F.col("_td") >= F.col("earliest")),
        ).select(F.col("_tdst").alias("node"), F.col("_td").alias("earliest"))
        state = (
            state.unionByName(cand)
            .groupBy("node")
            .agg(F.min("earliest").alias("earliest"))
            .localCheckpoint(eager=True)
        )
    return state


def louvain_one_level(
    edges: DataFrame,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One-level Louvain modularity ascent (Blondel et al. 2008, the
    local-move phase), synchronous + deterministic: every node starts
    as its own community; each round every node moves to the candidate
    community (its neighbors' communities ∪ its own) with the maximum
    modularity gain, ties toward the smaller community label. Unlike
    :func:`label_propagation` (most-frequent neighbor label), the vote
    is degree-aware — a high-degree hub's community is penalized by its
    Σ_tot mass, which is what keeps bridges from gluing two dense
    communities together. ``rounds`` is a fixed hyper-parameter, so a
    SQL oracle unrolls the identical rounds (the label_propagation /
    pagerank convention); the full multi-level Louvain stacks this
    phase with graph coarsening.

    The gain of moving node i (degree k_i) into community c is
    ΔQ(i→c) = k_{i,c}/m − Σ'_tot(c)·k_i/(2m²), with Σ'_tot(c) the
    community's total degree EXCLUDING i itself. Rather than compare
    float gains (cross-engine tie hazard), both engines compare
    ΔQ·2m² = 2m·k_{i,c} − Σ'_tot(c)·k_i — EXACT bigint arithmetic
    (bounded by 2m·max_deg ≤ 2m², fine in int64 up to ~10⁹ edges;
    cast the two products to decimal(38,0) past that). The stay option
    (c = current community) is always a candidate with k_{i,c} ≥ 0, so
    argmax-over-candidates subsumes the "move only if it improves"
    rule up to exact ties, which break to the smaller label — the
    deterministic variant, same design choice as the id-seeded k-means
    family.

    Per-round plan: ONE equi-join of the O(nodes) label vector against
    the edge list on the NEIGHBOR side + a (node, community) hash
    aggregate for k_{i,c} (map-side combinable); Σ_tot is an O(nodes)
    label⋈degree aggregate reused via broadcast-sized equi-join; the
    argmax is ONE combinable min-of-struct (−score, label) aggregate
    (never a window, never float equality);
    labels eagerly pinned per round — flat lineage, the
    iterative-state convention.

    ``edges`` must hold BOTH orientations of each undirected edge (the
    label_propagation input convention); m is half the row count.
    Returns (node, label) — nodes sharing a label share a community.
    """
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).localCheckpoint(eager=False)
    deg = (
        e.groupBy(F.col("_s").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_k"))
        .localCheckpoint(eager=True)  # reused every round (sigma + gain)
    )
    # E2 = 2m: the directed row count, as a 1-row broadcast scalar
    e2 = F.broadcast(e.agg(F.count(F.lit(1)).cast("bigint").alias("_e2")))
    labels = deg.select("node", F.col("node").alias("label"))
    for _ in range(rounds):
        # Σ_tot per community: O(nodes) aggregate of the label vector
        sigma = (
            labels.join(deg, "node")
            .groupBy("label")
            .agg(F.sum("_k").alias("_sig"))
        )
        # k_{i,c}: edges with the NEIGHBOR's community label, one hash
        # aggregate; the stay option rides along as a 0-count row so
        # isolated-from-own-community nodes still have their current
        # community in the candidate set
        nbr = (
            e.join(labels.select(F.col("node").alias("_d"), "label"), "_d")
            .select(F.col("_s").alias("node"), "label")
            .withColumn("_1", F.lit(1).cast("bigint"))
        )
        stay = labels.select("node", "label").withColumn(
            "_1", F.lit(0).cast("bigint")
        )
        cand = (
            nbr.unionByName(stay)
            .groupBy("node", "label")
            .agg(F.sum("_1").alias("_kic"))
        )
        # exact-integer gain: 2m·k_{i,c} − (Σ_tot(c) − k_i·[i ∈ c])·k_i
        cur = labels.select("node", F.col("label").alias("_cur"))
        scored = (
            cand.join(sigma, "label")
            .join(deg, "node")
            .join(cur, "node")
            .crossJoin(e2)
            .select(
                "node",
                "label",
                (
                    F.col("_e2") * F.col("_kic")
                    - (
                        F.col("_sig")
                        - F.when(
                            F.col("label") == F.col("_cur"), F.col("_k")
                        ).otherwise(F.lit(0).cast("bigint"))
                    )
                    * F.col("_k")
                ).alias("_score"),
            )
        )
        # argmax via ONE combinable min over (−score, label) structs:
        # max score first, min label among exact-integer ties — the
        # same collapse as label_propagation (optimization r12); the
        # former max + join + filter + re-aggregate pair (and the pin
        # its two consumers needed) is gone.
        labels = (
            scored.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_score")).alias("_ns"),
                        F.col("label").alias("_l"),
                    )
                ).alias("_b")
            )
            .select("node", F.col("_b._l").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels
