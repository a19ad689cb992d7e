"""PageRank (functions/graph.py)."""

from __future__ import annotations

import math

from covid_custom_sql_engine_spark.functions.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def test_pagerank_sums_to_one_and_ring_is_uniform(spark):
    """A directed ring: perfectly symmetric, so every node keeps exactly
    1/N at every iteration; total mass is conserved."""
    n = 5
    ring = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    r = _ranks(pagerank(ring, iterations=4))
    assert math.isclose(sum(r.values()), 1.0, rel_tol=1e-9)
    for v in r.values():
        assert math.isclose(v, 1.0 / n, rel_tol=1e-9)


def test_pagerank_star_ranks_hub_highest(spark):
    """Undirected star (hub 0, leaves 1..4, both edge directions): the
    hub receives every leaf's full rank and must rank strictly highest;
    leaves are symmetric and equal."""
    leaves = [1, 2, 3, 4]
    both = [(0, l) for l in leaves] + [(l, 0) for l in leaves]
    r = _ranks(pagerank(_edges(spark, both), iterations=3))
    assert r[0] > max(r[l] for l in leaves)
    assert len({round(r[l], 12) for l in leaves}) == 1
    assert math.isclose(sum(r.values()), 1.0, rel_tol=1e-9)


def test_pagerank_iteration_zero_shape_and_damping(spark):
    """One iteration of a 2-node swap graph keeps the uniform fixpoint
    regardless of damping (contributions are symmetric)."""
    sw = _edges(spark, [(1, 2), (2, 1)])
    for d in (0.5, 0.85):
        r = _ranks(pagerank(sw, iterations=1, damping=d))
        assert math.isclose(r[1], 0.5, rel_tol=1e-9)
        assert math.isclose(r[2], 0.5, rel_tol=1e-9)


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge has exactly two triangles sharing an edge:
    vertices 1-2 participate in both, 3 and 4 in one each. A pendant
    edge (5-6) joins no triangle and must not appear."""
    from covid_custom_sql_engine_spark.functions.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (5, 6)],
        "a long, b long",
    )
    out = {r.vertex: r.n_triangles for r in triangle_counts(edges).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}
    assert sum(out.values()) % 3 == 0  # 3 corners per triangle


def test_triangle_counts_triangle_free(spark):
    """Bipartite graphs are triangle-free: the 4-cycle yields nothing."""
    from covid_custom_sql_engine_spark.functions.graph import triangle_counts

    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "a long, b long"
    )
    assert triangle_counts(cyc).count() == 0


def test_hits_star_authority(spark):
    """Directed star: hubs 1..3 all point at authority 10, hub 1 also
    at 11. Authority 10 (three in-links) must outscore 11 (one); hubs
    2 and 3 are symmetric; all sides L1-normalize to 1."""
    import math

    from covid_custom_sql_engine_spark.functions.graph import hits

    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (1, 11)], "src long, dst long"
    )
    rows = hits(edges, iterations=3).collect()
    hubs = {r.node: r.score for r in rows if r.side == "hub"}
    auth = {r.node: r.score for r in rows if r.side == "authority"}
    assert auth[10] > auth[11]
    assert hubs[1] > hubs[2]  # hub 1 links to both authorities
    assert hubs[2] == hubs[3]
    assert math.isclose(sum(hubs.values()), 1.0, rel_tol=1e-9)
    assert math.isclose(sum(auth.values()), 1.0, rel_tol=1e-9)


def test_pagerank_keeps_zero_indegree_nodes(spark):
    """A directed graph with a source-only node: node 3 points in but
    nothing points at it. It must stay in the vector with its teleport
    mass, and total mass stays 1 (review finding, round 4)."""
    import math

    e = _edges(spark, [(1, 2), (2, 1), (3, 1)])
    r = _ranks(pagerank(e, iterations=3))
    assert set(r) == {1, 2, 3}
    assert math.isclose(r[3], 0.15 / 3, rel_tol=1e-9)  # pure teleport
    assert math.isclose(sum(r.values()), 1.0, rel_tol=1e-9)
    assert r[1] > r[2]  # node 1 receives 3's mass, 2 does not


def test_hits_rejects_zero_iterations(spark):
    import pytest

    from covid_custom_sql_engine_spark.functions.graph import hits

    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="iterations"):
        hits(e, iterations=0)


def test_bfs_layers_min_distance_and_early_exit(spark):
    """BFS layers equal the recursive min-dist spec on a graph with a
    shortcut (two paths of different lengths to the same node), an
    unreachable island, and an isolated source; expansion stops the
    round the frontier empties (depth cap larger than the diameter
    must not change the answer)."""
    from pyspark.sql import functions as F

    from covid_custom_sql_engine_spark.functions.graph import bfs_layers

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),  # chain a→d
            ("a", "d"),                           # shortcut: d at 1, not 3
            ("x", "y"),                           # island, unreachable
        ],
        "src string, dst string",
    )
    srcs = spark.createDataFrame([("a",), ("q",)], "node string")
    out = {
        r.node: r.dist
        for r in bfs_layers(edges, srcs, max_depth=10).collect()
    }
    assert out == {"a": 0, "q": 0, "b": 1, "d": 1, "c": 2}
    # duplicate sources collapse; dist column is bigint for the oracle
    two = bfs_layers(edges, srcs.unionAll(srcs), max_depth=2)
    assert dict((r.node, r.dist) for r in two.collect()) == out
    assert dict(two.dtypes)["dist"] == "bigint"


def test_bfs_layers_matches_floyd_reference(spark):
    """Randomized cross-check: BFS distances equal a pure-Python
    shortest-hop reference on a seeded random digraph."""
    import random

    from covid_custom_sql_engine_spark.functions.graph import bfs_layers

    rng = random.Random(17)
    n = 40
    es = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    edges = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in es], "src string, dst string"
    )
    srcs = spark.createDataFrame([("n0",), ("n1",)], "node string")
    got = {
        r.node: r.dist
        for r in bfs_layers(edges, srcs, max_depth=6).collect()
    }
    # reference: BFS from {0, 1}
    adj = {}
    for a, b in es:
        adj.setdefault(a, []).append(b)
    dist = {0: 0, 1: 0}
    frontier = [0, 1]
    d = 0
    while frontier and d < 6:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    assert got == {f"n{k}": v for k, v in dist.items()}


def test_label_propagation_two_cliques(spark):
    """Two 3-cliques with one bridge: after enough rounds every node
    in a clique shares a label; tie-breaks are deterministic (smaller
    label wins), so repeated runs and repartitioned inputs agree."""
    from covid_custom_sql_engine_spark.functions.graph import label_propagation

    edges = []
    for tri in ([("a", "b"), ("b", "c"), ("c", "a")],
                [("x", "y"), ("y", "z"), ("z", "x")]):
        for s, d in tri:
            edges += [(s, d), (d, s)]
    edges += [("c", "x"), ("x", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    assert out["a"] == out["b"] == out["c"] == "a"
    again = {
        r.node: r.label
        for r in label_propagation(df.repartition(7), rounds=3).collect()
    }
    assert again == out


def test_label_propagation_isolated_in_degree_keeps_label(spark):
    """A node with no in-edges never receives votes and must keep its
    own label (the left-join-back contract)."""
    from covid_custom_sql_engine_spark.functions.graph import label_propagation

    df = spark.createDataFrame(
        [("solo", "a"), ("a", "b"), ("b", "a")], "src string, dst string"
    )
    out = {r.node: r.label for r in label_propagation(df, rounds=2).collect()}
    assert out["solo"] == "solo"
    # synchronous updates oscillate on this 2-cycle (a classic LPA
    # property): round 1 → a='b' (tie solo/b broken low), b='a';
    # round 2 swaps back/forward deterministically — assert the exact
    # unrolled values rather than convergence
    assert out["a"] == "a" and out["b"] == "b"


def test_bfs_tree_min_parent_and_walkable_paths(spark):
    """Parent is the smallest first-touch frontier node; walking
    parents from any node reaches a source in exactly dist steps."""
    from covid_custom_sql_engine_spark.functions.graph import bfs_tree

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "d"), ("d", "c"), ("x", "c"),
         ("c", "e")],
        "src string, dst string",
    )
    src = spark.createDataFrame([("a",)], "node string")
    rows = {r.node: (r.dist, r.parent) for r in bfs_tree(edges, src, 5).collect()}
    assert rows == {
        "a": (0, None), "b": (1, "a"), "d": (1, "a"),
        "c": (2, "b"),  # min('b', 'd') — deterministic tie-break
        "e": (3, "c"),
    }
    for node, (dist, parent) in rows.items():
        steps = 0
        while parent is not None:
            node, (dist2, parent) = parent, rows[parent]
            steps += 1
            assert steps <= 5
        assert rows[node][0] == 0  # walk ends at a source


def test_sssp_bounded_prefers_cheap_two_hop(spark):
    """Weighted relaxation: a 2-edge path of total weight 3 beats a
    direct edge of weight 10 — the behavior unit-weight BFS cannot
    express; a node reachable only through MORE edges keeps the
    bounded-hop cost until more rounds run; a node >3 edges out is
    absent at rounds=3."""
    from covid_custom_sql_engine_spark.functions.graph import sssp_bounded

    edges = spark.createDataFrame(
        [
            ("a", "b", 10),  # direct but expensive
            ("a", "m", 1),
            ("m", "b", 2),   # cheap detour
            ("b", "c", 1),
            ("c", "d", 1),
            ("d", "e", 1),   # e is 4+ edges from a on every path
        ],
        "src string, dst string, w long",
    )
    srcs = spark.createDataFrame([("a",)], "node string")
    out = {r.node: r.dist for r in sssp_bounded(edges, srcs, rounds=3).collect()}
    assert out["a"] == 0
    assert out["m"] == 1
    assert out["b"] == 3   # min(10, 1+2)
    assert out["c"] == 4
    # within 3 edges d is only reachable via the EXPENSIVE direct edge
    # (a>b>c>d = 12); the cheap detour needs a 4th round to reach it
    assert out["d"] == 12
    assert "e" not in out  # >3 edges on every path


def test_adamic_adar_hand_computed(spark):
    """Two seeds on a tiny bipartite graph; scores = Σ 1/ln(deg(w))
    over shared right-side neighbors, degree-1 neighbors contribute
    nothing, the seed itself never appears as its own candidate."""
    import math

    from covid_custom_sql_engine_spark.functions.graph import adamic_adar

    edges = spark.createDataFrame(
        [
            ("u1", "w1"), ("u1", "w2"), ("u1", "w3"),
            ("u2", "w1"), ("u2", "w2"),
            ("u3", "w2"), ("u3", "w3"),
            ("u4", "w4"),  # w4 has degree 1: contributes to nobody
            ("u1", "w4"),
        ],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("u1",)], "node string")
    rows = {
        (r.seed, r.candidate): (r.score, r.rank)
        for r in adamic_adar(edges, seeds, k=5).collect()
    }
    # deg: w1=2, w2=3, w3=2, w4=2 (u4+u1)
    s12 = 1 / math.log(2) + 1 / math.log(3)          # shares w1, w2
    s13 = 1 / math.log(3) + 1 / math.log(2)          # shares w2, w3
    s14 = 1 / math.log(2)                            # shares w4
    assert abs(rows[("u1", "u2")][0] - round(s12, 6)) < 1e-6
    assert abs(rows[("u1", "u3")][0] - round(s13, 6)) < 1e-6
    assert abs(rows[("u1", "u4")][0] - round(s14, 6)) < 1e-6
    assert ("u1", "u1") not in rows
    # equal scores tie-break by candidate ascending
    assert rows[("u1", "u2")][1] == 1
    assert rows[("u1", "u3")][1] == 2
    assert rows[("u1", "u4")][1] == 3


def test_modularity_two_cliques(spark):
    """Two triangles joined by one bridge edge, communities = the
    triangles: Q = Σ_c (e_c/m − (deg_c/2m)²) with m=7 edges,
    e_c=3 within each, deg_c=7 per community."""
    from covid_custom_sql_engine_spark.functions.graph import modularity

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("a", "c"),   # triangle 1
            ("d", "e"), ("e", "f"), ("d", "f"),   # triangle 2
            ("c", "d"),                            # bridge
        ],
        "src string, dst string",
    )
    comm = spark.createDataFrame(
        [("a", "t1"), ("b", "t1"), ("c", "t1"),
         ("d", "t2"), ("e", "t2"), ("f", "t2")],
        "node string, community string",
    )
    row = modularity(edges, comm).collect()[0]
    expected = 2 * (3 / 7 - (7 / 14) ** 2)
    assert row.m_edges == 7
    assert row.n_communities == 2
    assert abs(row.modularity - round(expected, 6)) < 1e-6


def test_modularity_single_community_is_zero(spark):
    """All nodes in one community: e_c = m and deg_c = 2m, so
    Q = 1 − 1 = 0 exactly."""
    from covid_custom_sql_engine_spark.functions.graph import modularity

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    comm = spark.createDataFrame(
        [("a", "one"), ("b", "one"), ("c", "one")],
        "node string, community string",
    )
    row = modularity(edges, comm).collect()[0]
    assert row.modularity == 0.0


def test_personalized_pagerank_restarts_at_seeds(spark):
    """Teleport mass goes to the seed distribution only: on a graph
    with two symmetric components, all rank stays in the seeded
    component; values match a plain-Python reference loop."""
    from covid_custom_sql_engine_spark.functions.graph import (
        personalized_pagerank,
    )

    und = [("a", "b"), ("b", "c"), ("c", "a"),   # seeded component
           ("x", "y")]                             # unseeded component
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r.node: r.rank
        for r in personalized_pagerank(edges, seeds, iterations=3).collect()
    }
    # python reference: same unrolled rounds, same restart vector
    adj = {}
    for s, d in und + [(d, s) for s, d in und]:
        adj.setdefault(s, []).append(d)
    svec = {n: (1.0 if n == "a" else 0.0) for n in adj}
    r = dict(svec)
    for _ in range(3):
        nxt = {}
        for s, outs in adj.items():
            for d in outs:
                nxt[d] = nxt.get(d, 0.0) + r[s] / len(outs)
        r = {
            n: (1.0 - 0.85) * svec[n] + 0.85 * nxt.get(n, 0.0)
            for n in adj
        }
    for n in adj:
        assert abs(got[n] - r[n]) < 1e-12, n
    # the unseeded component holds zero rank after any round count
    assert got["x"] == 0.0 and got["y"] == 0.0


def test_bfs_path_counts_diamond_multiplicity(spark):
    """Diamond s→{a,b}→t plus a long way round: σ(t) = 2 at dist 2 (the
    two parallel routes), σ(a) = σ(b) = 1, and a node behind t inherits
    t's multiplicity."""
    from covid_custom_sql_engine_spark.functions.graph import bfs_path_counts

    e = _edges(
        spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    )
    srcs = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: (r.dist, r.n_paths)
        for r in bfs_path_counts(e, srcs, max_depth=4).collect()
    }
    assert got == {0: (0, 1), 1: (1, 1), 2: (1, 1), 3: (2, 2), 4: (3, 2)}


def test_bfs_path_counts_multi_source_and_shortcut(spark):
    """Two sources; a node reachable from both sums their path counts;
    an edge from a deeper node back to an already-visited node adds
    nothing (only min-dist walks count)."""
    from covid_custom_sql_engine_spark.functions.graph import bfs_path_counts

    e = _edges(spark, [(0, 2), (1, 2), (2, 0)])
    srcs = spark.createDataFrame([(0,), (1,)], "node long")
    got = {
        r.node: (r.dist, r.n_paths)
        for r in bfs_path_counts(e, srcs, max_depth=3).collect()
    }
    assert got == {0: (0, 1), 1: (0, 1), 2: (1, 2)}


def test_ktruss_peeling_cascades(spark):
    """A triangle {0,1,2} with a pendant edge (2,3): the pendant edge
    has zero support and is peeled in round 1; the triangle's edges
    each keep support 1 and survive every 3-truss round. In a 4-truss
    (support ≥ 2) even the triangle dissolves."""
    from covid_custom_sql_engine_spark.functions.graph import ktruss_edges

    e = _edges(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    kept3 = {
        (r.src, r.dst) for r in ktruss_edges(e, k=3, rounds=2).collect()
    }
    assert kept3 == {(0, 1), (0, 2), (1, 2)}
    assert ktruss_edges(e, k=4, rounds=2).count() == 0


def test_ktruss_two_triangles_sharing_edge(spark):
    """Two triangles sharing edge (1,2): the shared edge has support 2,
    the outer edges support 1 — the 4-truss peel drops the outer edges
    in round 1, which starves the shared edge in round 2."""
    from covid_custom_sql_engine_spark.functions.graph import ktruss_edges

    e = _edges(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    kept = ktruss_edges(e, k=4, rounds=2)
    assert kept.count() == 0
    # one round only: the shared edge still sees support 2 and survives
    one = {
        (r.src, r.dst) for r in ktruss_edges(e, k=4, rounds=1).collect()
    }
    assert one == {(1, 2)}


def test_seed_betweenness_diamond_and_chain(spark):
    """Diamond 0→{1,2}→3: nodes 1 and 2 each carry half of the traffic
    to 3 (δ = 0.5). Chain 0→1→2→3: δ(1) accumulates through δ(2)."""
    from covid_custom_sql_engine_spark.functions.graph import (
        seed_betweenness,
    )

    srcs = spark.createDataFrame([(0,)], "node long")
    diamond = _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    got = {
        r.node: (r.dist, r.delta)
        for r in seed_betweenness(diamond, srcs, max_depth=2).collect()
    }
    assert got == {1: (1, 0.5), 2: (1, 0.5)}

    chain = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    got = {
        r.node: (r.dist, r.delta)
        for r in seed_betweenness(chain, srcs, max_depth=3).collect()
    }
    # δ(2) = 1·(1+0) = 1; δ(1) = 1·(1+δ(2)) = 2
    assert got == {1: (1, 2.0), 2: (2, 1.0)}


def test_seed_betweenness_rejects_max_depth_below_2(spark):
    """max_depth < 2 has no intermediate level for dependency to land
    on — the API must refuse (it used to crash on out=None)."""
    import pytest

    from covid_custom_sql_engine_spark.functions.graph import (
        seed_betweenness,
    )

    srcs = spark.createDataFrame([(0,)], "node long")
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="max_depth >= 2"):
        seed_betweenness(e, srcs, max_depth=1)


def test_temporal_reachability_respects_time(spark):
    """Static path 0→1→2 exists, but the second edge departs BEFORE
    the first arrives — time-respecting reachability must not take it;
    a later edge makes 2 reachable, and same-day chaining is allowed."""
    import datetime

    from covid_custom_sql_engine_spark.functions.graph import (
        temporal_reachability,
    )

    def d(day):
        return datetime.date(2024, 1, day)

    srcs = spark.createDataFrame([(0,)], "node long")
    bad = spark.createDataFrame(
        [(0, 1, d(5)), (1, 2, d(3))], "src long, dst long, edate date"
    )
    got = {
        r.node: str(r.earliest)
        for r in temporal_reachability(bad, srcs, rounds=3).collect()
    }
    assert got == {0: "1970-01-01", 1: "2024-01-05"}

    ok = spark.createDataFrame(
        [(0, 1, d(5)), (1, 2, d(5))], "src long, dst long, edate date"
    )
    got = {
        r.node: str(r.earliest)
        for r in temporal_reachability(ok, srcs, rounds=3).collect()
    }
    assert got[2] == "2024-01-05"


def test_louvain_beats_lpa_on_bridged_cliques(spark):
    """Two planted K4s joined by TWO bridges, 3 rounds: Louvain's
    degree-aware gain recovers the planted cliques exactly (2
    communities), while LPA's most-frequent-label vote lets the bridges
    glue everything into ONE community — the head-to-head the
    one-level ascent exists for. Modularity confirms the ordering
    (planted partition Q > single-blob Q = 0). Deterministic: exact
    unrolled labels asserted, repartitioned input agrees."""
    import itertools

    from covid_custom_sql_engine_spark.functions.graph import (
        label_propagation,
        louvain_one_level,
        modularity,
    )

    a = [f"a{i}" for i in range(4)]
    b = [f"b{i}" for i in range(4)]
    und = (
        list(itertools.combinations(a, 2))
        + list(itertools.combinations(b, 2))
        + [("a0", "b0"), ("a1", "b1")]
    )
    rows = [(x, y) for x, y in und] + [(y, x) for x, y in und]
    df = spark.createDataFrame(rows, "src string, dst string")

    lou = {r.node: r.label for r in louvain_one_level(df, rounds=3).collect()}
    lpa = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    # Louvain: the planted partition, exact unrolled labels
    assert lou == {**{n: "a2" for n in a}, **{n: "b2" for n in b}}
    # LPA glued the cliques into one community
    assert len(set(lpa.values())) == 1
    assert len(set(lou.values())) == 2

    # modularity grades the two partitions in the same order
    und_df = spark.createDataFrame(und, "src string, dst string")
    def part(d):
        return spark.createDataFrame(
            [(k, v) for k, v in d.items()], "node string, community string"
        )
    q_lou = modularity(und_df, part(lou)).collect()[0].modularity
    q_lpa = modularity(und_df, part(lpa)).collect()[0].modularity
    assert q_lou > q_lpa
    assert q_lpa == 0.0  # single community is the chance baseline

    again = {
        r.node: r.label
        for r in louvain_one_level(df.repartition(7), rounds=3).collect()
    }
    assert again == lou


def test_louvain_stay_option_and_isolated_pair(spark):
    """A disconnected 2-path {p, q} OSCILLATES under synchronous
    updates (each round the move gain E2·1 − k·k = 8−1 = 7 beats the
    stay gain 0, so the pair swap labels every round — the same
    2-cycle property the LPA test pins down): assert the exact
    unrolled values per round, never convergence. The triangle merges
    to its min label by round 2 and stays put (its stay gain wins once
    unified), with no cross-component leakage — candidates come only
    from edges."""
    from covid_custom_sql_engine_spark.functions.graph import louvain_one_level

    und = [("p", "q"), ("t1", "t2"), ("t2", "t3"), ("t3", "t1")]
    rows = [(x, y) for x, y in und] + [(y, x) for x, y in und]
    df = spark.createDataFrame(rows, "src string, dst string")
    r2 = {r.node: r.label for r in louvain_one_level(df, rounds=2).collect()}
    assert (r2["p"], r2["q"]) == ("p", "q")  # swapped and swapped back
    assert r2["t1"] == r2["t2"] == r2["t3"] == "t1"
    r3 = {r.node: r.label for r in louvain_one_level(df, rounds=3).collect()}
    assert (r3["p"], r3["q"]) == ("q", "p")  # the odd-round half-swap
    assert r3["t1"] == r3["t2"] == r3["t3"] == "t1"  # stay gain holds


def test_typed_node_codec_roundtrip_and_order(spark):
    """The r13 order-preserving codec: decode(encode(k, side)) equals
    the decorated 'c:<k>'/'s:<k>' string, and sorting by the encoded
    bigint equals sorting by the decorated string — including the
    prefix-tie cases ('2' vs '20' vs '200') and the digit-boundary
    cases ('9' vs '10', '99' vs '100') that a naive numeric encoding
    gets wrong, up to the documented 10^12 − 1 key bound."""
    from covid_custom_sql_engine_spark.functions.graph import (
        decode_typed_node,
        encode_typed_key,
    )
    from pyspark.sql import functions as F

    keys = [0, 1, 2, 9, 10, 11, 19, 20, 21, 99, 100, 101, 199, 200,
            999, 1000, 2000000, 123456789, 999999999999]
    rows = [(k, s) for k in keys for s in (0, 1)]
    df = spark.createDataFrame(rows, "k long, side long")
    enc = df.select(
        "k",
        "side",
        F.when(F.col("side") == 0, encode_typed_key(F.col("k"), 0))
        .otherwise(encode_typed_key(F.col("k"), 1))
        .alias("enc"),
    )
    out = enc.select(
        "enc", decode_typed_node("enc").alias("node"), "k", "side"
    ).collect()
    for r in out:
        assert r.node == ("c:" if r.side == 0 else "s:") + str(r.k)
    by_enc = [r.node for r in sorted(out, key=lambda r: r.enc)]
    by_str = sorted((r.node for r in out))
    assert by_enc == by_str
    # NULL keys encode to NULL and decode to NULL (concat semantics)
    nl = spark.createDataFrame([(None,)], "k long").select(
        encode_typed_key(F.col("k"), 1).alias("enc")
    ).select(decode_typed_node("enc").alias("node")).collect()
    assert nl[0].node is None
