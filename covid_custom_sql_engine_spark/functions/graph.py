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

from pyspark.sql import DataFrame, functions as F

PR_DECIMAL = "decimal(38,18)"


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

    ``edges`` must contain every node as a source at least once (for an
    undirected graph, pass both directions — then out-degree ≥ 1 and
    in-degree ≥ 1 hold by construction and no dangling-node
    redistribution term is needed; this is the contract, not a checked
    precondition, because checking costs a scan).

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
    nodes = e.select(F.col("src").alias("node")).distinct()
    cnt = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("_n")))
    ranks = nodes.crossJoin(cnt).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(iterations):
        contribs = ranks.join(ew, ranks.node == ew.src).select(
            F.col("dst"), (F.col("rank") * F.col("w")).alias("_c")
        )
        ranks = (
            contribs.groupBy(F.col("dst").alias("node"))
            .agg(_dsum18(F.col("_c")).alias("_s"))
            .crossJoin(cnt)
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("_n") + damping * F.col("_s")
                ).alias("rank"),
            )
        )
    return ranks
