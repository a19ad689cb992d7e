"""Driver-window rotation: registration order = driver coverage order."""

from covid_custom_sql_engine_spark.registry._base import ORACLES, QUERIES

# ---------------------------------------------------------------------------
# Registration order = driver coverage order: the correctness driver
# checks the first 50 registered queries, so the front of the dict is
# reserved for entries that most need an official record this round —
# queries that are new, newly-oracled, recently-fixed, or touched by
# recent changes. Everything else keeps its relative source order (their
# green records exist from earlier rounds).
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_PRIORITY = [
    # ---- ROUND 9 WINDOW (first 50 = the driver's official check set) ----
    # flagship first — it's also the entry() smoke query
    "flagship_revenue_by_nation",
    # --- NEW in round 9 (never driver-checked): recursive-query BFS,
    # the distributed Pareto sweep, a-priori 3-itemsets, session path
    # mining, the lossless prefix-filtered Jaccard join, and
    # label-propagation communities ---
    "bfs_distances",
    "skyline_parts",
    "apriori_triples",
    "top_session_paths",
    "prefix_jaccard_pairs",
    "label_propagation_communities",
    "l_diversity_audit",
    "markov_attribution",
    "fd_audit",
    # --- NEW late in round 8, never driver-checked: the hybrid
    # retrieval + ranking-quality family ---
    "hybrid_search",
    "retrieval_ndcg_at_k",
    "diversified_topk",
    "mmr_topk",
    # --- touched by the round-9 review fixes (childless-super rule +
    # smallest-n oracle; fixed-point refined-codebook means; explicit-
    # codebook shape validation in pq_topk) — values re-proven locally,
    # official rows re-earn under the driver ---
    "hierarchical_assign_agreement",
    "pq_refined_recall",
    "pq_topk_recall",
    # --- the r4-stale refresh (oldest official rows; 33 of 38 — five
    # deferred: winsorize_values/xmr_control_limits/zscore_outliers/
    # array_functions/map_functions park first in line for round 10) ---
    "containment_pairs",
    "conversion_delay_quantiles",
    "data_quality_report",
    "embedding_normalize",
    "hash_sample",
    "hourly_change",
    "incremental_mv_rollup",
    "json_props",
    "k_anonymity_audit",
    "mad_outliers",
    "mixture_resample_lang",
    "oov_rate",
    "repeated_chunks",
    "revenue_concentration",
    "setop_except_all",
    "split_divergence",
    "token_counts",
    "tpch_q11_important_parts",
    "tpch_q13_order_count_dist",
    "tpch_q16_supplier_part_counts",
    "tpch_q19_disjunctive_filter",
    "tpch_q1_pricing_summary",
    "tpch_q20_heavy_shippers",
    "tpch_q21_waiting_supplier",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q9_nation_profit",
    "unpivot_metrics",
    "value_histogram",
    "window_distribution",
    # ---------------- out-of-window below this line ----------------
    # first in line for the round-10 refresh: the five deferred r4
    # rows, then the oldest r5-era official rows
    "winsorize_values",
    "xmr_control_limits",
    "zscore_outliers",
    "array_functions",
    "map_functions",
    "argmax_latest",
    "audio_stats_real",
    "benford_audit",
    "bigram_logprob",
    "bloom_filter_join_stats",
    "cohort_retention",
]


# The window rotates each round so every query eventually earns an
# official driver row. Round-9 composition (exactly 50): the flagship
# sentinel; the 9 queries NEW in r9 (BFS/recursive-CTE parity, the
# distributed Pareto sweep, a-priori triples, session path mining,
# the lossless prefix-filtered Jaccard join, label-propagation
# communities); the 4 late-r8 never-checked retrieval queries
# (hybrid_search, retrieval_ndcg_at_k, diversified_topk, mmr_topk —
# never-checked beats stale-refresh, the standing precedent); the 3
# queries touched by the round-9 review fixes (hierarchical
# assignment's childless-super rule + smallest-n oracle, the
# fixed-point refined-codebook means, pq_topk's explicit-codebook
# validation); and 33 of the 38 r4-stale rows — the oldest official
# records left (TPC-H tail, sampling, setops; the deferred
# winsorize_values/xmr_control_limits/zscore_outliers/array_functions/
# map_functions park first in line for round 10 with the oldest r5
# rows). The two LATE round-9 additions (ks_drift_promo,
# bfs_shortest_path_tree) land after the window filled — they are the
# round-10 never-checked backlog, first in line there by the standing
# never-checked-beats-stale rule.
# Everything below the out-of-window line holds an r1-r8 green row and
# is re-verified locally every round by check_oracle / check_bare
# (235 registered; full-registry gates at sf0.001/0.01/0.1 recorded in
# README per round).


def _reorder_registry() -> None:
    assert set(_DRIVER_WINDOW_PRIORITY) <= set(QUERIES), sorted(
        set(_DRIVER_WINDOW_PRIORITY) - set(QUERIES)
    )
    rest = [n for n in QUERIES if n not in set(_DRIVER_WINDOW_PRIORITY)]
    order = _DRIVER_WINDOW_PRIORITY + rest
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_reorder_registry()
