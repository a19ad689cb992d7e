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
    # ---- ROUND 10 WINDOW (first 50 = the driver's official check set) ----
    # flagship first — it's also the entry() smoke query
    "flagship_revenue_by_nation",
    # --- landed late in round 9, never driver-checked (the standing
    # never-checked-beats-stale rule) ---
    "bfs_shortest_path_tree",
    "ks_drift_promo",
    # --- NEW in round 10 (never driver-checked): the corpus×corpus ANN
    # similarity join audit + its CC clustering composition, bounded-hop
    # weighted SSSP, the reference's implied derived analytics, the
    # Zipfian-corpus PPJoin (uncapped through all three filters), the
    # iterated BPE trainer + its encode step, and the exact chi-square
    # categorical drift test ---
    "ann_join_recall",
    "ann_join_clusters",
    "sssp_bounded_costs",
    "vaccination_effect_fit",
    "resilience_score_by_nation",
    "prefix_jaccard_zipf",
    "bpe_train_merges",
    "bpe_encoded_lengths",
    "chi2_drift_source",
    # --- NEW in round 10, second wave (never driver-checked): bounded
    # k-core peeling, the W1/CUSUM drift siblings, the IND audit, exact
    # Shapley attribution, KMV set-operation sketches, the t-closeness
    # privacy gate, item-item CF cosine, the A/B experimentation
    # readout (Wilson + pooled z), and the Theil-Sen robust trend ---
    "kcore_trading_graph",
    "wasserstein_drift_promo",
    "cusum_changepoint_revenue",
    "ind_audit",
    "shapley_attribution",
    "kmv_setops_orders",
    "t_closeness_audit",
    "item_cf_topk",
    "ab_wilson_bounds",
    "ab_ztest_conversion",
    "theil_sen_trend",
    # --- NEW in round 10, third wave (never driver-checked): the
    # Kaplan–Meier censoring-aware survival curve, seeded Adamic–Adar
    # link prediction, Newman modularity of a partition, the
    # Benjamini–Hochberg step-up over the per-segment z-test family,
    # the Fourier periodogram scan, and categorical mutual
    # information ---
    "kaplan_meier_fulfillment",
    "adamic_adar_links",
    "modularity_nations",
    "bh_fdr_segments",
    "dominant_period_dft",
    "mutual_info_docs",
    # --- NEW in round 10, fourth wave (never driver-checked): the
    # log-rank survival test and seed-restart personalized PageRank ---
    "logrank_priority",
    "ppr_trusted_sources",
    # --- NEW in round 10, fifth wave (never driver-checked): the
    # split-conformal prediction-interval calibration and the
    # information-gain decision-stump split search ---
    "conformal_interval",
    "info_gain_split",
    # --- touched by the round-10 advice fixes (PPJoin epsilon guards on
    # the prefix-length ceil and the length filter; label_propagation's
    # per-round vote pinning) — values re-proven locally, official rows
    # re-earn under the driver ---
    "prefix_jaccard_pairs",
    "label_propagation_communities",
    # --- the five r4 rows deferred from the round-9 refresh (the oldest
    # official records left) ---
    "winsorize_values",
    "xmr_control_limits",
    "zscore_outliers",
    "array_functions",
    "map_functions",
    # --- the r5-stale refresh, 10 of 45: the §2 core-parity rows the
    # round-9 verdict called out by name plus pagerank/hits from its
    # graph tail. The 21 rows the second through fifth waves displaced
    # plus the 14 first-wave parked rows (all below the line) lead the
    # round-11 refresh. ---
    "filter_range_project",
    "join_ref_inner",
    "sort_nulls_rank",
    "stat_summary",
    "pivot_wide",
    "udaf_geometric_mean",
    "whole_table_agg",
    "group_agg_ref7",
    "pagerank_bipartite",
    "hits_bipartite",
    # ---------------- out-of-window below this line ----------------
    # first in line for the round-11 refresh: the twenty-one r5 rows
    # the second/third/fourth/fifth-wave round-10 queries displaced
    # (never-checked beats stale), then the fourteen r5 rows parked in
    # the first wave, then the oldest r6-era official rows
    "topk_orders",
    "cohort_retention",
    "benford_audit",
    "argmax_latest",
    "audio_stats_real",
    "bigram_logprob",
    "bloom_filter_join_stats",
    "collocation_pmi",
    "column_entropy_profile",
    "distinct_sorted",
    "embedding_outliers",
    "event_burstiness",
    "event_transition_matrix",
    "ewma_smooth",
    "funnel_conversion",
    "image_stats_real",
    "latest_per_group",
    "lsh_band_skew_monitor",
    "minhash_lsh_pairs",
    "minmax_dates",
    "near_dup_clusters",
    "ngram_diversity",
    "pack_token_budget",
    "psi_drift",
    "rename_pretty",
    "rolling_median",
    "safe_corr_qty_price",
    "seasonal_baseline",
    "source_overlap_matrix",
    "source_scorecard",
    "token_fertility_by_lang",
    "tpch_q12_ship_priority_classes",
    "triangle_counts",
    "user_entropy_histogram",
    "vocab_stats",
    "zipf_slope",
]


# The window rotates each round so every query eventually earns an
# official driver row. Round-10 composition (exactly 50): the flagship
# sentinel; the 2 late-r9 additions that missed the r9 window snapshot
# (bfs_shortest_path_tree, ks_drift_promo — never driver-checked); the
# 20 queries NEW in r10 — first wave (the corpus×corpus ANN join audit
# + its CC clustering composition, bounded-hop weighted SSSP, the
# reference's implied vaccination-effect + resilience analytics, the
# uncapped Zipfian PPJoin, the iterated BPE trainer + its encode step,
# the exact chi-square categorical drift test) and second wave
# (bounded k-core peeling, W1 + CUSUM drift, the IND audit, exact
# Shapley attribution, KMV set-op sketches, t-closeness, item-item CF,
# Wilson + pooled-z experimentation stats, Theil-Sen trend), third
# wave (Kaplan–Meier survival, seeded Adamic–Adar, Newman modularity,
# Benjamini–Hochberg FDR, the Fourier periodogram, categorical mutual
# information), fourth wave (the log-rank survival test, personalized
# PageRank), and fifth wave (split-conformal interval calibration,
# the information-gain stump split); the 2 queries touched by the r10
# advice fixes (prefix_jaccard_pairs' epsilon guards,
# label_propagation_communities' vote pinning); the 5 r4 rows deferred
# from round 9 (winsorize/xmr/zscore/array/map — the oldest official
# records); and 10 of the 45 r5-stale rows — ALL SEVEN §2 core-parity
# rows the round-9 verdict named (filter_range_project, join_ref_inner,
# sort_nulls_rank, group_agg_ref7, stat_summary, pivot_wide,
# udaf_geometric_mean) plus whole_table_agg and pagerank_bipartite /
# hits_bipartite from its graph tail. The 21 r5 rows the second
# through fifth waves displaced (topk_orders, cohort_retention …
# ngram_diversity) lead the round-11 refresh, ahead of the 14 r5 rows
# parked in the first wave (pack_token_budget … zipf_slope) and the
# oldest r6 rows.
# Everything below the out-of-window line holds an r1-r9 green row and
# is re-verified locally every round by check_oracle / check_bare
# (304 registered; full-registry gates at sf0.001/0.01/0.1 recorded in
# README per round).
#
# Round-10 CONTINUATION queries (registered after the window snapshot,
# never driver-checked — by the standing never-checked-beats-stale rule
# they lead the round-11 window AHEAD of the displaced r5 rows):
# mann_whitney_value_shift, rank_correlation_daily, acf_daily_revenue,
# seasonal_dow_decompose, ridge_regression_price, knn_label_vote,
# naive_bayes_lang, bfs_path_counts, ktruss_copurchase,
# spatial_grid_join, rocchio_prf, als_user_step, seed_betweenness,
# bootstrap_mean_ci, rake_keywords, forecast_backtest,
# temporal_reachability, quantile_normalize_events,
# em_gaussian_mixture, ridge_cv_lambda, permutation_test_weekend,
# trigram_name_match, rmst_fulfillment, logistic_newton,
# association_rules, neyman_poisson_sample, markov_entropy_rate
# (and any further continuation entries registered after this note —
# everything in registry/stats_ml.py is round-10-continuation).


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
