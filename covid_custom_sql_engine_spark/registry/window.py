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
    # ---- ROUND 11 WINDOW (first 50 = the driver's official check set) ----
    # flagship first — it's also the entry() smoke query
    "flagship_revenue_by_nation",
    # --- the 39 round-10 CONTINUATION queries (everything registered
    # after the r10 window snapshot — now split across rank_inference /
    # timeseries_stats / glm_survival / graph_spatial / ml_mining /
    # feature_quality): never driver-checked, so by the standing
    # never-checked-beats-stale rule they take the whole window ahead
    # of any stale refresh. Listed in their original registration
    # order. ---
    "mann_whitney_value_shift",
    "rank_correlation_daily",
    "acf_daily_revenue",
    "seasonal_dow_decompose",
    "ridge_regression_price",
    "knn_label_vote",
    "naive_bayes_lang",
    "bfs_path_counts",
    "ktruss_copurchase",
    "spatial_grid_join",
    "rocchio_prf",
    "als_user_step",
    "seed_betweenness",
    "bootstrap_mean_ci",
    "rake_keywords",
    "forecast_backtest",
    "temporal_reachability",
    "quantile_normalize_events",
    "em_gaussian_mixture",
    "ridge_cv_lambda",
    "permutation_test_weekend",
    "trigram_name_match",
    "rmst_fulfillment",
    "logistic_newton",
    "association_rules",
    "neyman_poisson_sample",
    "markov_entropy_rate",
    "did_estimator",
    "degree_assortativity",
    "woe_iv_binning",
    "target_encode_oof",
    "expectation_suite",
    "calibration_report",
    "clustering_coefficient",
    "dbscan_spatial",
    "readability_ari",
    "abc_classification",
    "cox_ph_newton",
    "auc_return_score",
    # --- NEW in round 11 (never driver-checked) slot here as they land,
    # displacing r5-stale rows below (never-checked beats stale) ---
    "trigram_match_scaled",
    "quality_classifier_gate",
    "holt_winters_forecast",
    "curation_pipeline_learned",
    "levenshtein_linkage",
    "pii_incidence_audit",
    # --- the r5-stale refresh, 4 of the displaced rows (oldest official
    # records first; the rest lead the round-12 refresh) ---
    "topk_orders",
    "cohort_retention",
    "benford_audit",
    "argmax_latest",
    # ---------------- out-of-window below this line ----------------
    # first in line for the round-12 refresh: the remaining r5 rows the
    # round-10 waves displaced, then the fourteen r5 rows parked in the
    # r10 first wave, then the oldest r6-era official rows
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
# official driver row. Round-11 composition (exactly 50): the flagship
# sentinel; ALL 39 round-10-continuation queries (the former
# stats_ml.py families — rank statistics, time-series diagnostics,
# GLMs-as-SQL, survival analysis, causal inference, record linkage,
# spatial clustering, data-quality suites, graph continuations) that
# were registered after the r10 window snapshot and so had never been
# driver-checked (round-10 verdict, "What's missing" #1); the 6
# queries NEW in round 11 (trigram_match_scaled — the uncapped 20k-name
# record-linkage row, quality_classifier_gate — the learned IRLS
# quality filter, holt_winters_forecast — the unrolled seasonal
# recurrence, curation_pipeline_learned — the learned gate composed
# into the curation pipeline, levenshtein_linkage — the provably-
# lossless bounded edit-distance join, pii_incidence_audit — the
# per-source PII governance readout over injected ground truth); and
# 4 of the r5-stale rows displaced by the round-10 waves (topk_orders
# … argmax_latest — the oldest official records). New round-11 queries slot in ahead of the r5
# refresh as they land, displacing its tail.
# Everything below the out-of-window line holds an r1-r10 green row and
# is re-verified locally every round by check_oracle / check_bare
# (full-registry gates at sf0.001/0.01/0.1 recorded in README per
# round). tools/check_window_debt.py enforces that no registered query
# goes more than 2 rounds without an official driver record.


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
