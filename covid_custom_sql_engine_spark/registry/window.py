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
    # ---- ROUND 12 WINDOW (first 50 = the driver's official check set) ----
    # flagship first — it's also the entry() smoke query
    "flagship_revenue_by_nation",
    # --- NEW in round 12 (never driver-checked — the standing rule:
    # never-checked beats stale) slot here as they land, displacing the
    # tail of the r6 refresh slice below ---
    "mjpeg_stats_real",
    "louvain_communities",
    "opq_topk_recall",
    "quality_classifier_lexical",
    "dsir_importance_weights",
    "jpeg420_stats_real",
    # --- the r5-stale refresh: ALL 32 remaining rows whose official
    # record dates to round 5 (age 7 = the new hard staleness ceiling in
    # tools/check_window_debt.py — every one of these would fail the
    # gate if parked out-of-window another round). Alphabetical. ---
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
    # --- the r6-stale refresh, the oldest age-6 rows (alphabetical;
    # the tail spills past slot 50 as round-12 queries land — spilled
    # rows stay age-6, under the ceiling, and lead the r13 refresh) ---
    "anti_join",
    "asof_join",
    "asof_join_forward_tol",
    "audio_spectrum_real",
    "corpus_curation_pipeline",
    "cosine_near_dups",
    "cosine_topk",
    "cube_agg",
    "datetime_functions",
    "dedup_exact",
    "dedup_representative",
    "embedding_norms",
    "frame_sample_plan",
    # ---------------- out-of-window below this line ----------------
    # first in line for the round-13 refresh: the remaining r6-era rows
    # (alphabetical), then the r7-era rows per check_window_debt.py's
    # staleness listing
    "grouping_sets",
    "guarded_incremental_dedup",
    "jpeg_stats_real",
    "lagged_corr_best",
    "lang_id",
    "locf_fill",
    "lsh_topk",
    "multimodal_features",
    "ngram_jaccard_pairs",
    "pca_power_step",
    "percentiles",
    "png_stats_real",
    "repeated_span_removal",
    "rolling_avg_7",
    "rollup_agg",
    "scalar_functions",
    "semi_join",
    "session_window",
    "setop_except",
    "setop_intersect",
    "setop_union",
    "simhash",
    "sliding_window",
    "stateful_running_total",
    "stream_static_join",
    "text_profile",
    "tumbling_window",
    "video_stats_real",
    "window_functions",
    "window_running_sum",
]


# The window rotates each round so every query eventually earns an
# official driver row. Round-12 composition (exactly 50, per the
# round-11 verdict's advice #1 — "fill the r12 window with flagship +
# the 49 stalest rows"): the flagship sentinel; the 4 queries NEW in
# round 12 (mjpeg_stats_real — the MJPEG-in-AVI compressed-video decode
# rung, louvain_communities — one-level modularity ascent,
# opq_topk_recall — learned-rotation PQ recall audit,
# quality_classifier_lexical — the learned gate's hashed-BOW lexical
# features proven on a vocabulary-separated corpus); ALL 32 rows whose
# official record dates to round 5 (now age 7, the hard staleness
# ceiling that tools/check_window_debt.py enforces as of round 12);
# and the first 13 (alphabetical) of the 43 round-6-era rows.
# Everything below the out-of-window line holds an r1-r11 green row and
# is re-verified locally every round by check_oracle / check_bare
# (full-registry gates at sf0.001/0.01/0.1 recorded in README per
# round). tools/check_window_debt.py enforces that no registered query
# goes more than 2 rounds without an official driver record, that no
# official record ages past 7 rounds without being queued, and that the
# registry counts stated in README/SURVEY match len(QUERIES).


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
