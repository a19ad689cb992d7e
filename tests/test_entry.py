"""Driver-contract smoke: entry/queries/oracle_sql alignment and that
every registered query executes at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert len(df.collect()) > 0


def test_oracles_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # every query has a value oracle (rows-only entries are a driver FAIL)
    assert set(qs) == set(os_)


def test_driver_window_priority_ordering():
    """The correctness driver checks the first 50 registered queries;
    the front of the registry must hold this round's at-risk entries."""
    from covid_custom_sql_engine_spark import queries_registry as qr

    names = list(entrymod.queries())
    window = set(names[:50])
    # the priority list's 50-entry prefix IS the driver window; entries
    # beyond it are the explicit parking order for future rounds
    assert set(qr._DRIVER_WINDOW_PRIORITY[:50]) == window
    # round 6: the nine queries new this round (never driver-checked),
    # the full 22-query r1-stale slice (set ops, window/scalar/datetime
    # functions, percentiles, simhash, cosine search, multimodal), and
    # the oldest 15 of the r2-stale backlog (no new never-checked
    # backlog may form)
    assert {
        # new this round
        "guarded_incremental_dedup", "kmeans_semdedup_scaled",
        "jpeg_stats_real", "png_stats_real", "video_stats_real",
        "audio_spectrum_real", "pq_topk_recall", "ivfpq_topk_recall",
        "repeated_span_removal",
        # the 22 r1-stale queries (r5 VERDICT item #1)
        "semi_join", "anti_join", "setop_union", "setop_intersect",
        "setop_except", "rollup_agg", "cube_agg", "grouping_sets",
        "window_running_sum", "window_functions", "scalar_functions",
        "datetime_functions", "percentiles", "text_profile", "lang_id",
        "dedup_exact", "simhash", "embedding_norms", "cosine_topk",
        "cosine_near_dups", "multimodal_features", "frame_sample_plan",
        # r5 regression sentinels
        "flagship_revenue_by_nation", "kmeans_semdedup",
        "corpus_curation_pipeline", "dedup_representative",
        # stale §2 rows from the r2 slice
        "locf_fill", "rolling_avg_7", "lagged_corr_best",
    } <= window


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    df.limit(5).collect()  # executes the plan
