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
    # round 8: the five queries new this round (never driver-checked),
    # the six whose plan this round's changes touched (PQ-codebook
    # broadcast rework, span apply, y4m parity), the FULL 31-query
    # r3-stale slice (r7 VERDICT item #2), and the 7 oldest r4 rows
    # (no new never-checked backlog may form)
    assert {
        # new this round
        "ivfpq_residual_recall", "pq_refined_recall", "filtered_ann_topk",
        "filtered_ann_audit", "hierarchical_assign_agreement",
        # touched by the PQ broadcast rework / span / y4m changes
        "pq_topk_recall", "ivfpq_topk_recall", "ivfpq_rerank_recall",
        "rrf_fusion", "repeated_span_apply", "video_stats_c420",
        # the 31 r3-stale queries (r7 VERDICT item #2)
        "tpch_q14_promo_share", "tpch_q15_top_supplier",
        "tpch_q17_small_qty_revenue", "tpch_q18_large_orders",
        "tpch_q22_idle_customers", "cms_heavy_hitters",
        "hll_distinct_orders", "zorder_cluster_stats", "minhash_accuracy",
        "windowed_hll_users", "length_bucket_stats", "key_skew_profile",
        "int8_topk_recall", "sql_surface", "chi_square_flags",
        "frequent_part_pairs", "ols_trend_by_type", "weighted_sample_docs",
        "ann_recall", "topn_per_group", "rolling_zscore_anomalies",
        "window_distinct_users", "attribution_left", "levenshtein_pairs",
        "join_full_outer", "subquery_exists_cte", "stratified_sample",
        "redact_pii", "repetition_ratio", "column_profile",
        "winnow_fingerprint",
        # the 3 oldest r4 rows + the late r8 additions
        "bm25_search", "group_agg_ref7", "join_ref_left",
        "binary_hamming_recall", "binary_rerank_recall",
        "ivf_cell_stats", "retrieval_rr_at_k",
        # pinned sentinel
        "flagship_revenue_by_nation",
    } <= window


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    df.limit(5).collect()  # executes the plan
