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
    # round 10: the thirty queries new this round (five waves)
    # plus the two late-r9 additions (never driver-checked), the two
    # advice-fix-touched queries, the five deferred r4 rows, and the
    # oldest (r5) official rows (no new never-checked backlog may form)
    assert {
        # new this round, first wave
        "ann_join_recall", "ann_join_clusters", "sssp_bounded_costs",
        "vaccination_effect_fit",
        "resilience_score_by_nation", "prefix_jaccard_zipf",
        "bpe_train_merges", "bpe_encoded_lengths", "chi2_drift_source",
        # new this round, second wave
        "kcore_trading_graph", "wasserstein_drift_promo",
        "cusum_changepoint_revenue", "ind_audit", "shapley_attribution",
        "kmv_setops_orders", "t_closeness_audit", "item_cf_topk",
        "ab_wilson_bounds", "ab_ztest_conversion", "theil_sen_trend",
        # new this round, third wave
        "kaplan_meier_fulfillment", "adamic_adar_links",
        "modularity_nations", "bh_fdr_segments", "dominant_period_dft",
        "mutual_info_docs",
        # new this round, fourth wave
        "logrank_priority", "ppr_trusted_sources",
        # new this round, fifth wave
        "conformal_interval", "info_gain_split",
        # late r9, never driver-checked
        "bfs_shortest_path_tree", "ks_drift_promo",
        # touched by the r10 advice fixes
        "prefix_jaccard_pairs", "label_propagation_communities",
        # the five r4 rows deferred from round 9
        "winsorize_values", "xmr_control_limits", "zscore_outliers",
        "array_functions", "map_functions",
        # the r5-stale refresh (spot sample incl. the verdict-named §2
        # core-parity rows; the full 35-query slice is asserted by the
        # prefix==window check above)
        "filter_range_project", "join_ref_inner", "sort_nulls_rank",
        "group_agg_ref7", "stat_summary", "udaf_geometric_mean",
        "pagerank_bipartite", "hits_bipartite",
        # pinned sentinel
        "flagship_revenue_by_nation",
    } <= window


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    df.limit(5).collect()  # executes the plan
