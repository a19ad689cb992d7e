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
    # round 9: the nine queries new this round (never driver-checked),
    # the four late-r8 never-checked retrieval queries, the three
    # queries touched by the r9 review fixes, and the oldest (r4)
    # official rows (no new never-checked backlog may form)
    assert {
        # new this round
        "bfs_distances", "skyline_parts", "apriori_triples",
        "top_session_paths", "prefix_jaccard_pairs",
        "label_propagation_communities", "l_diversity_audit",
        "markov_attribution", "fd_audit",
        # late r8, never driver-checked
        "hybrid_search", "retrieval_ndcg_at_k", "diversified_topk",
        "mmr_topk",
        # touched by the r9 review fixes
        "hierarchical_assign_agreement", "pq_refined_recall",
        "pq_topk_recall",
        # the r4-stale refresh (spot sample; the full 35-query slice is
        # asserted by the prefix==window check above)
        "tpch_q2_min_cost_supplier", "tpch_q9_nation_profit",
        "data_quality_report", "tpch_q1_pricing_summary",
        "mixture_resample_lang",
        # pinned sentinel
        "flagship_revenue_by_nation",
    } <= window


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    df.limit(5).collect()  # executes the plan
