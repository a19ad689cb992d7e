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
    # round 4: the 8 HUGEINT-oracle fixes retained to prove the cast,
    # the last never-driver-checked queries, and the 8 new-this-round
    # registrations (no new never-checked backlog may form)
    assert {
        # retained r3 hash-fails (oracle ::BIGINT casts) + latent 8th
        "pack_token_budget", "data_quality_report", "split_divergence",
        "k_anonymity_audit", "winsorize_values", "mad_outliers",
        "bloom_filter_join_stats", "xmr_control_limits",
        # the final never-checked backlog
        "containment_pairs", "tpch_q4_order_priority",
        "tpch_q13_order_count_dist", "conversion_delay_quantiles",
        "revenue_concentration", "token_counts",
        # new this round
        "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
        "tpch_q8_market_share", "tpch_q9_nation_profit",
        "tpch_q19_disjunctive_filter", "tpch_q21_waiting_supplier",
        "bm25_search", "mixture_resample_lang",
    } <= window


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    df.limit(5).collect()  # executes the plan
