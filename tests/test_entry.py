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
    # round 3: every query whose plan changed this round, plus every
    # query that had never earned a driver row through round 2
    assert {
        # determinism fixes + guard reformulations
        "pack_token_budget", "global_rank_orders", "equidepth_histogram",
        "minhash_lsh_pairs", "incremental_dedup_pairs", "near_dup_clusters",
        "interevent_gap_percentiles", "snapshot_diff", "negative_samples",
        # the 9 late-round-2 registrations the verdict flagged
        "ann_recall", "topn_per_group", "rolling_zscore_anomalies",
        "window_distinct_users", "attribution_left", "levenshtein_pairs",
    } <= window


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    df.limit(5).collect()  # executes the plan
