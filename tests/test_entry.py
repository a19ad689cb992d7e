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
    # round 12: new never-driver-checked queries + ALL 32 r5-era stale
    # rows (age 7 = the hard staleness ceiling check_window_debt.py now
    # enforces) + the oldest r6-era refresh rows
    assert {
        # new in round 12, never driver-checked
        "mjpeg_stats_real",
        "louvain_communities", "opq_topk_recall",
        "quality_classifier_lexical", "dsir_importance_weights",
        "jpeg420_stats_real",
        # the r5-era staleness-ceiling rows (spot sample; all 32 are in
        # the priority prefix, implied by the prefix==window check above)
        "zipf_slope", "vocab_stats", "triangle_counts",
        "tpch_q12_ship_priority_classes", "safe_corr_qty_price",
        "source_overlap_matrix", "minhash_lsh_pairs", "psi_drift",
        "audio_stats_real", "image_stats_real", "funnel_conversion",
        "latest_per_group", "pack_token_budget", "bigram_logprob",
        # the oldest r6-era refresh rows (alphabetical head)
        "anti_join", "asof_join", "corpus_curation_pipeline",
        "cosine_topk", "dedup_exact",
        # pinned sentinel
        "flagship_revenue_by_nation",
    } <= window


# slow: the 316-query execution sweep (~6 min) is excluded from the
# default (driver) path by pytest.ini — run with `-m ""`. Execution of
# every registered query is independently gated at round end by
# tools/check_oracle.py / check_bare.py (full 316-query oracle runs).
@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    df.limit(5).collect()  # executes the plan
