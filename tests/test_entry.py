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
    # round 7: the three queries new this round (never driver-checked),
    # the three kmeans-family queries whose assignment plan was
    # rewritten (broadcast struct-max argmax), the FULL 29-query
    # r2-stale slice (MERGE/SCD2/as-of/range joins, sampling,
    # sessionization — r6 VERDICT item #2), and the oldest 14 of the
    # r3-stale cohort (no new never-checked backlog may form)
    assert {
        # new this round
        "ivfpq_rerank_recall", "repeated_span_apply", "video_stats_c420",
        "rrf_fusion", "ivf_incremental_assign",
        # touched by the HOF assignment rewrite (both NULL flavors)
        "kmeans_step", "kmeans_semdedup", "kmeans_semdedup_scaled",
        "semdedup_prune", "ivf_topk", "ivfpq_topk_recall",
        # the 29 r2-stale queries (r6 VERDICT item #2)
        "dataset_split", "exact_medians_scalable", "range_join_bands",
        "salted_join", "interval_overlap_join", "scd2_intervals",
        "merge_upsert", "approx_distinct_parts", "attribution_join",
        "bpe_pair_counts", "chunk_documents", "corpus_filter_pipeline",
        "debounce_events", "decontaminate_ngrams", "demo_showcase",
        "embedding_quantize_int8", "event_transitions", "funnel_steps",
        "hourly_spine_zero_fill", "quota_sample", "range_window_rolling",
        "retention_cohorts", "session_ids", "synth_source_agg",
        "tfidf_top_terms", "time_weighted_avg", "udtf_tokens",
        "unigram_logprob", "winnow_pairs",
        # oldest r3-stale refresh (first TPC-H cohort + ranking)
        "global_rank_orders", "equidepth_histogram",
        "tpch_q3_shipping_priority", "tpch_q10_returned_items",
        # pinned sentinel
        "flagship_revenue_by_nation",
    } <= window


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    df.limit(5).collect()  # executes the plan
