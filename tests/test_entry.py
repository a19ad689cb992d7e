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


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    df.limit(5).collect()  # executes the plan
