"""End-to-end dashboard pipeline over a COVID-shaped CSV fixture
(FIXTURES.md §1-2): the reference's entire app dataflow in one run."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.pipelines import dashboard_pipeline

COVID_CSV = """iso_code,continent,location,date,total_cases,total_deaths,new_cases,new_deaths
AAA,Europe,Alpha,2021-01-01,10,1,10,1
AAA,Europe,Alpha,2021-01-02,15,1,5,0
AAA,Europe,Alpha,2021-01-03,,,,
AAA,Europe,Alpha,2021-01-04,30,2,15,1
BBB,Asia,Beta,2021-01-01,100,5,100,5
BBB,Asia,Beta,2021-01-02,150,7,50,2
BBB,Asia,Beta,2021-01-04,220,9,70,2
OWID,,World,2021-01-01,110,6,110,6
CCC,Europe,"Gamma, Land",2021-01-02,7,0,7,0
"""

META_CSV = """location,continent,income_group
Alpha,Europe,High
Beta,Asia,"Low, income"
Unmatched,Africa,Unknown
,Europe,High
"""


@pytest.fixture(scope="module")
def outputs(spark):
    covid = tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False)
    covid.write(COVID_CSV)
    covid.close()
    meta = tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False)
    meta.write(META_CSV)
    meta.close()
    return dashboard_pipeline(
        spark,
        covid.name,
        meta.name,
        date_range=("2021-01-01", "2021-01-04"),
        metrics=("total_cases", "total_deaths"),
    )


def test_countries_only_filter(outputs):
    # A2: the null-continent OWID aggregate row is dropped
    locs = [r.location for r in outputs["locations"].collect()]
    assert locs == ["Alpha", "Beta", "Gamma, Land"]  # sorted; quoted comma survives


def test_latest_tbl_max_per_metric(outputs):
    latest = {r.location: r for r in outputs["latest_tbl"].collect()}
    assert latest["Alpha"].total_cases == 30.0
    assert latest["Beta"].total_deaths == 9.0


def test_enrichment_join_r_prefix_inner(outputs):
    rows = {r.location: r for r in outputs["enriched"].collect()}
    # inner join: Gamma (no meta) and Unmatched (no fact) both drop
    assert set(rows) == {"Alpha", "Beta"}
    assert rows["Beta"].r_income_group == "Low, income"
    assert rows["Alpha"].r_location == "Alpha"


def test_locf_fills_gap_row(outputs):
    chart = {
        (r.location, r.date): r.total_cases_filled for r in outputs["chart"].collect()
    }
    # Alpha 01-03 is a null row -> carries 01-02's 15.0 forward
    assert chart[("Alpha", "2021-01-03")] == 15.0
    assert chart[("Alpha", "2021-01-04")] == 30.0


def test_stats_and_bounds(outputs):
    stats = {r.metric: r for r in outputs["stats"].collect()}
    assert stats["total_cases"]["count"] == 8.0  # COUNT(*) incl. the null row
    assert stats["total_cases"].max == 220.0
    b = outputs["date_bounds"].collect()[0]
    assert (b.min_date, b.max_date) == ("2021-01-01", "2021-01-04")


def test_execution_log_recorded(outputs):
    ops = [e.op for e in outputs["log"].entries]
    assert "load+validate" in ops and "latest_tbl" in ops and "enrich_join" in ops


def test_missing_required_column_raises(spark):
    bad = tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False)
    bad.write("iso_code,location\nA,B\n")
    bad.close()
    with pytest.raises(ValueError, match="missing required"):
        dashboard_pipeline(spark, bad.name)
