"""The reference's implied derived analytics on a COVID-shaped fixture
(PRETTY names app.py:63-69; no reference code computes them — these
tests pin the semantics this engine supplies for those columns)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.functions import epi


def test_vaccination_effect_exact_linear(spark):
    # y = 50 − 0.5·x exactly → slope −0.5, intercept 50, eff_40 = −20,
    # eff_60 = −30, herd threshold (x where modeled y hits 0) = 100.
    rows = [(float(x), 50.0 - 0.5 * x) for x in (0, 20, 40, 60, 80)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = epi.vaccination_effect(df, "x", "y").collect()[0]
    assert out.n_pairs == 5
    assert out.slope == -0.5
    assert out.intercept == 50.0
    assert out.eff_40 == -20.0
    assert out.eff_60 == -30.0
    assert out.herd_threshold_estimate == 100.0


def test_vaccination_effect_guards(spark):
    # fewer than min_pairs complete pairs → NULL everything but n;
    # pairwise-complete: null in either column drops the pair.
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, None), (None, 3.0)], "x double, y double"
    )
    out = epi.vaccination_effect(df, "x", "y").collect()[0]
    assert out.n_pairs == 1
    assert out.slope is None and out.herd_threshold_estimate is None

    # zero variance in x → slope 0.0 (safe-corr discipline), intercept =
    # mean(y), herd NULL (slope not < 0).
    flat = spark.createDataFrame(
        [(5.0, 1.0), (5.0, 2.0), (5.0, 3.0)], "x double, y double"
    )
    out = epi.vaccination_effect(flat, "x", "y").collect()[0]
    assert out.slope == 0.0 and out.intercept == 2.0
    assert out.herd_threshold_estimate is None


def test_vaccination_effect_positive_slope_no_herd(spark):
    # vaccination correlating with MORE cases → no herd estimate
    rows = [(float(x), 1.0 * x) for x in (0, 10, 20, 30)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = epi.vaccination_effect(df, "x", "y").collect()[0]
    assert out.slope == 1.0
    assert out.herd_threshold_estimate is None


def test_vaccination_effect_herd_clamped(spark):
    # x-intercept beyond 100% clamps to 100 (a percent can't exceed it)
    rows = [(float(x), 100.0 - 0.1 * x) for x in (0, 20, 40, 60)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = epi.vaccination_effect(df, "x", "y").collect()[0]
    assert out.herd_threshold_estimate == 100.0


def test_resilience_score_covid_shape(spark):
    # Three locations: A dominates every capacity indicator with the
    # lowest burden → score 1.0; C is the mirror image → −1.0; B sits
    # mid-range. NULL indicators drop from that location's mean.
    rows = [
        ("A", 50000.0, 0.95, 8.0, 100.0),
        ("B", 30000.0, None, 5.0, 500.0),
        ("C", 10000.0, 0.55, 2.0, 900.0),
    ]
    df = spark.createDataFrame(
        rows, "location string, gdp double, hdi double, beds double, dpm double"
    )
    out = {
        r.location: r.economic_resilience_score
        for r in epi.economic_resilience_score(
            df, "location", ("gdp", "hdi", "beds"), "dpm"
        ).collect()
    }
    assert out["A"] == 1.0
    assert out["C"] == -1.0
    # B: gdp (30000−10000)/40000 = 0.5, hdi dropped (NULL), beds 0.5 →
    # mean 0.5; burden (500−100)/800 = 0.5 → score 0.0
    assert out["B"] == 0.0


def test_resilience_score_constant_indicator_skipped(spark):
    # an indicator with zero global range contributes nothing (0/0 guard)
    rows = [("A", 1.0, 7.0, 10.0), ("B", 2.0, 7.0, 20.0)]
    df = spark.createDataFrame(
        rows, "location string, gdp double, flat double, dpm double"
    )
    out = {
        r.location: r.economic_resilience_score
        for r in epi.economic_resilience_score(
            df, "location", ("gdp", "flat"), "dpm"
        ).collect()
    }
    # flat drops from both means; A: gdp 0, dpm 0 → 0; B: gdp 1, dpm 1 → 0
    assert out["A"] == 0.0 and out["B"] == 0.0


def test_env_config_parity(tmp_path, monkeypatch):
    """Reference env contract (app.py:72-77, README.md:62-66):
    COVID_DATA_FILE / COUNTRY_META_FILE name the CSVs inside a data
    dir, with the reference's defaults."""
    from covid_custom_sql_engine_spark.pipelines import data_files_from_env

    # defaults
    monkeypatch.delenv("COVID_DATA_FILE", raising=False)
    monkeypatch.delenv("COUNTRY_META_FILE", raising=False)
    covid, meta = data_files_from_env(str(tmp_path))
    assert covid == os.path.join(str(tmp_path), "owid-covid-data.csv")
    assert meta == os.path.join(str(tmp_path), "country_meta.csv")

    # overrides
    monkeypatch.setenv("COVID_DATA_FILE", "my-covid.csv")
    monkeypatch.setenv("COUNTRY_META_FILE", "my-meta.csv")
    covid, meta = data_files_from_env(str(tmp_path))
    assert covid.endswith("my-covid.csv") and meta.endswith("my-meta.csv")


def test_dashboard_pipeline_implied_analytics(spark, tmp_path, monkeypatch):
    """dashboard_pipeline resolves files via the env contract and emits
    the implied-analytics outputs when the COVID columns are present."""
    from covid_custom_sql_engine_spark.pipelines import dashboard_pipeline

    csv = tmp_path / "owid-covid-data.csv"
    hdr = (
        "iso_code,continent,location,date,total_cases,total_deaths,"
        "people_fully_vaccinated_per_hundred,new_cases_smoothed_per_million,"
        "gdp_per_capita,human_development_index,hospital_beds_per_thousand,"
        "total_deaths_per_million"
    )
    rows = [
        f"AA,Europe,Alpha,2021-01-{d:02d},{100 + d},{2 + d},"
        f"{10.0 * d},{200.0 - 15.0 * d},40000,0.9,6,{50 + d}"
        for d in range(1, 6)
    ] + [
        f"BB,Asia,Beta,2021-01-{d:02d},{300 + d},{9 + d},"
        f"{5.0 * d},{300.0 - 10.0 * d},15000,0.6,2,{400 + d}"
        for d in range(1, 6)
    ]
    csv.write_text(hdr + "\n" + "\n".join(rows) + "\n")

    monkeypatch.delenv("COVID_DATA_FILE", raising=False)
    out = dashboard_pipeline(
        spark,
        data_dir=str(tmp_path),
        metrics=("total_cases", "total_deaths"),
    )
    ve = out["vaccination_effect"].collect()[0]
    assert ve.n_pairs == 10
    assert ve.slope < 0  # more vaccination → fewer smoothed cases
    assert ve.herd_threshold_estimate is not None
    res = {
        r.location: r.economic_resilience_score
        for r in out["resilience"].collect()
    }
    assert res["Alpha"] == 1.0 and res["Beta"] == -1.0


def test_dashboard_pipeline_requires_source(spark):
    from covid_custom_sql_engine_spark.pipelines import dashboard_pipeline

    with pytest.raises(ValueError, match="covid_csv or data_dir"):
        dashboard_pipeline(spark)
