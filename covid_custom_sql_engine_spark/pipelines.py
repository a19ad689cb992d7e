"""End-to-end reference application pipelines.

``dashboard_pipeline`` reproduces the reference's interactive dashboard
dataflow (SURVEY §3 entry point 2; app.py:84-158 load + 295-337 rerun +
914-1391 display) as ONE lazy Spark plan per output instead of the
reference's materialize-every-step loop:

  CSV parse (S1-S3) → required-column validation (A1) → countries-only
  filter (A2) → date-range filter (A5) → LATEST_TBL (A3) → location
  membership filter (A6) → enrichment join with r_ prefix (J1/A16) →
  multi-metric stat summary (A14) → chart pivot (A10) + LOCF (A11) →
  date bounds (A12) → pretty rename (A15), timings logged (A17).

Everything stays lazy until the caller acts on an output; the COVID fact
table is cached once (A18) because every downstream branch re-reads it —
the Spark analogue of the reference's ``@st.cache_resource`` load.
"""

from __future__ import annotations

import os

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid_custom_sql_engine_spark.operators import composites as comp
from covid_custom_sql_engine_spark.operators.core import ref_join
from covid_custom_sql_engine_spark.plans.listener import ExecutionLog, timed_action
from covid_custom_sql_engine_spark.sources import read_csv_ref, validate_required_columns
from covid_custom_sql_engine_spark.sources.csv_source import try_float

# app.py REQUIRED_COLS (app.py:86-94)
REQUIRED_COLS = {"iso_code", "continent", "location", "date", "total_cases", "total_deaths"}

DEFAULT_METRICS = ("total_cases", "total_deaths", "new_cases", "new_deaths")

# Reference env-var contract (app.py:72-77, README.md:62-66): the data
# FILES are named by env vars, resolved inside a data directory, with
# the reference's defaults.
DEFAULT_DATA_FILE = "owid-covid-data.csv"
DEFAULT_META_FILE = "country_meta.csv"


def data_files_from_env(data_dir: str) -> tuple[str, str]:
    """Resolve (covid_csv, meta_csv) inside ``data_dir`` honoring the
    reference's ``COVID_DATA_FILE`` / ``COUNTRY_META_FILE`` env
    overrides (app.py:72-77)."""
    covid = os.environ.get("COVID_DATA_FILE", DEFAULT_DATA_FILE)
    meta = os.environ.get("COUNTRY_META_FILE", DEFAULT_META_FILE)
    return os.path.join(data_dir, covid), os.path.join(data_dir, meta)


# Column mapping for the implied derived analytics (PRETTY names the
# reference displays but never computes, app.py:63-69): which fact
# columns play treatment/outcome/capacity/burden.
_VAX_X = "people_fully_vaccinated_per_hundred"
_VAX_Y = "new_cases_smoothed_per_million"
_RESILIENCE_POS = (
    "gdp_per_capita",
    "human_development_index",
    "hospital_beds_per_thousand",
)
_RESILIENCE_BURDEN = "total_deaths_per_million"


def dashboard_pipeline(
    spark: SparkSession,
    covid_csv: str | None = None,
    meta_csv: str | None = None,
    data_dir: str | None = None,
    date_range: tuple[str, str] | None = None,
    locations: Sequence[str] | None = None,
    metrics: Sequence[str] = DEFAULT_METRICS,
    chart_metric: str = "total_cases",
    log: ExecutionLog | None = None,
) -> dict[str, object]:
    """Run the dashboard dataflow; returns named lazy DataFrames.

    Outputs: ``fact`` (validated, countries-only, range-filtered),
    ``latest_tbl`` (location × max-per-metric wide table),
    ``locations`` (distinct sorted), ``enriched`` (latest ⋈ meta,
    r_-prefixed), ``stats`` (7-fn summary per metric), ``chart``
    (date × location LOCF-filled wide series), ``date_bounds``; plus,
    when the COVID columns are present, the implied derived analytics
    ``vaccination_effect`` (eff_40/eff_60/herd_threshold_estimate) and
    ``resilience`` (per-location economic_resilience_score) —
    functions/epi.py.

    Data files resolve either from explicit ``covid_csv``/``meta_csv``
    paths or from ``data_dir`` + the reference's env contract
    (``COVID_DATA_FILE`` / ``COUNTRY_META_FILE``, app.py:72-77); a
    ``meta_csv`` resolved from env that doesn't exist is skipped, the
    reference's optional-metadata behavior (app.py:78-82).
    """
    log = log if log is not None else ExecutionLog()
    if covid_csv is None:
        if data_dir is None:
            raise ValueError("provide covid_csv or data_dir")
        covid_csv, env_meta = data_files_from_env(data_dir)
        if meta_csv is None and os.path.exists(env_meta):
            meta_csv = env_meta

    with timed_action(log, "load+validate"):
        raw = read_csv_ref(spark, covid_csv)
        validate_required_columns(raw, REQUIRED_COLS)
        # mixed-type parity columns arrive as strings; metric use sites
        # apply try-cast-to-double (= reference numeric filtering,
        # dataframe.py:48)
        fact = raw.filter(F.col("continent").isNotNull())  # A2

    if date_range is not None:
        start, end = date_range
        # ISO string dates compare lexicographically (app.py:295-301)
        fact = fact.filter(F.col("date").between(start, end))
    fact = fact.cache()  # A18 — every output branches from here

    typed = fact.select(
        "location", "date", *[try_float(m).alias(m) for m in metrics]
    )

    with timed_action(log, "latest_tbl"):
        latest = comp.latest_per_group(typed, "location", list(metrics))  # A3
        if locations is not None:
            latest = latest.filter(F.col("location").isin(list(locations)))  # A6

    out: dict[str, object] = {
        "fact": fact,
        "latest_tbl": latest,
        "locations": comp.distinct_sorted(fact, "location"),  # A4
        "date_bounds": fact.agg(
            F.min("date").alias("min_date"), F.max("date").alias("max_date")
        ),  # A12
        "stats": comp.stat_summary(typed, list(metrics)),  # A14
        "chart": comp.locf(  # A11 over A10's long form
            typed.select("location", "date", chart_metric),
            key="location",
            order_col="date",
            value_col=chart_metric,
        ),
        "log": log,
    }

    # Implied derived analytics — only when the fact table actually
    # carries the COVID columns (parity mode loads everything as
    # strings; try_float is the reference's numeric coercion).
    if _VAX_X in fact.columns and _VAX_Y in fact.columns:
        from covid_custom_sql_engine_spark.functions import epi

        with timed_action(log, "vaccination_effect"):
            pairs = fact.select(
                try_float(_VAX_X).alias("x"), try_float(_VAX_Y).alias("y")
            )
            out["vaccination_effect"] = epi.vaccination_effect(pairs, "x", "y")
    present_pos = [c for c in _RESILIENCE_POS if c in fact.columns]
    if present_pos and _RESILIENCE_BURDEN in fact.columns:
        from covid_custom_sql_engine_spark.functions import epi

        with timed_action(log, "resilience_score"):
            ind = fact.select(
                "location",
                *[try_float(c).alias(c) for c in present_pos],
                try_float(_RESILIENCE_BURDEN).alias(_RESILIENCE_BURDEN),
            )
            out["resilience"] = epi.economic_resilience_score(
                ind, "location", tuple(present_pos), _RESILIENCE_BURDEN
            )

    if meta_csv is not None:
        with timed_action(log, "enrich_join"):
            meta = read_csv_ref(spark, meta_csv)
            out["enriched"] = ref_join(latest, meta, on=("location", "location"), how="inner")
    return out
