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


def dashboard_pipeline(
    spark: SparkSession,
    covid_csv: str,
    meta_csv: str | None = None,
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
    (date × location LOCF-filled wide series), ``date_bounds``.
    """
    log = log if log is not None else ExecutionLog()

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

    if meta_csv is not None:
        with timed_action(log, "enrich_join"):
            meta = read_csv_ref(spark, meta_csv)
            out["enriched"] = ref_join(latest, meta, on=("location", "location"), how="inner")
    return out
