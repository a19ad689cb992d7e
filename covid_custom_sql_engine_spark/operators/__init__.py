from covid_custom_sql_engine_spark.operators.core import (
    select_existing,
    ref_sort,
    ref_group_agg,
    ref_join,
    safe_corr,
    whole_table_agg,
    REF_AGG_FNS,
)
from covid_custom_sql_engine_spark.operators.composites import (
    latest_per_group,
    argmax_latest,
    pivot_wide,
    locf,
    rolling_avg,
    stat_summary,
    distinct_sorted,
    rename_pretty,
    lagged_corr_best,
)
from covid_custom_sql_engine_spark.operators.joins import asof_join, range_join

__all__ = [
    "select_existing",
    "ref_sort",
    "ref_group_agg",
    "ref_join",
    "safe_corr",
    "whole_table_agg",
    "REF_AGG_FNS",
    "latest_per_group",
    "argmax_latest",
    "pivot_wide",
    "locf",
    "rolling_avg",
    "stat_summary",
    "distinct_sorted",
    "rename_pretty",
    "lagged_corr_best",
    "asof_join",
    "range_join",
]
