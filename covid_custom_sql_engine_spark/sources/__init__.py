from covid_custom_sql_engine_spark.sources.csv_source import (
    read_csv_ref,
    validate_required_columns,
)

__all__ = ["read_csv_ref", "validate_required_columns"]
