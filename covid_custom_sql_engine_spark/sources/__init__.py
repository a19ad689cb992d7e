from covid_custom_sql_engine_spark.sources.csv_source import (
    read_csv_ref,
    validate_required_columns,
)
from covid_custom_sql_engine_spark.sources.python_datasource import (
    SynthEventsDataSource,
    register as register_synth_events,
)

__all__ = [
    "read_csv_ref",
    "validate_required_columns",
    "SynthEventsDataSource",
    "register_synth_events",
]
