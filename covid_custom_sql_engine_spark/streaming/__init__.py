from covid_custom_sql_engine_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_windows,
    stream_events,
    dedup_within_watermark,
    enriched_window_totals,
)
from covid_custom_sql_engine_spark.streaming.stateful import (
    running_totals_batch,
    running_totals_stream,
    running_totals_tws,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "stream_events",
    "dedup_within_watermark",
    "enriched_window_totals",
    "running_totals_batch",
    "running_totals_stream",
    "running_totals_tws",
]
