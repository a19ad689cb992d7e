from covid_custom_sql_engine_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_windows,
    stream_events,
    dedup_within_watermark,
    enriched_window_totals,
    attribution_join,
    interval_self_join,
    with_event_time_watermark,
)
from covid_custom_sql_engine_spark.streaming.monitor import (
    decay_fold,
    psi_row,
    start_adaptive_psi_monitor,
    start_psi_monitor,
    value_bins,
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
    "attribution_join",
    "interval_self_join",
    "with_event_time_watermark",
    "running_totals_batch",
    "running_totals_stream",
    "running_totals_tws",
    "decay_fold",
    "psi_row",
    "start_adaptive_psi_monitor",
    "start_psi_monitor",
    "value_bins",
]
