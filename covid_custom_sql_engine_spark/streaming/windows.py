"""Structured Streaming surface over the ``events`` table.

The reference has no streaming (SURVEY §2.3); this is the
beyond-reference scope. Every builder takes a DataFrame so the SAME
transformation runs in batch mode (for the DuckDB oracle, where
expressible) and in streaming mode (``readStream`` + watermark, tested
with an availableNow file stream in tests/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (availableNow-friendly)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet")


def with_event_time_watermark(df: DataFrame, col: str, delay: str) -> DataFrame:
    """``withWatermark`` that tolerates TIMESTAMP_NTZ event time.

    Spark's watermark tracking requires TIMESTAMP (LTZ); parquet files
    written with plain timestamp[us] load as NTZ and would throw
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. The cast interprets the wall
    time in the session timezone — identical on both the batch and
    stream side of a parity check, so window boundaries agree.
    """
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df.withWatermark(col, delay)


def _sum_value(det: bool):
    if det:
        from covid_custom_sql_engine_spark.operators.core import dsum

        return dsum(F.col("value")).alias("sum_value")
    return F.sum("value").alias("sum_value")


def tumbling_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    streaming: bool = False,
    det: bool = False,
) -> DataFrame:
    """Tumbling event-time windows per event_type: count + sum(value).

    In streaming mode the watermark bounds state: windows older than the
    watermark close and evict. Window boundaries are epoch-aligned.
    ``det`` switches to the order-independent fixed-point sum.
    """
    src = with_event_time_watermark(events, "ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_value(det),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    streaming: bool = False,
) -> DataFrame:
    """Sliding windows — each event lands in window/slide buckets."""
    src = with_event_time_watermark(events, "ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_windows(
    events: DataFrame,
    gap: str = "15 minutes",
    watermark: str = "30 minutes",
    streaming: bool = False,
    det: bool = False,
) -> DataFrame:
    """Session windows per user: a session extends while consecutive
    events are within ``gap``. Batch mode runs the same expression."""
    src = with_event_time_watermark(events, "ts", watermark) if streaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value(det))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state."""
    return with_event_time_watermark(events, "ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
    how: str = "inner",
    purchase_watermark: str | None = None,
) -> DataFrame:
    """Stream-stream join: each click matched to every purchase by
    the same user within ``max_delay`` after the click (the attribution
    shape). The SAME builder runs in batch (oracle) and streaming mode.
    ``how="left_outer"`` also emits unconverted clicks (purchase columns
    NULL) — in streaming, an unmatched click emits only once the
    watermark passes its match window, i.e. when a match is provably
    impossible.

    In streaming mode BOTH sides carry a watermark and the join
    condition bounds event time on both sides — that pair is what lets
    Spark evict join state: a buffered click can be dropped once the
    purchase-side watermark passes click_ts + max_delay. Without the
    time bound, stream-stream join state grows forever (and outer
    results could never be declared final).

    The two streams are INDEPENDENT sources and may lag differently
    (a purchase feed routed through a payment processor arrives later
    than the click feed): ``purchase_watermark`` sets the
    purchase-side delay separately (default: same as ``watermark``).
    Spark's GLOBAL watermark is the minimum across inputs, so the
    slower side's delay governs state eviction and outer-result
    finality — per-side delays bound each side's buffered state to
    what that side's lateness actually requires.

    Scale shape: an equi-join on user_id (one shuffle each side, no
    broadcast — both sides are unbounded); the time predicate is a
    post-match filter on the matched pair, not a nested-loop condition.
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if streaming:
        c = with_event_time_watermark(c, "click_ts", watermark)
        p = with_event_time_watermark(
            p, "purchase_ts", purchase_watermark or watermark
        )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_delay}")),
        how,
    )
    return joined.select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"
    )


def interval_self_join(
    events: DataFrame,
    lookback: str = "15 minutes",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Stream-stream INTERVAL SELF-JOIN: each event is matched with
    every STRICTLY EARLIER event of the same user within ``lookback``
    — the "what happened just before this" enrichment a sessionizing
    pipeline asks right after stream-static joins. The SAME builder
    runs in batch (oracle) and streaming mode; the round-trip parity
    test is the attribution_join pattern.

    One stream, two roles: the self-join reads the source twice (Spark
    plans two scans of the same stream), each side watermarked. The
    time bound on BOTH sides is what lets Spark evict join state — a
    buffered left event can be dropped once the right-side watermark
    passes its ts + lookback; without it, self-join state grows
    forever.

    Scale shape: an equi-join on user_id (one shuffle per side); the
    interval predicate is a post-match filter on the pair, and state
    size is bounded by (events per user per lookback) × watermark.
    """
    cur = events.select(
        F.col("user_id"),
        F.col("event_id"),
        F.col("ts"),
        F.col("event_type"),
    )
    prev = events.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("prev_event_id"),
        F.col("ts").alias("prev_ts"),
        F.col("event_type").alias("prev_event_type"),
    )
    if streaming:
        cur = with_event_time_watermark(cur, "ts", watermark)
        prev = with_event_time_watermark(prev, "prev_ts", watermark)
    joined = cur.join(
        prev,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("prev_ts") < F.col("ts"))
        & (F.col("prev_ts") >= F.col("ts") - F.expr(f"INTERVAL {lookback}")),
        "inner",
    )
    return joined.select(
        "user_id", "event_id", "ts", "event_type",
        "prev_event_id", "prev_ts", "prev_event_type",
    )


def enriched_window_totals(
    events: DataFrame,
    customers: DataFrame,
    window: str = "6 hours",
    watermark: str = "30 minutes",
    streaming: bool = False,
    det: bool = False,
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: events joined to
    the static customer dimension on user_id, then tumbling event-time
    windows per customer nation. The SAME builder runs in batch (oracle)
    and streaming mode; in streaming, Spark re-plans the static side per
    micro-batch, so a dimension refresh is picked up without restart.

    Scale shape: the dimension projects to 2 columns and broadcasts —
    the stream side never shuffles for the join; the windowed aggregate
    shuffles on (window, nation), with watermark-bounded state in
    streaming mode.
    """
    src = with_event_time_watermark(events, "ts", watermark) if streaming else events
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("_ck"), F.col("c_nationkey").alias("nationkey")
        )
    )
    return (
        src.join(dim, src["user_id"] == F.col("_ck"))
        .groupBy(F.window("ts", window).alias("w"), "nationkey")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value(det))
        .select(
            F.col("w.start").alias("window_start"),
            "nationkey",
            "n_events",
            "sum_value",
        )
    )
