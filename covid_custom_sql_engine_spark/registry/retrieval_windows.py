"""Similarity search, event-time windows, UDAF surface + approximate aggregates.

Split from the single-file registry (round 10); bodies unchanged.
"""

from __future__ import annotations

import math  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window, functions as F  # noqa: F401

from covid_custom_sql_engine_spark.catalog import load_table, parallelize_small  # noqa: F401
from covid_custom_sql_engine_spark.operators import core as ops  # noqa: F401
from covid_custom_sql_engine_spark.operators import composites as comp  # noqa: F401
from covid_custom_sql_engine_spark.operators import joins as xjoins  # noqa: F401
from covid_custom_sql_engine_spark.functions import corpus as cp  # noqa: F401
from covid_custom_sql_engine_spark.functions import dedup as dd  # noqa: F401
from covid_custom_sql_engine_spark.functions import similarity as sim  # noqa: F401
from covid_custom_sql_engine_spark.functions import sketches as sks  # noqa: F401
from covid_custom_sql_engine_spark.functions import text as tx  # noqa: F401
from covid_custom_sql_engine_spark.registry._base import _sql_dsum, query  # noqa: F401,E501


# Phase 3 — similarity search over `embeddings`
# ---------------------------------------------------------------------------


@query(
    "embedding_norms",
    oracle="""
    SELECT vec_id, round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm
    FROM embeddings
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-math warm-up: L2 norm via zip_with/aggregate fold (JVM
    higher-order functions, no UDF)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = sim.as_double("embedding")
    return e.select("vec_id", F.round(F.sqrt(sim.dot(v, v)), 6).alias("norm"))


@query(
    "cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id <= 4),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (SELECT query_id, vec_id,
                      list_dot_product(qv, cv)
                        / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
               FROM q CROSS JOIN c WHERE vec_id != query_id)
    SELECT query_id, vec_id, round(cos, 6) AS cos_sim,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) <= 5
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact ANN baseline): broadcast the
    query set, scan the corpus once for all queries, per-query top-k
    window. Self-matches excluded, ties break on neighbor id."""
    e = parallelize_small(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") <= 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.brute_force_topk(e, q, k=5)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Phase 3 — event-time windows (batch form of the streaming builders;
# the same builders run under readStream+watermark in tests/)
# ---------------------------------------------------------------------------


@query(
    "tumbling_window",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           {_sql_dsum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows per event_type."""
    e = load_table(spark, sf_dir, "events")
    from covid_custom_sql_engine_spark.streaming import tumbling_counts

    out = tumbling_counts(e, det=True)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "attribution_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           p.event_id AS purchase_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-stream attribution join: every click
    matched to same-user purchases within 1 hour after it
    (streaming/windows.attribution_join; the identical builder runs
    under readStream with watermarks on BOTH sides in tests/ — the
    time bound is what lets streaming evict join state)."""
    e = load_table(spark, sf_dir, "events")
    from covid_custom_sql_engine_spark.streaming import attribution_join as aj

    out = aj(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )
    return out.select(
        "user_id",
        "click_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "purchase_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "purchase_value",
    )


@query(
    "window_distinct_users",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly active-user counts per event type: count + COUNT(DISTINCT
    user_id) in one tumbling-window aggregate. Spark plans the distinct
    via expand + two-phase aggregation (partial per partition, merge on
    the (window, type) key) — no per-group set materialization. For
    sketch-sized memory at extreme cardinality, approx_count_distinct
    swaps in (see approx_distinct_parts)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


@query(
    "snapshot_diff",
    oracle="""
    WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
                 WHERE o_orderkey % 3 != 0),
    new AS (SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderkey % 5 != 0)
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                          AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
                THEN 'changed' END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE (CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                          AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
                THEN 'changed' END) IS NOT NULL
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed between two snapshot versions
    (operators/merge.snapshot_diff): added/removed/changed keys from one
    full-outer join, null-safe column compare. Snapshots derived
    deterministically from orders (drop every 3rd / 5th key, double
    price on every 7th)."""
    from covid_custom_sql_engine_spark.operators.merge import snapshot_diff as sd

    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus",
    )
    return sd(old, new, "o_orderkey")


@query(
    "attribution_left",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           p.event_id AS purchase_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
    """,
)
def attribution_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer attribution: every click, converted or not (purchase
    columns NULL for unconverted). The same builder's streaming mode
    emits an unmatched click only once the watermark proves no match
    can arrive (tests/test_streaming.py)."""
    e = load_table(spark, sf_dir, "events")
    from covid_custom_sql_engine_spark.streaming import attribution_join as aj

    out = aj(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    return out.select(
        "user_id",
        "click_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "purchase_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "purchase_value",
    )


@query(
    "stream_static_join",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '6 hours', e.ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           c.c_nationkey AS nationkey,
           count(*) AS n_events,
           {_sql_dsum('e.value')} AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (batch twin): events broadcast-join
    the customer dimension on user_id, then tumbling 6-hour windows per
    nation. The same builder runs under readStream in tests/ — the
    static side re-broadcasts per micro-batch."""
    from covid_custom_sql_engine_spark.streaming import enriched_window_totals

    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    out = enriched_window_totals(e, c, det=True)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "nationkey",
        "n_events",
        "sum_value",
    )


@query(
    "sliding_window",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS w, event_type FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '10 minutes', ts, INTERVAL '5 minutes'), event_type FROM events)
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, count(*) AS n_events
    FROM b GROUP BY 1, 2
    """,
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes (each event in 2)."""
    e = load_table(spark, sf_dir, "events")
    from covid_custom_sql_engine_spark.streaming import sliding_counts

    out = sliding_counts(e)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
    )


@query(
    "session_window",
    oracle=f"""
    WITH o AS (SELECT user_id, ts, value,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
               FROM events),
    m AS (SELECT *, CASE WHEN pts IS NULL OR ts >= pts + INTERVAL '15 minutes' THEN 1 ELSE 0 END AS new_s FROM o),
    s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m)
    SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts) + INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           user_id, count(*) AS n_events, {_sql_dsum('value')} AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user (15-minute inactivity gap): session =
    [first event, last event + gap). The oracle reproduces gaps-and-
    islands in SQL; Spark uses the native session_window expression."""
    e = load_table(spark, sf_dir, "events")
    from covid_custom_sql_engine_spark.streaming import session_windows

    out = session_windows(e, det=True)
    return out.select(
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


# ---------------------------------------------------------------------------
# Phase 3 — UDAF surface + approximate aggregates
# ---------------------------------------------------------------------------


@query(
    "udaf_geometric_mean",
    oracle="""
    SELECT o_orderpriority,
           round(exp(avg(ln(o_totalprice))), 6) AS gmean_o_totalprice
    FROM orders WHERE o_totalprice > 0
    GROUP BY o_orderpriority
    """,
)
def udaf_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 UDAF surface: arbitrary-callable aggregation as a grouped-agg
    Pandas UDF (Arrow-batched — the reference's DataFrame.agg(callable),
    dataframe.py:207-212, distributed)."""
    from covid_custom_sql_engine_spark.functions.udafs import grouped_geometric_mean

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    out = grouped_geometric_mean(o, "o_orderpriority", "o_totalprice")
    return out.select(
        "o_orderpriority", F.round("gmean_o_totalprice", 6).alias("gmean_o_totalprice")
    )


@query(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           CAST(1 AS BIGINT) AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the scale path for
    COUNT(DISTINCT) without a global shuffle of all distinct values.

    The raw HLL++ estimate is engine-specific, so the checked output is
    exact: the exact distinct count, plus a ``within_tol`` flag
    asserting the estimate landed within 3σ of default rsd=0.05 (1 on
    both sides — the oracle emits the literal, we emit the measured
    check, so a wildly-off sketch fails the hash)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.15 * F.col("exact_parts")
            )
            .cast("bigint")
            .alias("within_tol"),
        )
    )


# ---------------------------------------------------------------------------
