"""Full SQL surface widening: outer join, array/map functions, unpivot, subqueries/CTE, deterministic sampling, token counts, winnowing.

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
from covid_custom_sql_engine_spark.registry._base import _sql_davg, _sql_dstd, _sql_dsum, query  # noqa: F401,E501
from covid_custom_sql_engine_spark.registry.text_dedup import _SQL_SW_EN, _SQL_TOKS, _sql_minhash_cte  # noqa: F401,E501


# Batch 6 — full SQL surface widening: outer join, array/map functions,
# unpivot, subqueries/CTE, deterministic sampling, BPE-ish token counts
# ---------------------------------------------------------------------------


@query(
    "join_full_outer",
    oracle="""
    WITH cc AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
    sc AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(cc.nk, sc.nk) AS nationkey, cc.n_cust, sc.n_supp
    FROM cc FULL OUTER JOIN sc ON cc.nk = sc.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join (completes the inner/left/semi/anti/asof/range
    family): customer counts ⋈ supplier counts per nation, keys present
    on either side survive."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "array_functions",
    oracle="""
    WITH a AS (SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys FROM lineitem GROUP BY 1)
    SELECT l_orderkey,
           CAST(len(qtys) AS INTEGER) AS n_items,
           qtys[1] AS min_qty,
           qtys[-1] AS max_qty,
           list_contains(qtys, 50.0) AS has_50,
           array_to_string(list_transform(qtys[1:3], x -> CAST(CAST(x AS INTEGER) AS VARCHAR)), ',') AS head_csv
    FROM a
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column surface: collect_list → array_sort, element_at (both
    ends), array_contains, slice + transform. One shuffle (the groupBy);
    every array op is a codegen expression."""
    l = load_table(spark, sf_dir, "lineitem")
    qtys = F.array_sort(F.collect_list("l_quantity"))
    return (
        l.groupBy("l_orderkey")
        .agg(qtys.alias("qtys"))
        .select(
            "l_orderkey",
            F.size("qtys").alias("n_items"),
            F.element_at("qtys", 1).alias("min_qty"),
            F.element_at("qtys", -1).alias("max_qty"),
            F.array_contains("qtys", 50.0).alias("has_50"),
            F.concat_ws(
                ",", F.transform(F.slice("qtys", 1, 3), lambda x: x.cast("int").cast("string"))
            ).alias("head_csv"),
        )
    )


@query(
    "map_functions",
    oracle="""
    SELECT event_id, k.key AS key,
           CAST(json_extract(props, '$.' || k.key) AS BIGINT) AS val
    FROM events, unnest(json_keys(props)) AS k(key)
    WHERE props IS NOT NULL
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column surface: parse the JSON props into map<string,bigint>
    and explode to (key, value) rows — the generic shape for arbitrary
    property bags (JVM-side Jackson parse + generator, no Python)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        e.filter(F.col("props").isNotNull())
        .select("event_id", F.explode(m).alias("key", "val"))
    )


@query(
    "unpivot_metrics",
    oracle=f"""
    WITH w AS (SELECT l_returnflag, {_sql_dsum('l_quantity')} AS qty,
                      {_sql_dsum('l_discount')} AS disc
               FROM lineitem GROUP BY 1)
    SELECT l_returnflag, 'qty' AS metric, qty AS value FROM w
    UNION ALL SELECT l_returnflag, 'disc', disc FROM w
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (the inverse of A10's pivot): per-flag metric
    sums melted to (flag, metric, value) rows via df.unpivot."""
    l = load_table(spark, sf_dir, "lineitem")
    wide = l.groupBy("l_returnflag").agg(
        ops.dsum(F.col("l_quantity")).alias("qty"),
        ops.dsum(F.col("l_discount")).alias("disc"),
    )
    return wide.unpivot("l_returnflag", ["qty", "disc"], "metric", "value")


@query(
    "subquery_exists_cte",
    oracle="""
    WITH big AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1 HAVING count(*) >= 10)
    SELECT c.c_custkey, c.c_name, b.n AS n_orders
    FROM customer c JOIN big b ON b.o_custkey = c.c_custkey
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      AND c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def subquery_exists_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface query: CTE + correlated EXISTS + scalar subquery.
    Catalyst rewrites EXISTS to a left-semi join and the scalar subquery
    to a broadcast one-row join — no per-row re-execution."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"_sq_{t}")
    return spark.sql(
        """
        WITH big AS (SELECT o_custkey, count(*) AS n FROM _sq_orders GROUP BY 1 HAVING count(*) >= 10)
        SELECT c.c_custkey, c.c_name, b.n AS n_orders
        FROM _sq_customer c JOIN big b ON b.o_custkey = c.c_custkey
        WHERE EXISTS (SELECT 1 FROM _sq_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
          AND c.c_acctbal > (SELECT avg(c_acctbal) FROM _sq_customer)
        """
    )


@query(
    "hash_sample",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <= '19'
    """,
)
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by content hash (md5 of the key), the
    reproducible alternative to TABLESAMPLE for training-data pipelines:
    stable across runs, engines, and partitionings; no shuffle at all."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) <= "19"
    ).select("o_orderkey", "o_custkey", "o_orderpriority")


@query(
    "stratified_sample",
    oracle="""
    SELECT o_orderpriority, o_orderkey
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) <= 100
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly 100 rows per stratum,
    chosen by content-hash order (reproducible, unbiased w.r.t. any
    data ordering). One shuffle on the stratum key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 100)
        .select("o_orderpriority", "o_orderkey")
    )


@query(
    "token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x != '')) AS INTEGER)
             AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+')) AS INTEGER)
             AS bpe_ish_tokens
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways: whitespace tokens and the BPE-style
    pre-tokenizer regex (letter runs / single digits / punct runs) —
    the cost estimator for LLM training pipelines."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        tx.token_count("text").alias("ws_tokens"),
        tx.bpe_ish_token_count("text").alias("bpe_ish_tokens"),
    )


@query(
    "udtf_tokens",
    oracle=r"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x != '') AS toks
               FROM documents WHERE doc_id < 100)
    SELECT doc_id, CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos, unnest(toks) AS token
    FROM t
    """,
)
def udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: one (pos, token) row per token per
    document. API-surface demo of table-valued functions — the hot-path
    twin is the codegen expression in text.tokens."""
    from covid_custom_sql_engine_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    d.filter(F.col("doc_id") < 100).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, pos, token FROM _udtf_docs, LATERAL tokenize_udtf(text)"
    )


_MINHASH_RECURSIVE_CTE = _sql_minhash_cte().replace("WITH toks", "WITH RECURSIVE toks", 1)


@query(
    "near_dup_clusters",
    oracle=f"""
    {_MINHASH_RECURSIVE_CTE},
    edges AS (SELECT id_a AS src, id_b AS dst FROM cand
              UNION SELECT id_b, id_a FROM cand),
    reach(id, r) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
    ),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
    SELECT d.doc_id AS id,
           coalesce(c.component, d.doc_id) AS component,
           d.doc_id = coalesce(c.component, d.doc_id) AS keep
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering end-to-end: MinHash+LSH candidate pairs →
    connected components (iterative min-label propagation) → keep the
    min-id representative per cluster. The oracle reproduces the
    components with a recursive CTE — same fixpoint, declarative form."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    pairs = dd.lsh_candidate_pairs(d)
    return dd.near_dup_keep(d, pairs)


@query(
    "incremental_dedup_pairs",
    oracle=f"""
    {_MINHASH_RECURSIVE_CTE}
    SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash
    WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    """,
)
def incremental_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup (functions/dedup.incremental_lsh_pairs):
    a new batch (even doc_ids) checked against the accepted corpus (odd
    doc_ids) — band join emits ONLY new×corpus pairs, so corpus-internal
    work never repeats across batches."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return dd.incremental_lsh_pairs(
        d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)
    )


@query(
    "lsh_band_skew_monitor",
    oracle=f"""
    {_sql_minhash_cte()},
    sz AS (SELECT band, band_hash, count(*) AS sz FROM bands0 GROUP BY 1, 2),
    stats AS (SELECT band::BIGINT AS band, sum(sz)::BIGINT AS n_rows,
                     count(*)::BIGINT AS n_buckets,
                     max(sz)::BIGINT AS max_bucket_size,
                     sum(CASE WHEN sz > {dd.MAX_BAND_BUCKET} THEN 1 ELSE 0 END)::BIGINT
                       AS n_oversized
              FROM sz GROUP BY 1),
    hll AS ({sks.sql_hll_grouped("bands0", "band_hash", "band::BIGINT", "band")})
    SELECT s.band, s.n_rows, s.n_buckets, hll.hll_distinct AS hll_buckets,
           round(abs(hll.hll_distinct - s.n_buckets) / s.n_buckets, 4) AS hll_rel_err,
           s.max_bucket_size, s.n_oversized
    FROM stats s JOIN hll USING (band)
    """,
)
def lsh_band_skew_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-pair-generation skew telemetry for the LSH dedup path
    (dedup.band_skew_monitor): per band, exact bucket stats (rows,
    buckets, hottest bucket, count over MAX_BAND_BUCKET) PLUS a grouped
    HyperLogLog distinct-bucket estimate with its live error vs the
    exact count — the mergeable-sketch monitor that runs unchanged over
    streaming ingest micro-batches, composed with the same
    minhash_bands frame incremental_lsh_pairs consumes."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return dd.band_skew_monitor(dd.minhash_bands(d))


@query(
    "guarded_incremental_dedup",
    oracle=f"""
    {_MINHASH_RECURSIVE_CTE},
    jsz AS (SELECT band, band_hash, count(*) AS sz FROM bands0 GROUP BY 1, 2),
    gate AS (SELECT count(*) > 0 AS predrop FROM jsz WHERE sz > {dd.MAX_BAND_BUCKET})
    SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id,
           (SELECT predrop FROM gate) AS predrop_used
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash
    WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    """,
)
def guarded_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLOSED ingest loop the r5 verdict asked for
    (dedup.guarded_incremental_lsh_pairs): band_skew_monitor scans the
    joint (new ∪ corpus) bands first, and its n_oversized telemetry
    flips pair generation onto the constant-memory predrop path exactly
    when a joint bucket exceeds MAX_BAND_BUCKET — on healthy corpora the
    faster single-aggregation mode runs. Output is the incremental
    new×corpus pair set plus the gate decision as a column, so the
    oracle checks BOTH that the pairs are mode-independent and that the
    gate matches SQL's own oversized-bucket count. The adversarial flip
    (5k identical docs → predrop) is pytest-covered on a skewed
    fixture."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    pairs, predrop = dd.guarded_incremental_lsh_pairs(
        d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)
    )
    return pairs.withColumn("predrop_used", F.lit(predrop))


@query(
    "hourly_spine_zero_fill",
    oracle="""
    WITH b AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h, count(*) AS n
               FROM events GROUP BY 1, 2),
    bounds AS (SELECT min(time_bucket(INTERVAL '1 hour', ts)) AS lo,
                      max(time_bucket(INTERVAL '1 hour', ts)) AS hi FROM events),
    spine AS (SELECT et.event_type, g.h
              FROM (SELECT DISTINCT event_type FROM events) et
              CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS h
                          FROM bounds) g)
    SELECT s.event_type, strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
           coalesce(b.n, 0) AS n_events
    FROM spine s LEFT JOIN b ON s.event_type = b.event_type AND s.h = b.h
    """,
)
def hourly_spine_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time grid: hourly spine per event_type (sequence + explode
    — no driver loop) left-joined to actual counts, gaps zero-filled.
    The resample-to-grid op charting/feature pipelines need; the spine
    side is tiny (groups × hours) so it broadcasts."""
    e = load_table(spark, sf_dir, "events")
    hours = e.select(F.date_trunc("hour", "ts").alias("h"), "event_type")
    counts = hours.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("n_events"))
    bounds = hours.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
        )
        .crossJoin(e.select("event_type").distinct())
    )
    return (
        F.broadcast(spine)
        .join(counts, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


@query(
    "hourly_change",
    oracle="""
    WITH b AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h, count(*) AS n
               FROM events GROUP BY 1, 2)
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, n AS n_events,
           n - lag(n) OVER (PARTITION BY event_type ORDER BY h) AS delta,
           round((n - lag(n) OVER (PARTITION BY event_type ORDER BY h))
                 / lag(n) OVER (PARTITION BY event_type ORDER BY h) * 100, 6) AS pct_change
    FROM b
    """,
)
def hourly_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group period-over-period deltas (lag window): absolute and
    percent change of hourly event counts — the derived-metric pattern
    behind the reference's new_cases columns (README.md:123-131)."""
    e = load_table(spark, sf_dir, "events")
    b = (
        e.select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    prev = F.lag("n").over(w)
    return b.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n").alias("n_events"),
        (F.col("n") - prev).alias("delta"),
        F.round((F.col("n") - prev) / prev * 100, 6).alias("pct_change"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER wu AS BIGINT) AS quartile,
           round(percent_rank() OVER wu, 6) AS pr,
           round(cume_dist() OVER wu, 6) AS cd
    FROM orders
    WINDOW wu AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile quartiles, percent_rank,
    cume_dist over a deterministic (tie-broken) order."""
    o = load_table(spark, sf_dir, "orders")
    wu = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(wu).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(wu), 6).alias("pr"),
        F.round(F.cume_dist().over(wu), 6).alias("cd"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH e AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
    f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
    sizes AS (SELECT cohort_wk, count(*) AS cohort_size FROM f GROUP BY cohort_wk),
    per AS (
        SELECT f.cohort_wk,
               CAST(datediff('day', f.cohort_wk, e.wk) // 7 AS BIGINT) AS week_offset,
               count(DISTINCT e.user_id) AS n_active
        FROM e JOIN f USING (user_id)
        GROUP BY f.cohort_wk, week_offset
    )
    SELECT strftime(per.cohort_wk, '%Y-%m-%d') AS cohort_week,
           week_offset, n_active, cohort_size,
           n_active / cohort_size AS retention
    FROM per JOIN sizes USING (cohort_wk)
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (operators/composites.retention_matrix):
    users grouped by first-activity week, tracked by distinct-active
    count at each week offset, normalized by cohort size — the
    product-analytics staple. Shape: one per-user first-seen aggregate,
    an equi-join back onto the activity scan, a (cohort, offset)
    distinct-count grid, and a broadcast of the offset-0 row as the
    cohort size (every user is active in their own first week, so no
    extra pass). Retention = exact int/int division, identical IEEE on
    both engines."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    m = comp.retention_matrix(e, "user_id", "ts", "week")
    return m.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        F.col("period_offset").alias("week_offset"),
        "n_active",
        "cohort_size",
        "retention",
    )


EWMA_ALPHA = 0.9  # per-step decay
EWMA_SPAN = 32  # truncation window: 0.9^32 ≈ 0.034 residual weight


@query(
    "ewma_smooth",
    oracle=f"""
    WITH a AS (
        SELECT event_id, event_type, value,
               list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS BETWEEN {EWMA_SPAN - 1} PRECEDING AND CURRENT ROW) AS arr
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_id, event_type,
           list_reduce(list_prepend(0.0::DOUBLE, arr),
                       (acc, x) -> acc * {EWMA_ALPHA}::DOUBLE + x)
           / list_reduce(list_prepend(0.0::DOUBLE,
                                      list_transform(arr, x -> 1.0::DOUBLE)),
                         (acc, x) -> acc * {EWMA_ALPHA}::DOUBLE + x) AS ewma
    FROM a
    """,
)
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average per event type
    (operators/composites.ewma) — the time-series smoother whose
    textbook form (an order-dependent recurrence over the whole
    history) cannot distribute; see the composite's docstring for the
    window-fold formulation and the no-pow() determinism argument.
    NULL values are pre-filtered on BOTH engines because Spark's
    collect_list drops NULLs while DuckDB's list() keeps them."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return comp.ewma(
        e,
        "value",
        ["ts", "event_id"],
        partition_col="event_type",
        alpha=EWMA_ALPHA,
        span=EWMA_SPAN,
    ).select("event_id", "event_type", "ewma")


ROLLMED_SPAN = 15


@query(
    "rolling_median",
    oracle=f"""
    WITH a AS (
        SELECT event_id, event_type,
               list_sort(list(value) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN {ROLLMED_SPAN - 1} PRECEDING AND CURRENT ROW
               )) AS ls
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_id, event_type,
           CASE WHEN len(ls) % 2 = 1 THEN ls[(len(ls) + 1) // 2]
                ELSE (ls[len(ls) // 2] + ls[len(ls) // 2 + 1]) / 2.0::DOUBLE
           END AS roll_median
    FROM a
    """,
)
def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median per event type over a {ROLLMED_SPAN}-row trailing
    frame — the robust companion to `ewma_smooth` (a median shrugs off
    the outliers an EWMA chases). No distributed-median machinery is
    needed at window granularity: the frame's values sort INSIDE each
    row's array (O(span log span) per row, zero extra shuffle) and the
    middle element(s) read out exactly — bit-identical on both engines
    since no arithmetic happens beyond one even-case average. NULLs
    pre-filtered for the same collect_list-vs-list() parity reason as
    ewma_smooth."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLLMED_SPAN - 1), 0)
    )
    ls = F.array_sort(F.collect_list("value").over(w))
    n = F.size("_ls")
    med = F.when(
        n % 2 == 1, F.element_at("_ls", ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at("_ls", (n / 2).cast("int"))
            + F.element_at("_ls", (n / 2 + 1).cast("int"))
        )
        / F.lit(2.0)
    )
    return e.select("event_id", "event_type", ls.alias("_ls")).select(
        "event_id", "event_type", med.alias("roll_median")
    )


@query(
    "seasonal_baseline",
    oracle=f"""
    WITH b AS (
        SELECT event_type, hour(ts) AS hr,
               count(value) AS n,
               {_sql_davg('value')} AS mean_value,
               {_sql_dstd('value')} AS std_value
        FROM events GROUP BY event_type, hour(ts)
    )
    SELECT e.event_type, hour(e.ts) AS hr,
           any_value(b.n) AS n,
           any_value(b.mean_value) AS mean_value,
           any_value(b.std_value) AS std_value,
           sum(CASE WHEN b.std_value > 0
                     AND abs(e.value - b.mean_value) > 2 * b.std_value
                    THEN 1 ELSE 0 END)::BIGINT AS n_anomalies
    FROM events e JOIN b ON e.event_type = b.event_type
                        AND hour(e.ts) = b.hr
    GROUP BY e.event_type, hour(e.ts)
    """,
)
def seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly screen: learn the hour-of-day profile
    per event type (mean/std of value), then count readings more than
    2σ from their seasonal slot's mean — the de-seasonalized cousin of
    `rolling_zscore_anomalies`. Shape: one hash aggregate builds the
    O(types × 24) profile, which broadcasts back onto a second pass of
    the same scan; the anomaly count is a conditional-sum pivot. Means
    are exact decimal sums / counts, std uses the deterministic
    round(6) formula — both engines flag the identical rows."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hr"), "value"
    )
    b = e.groupBy("event_type", "hr").agg(
        F.count("value").alias("n"),
        ops.davg(F.col("value")).alias("mean_value"),
        *ops._agg_exprs("value", ("std",), True),
    )
    j = e.join(
        F.broadcast(
            b.select(
                F.col("event_type").alias("_et"),
                F.col("hr").alias("_hr"),
                "n",
                "mean_value",
                "std_value",
            )
        ),
        (F.col("event_type") == F.col("_et")) & (F.col("hr") == F.col("_hr")),
    )
    # when(cond, 1).otherwise(0), NOT cond.cast("long"): a NULL value
    # makes the comparison NULL, and summing NULLs would return NULL
    # where the oracle's CASE returns 0 for an all-NULL slot
    anom = F.when(
        (F.col("std_value") > 0)
        & (F.abs(F.col("value") - F.col("mean_value")) > 2 * F.col("std_value")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return j.groupBy("event_type", "hr").agg(
        F.first("n").alias("n"),
        F.first("mean_value").alias("mean_value"),
        F.first("std_value").alias("std_value"),
        F.sum(anom).alias("n_anomalies"),
    )


@query(
    "benford_audit",
    oracle="""
    WITH d AS (
        SELECT substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS digit
        FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
    tot AS (SELECT sum(n_obs)::BIGINT AS n FROM obs)
    SELECT digit, n_obs,
           round(n * log10(1 + 1.0::DOUBLE / CAST(digit AS BIGINT)), 6)
             AS expected,
           round(pow(n_obs - n * log10(1 + 1.0::DOUBLE / CAST(digit AS BIGINT)), 2)
                 / (n * log10(1 + 1.0::DOUBLE / CAST(digit AS BIGINT))), 6)
             AS chi_term
    FROM obs CROSS JOIN tot
    """,
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data screen. The leading digit comes from the STRING of
    an exact integer (cents as BIGINT): integer-to-string rendering is
    identical across engines, where float-to-string and
    floor(log10(x)) at power-of-10 boundaries are not. One hash
    aggregate over ≤9 groups plus a 1-row total broadcast; expected
    counts and χ² terms round(6) because log10 of the digit constants
    is libm-dependent in the last ulp."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
            1,
            1,
        ).alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = F.broadcast(obs.agg(F.sum("n_obs").alias("n")))
    expected = F.col("n") * F.log10(1 + F.lit(1.0) / F.col("digit").cast("bigint"))
    return obs.crossJoin(tot).select(
        "digit",
        "n_obs",
        F.round(expected, 6).alias("expected"),
        F.round(
            F.pow(F.col("n_obs") - expected, 2) / expected, 6
        ).alias("chi_term"),
    )


@query(
    "levenshtein_pairs",
    oracle=f"""
    {_sql_minhash_cte()}
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(substring(x.t, 1, 80), substring(y.t, 1, 80)) AS BIGINT) AS edit_dist
    FROM cand c
    JOIN (SELECT doc_id, lower(trim(text)) AS t FROM documents) x ON c.id_a = x.doc_id
    JOIN (SELECT doc_id, lower(trim(text)) AS t FROM documents) y ON c.id_b = y.doc_id
    """,
)
def levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verify on LSH candidates (the character-level
    near-dup check next to shingle Jaccard). Prefix-bounded (80 chars)
    so the O(len²) DP stays constant-cost per pair at corpus scale."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    cand = dd.lsh_candidate_pairs(d)
    t = d.select(
        "doc_id", F.lower(F.trim(F.col("text"))).substr(1, 80).alias("t")
    )
    a = t.select(F.col("doc_id").alias("id_a"), F.col("t").alias("t_a"))
    b = t.select(F.col("doc_id").alias("id_b"), F.col("t").alias("t_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b",
            F.levenshtein("t_a", "t_b").cast("bigint").alias("edit_dist"),
        )
    )


@query(
    "embedding_normalize",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
    SELECT vec_id,
           round(CASE WHEN nrm > 0 THEN list_dot_product(
                     list_transform(v, x -> x / nrm),
                     list_transform(v, x -> x / nrm)) ELSE 0.0 END, 6) AS unit_dot,
           round(nrm, 6) AS norm
    FROM n
    """,
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize embedding vectors with pure array expressions
    (transform / aggregate — JVM, no Python): emits the unit vector's
    self-dot (≡1, proves normalization) and the original norm."""
    e = load_table(spark, sf_dir, "embeddings")
    v = sim.as_double("embedding")
    nrm = F.sqrt(sim.dot(v, v))
    unit = F.transform(v, lambda x: x / nrm)
    return e.select(
        "vec_id",
        F.round(
            F.when(nrm > 0, sim.dot(unit, unit)).otherwise(F.lit(0.0)), 6
        ).alias("unit_dot"),
        F.round(nrm, 6).alias("norm"),
    )


@query(
    "session_ids",
    oracle="""
    WITH o AS (SELECT event_id, user_id, ts,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
               FROM events),
    m AS (SELECT *, CASE WHEN pts IS NULL OR ts >= pts + INTERVAL '15 minutes'
                         THEN 1 ELSE 0 END AS new_s FROM o)
    SELECT event_id, user_id,
           CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM m
    """,
)
def session_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session assignment (gaps-and-islands): a new session
    starts after 15 idle minutes; session_id = running count of starts.
    The row-level complement of the session_window aggregate — one
    shuffle on user_id, two window passes over the same sort."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") >= F.lag("ts").over(w) + F.expr("INTERVAL 15 MINUTES")),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(new_s).over(run).cast("bigint").alias("session_id"),
    )


@query(
    "range_window_rolling",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_prev_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def range_window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (value-based, not row-based): per event, how
    many of the same user's events fall in the trailing hour. Epoch
    seconds give both engines the identical numeric range frame."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_prev_hour"),
    )


@query(
    "corpus_filter_pipeline",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, lang,
                      {_SQL_TOKS} AS toks, length(text) AS n FROM documents),
    m AS (SELECT doc_id, text, lang, len(toks) AS n_tokens, n,
                 (n - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) AS n_punct,
                 len(list_filter(toks, x -> list_contains({_SQL_SW_EN}, x))) AS n_sw
          FROM t),
    q AS (SELECT doc_id, text, lang, n_tokens,
                 (least(n / 500.0, 1.0)
                  + (1.0 - CASE WHEN n > 0 THEN n_punct / n ELSE 0.0 END)
                  + least((CASE WHEN n_tokens > 0 THEN n_sw / n_tokens ELSE 0.0 END) * 5.0, 1.0)
                 ) / 3.0 AS quality
          FROM m),
    f AS (SELECT * FROM q WHERE lang = 'en' AND n_tokens BETWEEN 5 AND 10000 AND quality >= 0.5),
    d AS (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                 min(doc_id) AS doc_id FROM f GROUP BY 1)
    SELECT f.doc_id, f.n_tokens AS n_tokens, round(f.quality, 6) AS quality
    FROM f JOIN d ON f.doc_id = d.doc_id
    """,
)
def corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical LLM training-data preprocessing chain as one lazy
    plan: language filter → token-length bounds → quality threshold →
    exact dedup keeping min-id representatives. One scan feeds every
    predicate (conjunctions fuse); the only shuffle is the dedup
    fingerprint group-by."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id",
        "text",
        "lang",
        tx.token_count("text").alias("n_tokens"),
        tx.quality_score("text").alias("quality"),
    ).filter(
        (F.col("lang") == "en")
        & F.col("n_tokens").between(5, 10000)
        & (F.col("quality") >= 0.5)
    )
    keep = (
        scored.groupBy(tx.fingerprint("text").alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return scored.join(keep, "doc_id").select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.round("quality", 6).alias("quality"),
    )


@query(
    "redact_pii",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+?[0-9][0-9()\-\s]{7,}[0-9]', '<PHONE>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>', 'g')
             AS redacted
    FROM documents
    """,
)
def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails → phones → IPv4, chained JVM regexes) —
    the scrub step of a training-data pipeline; one projection, no
    shuffle, pushes through any downstream operator."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", tx.redact_pii("text").alias("redacted"))


@query(
    "repetition_ratio",
    oracle=r"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x != '') AS toks
               FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN len(toks) >= 3
                      THEN list_transform(range(0, len(toks) - 2),
                                          i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
                      ELSE [] END AS grams
          FROM t)
    SELECT doc_id,
           round(CASE WHEN len(grams) > 0
                      THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
                      ELSE 0.0 END, 6) AS rep_ratio
    FROM g
    """,
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (boilerplate) ratio over word 3-grams —
    the gopher-style repetition quality filter."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", F.round(tx.repetition_ratio("text"), 6).alias("rep_ratio")
    )


@query(
    "asof_join_forward_tol",
    oracle="""
    SELECT l.event_id,
           CASE WHEN r.ts IS NOT NULL AND epoch(r.ts) - epoch(l.ts) <= 600.0
                THEN r.value END AS r_value,
           CASE WHEN r.ts IS NOT NULL AND epoch(r.ts) - epoch(l.ts) <= 600.0
                THEN strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') END AS r_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def asof_join_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each click matched to the user's
    NEXT purchase only if within 10 minutes (pandas merge_asof
    direction='forward' semantics). Same linear merge-scan, reversed
    time order."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    out = xjoins.asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["ts", "value"], direction="forward", tolerance_seconds=600,
    )
    return out.select(
        "event_id",
        F.col("r_value"),
        F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("r_ts"),
    )


@query(
    "interval_overlap_join",
    oracle=f"""
    WITH o AS (SELECT user_id, ts,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
               FROM events),
    m AS (SELECT *, CASE WHEN pts IS NULL OR ts >= pts + INTERVAL '15 minutes' THEN 1 ELSE 0 END AS new_s FROM o),
    s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m),
    sessions AS (SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL '15 minutes' AS s_end
                 FROM s GROUP BY user_id, sid),
    incidents AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS i_start,
                         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS i_end
                  FROM events WHERE event_type = 'error'
                  GROUP BY 1 HAVING count(*) >= 3)
    SELECT sess.user_id,
           strftime(sess.s_start, '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(i.i_start, '%Y-%m-%d %H:%M:%S') AS incident_hour
    FROM sessions sess JOIN incidents i
      ON sess.s_start < i.i_end AND i.i_start < sess.s_end
    """,
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join via time-bucketing: user sessions
    (15-min gap) × incident hours (≥3 error events). The oracle is the
    direct theta join; the engine runs the bucketed equi-join + exact
    verify (no nested-loop product at scale)."""
    e = load_table(spark, sf_dir, "events")
    from covid_custom_sql_engine_spark.streaming import session_windows

    sessions = session_windows(e).select(
        "user_id", F.col("session_start").alias("s_start"), F.col("session_end").alias("s_end")
    )
    incidents = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("i_start"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("i_start", (F.col("i_start") + F.expr("INTERVAL 1 HOUR")).alias("i_end"))
    )
    out = xjoins.interval_join(sessions, incidents, "s_start", "s_end", "i_start", "i_end")
    return out.select(
        "user_id",
        F.date_format("s_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format("i_start", "yyyy-MM-dd HH:mm:ss").alias("incident_hour"),
    )


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag semantics — per-row multiplicity
    subtraction, unlike the distinct EXCEPT): urgent-order customers
    minus low-order customers, duplicates preserved."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.exceptAll(low)


@query(
    "value_histogram",
    oracle="""
    SELECT CAST(CASE WHEN l_extendedprice < 0 THEN 0
                     WHEN l_extendedprice >= 110000.0 THEN 23
                     ELSE floor(l_extendedprice / 5000.0) + 1 END AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi
    FROM lineitem GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — one codegen hash
    aggregate, the building block of the distributed median/selection
    operator (operators/selection.py)."""
    l = load_table(spark, sf_dir, "lineitem")
    b = F.width_bucket("l_extendedprice", F.lit(0.0), F.lit(110000.0), F.lit(22))
    return l.groupBy(b.cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rk
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf FROM scored WHERE rk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document (text-analysis / feature step of
    an LLM-data pipeline).

    Rank key is integer-only (tf DESC, df ASC, term ASC) — monotone in
    tf·idf for fixed tf and cross-engine deterministic, unlike ordering
    by the double score itself. The doc-frequency table is a grouped
    count of the tf table (no second tokenize pass); at real scale the
    vocab side stays a shuffle join and AQE broadcasts it when it fits
    — locally it is a few thousand terms.
    """
    docs = parallelize_small(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: x != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


@query(
    "zscore_outliers",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             count(value) AS n,
             {_sql_dsum('value')} AS sx,
             {_sql_dsum('value * value')} AS sxx
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_id, e.event_type, e.value,
             (e.value - sx / n)
               / sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS zs
      FROM events e JOIN stats USING (event_type)
      WHERE e.value IS NOT NULL
    )
    SELECT event_id, event_type, value, round(zs, 6) AS z
    FROM z WHERE abs(zs) > 2.0
    """,
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (data-quality filter): events
    whose value is >2σ from their event_type mean.

    Two-pass shape: tiny grouped-stats aggregate (5 rows) broadcast back
    onto the fact scan — no window, no second shuffle, scales as one
    scan + one map-side join. Stats use the deterministic decimal-sum
    mode (ops.dsum) so both engines compute bit-identical doubles;
    sqrt/division are IEEE-exact, so the >2.0 cut is cross-engine safe.
    """
    e = load_table(spark, sf_dir, "events")
    n = F.count("value")
    stats = e.groupBy("event_type").agg(
        n.alias("n"),
        ops.dsum(F.col("value")).alias("sx"),
        ops.dsum(F.col("value") * F.col("value")).alias("sxx"),
    )
    z = (
        F.col("value") - F.col("sx") / F.col("n")
    ) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        / (F.col("n") * (F.col("n") - 1))
    )
    return (
        e.filter(F.col("value").isNotNull())
        .join(F.broadcast(stats), "event_type")
        .withColumn("zs", z)
        .filter(F.abs(F.col("zs")) > 2.0)
        .select(
            "event_id", "event_type", "value", F.round("zs", 6).alias("z")
        )
    )


@query(
    "column_profile",
    oracle="""
    SELECT 'l_quantity' AS col, count(*) - count(l_quantity) AS n_nulls,
           count(DISTINCT l_quantity) AS n_distinct FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*) - count(l_extendedprice),
           count(DISTINCT l_extendedprice) FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag) FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', count(*) - count(l_linestatus),
           count(DISTINCT l_linestatus) FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', count(*) - count(l_shipdate),
           count(DISTINCT l_shipdate) FROM lineitem
    """,
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (null count + exact distinct cardinality per
    column) — the health-check step before a training-data pipeline run.

    One pass: stack() unpivots k columns in the scan stage (values cast
    to string — injective, so cardinality is preserved), then a single
    hash aggregate by column name. The oracle's k scans express the same
    result; ours reads the parquet once regardless of k.
    """
    l = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus", "l_shipdate"]
    pairs = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    stacked = l.select(F.expr(f"stack({len(cols)}, {pairs}) AS (col, val)"))
    return stacked.groupBy("col").agg(
        (F.count(F.lit(1)) - F.count("val")).alias("n_nulls"),
        F.countDistinct("val").alias("n_distinct"),
    )


def _splitmix_mulmod_sql(e: str, k: int) -> str:
    """(e * k) mod 2^64 over UBIGINT operands via 32-bit limbs; each
    partial product fits UBIGINT, the final carry-sum runs in HUGEINT."""
    klo, khi = k & 0xFFFFFFFF, k >> 32
    return (
        f"CAST((CAST((({e}) % 4294967296) * {klo} AS HUGEINT)"
        f" + ((CAST((({e}) % 4294967296) * {khi} AS HUGEINT)"
        f" + CAST((({e}) // 4294967296) * {klo} AS HUGEINT)) % 4294967296)"
        f" * 4294967296) % 18446744073709551616 AS UBIGINT)"
    )


def _splitmix_seed_const(seed: int) -> int:
    z = (seed + 0x9E3779B97F4A7C15) % 2**64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % 2**64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % 2**64
    return z ^ (z >> 31)


_SYNTH_ORACLE = f"""
    WITH ids AS (SELECT CAST(unnest(range(0, 50000)) AS UBIGINT) AS id),
    m1 AS (SELECT id, CAST((CAST(xor(id, CAST({_splitmix_seed_const(42)} AS UBIGINT)) AS HUGEINT)
                            + {0x9E3779B97F4A7C15}) % 18446744073709551616 AS UBIGINT) AS z FROM ids),
    m2 AS (SELECT id, {_splitmix_mulmod_sql('xor(z, z >> 30)', 0xBF58476D1CE4E5B9)} AS z FROM m1),
    m3 AS (SELECT id, {_splitmix_mulmod_sql('xor(z, z >> 27)', 0x94D049BB133111EB)} AS z FROM m2),
    r AS (SELECT id, xor(z, z >> 31) AS r FROM m3),
    ev AS (SELECT id, r % 1000 AS user_id,
                  list_extract(['view','click','signup','purchase','error'],
                               CAST((r >> 16) % 5 AS INT) + 1) AS event_type,
                  CAST(r >> 11 AS DOUBLE) / 9007199254740992.0 * 100.0 AS value
           FROM r)
    SELECT event_type, count(*) AS n,
           round({_sql_dsum('value')}, 6) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM ev GROUP BY event_type
"""


@query("synth_source_agg", oracle=_SYNTH_ORACLE)
def synth_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (sources/python_datasource.py): generate
    100k deterministic events, push an event_id range into the source
    (pushFilters prunes the generated range itself — the scan only
    produces 50k ids), then aggregate. The generator is counter-mode
    splitmix64, a closed form the oracle re-derives in SQL (64-bit
    wraparound arithmetic via 32-bit limbs) — bit-identical ids/values
    on both engines. The full source contract (Arrow batches, partition
    invariance, stream/batch equality) is pinned by
    tests/test_python_datasource.py."""
    from covid_custom_sql_engine_spark.sources import register_synth_events

    register_synth_events(spark)
    df = (
        spark.read.format("synth_events")
        .option("n_rows", 100_000)
        .option("n_partitions", 16)
        .load()
        .filter(F.col("event_id") < 50_000)
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(ops.dsum(F.col("value")), 6).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
           l.l_extendedprice * (1 - l.l_discount) AS net
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def salted_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defeating salted equi-join (operators/joins.py:salted_join):
    right rows exploded into ``salt`` tagged copies, left rows tagged by
    key-hash, joined on (key, salt) so a hot key spreads over ``salt``
    shuffle partitions. Semantically identical to the plain join — the
    oracle IS the plain join. The explicit tool for extreme known-hot
    keys; AQE's skew-split covers the moderate case."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    out = xjoins.salted_join(l, o, "l_orderkey", "o_orderkey", salt=4)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )


_WINNOW_POLY_SQL = " + ".join(
    f"ord(substr(t, i + {j}, 1))::BIGINT * {tx._WINNOW_B ** j}" for j in range(tx.WINNOW_K)
)

# Shared DuckDB CTEs mirroring functions/text.py::winnow_fingerprints —
# t0 = normalized text, g0 = k-gram rolling hashes, _WINNOW_WINS_SQL =
# the deduped window-min fingerprint list over a g0 row's `g`.
_WINNOW_CTES_SQL = f"""
    t0 AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(lower(trim(coalesce(text, ''))),
                            '[^ -~]', '', 'g'), ' +', ' ', 'g') AS t
      FROM documents
    ),
    g0 AS (
      SELECT doc_id,
             CASE WHEN length(t) < {tx.WINNOW_K} THEN []
                  ELSE list_transform(range(1, length(t) - {tx.WINNOW_K} + 2),
                                      i -> ({_WINNOW_POLY_SQL}) % {tx._WINNOW_M})
             END AS g
      FROM t0
    )"""

_WINNOW_WINS_SQL = f"""list_distinct(
                    list_transform(range(1, greatest(len(g) - {tx.WINNOW_W} + 1, 1) + 1),
                                   i -> list_min(list_slice(g, i, i + {tx.WINNOW_W} - 1))))"""


@query(
    "winnow_fingerprint",
    oracle=f"""
    WITH {_WINNOW_CTES_SQL}
    SELECT doc_id,
           array_to_string(
             CASE WHEN len(g) = 0 THEN []
                  ELSE list_sort({_WINNOW_WINS_SQL})
             END, ',') AS fps,
           CASE WHEN len(g) = 0 THEN 0
                ELSE len({_WINNOW_WINS_SQL})
           END AS n_fps
    FROM g0
    """,
)
def winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (functions/text.py) — the
    SIGMOD'03 local document fingerprint: any shared substring of length
    >= k+w-1 between two docs yields a shared fingerprint. One narrow
    projection, zero shuffles; emitted as a comma-joined string for the
    cross-engine hash compare."""
    d = load_table(spark, sf_dir, "documents")
    fps = tx.winnow_fingerprints("text")
    return d.select(
        "doc_id",
        F.array_join(F.transform(fps, lambda x: x.cast("string")), ",").alias("fps"),
        F.size(fps).alias("n_fps"),
    )


_WINNOW_MAX_DF = 50  # stop-gram cap: a fingerprint in > this many docs is boilerplate
_WINNOW_MIN_SHARED = 10


@query(
    "winnow_pairs",
    oracle=f"""
    WITH {_WINNOW_CTES_SQL},
    f AS (
      SELECT doc_id, unnest({_WINNOW_WINS_SQL}) AS fp
      FROM g0 WHERE len(g) > 0
    ),
    rare AS (
      SELECT fp FROM f GROUP BY fp HAVING count(*) <= {_WINNOW_MAX_DF}
    ),
    f2 AS (SELECT f.doc_id, f.fp FROM f JOIN rare USING (fp))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
    FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {_WINNOW_MIN_SHARED}
    """,
)
def winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs from shared winnowing fingerprints —
    explode fingerprints, drop boilerplate fingerprints whose document
    frequency exceeds {MAX_DF} (the stop-gram guard that keeps the
    fp self-join from going quadratic on a hot bucket at scale), then
    self-join on fp and keep pairs sharing >= {MIN_SHARED} fingerprints.
    Both shuffles key on `fp`, so doc-frequency filter and pair join
    co-partition; the cap bounds any bucket's pair fan-out at
    MAX_DF^2 regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    f = d.select(
        "doc_id", F.explode(tx.winnow_fingerprints("text")).alias("fp")
    )
    rare = (
        f.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _WINNOW_MAX_DF)
        .select("fp")
    )
    f2 = f.join(rare, "fp")
    a, b = f2.alias("a"), f2.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= _WINNOW_MIN_SHARED)
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH b AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
                  ELSE list_max(list_transform(v, x -> abs(x))) / 127.0
             END AS scale
      FROM b
    ),
    q AS (
      SELECT vec_id, v, scale,
             list_transform(v,
               x -> greatest(-127.0, least(127.0, floor(x / scale + 0.5)))::INT) AS qv
      FROM s
    )
    SELECT vec_id,
           round(scale, 6) AS scale6,
           array_to_string(qv, ',') AS q_str,
           round(list_max(list_transform(range(1, len(v) + 1),
                 i -> abs(v[i] - qv[i] * scale))), 6) AS max_err6
    FROM q
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 absmax quantization of the embedding column — the
    4x storage/bandwidth reduction step a training-data pipeline applies
    before shipping vectors. Per-vector scale = absmax/127; round via
    floor(x/scale + 0.5) (identical in Spark and DuckDB, unlike the
    engines' differing round() tie rules); clamp to [-127, 127];
    max reconstruction error verified cross-engine. Pure higher-order
    JVM expressions — one narrow projection, zero shuffles, linear
    scale-out."""
    e = load_table(spark, sf_dir, "embeddings")
    e = e.withColumn(
        "v", F.expr("transform(embedding, x -> cast(x AS double))")
    ).withColumn(
        "scale",
        F.expr(
            "CASE WHEN array_max(transform(v, x -> abs(x))) = 0 THEN 1.0D "
            "ELSE array_max(transform(v, x -> abs(x))) / 127.0D END"
        ),
    ).withColumn(
        "qv",
        F.expr(
            "transform(v, x -> cast(greatest(-127.0D, "
            "least(127.0D, floor(x / scale + 0.5D))) AS int))"
        ),
    )
    return e.select(
        "vec_id",
        F.round("scale", 6).alias("scale6"),
        F.array_join(F.transform("qv", lambda x: x.cast("string")), ",").alias("q_str"),
        F.round(
            F.expr("array_max(zip_with(v, qv, (x, qi) -> abs(x - qi * scale)))"), 6
        ).alias("max_err6"),
    )


@query(
    "demo_showcase",
    oracle=f"""
    WITH f AS (SELECT o_custkey, o_totalprice FROM orders
               WHERE o_totalprice > 100000),
    g AS (SELECT o_custkey, count(*) AS n_orders,
                 {_sql_dsum('o_totalprice')} AS sum_totalprice
          FROM f GROUP BY o_custkey)
    SELECT g.o_custkey, g.n_orders, g.sum_totalprice,
           c.c_mktsegment AS r_c_mktsegment,
           c.c_nationkey AS r_c_nationkey
    FROM g JOIN customer c ON g.o_custkey = c.c_custkey
    """,
)
def demo_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 'SQL Operations Demo' tab (app.py:347-898) as a
    composed pipeline: CSV parse → WHERE → SELECT → group/agg → hash
    join, each step materialized and timed through the A17 execution
    log (demo.py). The CSV round-trip is value-exact (shortest-repr
    doubles reparse identically), so the oracle works straight off the
    parquet tables."""
    from covid_custom_sql_engine_spark.demo import sql_operations_demo

    out = sql_operations_demo(spark, sf_dir)
    return out["result"]


# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# PII incidence audit (governance readout over injected ground truth)
# ---------------------------------------------------------------------------

_PII_E = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_P = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"
_PII_I = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


@query(
    "pii_incidence_audit",
    oracle=rf"""
    WITH d2 AS (SELECT source,
                       text
                       || CASE WHEN doc_id % 7 = 0
                               THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                    || '@example.com now' ELSE '' END
                       || CASE WHEN doc_id % 11 = 0
                               THEN ' call 555-0100-'
                                    || CAST(doc_id % 90 + 10 AS VARCHAR)
                               ELSE '' END
                       || CASE WHEN doc_id % 13 = 0
                               THEN ' from 192.168.'
                                    || CAST(doc_id % 256 AS VARCHAR) || '.7'
                               ELSE '' END AS t
                FROM documents),
    m AS (SELECT source,
                 len(regexp_extract_all(t, '{_PII_E}', 0)) AS ne,
                 len(regexp_extract_all(t, '{_PII_P}', 0)) AS np,
                 len(regexp_extract_all(t, '{_PII_I}', 0)) AS ni
          FROM d2)
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_email,
           sum(CASE WHEN np > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_phone,
           sum(CASE WHEN ni > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_ipv4,
           sum(ne)::BIGINT AS n_email, sum(np)::BIGINT AS n_phone,
           sum(ni)::BIGINT AS n_ipv4,
           round(sum(CASE WHEN ne > 0 OR np > 0 OR ni > 0 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS pii_doc_rate
    FROM m GROUP BY source
    """,
)
def pii_incidence_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII GOVERNANCE readout — the audit that decides
    whether a source needs scrubbing before training: per source, the
    count of documents containing each PII class (email / phone /
    IPv4, the same patterns text.redact_pii removes), total match
    counts, and the any-PII document rate.  The synthetic corpus
    carries no natural PII, so ground truth is INJECTED inside both
    engines with deterministic doc_id arithmetic (emails on id % 7,
    phones on id % 11, IPv4s on id % 13 — the trigram-corruption
    convention: the audit's expected values are known by construction
    and the full extract-count pipeline is exercised end to end).
    Match counting is `regexp_extract_all(..., 0)` — a built-in with
    verified cross-engine parity on these patterns — so the audit is
    one per-row codegen projection + ONE hash aggregate keyed by
    source: no shuffle beyond the group-by at any corpus size, and the
    redaction step (`redact_pii`) consumes the same patterns, so rate
    and scrub stay consistent by construction."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" call 555-0100-"), (did % 90 + 10).cast("string")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 13 == 0,
            F.concat(
                F.lit(" from 192.168."),
                (did % 256).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.lit("")),
    )
    m = d.select(
        "source",
        F.size(F.regexp_extract_all(t, F.lit(_PII_E), 0)).alias("ne"),
        F.size(F.regexp_extract_all(t, F.lit(_PII_P), 0)).alias("np"),
        F.size(F.regexp_extract_all(t, F.lit(_PII_I), 0)).alias("ni"),
    )
    cnt = F.count(F.lit(1))
    return m.groupBy("source").agg(
        cnt.cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("ne") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_email"),
        F.sum(F.when(F.col("np") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_phone"),
        F.sum(F.when(F.col("ni") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_ipv4"),
        F.sum("ne").cast("bigint").alias("n_email"),
        F.sum("np").cast("bigint").alias("n_phone"),
        F.sum("ni").cast("bigint").alias("n_ipv4"),
        F.round(
            F.sum(
                F.when(
                    (F.col("ne") > 0) | (F.col("np") > 0) | (F.col("ni") > 0),
                    1,
                ).otherwise(0)
            )
            / cnt.cast("double"),
            6,
        ).alias("pii_doc_rate"),
    )
