"""Scalar function library, window surface, grouping sets, IVF ANN, multimodal plumbing, n-gram dedup, LSH top-k, stateful op, JSON props.

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
from covid_custom_sql_engine_spark.registry.text_dedup import _SQL_NORM  # noqa: F401,E501


# Batch 4 — scalar function library, full window surface, grouping sets,
# percentiles, embedding near-dups, IVF ANN, multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "scalar_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(substring(p_name, 1, 8)) AS name_head,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat(p_brand, '/', p_type) AS brand_type,
           abs(p_retailprice - 1000.0) AS price_dev,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           round(ln(p_retailprice + 1.0), 6) AS price_ln,
           round(pow(p_size, 2.0), 6) AS size_sq
    FROM part
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math function library passthrough (SURVEY §2.1
    'not implemented by the reference, in-Spark-scope'). libm-sensitive
    fns (sqrt/ln/pow) round(6) on both sides."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower(F.substring("p_name", 1, 8)).alias("name_head"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1.0), 6).alias("price_ln"),
        F.round(F.pow("p_size", F.lit(2.0)), 6).alias("size_sq"),
    )


@query(
    "datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
           CAST(extract(month FROM o_orderdate) AS BIGINT) AS m,
           CAST(extract(day FROM o_orderdate) AS BIGINT) AS d,
           CAST(extract(hour FROM o_orderdate) AS BIGINT) AS h,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL '90 days', '%Y-%m-%d') AS due_date
    FROM orders
    """,
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function passthrough: extract/trunc/interval arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.hour("o_orderdate").cast("bigint").alias("h"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
    )


@query(
    "window_functions",
    oracle="""
    SELECT o_orderkey,
           rank() OVER wp AS rnk,
           dense_rank() OVER wp AS drnk,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders,
           lead(o_orderkey) OVER wu AS next_key,
           lag(o_orderkey) OVER wu AS prev_key,
           first_value(o_orderkey) OVER wu AS first_key
    FROM orders
    WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_orderpriority),
           wu AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking/navigation window surface: rank/dense_rank over a
    tying order (tie-stable), lead/lag/first_value over a unique order
    (deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    wu = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.rank().over(wp).cast("bigint").alias("rnk"),
        F.dense_rank().over(wp).cast("bigint").alias("drnk"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n_orders"),
        F.lead("o_orderkey").over(wu).alias("next_key"),
        F.lag("o_orderkey").over(wu).alias("prev_key"),
        F.first("o_orderkey").over(wu).alias("first_key"),
    )


@query(
    "grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
           count(*) AS n_rows, {_sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() flags (distinguishes NULL
    key values from subtotal rows)."""
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
               count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (the exact
    counterpart of approx_percentile; both exist in the engine)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 6).alias("p75"),
    )


def _plane_subquery(i: int) -> str:
    return f"(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = {i})"


_SQL_BUCKET = " || ".join(
    f"(CASE WHEN list_dot_product(v, {_plane_subquery(i)}) >= 0 THEN '1' ELSE '0' END)"
    for i in range(5)
)


@query(
    "cosine_near_dups",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_SQL_BUCKET} AS bucket FROM c)
    SELECT a.vec_id AS id_a, x.vec_id AS id_b,
           round(list_dot_product(a.v, x.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(x.v, x.v))), 6)
             AS cos_sim
    FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id
    WHERE list_dot_product(a.v, x.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(x.v, x.v))) >= 0.35
    """,
)
def cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via hyperplane-LSH bucket equi-join +
    exact cosine verify on bucket-mates only (approximate by design;
    deterministic given the fixed planes = corpus vectors 0-4)."""
    e = parallelize_small(load_table(spark, sf_dir, "embeddings"))
    planes = [
        [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") <= 4).orderBy("vec_id").collect()
    ]
    out = sim.cosine_near_dup_pairs(e, planes, threshold=0.35)
    return out.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


# Shared IVF coarse-quantizer oracle fragment: label-mean centroids,
# 1-nearest cell per corpus vector, n_probe=2 probed cells per query —
# used by ivf_topk AND ivfpq_topk_recall so the two stay in lockstep.
_SQL_IVF_COARSE = """c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    el AS (SELECT label, generate_subscripts(embedding, 1) AS i,
                  unnest(embedding::DOUBLE[]) AS x FROM embeddings),
    ce AS (SELECT label, i, avg(x) AS ax FROM el GROUP BY label, i),
    cent AS (SELECT label AS cell, list(ax ORDER BY i) AS cv FROM ce GROUP BY label),
    asn AS (
      SELECT vec_id, cell, v, row_number() OVER (
        PARTITION BY vec_id
        ORDER BY (list_dot_product(v, cv)
                  / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))))
                 DESC NULLS FIRST, cell ASC) AS rn
      FROM c CROSS JOIN cent),
    corpus AS (SELECT vec_id, cell, v FROM asn WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id <= 4),
    pr AS (
      SELECT query_id, cell, qv FROM (
        SELECT query_id, cell, qv, row_number() OVER (
          PARTITION BY query_id
          ORDER BY (list_dot_product(qv, cv)
                    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))))
                   DESC NULLS FIRST, cell ASC) AS rn
        FROM q CROSS JOIN cent) WHERE rn <= 2)"""


@query(
    "ivf_topk",
    oracle=f"""
    WITH {_SQL_IVF_COARSE},
    sc AS (
      SELECT p.query_id, s.vec_id,
             list_dot_product(p.qv, s.v)
             / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.v, s.v))) AS cs
      FROM corpus s JOIN pr p ON s.cell = p.cell
      WHERE s.vec_id <> p.query_id)
    SELECT query_id, vec_id, round(cs, 6) AS cos_sim, CAST(rn AS BIGINT) AS rank
    FROM (SELECT query_id, vec_id, cs,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cs DESC NULLS LAST, vec_id ASC) AS rn
          FROM sc)
    WHERE rn <= 5
    """,
)
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: label-mean centroids, n_probe=2 cells per query.
    Approximate vs brute force but deterministic given the fixed
    centroid rule, so the oracle reimplements centroid-assignment +
    probed-cell scan with DuckDB list functions (tests additionally
    assert recall vs the exact baseline)."""
    e = parallelize_small(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") <= 4).select(F.col("vec_id").alias("query_id"), "embedding")
    out = sim.ivf_topk(e, q, k=5, n_probe=2)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("bigint").alias("rank"),
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substring(lower(hex(encode(text))), 1, 16) AS head_hex
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payload + typed metadata →
    mapInPandas feature extraction (Arrow batches). Codec is the
    deterministic byte-stat stub; real decode is the NotImplementedError
    integration point (no image/audio libs in this container)."""
    from covid_custom_sql_engine_spark.functions import multimodal as mm

    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    media = mm.documents_as_media(d)
    feats = mm.extract_features(media)
    return feats.select("media_id", "media_type", "n_bytes", "head_hex")


@query(
    "frame_sample_plan",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, greatest(CAST(floor((n_chars * 40) / 1000) AS BIGINT), 1))) * 1000 AS BIGINT)
             AS frame_ts_ms
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out: one row per frame timestamp from
    metadata (the per-frame decode is the stubbed step)."""
    from covid_custom_sql_engine_spark.functions import multimodal as mm

    d = load_table(spark, sf_dir, "documents")
    out = mm.frame_sample_plan(mm.documents_as_media(d))
    return out.select("media_id", F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms"))


# ---------------------------------------------------------------------------
# Batch 5 — n-gram Jaccard dedup, LSH top-k ANN, custom stateful operator,
# JSON property extraction
# ---------------------------------------------------------------------------


def _sql_shingle_cte(shingle_n: int = 2) -> str:
    """tokens → distinct word n-gram shingle sets (mirrors
    dedup.word_shingles for arbitrary n)."""
    return f"""
    WITH toks AS (SELECT doc_id, string_split({_SQL_NORM}, ' ') AS toks FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(CASE WHEN len(toks) >= {shingle_n}
                    THEN list_transform(range(0, len(toks) - {shingle_n - 1}),
                                        i -> array_to_string(list_slice(toks, i + 1, i + {shingle_n}), ' '))
                    ELSE [array_to_string(toks, ' ')] END) AS sh
           FROM toks)
    """


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    {_sql_shingle_cte(2)},
    postings AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
    rare AS (SELECT shingle FROM postings GROUP BY shingle HAVING count(*) <= 50),
    p AS (SELECT postings.doc_id, postings.shingle FROM postings JOIN rare USING (shingle)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)
    SELECT c.id_a, c.id_b,
           CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) > 0
                THEN CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(x.sh, y.sh)))
                ELSE 0.0 END AS jaccard
    FROM cand c JOIN sh x ON c.id_a = x.doc_id JOIN sh y ON c.id_b = y.doc_id
    WHERE CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) > 0
               THEN CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(x.sh, y.sh)))
               ELSE 0.0 END >= 0.05
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard dedup via inverted shingle index: postings
    self-join on rare shingles (doc-frequency cap bounds fan-out) →
    exact shingle-set Jaccard on candidates only. The non-MinHash
    member of the dedup family (2-gram shingles here so the sparse
    testdata corpus actually yields candidates)."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return dd.ngram_jaccard_pairs(d, shingle_n=2, threshold=0.05, max_df=50)


@query(
    "lsh_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_SQL_BUCKET} AS bucket FROM c),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id <= 4),
    scored AS (SELECT q.query_id, b.vec_id,
                      list_dot_product(qv, b.v)
                        / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(b.v, b.v))) AS cos
               FROM q JOIN b USING (bucket) WHERE b.vec_id != q.query_id)
    SELECT query_id, vec_id, round(cos, 6) AS cos_sim,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) <= 5
    """,
)
def lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH top-k ANN (the bucketed scale path next to the
    brute-force baseline): queries only score corpus vectors in their
    own bucket. Deterministic given the fixed planes (= corpus vectors
    0-4), so the DuckDB oracle reproduces it exactly."""
    e = parallelize_small(load_table(spark, sf_dir, "embeddings"))
    planes = [
        [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") <= 4).orderBy("vec_id").collect()
    ]
    q = e.filter(F.col("vec_id") <= 4).select(F.col("vec_id").alias("query_id"), "embedding")
    out = sim.lsh_topk(e, q, planes, k=5)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("bigint").alias("rank"),
    )


@query(
    "stateful_running_total",
    oracle="""
    SELECT user_id, event_id,
           CAST(row_number() OVER w AS BIGINT) AS seq,
           round(sum(coalesce(value, 0.0)) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_total
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def stateful_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandas grouped-map; the
    applyInPandasWithState twin runs the same arithmetic under
    readStream in tests/): per-user event-ordered running (count, sum).
    Oracle = SQL running-window sum, proving the custom operator
    preserves declarative semantics."""
    from covid_custom_sql_engine_spark.streaming import running_totals_batch

    e = load_table(spark, sf_dir, "events")
    # pin the grouped-map stage width (see running_totals_batch docstring)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out = running_totals_batch(e, num_partitions=n_parts)
    return out.select(
        "user_id", "event_id", "seq", F.round("running_total", 6).alias("running_total")
    )


@query(
    "json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property column: parse `props` with an
    explicit schema (from_json — JVM-side Jackson, no Python), then
    aggregate the extracted field per event_type."""
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
