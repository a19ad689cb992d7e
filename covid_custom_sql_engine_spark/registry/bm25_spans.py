"""BM25 retrieval, mixture resampling, repeated-span removal.

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
from covid_custom_sql_engine_spark.registry._base import query  # noqa: F401,E501
from covid_custom_sql_engine_spark.registry.text_dedup import _SQL_TOKS  # noqa: F401,E501


# BM25 retrieval + mixture resampling (functions/text.py, functions/
# corpus.py — beyond-reference LLM-pipeline operators)
# ---------------------------------------------------------------------------

BM25_QUERIES: list[tuple[str, str]] = [
    ("q1", "fast"), ("q1", "hash"),
    ("q2", "table"), ("q2", "scan"),
    ("q3", "merge"), ("q3", "sort"),
    ("q4", "window"), ("q4", "agg"),
]


@query(
    "bm25_search",
    oracle=f"""
    WITH q(query_id, term) AS (VALUES {', '.join(f"('{q}', '{t}')" for q, t in BM25_QUERIES)}),
    tk AS (SELECT doc_id, {_SQL_TOKS} AS tks FROM documents),
    stats AS (SELECT count(*) AS n_docs, avg(len(tks)::DOUBLE) AS avgdl FROM tk),
    toks AS (SELECT doc_id, len(tks) AS dl, unnest(tks) AS term FROM tk),
    tf AS (SELECT q.query_id, t.doc_id, t.term, count(*) AS tf, min(t.dl) AS dl
           FROM toks t JOIN q USING (term) GROUP BY 1, 2, 3),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.query_id, tf.doc_id,
               sum(CAST(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                        * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
                        AS DECIMAL(38,18))) AS s
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, round(s::DOUBLE, 6) + 0.0 AS score,
           row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS rk
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) <= 5
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-5 per query over the documents corpus
    (functions/text.bm25_topk) — the lexical-retrieval leg of a RAG /
    data-curation pipeline. Query terms broadcast; postings prune to
    query terms at the map stage; per-(query, doc) scores fold through
    DECIMAL(38,18) so the ranking is order-independent and engine-
    stable; ties break on doc_id."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    qdf = spark.createDataFrame(BM25_QUERIES, ["query_id", "term"])
    out = tx.bm25_topk(d, qdf, k=5)
    return out.select(
        "query_id", "doc_id", "score", F.col("rk").cast("bigint").alias("rk")
    )


@query(
    "repeated_chunks",
    oracle=f"""
    WITH nz AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
                WHERE len({_SQL_TOKS}) > 0),
    g AS (SELECT doc_id,
                 md5(array_to_string(list_slice(toks, s, least(s + 7, len(toks))), ' ')) AS chunk_fp
          FROM nz, unnest(generate_series(1, greatest(len(toks) - 4, 1), 4)) AS t(s))
    SELECT chunk_fp,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs,
           min(doc_id) AS first_doc
    FROM g GROUP BY chunk_fp HAVING count(DISTINCT doc_id) >= 2
    """,
)
def repeated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated token windows — the chunk-fingerprint
    approximation of exact-substring dedup (the suffix-array technique
    of Lee et al. 2022, arXiv:2107.06499, reduced to strided 8-token
    windows so it stays a hash aggregate): any 11+-token substring
    shared between documents must produce a shared window fingerprint.
    One explode + one groupBy on the 32-char fp — bounded by distinct
    chunks, map-side-combinable, no joins; the output lists each
    cross-document fingerprint with occurrence/document counts and its
    first (keeper) document."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    ch = cp.chunk_tokens(d, window=8, stride=4)
    return (
        ch.groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# The shared span-detection CTE chain (8-token shared grams → marked
# positions → gaps-and-islands merge) — used by repeated_span_removal
# (the edit PLAN) and repeated_span_apply (the plan EXECUTED), so the
# two oracles derive spans identically and cannot drift.
_SQL_SPAN_CTES = f"""nz AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
                WHERE len({_SQL_TOKS}) >= 8),
    g AS (SELECT doc_id, s AS p,
                 md5(array_to_string(list_slice(toks, s, s + 7), ' ')) AS fp
          FROM nz, unnest(generate_series(1, len(toks) - 7, 1)) AS t(s)),
    dup AS (SELECT fp FROM g GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
    rp AS (SELECT g.doc_id, g.p FROM g JOIN dup ON g.fp = dup.fp),
    fl AS (SELECT doc_id, p,
                  CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 8
                       THEN 1 ELSE 0 END AS brk
           FROM rp),
    isl AS (SELECT doc_id, p,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                                  ROWS UNBOUNDED PRECEDING) AS island
            FROM fl)"""


@query(
    "repeated_span_removal",
    oracle=f"""
    WITH {_SQL_SPAN_CTES}
    SELECT doc_id, min(p)::BIGINT AS span_start,
           (max(p) + 8)::BIGINT AS span_end,
           (max(p) + 8 - min(p))::BIGINT AS span_tokens
    FROM isl GROUP BY doc_id, island
    """,
)
def repeated_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup as an actionable EDIT PLAN (the removal
    step of Lee et al. 2022, arXiv:2107.06499): every 8-token window
    shared across ≥2 documents marks its positions, and overlapping/
    adjacent marked windows merge into per-document token spans
    [span_start, span_end) to cut — the operation `repeated_chunks`
    only detects. Plan shape: one gram explode + one hash aggregate for
    the cross-doc fingerprint set, an equi-join back, then PER-DOCUMENT
    windows (partitioned by doc_id — state bounded by document length,
    never corpus size) for the classic gaps-and-islands interval
    merge. Token indices are 1-based; span_end is exclusive. The
    operator is corpus.repeated_token_spans (shared with the unit
    semantics test)."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return cp.repeated_token_spans(d, k=8)


@query(
    "repeated_span_apply",
    oracle=f"""
    WITH {_SQL_SPAN_CTES},
    spans AS (SELECT doc_id, min(p) AS span_start, max(p) + 8 AS span_end
              FROM isl GROUP BY doc_id, island),
    t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS tk
            FROM t),
    keep AS (SELECT tok.doc_id, tok.i, tok.tk FROM tok
             WHERE NOT EXISTS (SELECT 1 FROM spans s
                               WHERE s.doc_id = tok.doc_id
                                 AND s.span_start <= tok.i AND tok.i < s.span_end))
    SELECT t.doc_id,
           coalesce(string_agg(keep.tk, ' ' ORDER BY keep.i), '') AS text_clean,
           len(t.toks)::BIGINT AS n_tokens,
           count(keep.i)::BIGINT AS n_kept,
           (len(t.toks) - count(keep.i))::BIGINT AS n_cut
    FROM t LEFT JOIN keep ON t.doc_id = keep.doc_id
    GROUP BY t.doc_id, len(t.toks)
    """,
)
def repeated_span_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lee-2022 loop CLOSED from detection to a cleaned corpus:
    repeated_token_spans produces the per-document edit plan and
    corpus.remove_spans executes it — every document comes back with
    its cross-document repeated spans cut and the text rebuilt from
    the kept tokens (canonical single-space form), plus kept/cut token
    accounting. Documents with no repeated spans pass through with
    n_cut = 0. Executing the plan is one equi-join (plan ⋈ corpus) and
    one higher-order-filter map pass — no UDF, so cleaning a 100 TB
    corpus costs one join beyond the detection it already ran."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    spans = cp.repeated_token_spans(d, k=8)
    return cp.remove_spans(d, spans)


@query(
    "oov_rate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
    vocab AS (SELECT term FROM toks GROUP BY term HAVING count(*) >= 100)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           round(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.term = v.term
    GROUP BY t.doc_id
    """,
)
def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate vs a frequency-derived corpus vocabulary
    (functions/text.oov_rate_report) — the tokenizer-coverage screen.
    The vocab aggregate is bounded by vocabulary size and broadcasts
    back onto the token stream; no data-sized shuffle."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return tx.oov_rate_report(d, min_count=100)


@query(
    "mixture_resample_lang",
    oracle="""
    WITH counts AS (SELECT lang, count(*) AS gn FROM documents GROUP BY lang),
    tot AS (SELECT count(*) AS t FROM documents),
    probs AS (SELECT lang, least(1.0, 0.2 * t / gn) AS p FROM counts, tot)
    SELECT d.doc_id, d.lang, round(p.p, 6) AS accept_prob
    FROM documents d JOIN probs p USING (lang)
    WHERE ('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
          / 1152921504606846976.0 < p.p
    """,
)
def mixture_resample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture resampling to equal language shares
    (functions/corpus.mixture_resample): the domain-reweighting step of
    a pretraining pipeline. Over-represented languages are thinned with
    an md5(doc_id) acceptance draw (reproducible under any
    partitioning); the acceptance table is a ≤|langs|-row broadcast and
    the sample is a map-side filter on one corpus scan — no data
    shuffle at any scale."""
    d = load_table(spark, sf_dir, "documents")
    return cp.mixture_resample(
        d, "lang", {"en": 0.2, "de": 0.2, "es": 0.2, "fr": 0.2, "zh": 0.2}
    )


# ---------------------------------------------------------------------------
