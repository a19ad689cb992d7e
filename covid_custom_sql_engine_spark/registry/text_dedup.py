"""Text analysis + deduplication over ``documents``.

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


# Phase 3 — text analysis over `documents`
# ---------------------------------------------------------------------------

_SQL_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '')"
)
_SQL_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_SQL_SW_EN = "['the','and','of','to','in','is','that','it','for','was']"


@query(
    "text_profile",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks, length(text) AS n FROM documents),
    m AS (
      SELECT doc_id, n,
             len(toks) AS n_tokens,
             (n - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) AS n_punct,
             len(list_filter(toks, t -> list_contains({_SQL_SW_EN}, t))) AS n_sw,
             md5({_SQL_NORM}) AS fp
      FROM t)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n AS BIGINT) AS n_chars_measured,
           CASE WHEN n > 0 THEN n_punct / n ELSE 0.0 END AS punct_ratio,
           CASE WHEN n_tokens > 0 THEN n_sw / n_tokens ELSE 0.0 END AS stopword_ratio,
           (least(n / 500.0, 1.0)
            + (1.0 - CASE WHEN n > 0 THEN n_punct / n ELSE 0.0 END)
            + least((CASE WHEN n_tokens > 0 THEN n_sw / n_tokens ELSE 0.0 END) * 5.0, 1.0)
           ) / 3.0 AS quality,
           fp
    FROM m
    """,
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality profile: token/char counts, punctuation ratio,
    stopword ratio, composite quality score, exact-dup fingerprint —
    all built-in expressions (codegen), zero Python in the hot path."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    out = tx.text_profile(d)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_chars_measured").cast("bigint").alias("n_chars_measured"),
        "punct_ratio",
        "stopword_ratio",
        "quality",
        "fp",
    )


_SQL_LANG_SCORES = {
    "de": "['der','die','das','und','ist','nicht','ein','mit','sich','auf']",
    "en": _SQL_SW_EN,
    "es": "['el','la','los','y','es','no','una','por','que','con']",
    "fr": "['le','la','les','et','est','pas','une','pour','que','dans']",
}
_SQL_LANG_CTE = ", ".join(
    f"CASE WHEN len(toks) > 0 THEN len(list_filter(toks, t -> list_contains({lst}, t))) / len(toks) ELSE 0.0 END AS s_{lang}"
    for lang, lst in _SQL_LANG_SCORES.items()
)


@query(
    "lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, {_SQL_LANG_CTE} FROM t)
    SELECT doc_id,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
                WHEN s_fr >= greatest(s_de, s_en, s_es) THEN 'fr'
                WHEN s_es >= greatest(s_de, s_en) THEN 'es'
                WHEN s_en >= s_de THEN 'en'
                ELSE 'de' END AS lang_pred,
           s_de AS score_de, s_en AS score_en, s_es AS score_es, s_fr AS score_fr
    FROM s
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: per-language stopword hit
    ratio, argmax wins (ties → lexicographically last code), all-zero →
    'und'. Pure expression — langid at 100 TB is a codegen'd map stage."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        tx.lang_id("text").alias("lang_pred"),
        *[s.alias(f"score_{lang}") for s, lang in zip(tx.lang_scores("text"), sorted(tx.LANG_STOPWORDS))],
    )


# ---------------------------------------------------------------------------
# Phase 3 — deduplication over `documents`
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle=f"""
    WITH u AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 1000000, text FROM documents)
    SELECT md5({_SQL_NORM}) AS fp, min(doc_id) AS doc_id, count(*) AS n_copies
    FROM u GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via fingerprint hash-groupBy (min-id representative).
    Input is the corpus unioned with a shifted copy of itself so the
    dup-collapse path actually collapses (testdata texts are unique)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1000000))
    return dd.exact_dedup(doubled)


def _sql_minhash_cte(source: str = "documents", lead: str = "WITH ") -> str:
    """Shared CTE chain: tokens → shingles → 12 minhashes → 4 bands.

    Mirrors dedup.minhash_signatures' Kirsch–Mitzenmacher double hashing:
    one md5 per shingle split into two 60-bit hex halves, h_i =
    (h1 + i·h2) mod KM_MODULUS, min per i.

    ``source``/``lead`` let a composite oracle embed the chain mid-query
    over a filtered CTE (lead=", ") instead of heading it over the raw
    table."""
    m = dd.KM_MODULUS
    mh = ",\n             ".join(
        f"list_aggregate(list_transform(hs, h -> (h[1] + {i} * h[2]) % {m}), 'min') AS mh_{i}"
        for i in range(12)
    )
    bands = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(mh_{3*b} || '_' || mh_{3*b+1} || '_' || mh_{3*b+2}) AS band_hash FROM sigs"
        for b in range(4)
    )
    return f"""
    {lead}toks AS (SELECT doc_id, string_split({_SQL_NORM}, ' ') AS toks FROM {source}),
    sh AS (SELECT doc_id,
                  list_distinct(CASE WHEN len(toks) >= 3
                    THEN list_transform(range(0, len(toks) - 2),
                                        i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
                    ELSE [array_to_string(toks, ' ')] END) AS sh
           FROM toks),
    hsets AS (SELECT doc_id, sh,
                     list_transform(sh, s ->
                       [CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {m},
                        CAST('0x' || substr(md5(s), 16, 15) AS BIGINT) % {m}]) AS hs
              FROM sh),
    sigs AS (SELECT doc_id, {mh} FROM hsets),
    bands0 AS ({bands}),
    okb AS (SELECT band, band_hash FROM bands0
            GROUP BY band, band_hash HAVING count(*) <= {dd.MAX_BAND_BUCKET}),
    bands AS (SELECT bands0.* FROM bands0 JOIN okb USING (band, band_hash)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
    """


@query(
    "minhash_lsh_pairs",
    oracle=f"""
    {_sql_minhash_cte()}
    SELECT c.id_a, c.id_b,
           CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) > 0
                THEN CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(x.sh, y.sh)))
                ELSE 0.0 END AS jaccard
    FROM cand c JOIN sh x ON c.id_a = x.doc_id JOIN sh y ON c.id_b = y.doc_id
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates with exact Jaccard verify.

    Pipeline: word 3-gram shingles → 12 md5-minhashes → 4 bands × 3 rows
    → equi-join on (band, band_hash) for candidates (never all-pairs) →
    shingle-set Jaccard on candidates only. All hashes are md5-derived →
    portable and deterministic."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return dd.minhash_near_dups(d, threshold=None)


@query(
    "containment_pairs",
    oracle=f"""
    {_sql_minhash_cte()}
    SELECT c.id_a, c.id_b,
           round(CASE WHEN len(x.sh) > 0
                THEN CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / len(x.sh)
                ELSE 0.0 END, 6) AS containment_a_in_b,
           round(CASE WHEN len(y.sh) > 0
                THEN CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / len(y.sh)
                ELSE 0.0 END, 6) AS containment_b_in_a
    FROM cand c JOIN sh x ON c.id_a = x.doc_id JOIN sh y ON c.id_b = y.doc_id
    """,
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC overlap for LSH candidate pairs: |A∩B|/|A| and
    |A∩B|/|B| on the shingle sets — the partial-copy detector. Jaccard
    misses a short document wholly quoted inside a long one (union
    dominates); containment flags it from either side. Same equi-join
    candidate generation as minhash_lsh_pairs (never all-pairs); the
    two ratios come from one array_intersect per candidate. The shingle
    sets are cached — three subtrees consume them (candidate
    generation + both join sides), same rationale as
    minhash_near_dups."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    sh = dd.shingle_sets(d).cache()
    cand = dd.candidate_pairs_from_bands(
        dd._bands_from_signatures(dd.minhash_signatures(sh, "doc_id", 12), "doc_id", 12, 3)
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    c_ab = F.when(F.size("sh_a") > 0, inter / F.size("sh_a")).otherwise(0.0)
    c_ba = F.when(F.size("sh_b") > 0, inter / F.size("sh_b")).otherwise(0.0)
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(c_ab, 6).alias("containment_a_in_b"),
            F.round(c_ba, 6).alias("containment_b_in_a"),
        )
    )


def _sql_simhash() -> str:
    votes = ",\n           ".join(
        f"sum(CASE WHEN substr(md5(tok), {j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v_{j}"
        for j in range(32)
    )
    bits = " || ".join(
        f"CASE WHEN v_{j} > 0 THEN '1' ELSE '0' END" for j in range(32)
    )
    return f"""
    WITH toks AS (SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS tok FROM documents),
    f AS (SELECT doc_id, tok FROM toks WHERE tok != ''),
    v AS (SELECT doc_id, {votes} FROM f GROUP BY doc_id)
    SELECT doc_id, {bits} AS simhash FROM v
    """


@query("simhash", oracle=_sql_simhash())
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup fingerprint: 32-bit per-token-md5 majority vote,
    emitted as a bitstring (hamming distance = simhash distance).
    One explode + one hash aggregate — shuffle on doc_id only."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return dd.simhash(d)


# ---------------------------------------------------------------------------
