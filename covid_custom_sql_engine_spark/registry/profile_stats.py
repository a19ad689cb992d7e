"""Corpus / source / event profiling analytics: ordered funnels, transition
matrices, entropy and PSI profiling, cluster-representative policy,
Zipf/fertility/vocabulary statistics, outlier and burstiness screens.

Split from registry/analytics.py in round 12; bodies unchanged.
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
from covid_custom_sql_engine_spark.registry.text_dedup import _SQL_NORM, _SQL_SW_EN, _SQL_TOKS, _sql_minhash_cte  # noqa: F401,E501
from covid_custom_sql_engine_spark.registry.sql_wide import _MINHASH_RECURSIVE_CTE  # noqa: F401,E501


# Round 5 — pipeline analytics: ordered funnels, Markov transitions,
# distribution profiling (entropy, PSI), cluster-representative policy
# ---------------------------------------------------------------------------


@query(
    "funnel_conversion",
    oracle=f"""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3, min(s2.t2) AS t2
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
    SELECT '1_view' AS stage, count(*)::BIGINT AS n_users,
           CAST(NULL AS DOUBLE) AS avg_delay_sec FROM s1
    UNION ALL
    SELECT '2_click', count(*)::BIGINT,
           round({_sql_dsum('CAST(epoch_us(t2) - epoch_us(t1) AS DOUBLE)')}
                 / count(*) / 1e6, 6) FROM s2
    UNION ALL
    SELECT '3_purchase', count(*)::BIGINT,
           round({_sql_dsum('CAST(epoch_us(t3) - epoch_us(t2) AS DOUBLE)')}
                 / count(*) / 1e6, 6) FROM s3
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-stage funnel (view → click → purchase): users
    reaching each stage with each later stage's first event strictly
    after the prior stage's, plus mean stage-to-stage latency. Each
    stage is one filtered aggregate equi-joined to the previous stage
    on user_id — the per-stage frames shrink monotonically, every
    shuffle keys on user_id, and nothing is windowed over the full
    event stream (the classic sessionize-then-scan funnel would sort
    every user's history; this touches only stage-relevant events)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.join(s1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        e.join(s2, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t2").alias("t2"))
    )

    def stage(df, name, a, b):
        n = F.count(F.lit(1)).cast("bigint").alias("n_users")
        if a is None:
            return df.agg(n).select(
                F.lit(name).alias("stage"),
                "n_users",
                F.lit(None).cast("double").alias("avg_delay_sec"),
            )
        us = F.expr(f"CAST(timestampdiff(MICROSECOND, {a}, {b}) AS DOUBLE)")
        return df.agg(
            n,
            F.round(ops.dsum(us) / F.count(F.lit(1)) / F.lit(1e6), 6).alias(
                "avg_delay_sec"
            ),
        ).select(F.lit(name).alias("stage"), "n_users", "avg_delay_sec")

    return (
        stage(s1, "1_view", None, None)
        .unionByName(stage(s2, "2_click", "t1", "t2"))
        .unionByName(stage(s3, "3_purchase", "t2", "t3"))
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH t AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events),
    c AS (SELECT src, dst, count(*) AS n FROM t WHERE dst IS NOT NULL
          GROUP BY 1, 2)
    SELECT src, dst, n,
           round(n::DOUBLE / sum(n) OVER (PARTITION BY src), 6) AS p
    FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the session-shape
    fingerprint behind next-action prediction and bot detection. The
    lead() window is partitioned BY USER (bounded history per key —
    never a global sort); the transition aggregate is |types|² rows, so
    the probability normalization window runs over a dimension-sized
    frame, not the data."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = t.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    ws = Window.partitionBy("src")
    return c.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(ws), 6).alias("p"),
    )


@query(
    "column_entropy_profile",
    oracle=f"""
    WITH lv AS (
        SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders),
    c AS (SELECT col_name, val, count(*) AS c FROM lv GROUP BY 1, 2),
    p AS (SELECT col_name, sum(c)::BIGINT AS n_values,
                 count(*)::BIGINT AS n_distinct,
                 {_sql_dsum('c * ln(c)')} AS s
          FROM c GROUP BY 1)
    SELECT col_name, n_values, n_distinct,
           round(ln(n_values) - s / n_values, 6) AS entropy,
           round(CASE WHEN n_distinct > 1
                      THEN (ln(n_values) - s / n_values) / ln(n_distinct)
                      ELSE 0.0 END, 6) AS norm_entropy
    FROM p
    """,
)
def column_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy per categorical column (H = ln n − Σc·ln c / n,
    plus H/ln(distinct) normalized to [0,1]) — the column-level
    skew/informativeness profile feature stores compute before
    encoding decisions. One stack projection + one (column, value)
    hash aggregate; per-column state is one row per distinct value,
    folded with the same c·ln c identity on both engines so no
    per-value probability division ever happens (n is only applied
    once, at the end, on dimension-sized rows)."""
    o = load_table(spark, sf_dir, "orders")
    lv = o.select(
        F.expr(
            "stack(2, 'o_orderstatus', o_orderstatus,"
            " 'o_orderpriority', o_orderpriority) AS (col_name, val)"
        )
    )
    c = lv.groupBy("col_name", "val").agg(F.count(F.lit(1)).alias("c"))
    prof = c.groupBy("col_name").agg(
        F.sum("c").cast("bigint").alias("n_values"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        ops.dsum(F.col("c") * F.log(F.col("c"))).alias("s"),
    )
    h = F.log(F.col("n_values")) - F.col("s") / F.col("n_values")
    return prof.select(
        "col_name",
        "n_values",
        "n_distinct",
        F.round(h, 6).alias("entropy"),
        F.round(
            F.when(F.col("n_distinct") > 1, h / F.log(F.col("n_distinct"))).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("norm_entropy"),
    )


@query(
    "psi_drift",
    oracle="""
    WITH d AS (SELECT ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                      % 100 AS h,
                      (n_chars // 200)::BIGINT AS bin
               FROM documents),
    b AS (SELECT bin, CASE WHEN h < 80 THEN 'train' ELSE 'val' END AS split
          FROM d WHERE h < 90),
    c AS (SELECT bin,
                 sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
                 sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val
          FROM b GROUP BY 1),
    t AS (SELECT sum(n_train)::BIGINT AS nt, sum(n_val)::BIGINT AS nv,
                 count(*)::BIGINT AS nb FROM c)
    SELECT c.bin, c.n_train, c.n_val,
           round(((c.n_train + 0.5::DOUBLE) / (t.nt + 0.5::DOUBLE * t.nb)
                  - (c.n_val + 0.5::DOUBLE) / (t.nv + 0.5::DOUBLE * t.nb))
                 * ln(((c.n_train + 0.5::DOUBLE) / (t.nt + 0.5::DOUBLE * t.nb))
                      / ((c.n_val + 0.5::DOUBLE) / (t.nv + 0.5::DOUBLE * t.nb))),
                 6) AS psi_contrib
    FROM c CROSS JOIN t
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the train and val splits of
    the corpus over document-length bins — the drift score that gates
    "is the new batch distributed like what the model trained on".
    Splits are the same deterministic md5 percentile hash dataset_split
    uses; bins are fixed-width (200 chars). One hash aggregate keyed by
    bin (both split counts in the same pass — no pivot join), then the
    0.5-Laplace-smoothed PSI contribution against a 1-row broadcast of
    the totals, so empty-on-one-side bins stay finite. Σ psi_contrib =
    the headline PSI; per-bin rows keep the drivers visible."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    d = load_table(spark, sf_dir, "documents").select(
        bucket.alias("h"),
        F.floor(F.col("n_chars") / F.lit(200)).cast("bigint").alias("bin"),
    ).filter(F.col("h") < 90)
    c = d.groupBy("bin").agg(
        F.sum(F.when(F.col("h") < 80, 1).otherwise(0)).cast("bigint").alias("n_train"),
        F.sum(F.when(F.col("h") >= 80, 1).otherwise(0)).cast("bigint").alias("n_val"),
    # the bin-count subtree feeds BOTH the per-bin rows and the totals
    # broadcast; pin it so the corpus scans once (multi-consumer
    # lazy-checkpoint pattern, cf. semdedup_prune/bm25)
    ).localCheckpoint(eager=False)
    t = c.agg(
        F.sum("n_train").cast("bigint").alias("nt"),
        F.sum("n_val").cast("bigint").alias("nv"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    half = F.lit(0.5)
    pt = (F.col("n_train") + half) / (F.col("nt") + half * F.col("nb"))
    pv = (F.col("n_val") + half) / (F.col("nv") + half * F.col("nb"))
    return c.crossJoin(F.broadcast(t)).select(
        "bin",
        "n_train",
        "n_val",
        F.round((pt - pv) * F.log(pt / pv), 6).alias("psi_contrib"),
    )


@query(
    "dedup_representative",
    oracle=f"""
    {_MINHASH_RECURSIVE_CTE},
    edges AS (SELECT id_a AS src, id_b AS dst FROM cand
              UNION SELECT id_b, id_a FROM cand),
    reach(id, r) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
    ),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    m AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component, d.n_chars
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
    rep AS (SELECT component, doc_id AS rep_id FROM m
            QUALIFY row_number() OVER (PARTITION BY component
                                       ORDER BY n_chars DESC, doc_id ASC) = 1)
    SELECT m.doc_id, m.component, rep.rep_id,
           m.doc_id = rep.rep_id AS is_rep
    FROM m JOIN rep USING (component)
    """,
)
def dedup_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection per near-dup cluster: instead
    of near_dup_clusters' min-id policy, each cluster keeps its LONGEST
    member (ties → smallest id) — the "keep the best copy" step a
    curation pipeline runs after clustering, where quality can be any
    per-doc score. Clustering reuses the LSH → connected-components
    path; the representative comes from one combinable max-of-struct
    aggregate per component ((n_chars, −id) lexicographic argmax), not
    a per-component sort window."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    comp_df = dd.near_dup_keep(d, dd.lsh_candidate_pairs(d))
    m = comp_df.select("id", "component").join(
        d.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    rep = (
        m.groupBy("component")
        .agg(F.max(F.struct(F.col("n_chars"), (-F.col("id")).alias("_nid"))).alias("_m"))
        .select("component", (-F.col("_m._nid")).cast("bigint").alias("rep_id"))
    )
    return m.join(rep, "component").select(
        F.col("id").alias("doc_id"),
        "component",
        "rep_id",
        (F.col("id") == F.col("rep_id")).alias("is_rep"),
    )


@query(
    "ngram_diversity",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id, list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1]) AS g
          FROM t WHERE len(toks) >= 2)
    SELECT doc_id, len(g)::BIGINT AS n_bigrams,
           len(list_distinct(g))::BIGINT AS n_distinct,
           round(len(list_distinct(g))::DOUBLE / len(g), 6) AS distinct_ratio
    FROM g
    """,
)
def ngram_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram diversity (corpus.ngram_diversity): the
    distinct-n self-repetition screen — low distinct/total bigram
    ratio = phrase-looping text. Pure per-row HOFs on the token array
    (offset-slice zip + array_distinct): map-side only, zero shuffle."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return cp.ngram_diversity(d)


@query(
    "zipf_slope",
    oracle=f"""
    WITH occ AS (SELECT unnest({_SQL_TOKS}) AS token FROM documents),
    v AS (SELECT token, count(*) AS cnt FROM occ GROUP BY 1),
    r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank FROM v),
    xy AS (SELECT ln(rank::DOUBLE) AS x, ln(cnt::DOUBLE) AS y FROM r),
    a AS (SELECT count(*)::BIGINT AS n_terms,
                 {_sql_dsum('x')} AS sx, {_sql_dsum('y')} AS sy,
                 {_sql_dsum('x * x')} AS sxx, {_sql_dsum('x * y')} AS sxy
          FROM xy)
    SELECT n_terms,
           round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6) AS slope,
           round((sy - ((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)) * sx)
                 / n_terms, 6) AS intercept
    FROM a
    """,
)
def zipf_slope_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency OLS fit over the corpus vocabulary
    (corpus.zipf_slope): slope ≈ −1 is healthy natural language;
    deviations flag boilerplate floods or truncated vocabularies. Term
    ranks come from the two-phase distributed global rank (a web-scale
    vocabulary is itself huge — never a bare global ROW_NUMBER), and
    the OLS reduction is one fixed-point-summed aggregate."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return cp.zipf_slope(d)


@query(
    "token_fertility_by_lang",
    oracle=f"""
    WITH t AS (SELECT lang, len({_SQL_TOKS})::BIGINT AS nt, n_chars FROM documents)
    SELECT lang, count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS total_tokens,
           sum(n_chars)::BIGINT AS total_chars,
           round(sum(nt)::DOUBLE / sum(n_chars), 6) AS tokens_per_char
    FROM t GROUP BY lang
    """,
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens-per-character by language — the fertility profile that
    sizes per-language token budgets and flags scripts a
    whitespace-ish tokenizer undersegments. One per-row token count +
    one |langs|-group hash aggregate; nothing scales past the
    dimension."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    t = d.select(
        "lang",
        F.size(tx.tokens("text")).cast("bigint").alias("nt"),
        "n_chars",
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(
            F.sum("nt").cast("double") / F.sum("n_chars"), 6
        ).alias("tokens_per_char"),
    )


@query(
    "source_scorecard",
    oracle=f"""
    WITH m AS (SELECT source, lang, n_chars, text, length(text) AS n,
                      {_SQL_TOKS} AS toks, md5({_SQL_NORM}) AS fp
               FROM documents),
    q AS (SELECT source, lang, n_chars, fp,
                 (least(n / 500.0, 1.0)
                  + (1.0 - CASE WHEN n > 0
                                THEN (n - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / n
                                ELSE 0.0 END)
                  + least((CASE WHEN len(toks) > 0
                                THEN len(list_filter(toks, t -> list_contains({_SQL_SW_EN}, t)))
                                     / len(toks)
                                ELSE 0.0 END) * 5.0, 1.0)
                 ) / 3.0 AS q
          FROM m)
    SELECT source, count(*)::BIGINT AS n_docs,
           round(1.0 - count(DISTINCT fp)::DOUBLE / count(*), 6) AS dup_rate,
           round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS en_share,
           round(sum(n_chars)::DOUBLE / count(*), 6) AS avg_chars,
           round({_sql_dsum('q')} / count(*), 6) AS avg_quality
    FROM q GROUP BY source
    """,
)
def source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: volume, exact-dup rate (1 −
    distinct fingerprints / docs), language share, mean length, mean
    heuristic quality — the one-pass scorecard that decides which
    sources to upweight, cap, or drop. Everything rides one hash
    aggregate keyed by source (the dup-rate COUNT DISTINCT expands to
    a (source, fp) pre-aggregate — still equi-keyed, no joins); quality
    is the same codegen expression text_profile uses."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    prof = d.select(
        "source",
        "lang",
        "n_chars",
        tx.quality_score("text").alias("_q"),
        tx.fingerprint("text").alias("_fp"),
    )
    cnt = F.count(F.lit(1))
    return prof.groupBy("source").agg(
        cnt.cast("bigint").alias("n_docs"),
        F.round(
            F.lit(1.0) - F.countDistinct("_fp").cast("double") / cnt, 6
        ).alias("dup_rate"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double") / cnt,
            6,
        ).alias("en_share"),
        F.round(F.sum("n_chars").cast("double") / cnt, 6).alias("avg_chars"),
        F.round(ops.dsum(F.col("_q")) / cnt, 6).alias("avg_quality"),
    )


@query(
    "embedding_outliers",
    oracle=f"""
    WITH c AS (SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS v
               FROM embeddings),
    el AS (SELECT label::BIGINT AS label, generate_subscripts(embedding, 1) AS i,
                  unnest(embedding::DOUBLE[]) AS x FROM embeddings),
    ce AS (SELECT label, i, avg(x) AS ax FROM el GROUP BY label, i),
    cent AS (SELECT label, list(ax ORDER BY i) AS cv FROM ce GROUP BY label),
    s AS (SELECT c.vec_id, c.label,
                 list_dot_product(v, cv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS cs
          FROM c JOIN cent USING (label)),
    st AS (SELECT label, count(*) AS n,
                  {_sql_dsum('cs')} / count(*) AS m,
                  CASE WHEN count(*) < 2 THEN NULL
                       ELSE round(sqrt(greatest(
                            (count(*) * {_sql_dsum('cs * cs')}
                             - {_sql_dsum('cs')} * {_sql_dsum('cs')})
                            / (count(*) * (count(*) - 1)), 0.0)), 6) END AS sd
           FROM s GROUP BY label)
    SELECT s.vec_id, s.label, round(cs, 6) AS cos_centroid,
           round(CASE WHEN sd > 0 THEN (cs - m) / sd END, 6) AS z,
           coalesce((CASE WHEN sd > 0 THEN (cs - m) / sd END) < -2.0, FALSE)
             AS is_outlier
    FROM s JOIN st USING (label)
    """,
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space quality screen: cosine of every vector to its
    own label centroid, z-scored within the label; z < −2 flags
    mislabeled/corrupted vectors — the QA sibling of semdedup (which
    removes near-DUPLICATES; this removes near-NOTHING-LIKE-ITS-GROUP).
    Centroids broadcast; the per-vector similarity frame is pinned once
    for its two consumers (stats + join-back); label stats are a
    |labels|-row broadcast. Std uses the repo's deterministic
    fixed-point computational formula with round(6)."""
    e = parallelize_small(load_table(spark, sf_dir, "embeddings"))
    cents = F.broadcast(
        sim.label_centroids(e).withColumnRenamed("cell", "label")
    )
    sims = (
        e.select(
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            sim.as_double("embedding").alias("_v"),
        )
        .join(cents, "label")
        .select(
            "vec_id", "label", sim.cosine(F.col("_v"), F.col("_cv")).alias("_cos")
        )
        .localCheckpoint(eager=False)
    )
    n = F.count(F.lit(1))
    sx = ops.dsum(F.col("_cos"))
    sxx = ops.dsum(F.col("_cos") * F.col("_cos"))
    stats = sims.groupBy("label").agg(
        (sx / n).alias("_m"),
        F.when(n < 2, F.lit(None))
        .otherwise(
            F.round(
                F.sqrt(
                    F.greatest(
                        (n * sxx - sx * sx) / (n * (n - 1)), F.lit(0.0)
                    )
                ),
                6,
            )
        )
        .alias("_sd"),
    )
    z = F.when(F.col("_sd") > 0, (F.col("_cos") - F.col("_m")) / F.col("_sd"))
    return sims.join(F.broadcast(stats), "label").select(
        "vec_id",
        "label",
        F.round(F.col("_cos"), 6).alias("cos_centroid"),
        F.round(z, 6).alias("z"),
        F.coalesce(z < -2.0, F.lit(False)).alias("is_outlier"),
    )


@query(
    "vocab_stats",
    oracle=f"""
    WITH occ AS (SELECT unnest({_SQL_TOKS}) AS token FROM documents),
    v AS (SELECT token, count(*) AS cnt FROM occ GROUP BY 1)
    SELECT sum(cnt)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_terms,
           round(count(*)::DOUBLE / sum(cnt), 6) AS type_token_ratio,
           sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax_count,
           round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS hapax_ratio
    FROM v
    """,
)
def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary health in one row: token/term totals,
    type-token ratio, and the hapax-legomena share (terms seen exactly
    once — a high rate means OCR noise/typos/IDs polluting the vocab;
    a collapsing rate means boilerplate flooding). Zipf's slope
    (zipf_slope) fits the same table's SHAPE; this reads its tails.
    One explode + one term-keyed aggregate + one scalar fold — state
    bounded by vocabulary, order statistics nowhere."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    v = (
        d.select(F.explode(tx.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hap = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
    return v.agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("cnt"), 6).alias(
            "type_token_ratio"
        ),
        hap.cast("bigint").alias("hapax_count"),
        F.round(hap.cast("double") / F.count(F.lit(1)), 6).alias("hapax_ratio"),
    )


@query(
    "user_entropy_histogram",
    oracle=f"""
    WITH c AS (SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2),
    u AS (SELECT user_id, sum(c)::BIGINT AS n, {_sql_dsum('c * ln(c)')} AS s
          FROM c GROUP BY 1),
    h AS (SELECT user_id, round(ln(n) - s / n, 6) AS ent FROM u)
    SELECT CAST(floor(ent / 0.25::DOUBLE) AS BIGINT) AS bucket,
           count(*)::BIGINT AS n_users,
           round(min(ent), 6) AS min_entropy,
           round(max(ent), 6) AS max_entropy
    FROM h GROUP BY 1
    """,
)
def user_entropy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity fingerprint: Shannon entropy of each user's
    event-type mix (the c·ln c identity again — per-user state is one
    row per (user, type)), bucketed into a 0.25-nat histogram. Near-zero
    entropy = single-action bots; the histogram keeps the output
    dimension-sized no matter how many users exist. Two combinable hash
    aggregates keyed (user, type) then (user) — the same partitioning
    family, so AQE coalesces the second exchange."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    u = c.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        ops.dsum(F.col("c") * F.log(F.col("c"))).alias("s"),
    )
    h = u.select(
        F.round(F.log(F.col("n")) - F.col("s") / F.col("n"), 6).alias("ent")
    )
    return h.groupBy(
        F.floor(F.col("ent") / F.lit(0.25)).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.min("ent"), 6).alias("min_entropy"),
        F.round(F.max("ent"), 6).alias("max_entropy"),
    )


@query(
    "event_burstiness",
    oracle=f"""
    WITH hc AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
                       count(*) AS c
                FROM events GROUP BY 1, 2)
    SELECT event_type, count(*)::BIGINT AS n_hours,
           round({_sql_dsum('c')} / count(*), 6) AS mean_per_hour,
           round((count(*) * {_sql_dsum('(c::DOUBLE) * c')} - {_sql_dsum('c')} * {_sql_dsum('c')})
                 / (count(*) * (count(*) - 1))
                 / ({_sql_dsum('c')} / count(*)), 6) AS fano_factor
    FROM hc GROUP BY event_type
    """,
)
def event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per event type: the Fano factor
    (variance-to-mean ratio) of hourly arrival counts — ≈1 is
    Poisson-like steady traffic, ≫1 is bursty (flash crowds,
    batch-replay artifacts), ≪1 is suspiciously metronomic (synthetic
    load). One (type, hour) pre-aggregate then a |types|-row
    variance fold with the deterministic fixed-point sums."""
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    hc = e.groupBy(
        "event_type", F.window("ts", "1 hour").getField("start").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    n = F.count(F.lit(1))
    sx = ops.dsum(F.col("c"))
    # square in DOUBLE: a >3e9-count bucket would overflow the raw
    # BIGINT product before the decimal cast (oracle casts identically)
    sxx = ops.dsum(F.col("c").cast("double") * F.col("c"))
    return hc.groupBy("event_type").agg(
        n.cast("bigint").alias("n_hours"),
        F.round(sx / n, 6).alias("mean_per_hour"),
        F.round(
            (n * sxx - sx * sx) / (n * (n - 1)) / (sx / n), 6
        ).alias("fano_factor"),
    )
