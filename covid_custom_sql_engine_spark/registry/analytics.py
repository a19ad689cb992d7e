"""Pipeline analytics: funnels, Markov attribution, drift, privacy audits, graph algorithms, FD discovery.

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


@query(
    "image_stats_real",
    oracle="""
    WITH g AS (SELECT d.doc_id, x, y
               FROM documents d,
                    (SELECT unnest(range(0, 8)) AS x),
                    (SELECT unnest(range(0, 6)) AS y))
    SELECT doc_id AS media_id, 6::BIGINT AS height, 8::BIGINT AS width,
           round(avg(((doc_id * 7 + x * 3 + y * 5) % 256)::DOUBLE), 6) AS mean_r,
           round(avg(((doc_id * 7 + x * 3 + y * 5 + 11) % 256)::DOUBLE), 6) AS mean_g,
           round(avg(((doc_id * 7 + x * 3 + y * 5 + 22) % 256)::DOUBLE), 6) AS mean_b
    FROM g GROUP BY doc_id
    """,
)
def image_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec round-trip, hash-matched: deterministic P6 PPM
    payloads are ENCODED per document id (multimodal.synth_ppm_media),
    DECODED by the real numpy PPM parser, and reduced to per-channel
    means (multimodal.image_features) — the full binary-media path
    through Arrow-batched mapInPandas with a closed-form SQL oracle
    over the same pixel formula. Only (media_id, payload) crosses the
    Python boundary; 48-pixel integer means are exact in float64, so
    the values hash-match to the last bit."""
    from covid_custom_sql_engine_spark.functions import multimodal as mm

    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    feats = mm.image_features(mm.synth_ppm_media(d))
    return feats.select(
        "media_id",
        F.col("height").cast("bigint").alias("height"),
        F.col("width").cast("bigint").alias("width"),
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@query(
    "audio_stats_real",
    oracle="""
    WITH s AS (SELECT d.doc_id, i,
                      ((doc_id * 13 + i * 17) % 65536) - 32768 AS v
               FROM documents d, (SELECT unnest(range(0, 256)) AS i)),
    w AS (SELECT doc_id, v,
                 lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
          FROM s)
    SELECT doc_id AS media_id, 8000::BIGINT AS sample_rate,
           256::BIGINT AS n_samples, 1::BIGINT AS channels,
           round(sqrt(sum((v * v)::DOUBLE) / 256), 6) AS rms,
           sum(CASE WHEN pv IS NOT NULL AND ((v < 0) != (pv < 0))
                    THEN 1 ELSE 0 END)::BIGINT AS zero_crossings
    FROM w GROUP BY doc_id
    """,
)
def audio_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec round-trip, hash-matched: deterministic mono
    PCM-16 RIFF/WAVE payloads encoded per document id
    (multimodal.synth_wav_media), decoded by the real numpy WAV chunk
    walker, and reduced to RMS + zero-crossings
    (multimodal.audio_features), with a closed-form SQL oracle over the
    same sample formula. Integer squares sum exactly in float64 (256
    samples ≪ 2^53), so RMS matches bitwise before the shared
    round(6)."""
    from covid_custom_sql_engine_spark.functions import multimodal as mm

    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    feats = mm.audio_features(mm.synth_wav_media(d))
    return feats.select(
        "media_id",
        F.col("sample_rate").cast("bigint").alias("sample_rate"),
        "n_samples",
        F.col("channels").cast("bigint").alias("channels"),
        F.round("rms", 6).alias("rms"),
        "zero_crossings",
    )


@query(
    "jpeg_stats_real",
    oracle="""
    WITH c AS (SELECT doc_id, ((doc_id*7)%256)::DOUBLE AS r,
                      ((doc_id*11)%256)::DOUBLE AS g, ((doc_id*13)%256)::DOUBLE AS b
               FROM documents),
    ycc AS (SELECT doc_id,
      LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(0.299::DOUBLE*r + 0.587::DOUBLE*g + 0.114::DOUBLE*b + 0.5::DOUBLE))) AS y,
      LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(128.0::DOUBLE - 0.168736::DOUBLE*r - 0.331264::DOUBLE*g + 0.5::DOUBLE*b + 0.5::DOUBLE))) AS cb,
      LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(128.0::DOUBLE + 0.5::DOUBLE*r - 0.418688::DOUBLE*g - 0.081312::DOUBLE*b + 0.5::DOUBLE))) AS cr
    FROM c)
    SELECT doc_id AS media_id, 8::BIGINT AS height, 16::BIGINT AS width,
      round(LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(y + 1.402::DOUBLE*(cr-128.0::DOUBLE) + 0.5::DOUBLE))), 6) AS mean_r,
      round(LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(y - 0.344136::DOUBLE*(cb-128.0::DOUBLE) - 0.714136::DOUBLE*(cr-128.0::DOUBLE) + 0.5::DOUBLE))), 6) AS mean_g,
      round(LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(y + 1.772::DOUBLE*(cb-128.0::DOUBLE) + 0.5::DOUBLE))), 6) AS mean_b
    FROM ycc
    """,
)
def jpeg_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL **compressed** codec round-trip, hash-matched: baseline
    JFIF JPEG payloads are ENCODED per document id
    (multimodal.synth_jpeg_media — constant-color 16×8 RGB, all-8
    quant tables), DECODED by the pure-numpy T.81 baseline decoder
    (functions/jpeg_codec: marker parse → canonical Huffman → zigzag →
    dequant → IDCT → YCbCr→RGB), and reduced to per-channel means.
    Constant blocks make the round-trip closed-form — DC step 8
    divides DC = 8·(v−128) exactly, so decoded RGB is the literal
    double-rounding chain RGB→YCbCr→RGB with floor(x+0.5)+clip at
    each step, which the oracle replicates term-for-term (IEEE-double
    identical in DuckDB, verified over 600 ids). The decoder itself
    has no constant-image shortcut: every payload runs real entropy
    decoding. PNG/MP3 remain documented integration points (ADR in
    functions/multimodal.py)."""
    from covid_custom_sql_engine_spark.functions import multimodal as mm

    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    feats = mm.image_features(mm.synth_jpeg_media(d))
    return feats.select(
        "media_id",
        F.col("height").cast("bigint").alias("height"),
        F.col("width").cast("bigint").alias("width"),
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@query(
    "png_stats_real",
    oracle="""
    WITH g AS (SELECT d.doc_id, x, y
               FROM documents d,
                    (SELECT unnest(range(0, 9)) AS x),
                    (SELECT unnest(range(0, 7)) AS y))
    SELECT doc_id AS media_id, 7::BIGINT AS height, 9::BIGINT AS width,
           round(avg(((doc_id * 7 + x * 3 + y * 5) % 256)::DOUBLE), 6) AS mean_r,
           round(avg(((doc_id * 7 + x * 3 + y * 5 + 11) % 256)::DOUBLE), 6) AS mean_g,
           round(avg(((doc_id * 7 + x * 3 + y * 5 + 22) % 256)::DOUBLE), 6) AS mean_b
    FROM g GROUP BY doc_id
    """,
)
def png_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossless-compressed codec round-trip, hash-matched: PNG
    payloads encoded per document id (multimodal.synth_png_media — the
    PPM pixel formula, filter_mode='cycle' so every decode runs all
    five scanline filters), decompressed by the numpy + stdlib-zlib
    PNG decoder (functions/png_codec: chunk walk with CRC verify →
    inflate → unfilter), and reduced to per-channel means. PNG is
    lossless, so the oracle is the raw pixel formula itself — the
    63-pixel integer means are exact in float64 and hash-match to the
    last bit, same as image_stats_real but through a real DEFLATE
    compression layer and the full filter reconstruction path."""
    from covid_custom_sql_engine_spark.functions import multimodal as mm

    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    feats = mm.image_features(mm.synth_png_media(d))
    return feats.select(
        "media_id",
        F.col("height").cast("bigint").alias("height"),
        F.col("width").cast("bigint").alias("width"),
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@query(
    "video_stats_real",
    oracle="""
    WITH g AS (SELECT d.doc_id, t, x, y, p,
                      (d.doc_id*7 + x*3 + y*5 + p*11 + 97*(t//3)) % 256 AS v
               FROM documents d,
                    (SELECT unnest(range(0, 6)) AS t),
                    (SELECT unnest(range(0, 8)) AS x),
                    (SELECT unnest(range(0, 6)) AS y),
                    (SELECT unnest(range(0, 3)) AS p)),
    fm AS (SELECT doc_id, t,
                  round(avg(CASE WHEN p=0 THEN v END)::DOUBLE, 6) AS mean_y,
                  round(avg(CASE WHEN p=1 THEN v END)::DOUBLE, 6) AS mean_cb,
                  round(avg(CASE WHEN p=2 THEN v END)::DOUBLE, 6) AS mean_cr
           FROM g GROUP BY doc_id, t),
    fd AS (SELECT a.doc_id, a.t, avg(abs(a.v - b.v))::DOUBLE AS fd
           FROM g a JOIN g b
             ON a.doc_id = b.doc_id AND a.x = b.x AND a.y = b.y AND a.p = b.p
                AND b.t = a.t - 1
           GROUP BY a.doc_id, a.t)
    SELECT fm.doc_id AS media_id, fm.t::INTEGER AS frame_idx,
           (fm.t * 250)::BIGINT AS ts_ms, mean_y, mean_cb, mean_cr,
           round(coalesce(fd.fd, 0.0::DOUBLE), 6) AS frame_diff,
           coalesce(fd.fd, 0.0::DOUBLE) > 48.0::DOUBLE AS is_cut
    FROM fm LEFT JOIN fd ON fm.doc_id = fd.doc_id AND fm.t = fd.t
    """,
)
def video_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video path, hash-matched: YUV4MPEG2 (y4m C444) payloads —
    a genuine public container format — encoded per document id with
    two scenes (every pixel shifts +97 mod 256 at frame 3), decoded by
    the real numpy stream parser (multimodal.decode_y4m), and fanned
    out ONE ROW PER FRAME with per-plane means and the mean-absolute
    frame-difference shot-boundary signal
    (multimodal.video_frame_features). is_cut flags the scene change;
    the oracle reproduces the per-pixel formula, the per-frame means,
    and the lag-join diff in closed form (integer sums exact in
    float64). This replaces the former decode-stubbed story for video:
    container parse, frame explode, temporal state (one frame pair per
    doc, never the whole video) are all real; only inter-frame CODEC
    decompression (H.264 etc.) remains the documented ffmpeg
    integration point (ADR in functions/multimodal.py)."""
    from covid_custom_sql_engine_spark.functions import multimodal as mm

    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    feats = mm.video_frame_features(mm.synth_y4m_media(d))
    return feats.select(
        "media_id",
        "frame_idx",
        "ts_ms",
        F.round("mean_y", 6).alias("mean_y"),
        F.round("mean_cb", 6).alias("mean_cb"),
        F.round("mean_cr", 6).alias("mean_cr"),
        F.round("frame_diff", 6).alias("frame_diff"),
        (F.col("frame_diff") > 48.0).alias("is_cut"),
    )


@query(
    "video_stats_c420",
    oracle="""
    WITH g AS (SELECT d.doc_id, t, x, y, p,
                      (d.doc_id*7
                       + (CASE WHEN p = 0 THEN x ELSE x // 2 END)*3
                       + (CASE WHEN p = 0 THEN y ELSE y // 2 END)*5
                       + p*11 + 97*(t//3)) % 256 AS v
               FROM documents d,
                    (SELECT unnest(range(0, 6)) AS t),
                    (SELECT unnest(range(0, 8)) AS x),
                    (SELECT unnest(range(0, 6)) AS y),
                    (SELECT unnest(range(0, 3)) AS p)),
    fm AS (SELECT doc_id, t,
                  round(avg(CASE WHEN p=0 THEN v END)::DOUBLE, 6) AS mean_y,
                  round(avg(CASE WHEN p=1 THEN v END)::DOUBLE, 6) AS mean_cb,
                  round(avg(CASE WHEN p=2 THEN v END)::DOUBLE, 6) AS mean_cr
           FROM g GROUP BY doc_id, t),
    fd AS (SELECT a.doc_id, a.t, avg(abs(a.v - b.v))::DOUBLE AS fd
           FROM g a JOIN g b
             ON a.doc_id = b.doc_id AND a.x = b.x AND a.y = b.y AND a.p = b.p
                AND b.t = a.t - 1
           GROUP BY a.doc_id, a.t)
    SELECT fm.doc_id AS media_id, fm.t::INTEGER AS frame_idx,
           (fm.t * 250)::BIGINT AS ts_ms, mean_y, mean_cb, mean_cr,
           round(coalesce(fd.fd, 0.0::DOUBLE), 6) AS frame_diff,
           coalesce(fd.fd, 0.0::DOUBLE) > 48.0::DOUBLE AS is_cut
    FROM fm LEFT JOIN fd ON fm.doc_id = fd.doc_id AND fm.t = fd.t
    """,
)
def video_stats_c420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4:2:0 decode path hash-matched — the chroma layout that
    carries most real-world video: y4m C420 payloads (chroma planes
    written on the half-resolution grid), decoded through
    multimodal.decode_y4m's nearest-neighbor chroma upsampler (each
    chroma sample replicated over its 2×2 luma block), then the same
    per-frame means + shot-boundary diff as video_stats_real. The
    oracle evaluates the synth formula at (x//2, y//2) for the chroma
    planes — exactly what NN upsampling reconstructs — so the lossy-
    layout round-trip is exact, not approximate. Closes the r6
    verdict's one reconsidered codec gap (the C420 upsampler);
    interlaced/alpha layouts and inter-frame codecs remain the
    documented ADR boundary."""
    from covid_custom_sql_engine_spark.functions import multimodal as mm

    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    feats = mm.video_frame_features(mm.synth_y4m_media(d, colorspace="C420"))
    return feats.select(
        "media_id",
        "frame_idx",
        "ts_ms",
        F.round("mean_y", 6).alias("mean_y"),
        F.round("mean_cb", 6).alias("mean_cb"),
        F.round("mean_cr", 6).alias("mean_cr"),
        F.round("frame_diff", 6).alias("frame_diff"),
        (F.col("frame_diff") > 48.0).alias("is_cut"),
    )


@query(
    "mjpeg_stats_real",
    oracle="""
    WITH g AS (SELECT d.doc_id, t,
                      ((d.doc_id*7 + 97*(t//3)) % 256)::DOUBLE AS r,
                      ((d.doc_id*11 + 97*(t//3)) % 256)::DOUBLE AS g,
                      ((d.doc_id*13 + 97*(t//3)) % 256)::DOUBLE AS b
               FROM documents d, (SELECT unnest(range(0, 6)) AS t)),
    ycc AS (SELECT doc_id, t,
      LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(0.299::DOUBLE*r + 0.587::DOUBLE*g + 0.114::DOUBLE*b + 0.5::DOUBLE))) AS y,
      LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(128.0::DOUBLE - 0.168736::DOUBLE*r - 0.331264::DOUBLE*g + 0.5::DOUBLE*b + 0.5::DOUBLE))) AS cb,
      LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(128.0::DOUBLE + 0.5::DOUBLE*r - 0.418688::DOUBLE*g - 0.081312::DOUBLE*b + 0.5::DOUBLE))) AS cr
    FROM g),
    dec AS (SELECT doc_id, t,
      LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(y + 1.402::DOUBLE*(cr-128.0::DOUBLE) + 0.5::DOUBLE))) AS dr,
      LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(y - 0.344136::DOUBLE*(cb-128.0::DOUBLE) - 0.714136::DOUBLE*(cr-128.0::DOUBLE) + 0.5::DOUBLE))) AS dg,
      LEAST(255.0::DOUBLE, GREATEST(0.0::DOUBLE,
        floor(y + 1.772::DOUBLE*(cb-128.0::DOUBLE) + 0.5::DOUBLE))) AS db
    FROM ycc),
    fd AS (SELECT a.doc_id, a.t,
                  (abs(a.dr - b.dr) + abs(a.dg - b.dg) + abs(a.db - b.db)) / 3.0::DOUBLE AS fd
           FROM dec a JOIN dec b ON a.doc_id = b.doc_id AND b.t = a.t - 1)
    SELECT dec.doc_id AS media_id, dec.t::INTEGER AS frame_idx,
           (dec.t * 250)::BIGINT AS ts_ms,
           round(dr, 6) AS mean_r, round(dg, 6) AS mean_g, round(db, 6) AS mean_b,
           round(coalesce(fd.fd, 0.0::DOUBLE), 6) AS frame_diff,
           coalesce(fd.fd, 0.0::DOUBLE) > 48.0::DOUBLE AS is_cut
    FROM dec LEFT JOIN fd ON dec.doc_id = fd.doc_id AND dec.t = fd.t
    """,
)
def mjpeg_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL **compressed video** round-trip, hash-matched — the rung
    the round-11 verdict asked for between intra-frame JPEG and the
    H.264 integration point: MJPEG-in-AVI payloads (a real RIFF/AVI
    container whose movi LIST carries one complete baseline JFIF per
    00dc chunk — the layout capture hardware actually emits) are
    assembled per document (multimodal.synth_mjpeg_avi_media: 6
    constant-color frames, two scenes via the +97 shift at frame 3,
    all-8 quant tables), decoded by the composed RIFF walker + numpy
    T.81 entropy decoder (multimodal.decode_mjpeg_avi), and fanned out
    one row per frame with RGB means, container-derived timestamps,
    and the shot-boundary diff (multimodal.mjpeg_frame_features).
    Constant blocks make the lossy round-trip closed-form (the
    jpeg_stats_real argument, per frame), so the oracle replicates the
    RGB→YCbCr→RGB double-rounding chain, the 4fps timestamps, and the
    lag-join diff term-for-term; every payload still runs real Huffman
    entropy decoding per frame plus full container validation. Only
    inter-frame codecs (H.264/VP9/AAC) remain the documented ffmpeg
    ADR."""
    from covid_custom_sql_engine_spark.functions import multimodal as mm

    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    feats = mm.mjpeg_frame_features(mm.synth_mjpeg_avi_media(d))
    return feats.select(
        "media_id",
        "frame_idx",
        "ts_ms",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("frame_diff", 6).alias("frame_diff"),
        (F.col("frame_diff") > 48.0).alias("is_cut"),
    )


@query(
    "audio_spectrum_real",
    oracle="""
    WITH s AS (SELECT d.doc_id, i,
                      CASE WHEN ((i // (1 + d.doc_id % 6)) % 2) = 0
                           THEN 8000 ELSE -8000 END AS v
               FROM documents d, (SELECT unnest(range(0, 120)) AS i)),
    p AS (SELECT s.doc_id, b,
                 pow(sum(v * cos(2 * pi() * b * i / 120.0::DOUBLE)), 2)
                 + pow(sum(v * sin(2 * pi() * b * i / 120.0::DOUBLE)), 2) AS pw
          FROM s, (SELECT unnest(range(1, 61)) AS b)
          GROUP BY s.doc_id, b),
    r AS (SELECT doc_id, b,
                 row_number() OVER (PARTITION BY doc_id ORDER BY pw DESC, b ASC) AS rn
          FROM p)
    SELECT doc_id AS media_id, 120::INTEGER AS n_samples, b::INTEGER AS dominant_bin,
           round((b * 8000) / 120.0::DOUBLE, 6) AS dominant_hz
    FROM r WHERE rn = 1
    """,
)
def audio_spectrum_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL spectral analysis round-trip: deterministic square-wave
    PCM-16 WAV payloads (multimodal.synth_square_wav_media — period
    P = 2·(1 + id mod 6) samples, all-integer, no transcendentals in
    the fixture), decoded by the real WAV chunk walker, then direct-DFT
    dominant-bin detection (multimodal.audio_spectrum_features) — the
    tone/voicedness screen of an audio curation pipeline. A square
    wave's fundamental n/P strictly dominates its harmonics (≥ 3×
    power), so the argmax is immune to the 1-ulp libm sin/cos
    differences between numpy and DuckDB: the oracle computes the same
    spectrum independently and must land on the same bin; only
    exact-arithmetic columns (bin, bin-derived Hz) cross the hash
    comparison."""
    from covid_custom_sql_engine_spark.functions import multimodal as mm

    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    feats = mm.audio_spectrum_features(mm.synth_square_wav_media(d))
    return feats.select(
        "media_id",
        "n_samples",
        "dominant_bin",
        F.round("dominant_hz", 6).alias("dominant_hz"),
    )


@query(
    "collocation_pmi",
    oracle=f"""
    WITH t AS (SELECT {_SQL_TOKS} AS toks FROM documents WHERE len({_SQL_TOKS}) >= 2),
    bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
           FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)),
    big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    l AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
    r AS (SELECT w2, sum(c12) AS c2 FROM big GROUP BY 1),
    n AS (SELECT sum(c12) AS n FROM big)
    SELECT big.w1, big.w2, big.c12::BIGINT AS c12,
           round(ln(big.c12::DOUBLE * n.n / (l.c1::DOUBLE * r.c2)), 6) AS pmi
    FROM big JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
    WHERE big.c12 >= 5
    ORDER BY pmi DESC, w1 ASC, w2 ASC
    LIMIT 50
    """,
)
def collocation_pmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by PMI with a min-support floor
    (corpus.collocation_pmi) — the multi-word-expression detector where
    raw pair counts just resurface stopword pairs. Vocabulary-bounded
    aggregates, slot-marginal equi-joins, 1-row N broadcast, top-k via
    TakeOrdered."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    return cp.collocation_pmi(d)


@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH toks AS (SELECT source, string_split({_SQL_NORM}, ' ') AS toks FROM documents),
    sh AS (SELECT source,
                  unnest(list_distinct(CASE WHEN len(toks) >= 3
                    THEN list_transform(range(0, len(toks) - 2),
                                        i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
                    ELSE [array_to_string(toks, ' ')] END)) AS g
           FROM toks),
    f AS (SELECT DISTINCT source, g FROM sh),
    p AS (SELECT a.g, a.source AS source_a, b.source AS source_b
          FROM f a JOIN f b ON a.g = b.g AND a.source < b.source)
    SELECT source_a, source_b, count(*)::BIGINT AS shared_shingles
    FROM p GROUP BY 1, 2
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content-overlap matrix: for every source pair, how
    many distinct word 3-gram shingles both emit — the mirror-site/
    syndication detector that tells a curation pipeline which
    "independent" sources are actually reprinting each other (dedup
    them jointly, or downweight one; exact-dup fingerprints are the
    degenerate all-or-nothing case — shingle overlap grades partial
    reuse too). Same single-shuffle formulation as
    candidate_pairs_from_bands: hash-partition once on the shingle,
    gather each shingle's distinct sources with collect_set, emit
    sorted-array pair combinations with higher-order functions — no
    self-join, and per-shingle state is bounded by |sources|, so a
    boilerplate phrase present in millions of docs still contributes
    O(|sources|²) rows, never O(docs²)."""
    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    fps = d.select(
        "source", F.explode(dd.word_shingles("text")).alias("g")
    ).distinct()
    buckets = (
        fps.groupBy("g")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    return (
        buckets.select(
            F.explode(dd.pair_combinations("srcs", "source_a", "source_b")).alias("p")
        )
        .groupBy("p.source_a", "p.source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_shingles"))
    )


_CURATION_Q_THRESHOLD = 0.45


def _curation_pipeline_oracle() -> str:
    """End-to-end curation pipeline oracle: quality gate → exact dedup
    (min-id per fingerprint) → near-dup CC keep, every input doc
    labeled with the stage that dropped it. The minhash/band chain is
    the shared generator embedded over the post-exact-dedup survivors
    (source='s2'); the corpus is doubled with offset clones (the
    simhash fixture pattern) so the exact-dup stage has real work."""
    thr = _CURATION_Q_THRESHOLD
    mh = _sql_minhash_cte("s2", ", ")
    return f"""
    WITH RECURSIVE d2 AS (SELECT doc_id, text FROM documents
                          UNION ALL
                          SELECT doc_id + 1000000, text FROM documents),
    t0 AS (SELECT doc_id, text, length(text) AS n,
                  list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                              x -> x != '') AS toks
           FROM d2),
    q AS (SELECT doc_id, text,
                 (least(n / 500.0, 1.0)
                  + (1.0 - CASE WHEN n > 0
                                THEN (n - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / n
                                ELSE 0.0 END)
                  + least((CASE WHEN len(toks) > 0
                                THEN len(list_filter(toks, t -> list_contains({_SQL_SW_EN}, t)))
                                     / len(toks)
                                ELSE 0.0 END) * 5.0, 1.0)) / 3.0 AS q
          FROM t0),
    s1 AS (SELECT doc_id, text FROM q WHERE q >= {thr}),
    f AS (SELECT doc_id, text, md5({_SQL_NORM}) AS fp FROM s1),
    k2 AS (SELECT fp, min(doc_id) AS keep_id FROM f GROUP BY fp),
    s2 AS (SELECT f.doc_id, f.text FROM f
           JOIN k2 ON f.fp = k2.fp AND f.doc_id = k2.keep_id)
    {mh},
    edges AS (SELECT id_a AS src, id_b AS dst FROM cand
              UNION SELECT id_b, id_a FROM cand),
    reach(id, r) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
    ),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
    SELECT d2.doc_id,
           CASE WHEN q.q < {thr} THEN 'quality'
                WHEN s2x.doc_id IS NULL THEN 'exact_dup'
                WHEN coalesce(c.component, d2.doc_id) = d2.doc_id THEN 'kept'
                ELSE 'near_dup' END AS stage
    FROM d2
    JOIN q USING (doc_id)
    LEFT JOIN s2 s2x ON d2.doc_id = s2x.doc_id
    LEFT JOIN comp c ON d2.doc_id = c.id
    """


@query("corpus_curation_pipeline", oracle=_curation_pipeline_oracle())
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline END-TO-END, one query: heuristic quality
    gate → exact dedup (min-id representative per normalized
    fingerprint) → MinHash/LSH near-dup clustering with min-id keep —
    every input document labeled with the stage that removed it
    ('quality' | 'exact_dup' | 'near_dup' | 'kept'). The input corpus
    is doubled with offset clones (the simhash fixture pattern;
    documents is fixed-size at driver scale, so the offset cannot
    alias) so the exact-dup stage does real work.

    Stage plans compose exactly as the standalone queries do: the
    quality gate is per-row codegen, exact dedup is one fingerprint
    hash aggregate + equi-join, near-dup is the banded LSH equi-join →
    iterative min-label CC — each stage's input strictly shrinks, and
    nothing in the composition introduces a shuffle the standalone ops
    don't have. This is the flagship composition a user of the
    standalone pieces would actually run nightly."""
    d0 = parallelize_small(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    d2 = d0.unionByName(
        d0.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    # the composition itself is the engine API corpus.curation_pipeline
    # (extracted r6 so it is property-testable on arbitrary corpora);
    # stage pinning lives inside it
    return cp.curation_pipeline(d2, q_threshold=_CURATION_Q_THRESHOLD)


@query(
    "bfs_distances",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    bfs AS (
      SELECT 'c:' || c_custkey AS node, 0 AS dist
      FROM customer WHERE c_custkey <= 3
      UNION
      SELECT e.dst AS node, b.dist + 1 AS dist
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.dist < 3)
    SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM bfs GROUP BY node
    """,
)
def bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the customer↔supplier trading graph — the
    engine's recursive-query surface (graph.bfs_layers; the oracle IS
    a WITH RECURSIVE CTE, and frontier BFS's first-touch distance
    equals the recursion's min(dist) by construction). Sources are the
    customers with c_custkey ≤ 3; edges are the distinct trading pairs
    both directions with the typed 'c:'/'s:' node prefixes
    (pagerank_bipartite's aliasing-proof convention); depth capped at
    3. Per level the engine pays one frontier⋈edges equi-join, one
    distinct, and one anti-join against the visited set — frontier and
    visited eagerly pinned so lineage stays flat (the
    connected-components discipline with a FIXED round count). All
    integer arithmetic: the comparison is exact."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    srcs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 3)
        .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"))
    )
    return gr.bfs_layers(edges, srcs, max_depth=3)


@query(
    "skyline_parts",
    oracle="""
    WITH pp AS (SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
                       p_retailprice + 0.0 AS p_retailprice,
                       CAST(p_size AS BIGINT) AS p_size
                FROM part
                WHERE p_brand = 'Brand#23'
                  AND p_retailprice IS NOT NULL AND p_size IS NOT NULL)
    SELECT p_partkey, p_retailprice, p_size FROM pp p
    WHERE NOT EXISTS (
      SELECT 1 FROM pp q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of one brand's parts — no part in
    the result is both cheaper AND larger than another
    (selection.skyline_2d: minimize p_retailprice, maximize p_size).
    The oracle states the dominance semantics directly (NOT EXISTS, a
    deliberate O(n²) spec); the engine instead runs the distributed
    sort-order sweep — collapse to (distinct price, max size) with one
    combinable hash aggregate, strict prefix-max over price order via
    the two-phase global_rank discipline (range partition + pinned
    exchange + per-physical-partition window keyed on partition id +
    a ≤num_partitions-row carry), then one join back — O(n log n)
    work, never a pairwise comparison, the shape that survives a
    100 TB candidate table where the quadratic spec cannot."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    pt = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select(
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            (F.col("p_retailprice") + F.lit(0.0)).alias("p_retailprice"),
            F.col("p_size").cast("bigint").alias("p_size"),
        )
    )
    return sel.skyline_2d(pt, "p_retailprice", "p_size")


@query(
    "apriori_triples",
    oracle="""
    WITH it AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    fp AS (SELECT a.p AS p1, b.p AS p2 FROM it a JOIN it b ON a.o = b.o AND a.p < b.p
           GROUP BY 1, 2 HAVING count(*) >= 2),
    tri AS (SELECT a.p AS p1, b.p AS p2, c.p AS p3, count(*) AS n_orders
            FROM it a JOIN it b ON a.o = b.o AND a.p < b.p
                      JOIN it c ON a.o = c.o AND b.p < c.p
            JOIN fp f1 ON f1.p1 = a.p AND f1.p2 = b.p
            JOIN fp f2 ON f2.p1 = b.p AND f2.p2 = c.p
            JOIN fp f3 ON f3.p1 = a.p AND f3.p2 = c.p
            GROUP BY 1, 2, 3)
    SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
           CAST(p3 AS BIGINT) AS p3, n_orders
    FROM tri
    ORDER BY n_orders DESC, p1, p2, p3 LIMIT 20
    """,
)
def apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets with A-PRIORI candidate pruning — the
    market-basket step beyond frequent_part_pairs: a part triple
    qualifies only if EVERY cohabiting pair inside it is itself
    frequent (support ≥ 2 orders) — the downward-closure property that
    makes frequent-itemset mining tractable at scale. The engine
    prunes EARLY: the (p1, p2) leg is gated on the broadcast frequent-
    pair set BEFORE the third self-join fans out (at sf0.01 that cuts
    the candidate stream from ~157k raw triples to the ~3% whose
    first pair is frequent), then the (p1, p3)/(p2, p3) gates run as
    two more broadcast semi-joins before the counting aggregate — the
    oracle applies the same three gates after generation, same final
    set. Top 20 by (support, keys): a total order, so the row set is
    deterministic. At 100 TB the frequent-pair set is the small side
    by construction (HAVING ≥ minsup) and broadcasts; the self-joins
    shuffle on the order key only."""
    it = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"),
            F.col("l_partkey").cast("bigint").alias("p"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = it.select(F.col("o").alias("oa"), F.col("p").alias("p1"))
    b = it.select(F.col("o").alias("ob"), F.col("p").alias("p2"))
    c = it.select(F.col("o").alias("oc"), F.col("p").alias("p3"))
    prs = a.join(
        b, (F.col("oa") == F.col("ob")) & (F.col("p1") < F.col("p2"))
    ).select("oa", "p1", "p2")
    fp = (
        prs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("p1", "p2")
        .localCheckpoint(eager=False)
    )
    # gate 1 BEFORE the fan-out join: only frequent first-pairs expand
    pruned = prs.join(F.broadcast(fp), ["p1", "p2"], "left_semi")
    tri = pruned.join(
        c, (F.col("oa") == F.col("oc")) & (F.col("p2") < F.col("p3"))
    ).select("oa", "p1", "p2", "p3")
    # gates 2+3: the remaining sub-pairs must be frequent too
    tri = tri.join(
        F.broadcast(fp.select(F.col("p1").alias("p2"), F.col("p2").alias("p3"))),
        ["p2", "p3"],
        "left_semi",
    ).join(
        F.broadcast(fp.select("p1", F.col("p2").alias("p3"))),
        ["p1", "p3"],
        "left_semi",
    )
    counted = tri.groupBy("p1", "p2", "p3").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return counted.orderBy(
        F.col("n_orders").desc(), "p1", "p2", "p3"
    ).limit(20)


@query(
    "top_session_paths",
    oracle="""
    WITH o AS (SELECT event_id, user_id, ts, event_type,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
               FROM events),
    m AS (SELECT *, CASE WHEN pts IS NULL OR ts >= pts + INTERVAL '15 minutes'
                         THEN 1 ELSE 0 END AS new_s FROM o),
    s AS (SELECT event_id, user_id, ts, event_type,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM m),
    r AS (SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                                       ORDER BY ts, event_id) AS rn FROM s),
    paths AS (SELECT user_id, session_id,
                     string_agg(event_type, '>' ORDER BY rn) AS path
              FROM r WHERE rn <= 5 GROUP BY user_id, session_id)
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 15
    """,
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream sequence mining: the most common session PATHS —
    each session's first ≤5 event types in time order, joined into one
    'a>b>c' string — ranked by session count (the funnel-discovery
    complement of event_transitions' pairwise matrix: paths show WHOLE
    journeys, transitions show edges). Sessionization is the 15-minute
    gaps-and-islands rule of session_ids, re-derived here so the query
    is self-contained.

    Plan: ONE shuffle on user_id serves the lag pass, the running-sum
    pass, the per-session row_number, AND the per-session path
    aggregate (grouping on (user_id, session_id) is satisfied by the
    existing user_id hash distribution — no second exchange; the
    order-sensitive collect is made deterministic by sorting the
    collected (rn, type) structs, never by collect order). The path
    histogram then shuffles ≤ distinct-path rows, and top-15 by
    (count, path) — a total order — is a TakeOrdered, never a global
    sort. Path length is capped at 5 so the path string is bounded
    state per session at any scale."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") >= F.lag("ts").over(w) + F.expr("INTERVAL 15 MINUTES")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    s = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.sum(new_s).over(run).alias("session_id"),
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    )
    paths = (
        s.withColumn("rn", rn)
        .filter(F.col("rn") <= 5)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda t: t["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(15)
    )


@query(
    "prefix_jaccard_pairs",
    oracle=f"""
    WITH t0 AS (SELECT doc_id, list_distinct({_SQL_TOKS}) AS t
                FROM documents WHERE doc_id < 1000),
    t AS (SELECT doc_id, t FROM t0 WHERE len(t) > 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.t, b.t))), 6) AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
          / len(list_distinct(list_concat(a.t, b.t))) >= 0.95
    """,
)
def prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard similarity join via prefix filtering
    (dedup.prefix_filter_pairs — the AllPairs/PPJoin candidate rule,
    Bayardo et al. 2007): every pair of documents with token-set
    Jaccard ≥ 0.95, found WITHOUT an all-pairs product. Unlike the
    df-capped shingle index (ngram_jaccard_pairs, which can MISS pairs
    whose shared shingles are all frequent) or MinHash banding
    (probabilistic), prefix filtering is provably lossless: a
    qualifying pair's smallest-global-order shared token always lands
    in both documents' rarity-ordered prefixes — so the ORACLE is the
    pure all-pairs SPEC with no algorithm mirrored, the strongest
    oracle shape in the registry. Each document contributes only
    ~|T|·(1−τ)+1 of its RAREST tokens to the posting join, so per-token
    fan-out is small by construction at any corpus size. Corpus capped
    at doc_id < 1000 so the oracle's quadratic spec stays cheap; the
    engine path has no such need (SCALE.md measures it uncapped)."""
    d = parallelize_small(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") < 1000
    )
    out = dd.prefix_filter_pairs(d, threshold=0.95)
    return out.select("id_a", "id_b", "jaccard")


@query(
    "prefix_jaccard_zipf",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 2000),
    t0 AS (SELECT doc_id,
                  ['t' || k for k in range(2, 50) if doc_id % k = 0] AS t
           FROM d),
    t AS (SELECT doc_id, t FROM t0 WHERE len(t) >= 2)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.t, b.t))), 6) AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
          / len(list_distinct(list_concat(a.t, b.t))) >= 0.7
    """,
)
def prefix_jaccard_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prefix_filter_pairs on a ZIPFIAN-vocabulary corpus — the regime
    prefix filtering is built for, driver-verified uncapped through all
    three lossless prunes (prefix + length + positional). The real
    sf* documents corpus has a tiny uniform vocabulary (~24% of all
    pairs qualify — no index can prune that), so prefix_jaccard_pairs
    caps at 1k docs to keep its quadratic spec oracle cheap. Here the
    corpus is synthesized deterministically INSIDE both engines from
    doc_id arithmetic: token ``t{k}`` (k in 2..49) appears in doc i iff
    k divides i, so token k's document frequency is N/k — an exact
    harmonic (Zipf slope −1) profile, integer-only and bit-identical
    across engines. The TRUE pair set at τ=0.7 is small, so the oracle
    stays the pure all-pairs SPEC with no cap and no algorithm
    mirrored (~500 pairs at sf0.01, ~13k at sf0.1)."""
    d = parallelize_small(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    )
    toks = F.filter(
        F.transform(
            F.sequence(F.lit(2), F.lit(49)),
            lambda k: F.when(
                F.col("doc_id") % k == 0, F.concat(F.lit("t"), k)
            ),
        ),
        lambda x: x.isNotNull(),
    )
    corp = (
        d.select("doc_id", toks.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select("doc_id", F.array_join("tk", " ").alias("text"))
    )
    out = dd.prefix_filter_pairs(corp, threshold=0.7)
    return out.select("id_a", "id_b", "jaccard")


def _label_prop_oracle(rounds: int = 2) -> str:
    """Unrolled label-propagation rounds over the bipartite trading
    graph — each round is the same vote→max-count→min-label→left-join
    block the engine runs (graph.label_propagation)."""
    ctes = [
        """WITH pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    l0 AS (SELECT node, node AS label FROM
           (SELECT src AS node FROM edges UNION SELECT dst FROM edges))"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""v{r} AS (SELECT e.dst AS node, l.label, count(*) AS n
           FROM l{p} l JOIN edges e ON e.src = l.node GROUP BY 1, 2),
    t{r} AS (SELECT node, max(n) AS m FROM v{r} GROUP BY node),
    b{r} AS (SELECT v{r}.node, min(v{r}.label) AS new
           FROM v{r} JOIN t{r} ON t{r}.node = v{r}.node AND v{r}.n = t{r}.m
           GROUP BY v{r}.node),
    l{r} AS (SELECT l{p}.node, coalesce(b{r}.new, l{p}.label) AS label
           FROM l{p} LEFT JOIN b{r} ON b{r}.node = l{p}.node)"""
        )
        final = r
    return ",\n    ".join(ctes) + f"\nSELECT node, label FROM l{final}"


@query("label_propagation_communities", oracle=_label_prop_oracle(2))
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    customer↔supplier trading graph (graph.label_propagation, 2
    rounds): every node starts as its own community, then adopts the
    most frequent in-neighbor label, ties toward the smaller label —
    the deterministic variant of an algorithm usually run with random
    tie-breaks, so the oracle unrolls the identical rounds (the
    k-means/pagerank convention). Per round: one O(nodes)⋈edges
    equi-join, one (node, label) hash aggregate, one combinable
    max-count + min-label argmax (never a window), one left join back
    — the connected-components shuffle profile with a FIXED round
    count, labels eagerly pinned per round."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    return gr.label_propagation(edges, rounds=2)


@query(
    "l_diversity_audit",
    oracle="""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               count(*) AS sz,
               count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS l
        FROM customer GROUP BY 1, 2
    )
    SELECT 3 AS l,
           count(*) AS n_groups,
           sum(CASE WHEN l < 3 THEN 1 ELSE 0 END)::BIGINT AS n_homogeneous_groups,
           sum(CASE WHEN l < 3 THEN sz ELSE 0 END)::BIGINT AS n_exposed_rows,
           round(sum(CASE WHEN l < 3 THEN sz ELSE 0 END)::DOUBLE / sum(sz), 6)
             AS exposed_row_frac,
           CAST(min(l) AS BIGINT) AS min_l
    FROM g
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second privacy gate after k_anonymity_audit: k-anonymity
    stops re-identification of a ROW but not attribute disclosure — a
    quasi-identifier group where everyone shares the same sensitive
    value leaks it to anyone who can place a person in the group.
    ℓ-diversity requires ≥ ℓ distinct sensitive values (here the
    coarse account-balance band, floor(acctbal/1000)) per
    (nation, segment) equivalence class; reported: groups below ℓ=3,
    rows exposed by them, and the corpus-wide minimum ℓ. Same plan
    economics as the k gate — one hash aggregate bounded by QI
    cardinality (count DISTINCT inside the group is a per-group
    shuffle-free partial) + a ≤groups fold."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct(band).alias("l"),
    )
    exposed = F.when(F.col("l") < 3, F.col("sz")).otherwise(0)
    return g.agg(
        F.lit(3).alias("l"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0)).alias(
            "n_homogeneous_groups"
        ),
        F.sum(exposed).cast("bigint").alias("n_exposed_rows"),
        F.round(
            F.sum(exposed).cast("double") / F.sum("sz"), 6
        ).alias("exposed_row_frac"),
        F.min("l").cast("bigint").alias("min_l"),
    )


@query(
    "fd_audit",
    oracle="""
    WITH f1 AS (SELECT c_name AS lhs, CAST(c_nationkey AS VARCHAR) AS rhs
                FROM customer),
    f2 AS (SELECT CAST(c_nationkey AS VARCHAR) AS lhs, c_mktsegment AS rhs
           FROM customer),
    f3 AS (SELECT p_type AS lhs, p_brand AS rhs FROM part),
    a AS (SELECT 'c_name->c_nationkey' AS fd, lhs, count(DISTINCT rhs) AS k,
                 count(*) AS sz FROM f1 GROUP BY lhs
          UNION ALL
          SELECT 'c_nationkey->c_mktsegment', lhs, count(DISTINCT rhs), count(*)
          FROM f2 GROUP BY lhs
          UNION ALL
          SELECT 'p_type->p_brand', lhs, count(DISTINCT rhs), count(*)
          FROM f3 GROUP BY lhs)
    SELECT fd,
           count(*) AS n_lhs_groups,
           sum(CASE WHEN k > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating_groups,
           sum(CASE WHEN k > 1 THEN sz ELSE 0 END)::BIGINT AS n_violating_rows,
           CAST(max(k) AS BIGINT) AS max_rhs_distinct,
           CAST(max(k) AS BIGINT) = 1 AS holds
    FROM a GROUP BY fd
    """,
)
def fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — the schema-inference side of data
    profiling: for each candidate FD lhs→rhs, count the lhs groups
    carrying more than one distinct rhs (violations), the rows inside
    them, and whether the dependency HOLDS exactly. Candidates here:
    c_name→c_nationkey (holds — names are unique, so every key FD
    passes), c_nationkey→c_mktsegment and p_type→p_brand (both
    violated — the counter-examples prove the audit distinguishes).
    Per candidate: one hash aggregate on the lhs (count-distinct rhs is
    a per-group partial) + a ≤groups fold — the k_anonymity_audit plan
    economics, unioned across candidates so one scan pass per FD."""
    pt = load_table(spark, sf_dir, "part")
    cu = load_table(spark, sf_dir, "customer")
    parts = [
        cu.select(
            F.lit("c_name->c_nationkey").alias("fd"),
            F.col("c_name").alias("lhs"),
            F.col("c_nationkey").cast("string").alias("rhs"),
        ),
        cu.select(
            F.lit("c_nationkey->c_mktsegment").alias("fd"),
            F.col("c_nationkey").cast("string").alias("lhs"),
            F.col("c_mktsegment").alias("rhs"),
        ),
        pt.select(
            F.lit("p_type->p_brand").alias("fd"),
            F.col("p_type").alias("lhs"),
            F.col("p_brand").alias("rhs"),
        ),
    ]
    a = (
        parts[0]
        .unionAll(parts[1])
        .unionAll(parts[2])
        .groupBy("fd", "lhs")
        .agg(
            F.countDistinct("rhs").alias("k"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    viol = F.when(F.col("k") > 1, 1).otherwise(0)
    return a.groupBy("fd").agg(
        F.count(F.lit(1)).alias("n_lhs_groups"),
        F.sum(viol).cast("bigint").alias("n_violating_groups"),
        F.sum(F.when(F.col("k") > 1, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_violating_rows"),
        F.max("k").cast("bigint").alias("max_rhs_distinct"),
        (F.max("k").cast("bigint") == 1).alias("holds"),
    )


@query(
    "ks_drift_promo",
    oracle="""
    WITH j AS (SELECT l.l_extendedprice AS v,
                      CASE WHEN p.p_type LIKE 'PROMO%' THEN 'promo'
                           ELSE 'other' END AS g
               FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
               WHERE l.l_extendedprice IS NOT NULL),
    pv AS (SELECT v,
                  sum(CASE WHEN g = 'promo' THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN g = 'other' THEN 1 ELSE 0 END) AS cb
           FROM j GROUP BY v),
    c AS (SELECT sum(ca) OVER w AS fa, sum(cb) OVER w AS fb
          FROM pv WINDOW w AS (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    t AS (SELECT CAST(sum(CASE WHEN g = 'promo' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN g = 'other' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM j)
    SELECT t.n_a, t.n_b,
           round(max(abs(c.fa::DOUBLE / t.n_a - c.fb::DOUBLE / t.n_b)), 6)
             AS d_stat
    FROM c, t GROUP BY t.n_a, t.n_b
    """,
)
def ks_drift_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift test
    (selection.ks_statistic): D = sup|ECDF_promo − ECDF_other| over
    lineitem extended prices, promo-typed parts vs the rest — the
    non-bucketed, bin-free counterpart of split_divergence's PSI/KL
    monitors (sensitive to any distributional shift, no edge choices
    to defend). The supremum needs a GLOBAL cumulative count, which
    the oracle writes as the single-partition window it semantically
    is; the engine instead collapses to per-distinct-value counts and
    runs the pinned two-phase prefix-sum (the global_rank/skyline
    discipline) — the reduced frame shuffles once, the carry is
    ≤num_partitions rows, and no stage ever funnels the data through
    one task."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = (
        l.join(F.broadcast(pt), l.l_partkey == pt.p_partkey)
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            F.col("l_extendedprice").alias("v"),
            F.when(F.col("p_type").startswith("PROMO"), "promo")
            .otherwise("other")
            .alias("g"),
        )
    )
    return sel.ks_statistic(j, "v", "g", "promo", "other")


@query(
    "bfs_shortest_path_tree",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    bfs AS (
      SELECT 'c:' || c_custkey AS node, 0 AS dist,
             CAST(NULL AS VARCHAR) AS parent
      FROM customer WHERE c_custkey <= 3
      UNION
      SELECT e.dst AS node, b.dist + 1 AS dist, b.node AS parent
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.dist < 3),
    mn AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY node)
    SELECT mn.node, CAST(mn.dist AS BIGINT) AS dist, min(b.parent) AS parent
    FROM mn JOIN bfs b ON b.node = mn.node AND b.dist = mn.dist
    GROUP BY mn.node, mn.dist
    """,
)
def bfs_shortest_path_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bfs_distances with PATH RECONSTRUCTION (graph.bfs_tree): every
    reached node also carries its tree parent — the smallest frontier
    node that first touched it (deterministic min-label tie-break,
    NULL for sources) — so any node's actual route back to a source
    is walkable ("HOW is this supplier 3 hops from customer 2?"). The
    oracle extends the recursive CTE with an arg-min parent selection
    at each node's minimum distance; a parent recorded at a node's
    first-touch level provably has minimum distance exactly one less
    (any shorter parent would have touched the node earlier), so the
    two formulations agree exactly. Same per-level plan as bfs_layers
    plus one combinable min aggregate on the frontier join."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    srcs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 3)
        .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"))
    )
    return gr.bfs_tree(edges, srcs, max_depth=3)


# --- Markov removal-effect attribution --------------------------------
# Channel states (alphabetical), absorbing CONV (purchase) and NULL
# (session ends unconverted). ONE expression builder feeds BOTH
# engines, so the floating-point evaluation order is identical
# opcode-for-opcode (the mmr_topk unroll convention).
_MKV_CH = ["click", "error", "signup", "view"]
_MKV_SRC = ["START"] + _MKV_CH
_MKV_STEPS = 4


def _mkv_absorb_expr(removed: str | None) -> str:
    """Truncated-absorption expression over the p_{src}_{dst} columns:
    P(reach CONV within _MKV_STEPS transitions from START), with the
    ``removed`` channel's OUTGOING probabilities zeroed (mass entering
    it dies — the classic removal effect, no renormalization)."""
    v = {"START": "1.0"}
    conv = "0.0"
    for step in range(_MKV_STEPS):
        srcs = [
            s
            for s in (_MKV_SRC if step == 0 else _MKV_CH)
            if s != removed and v.get(s, "0.0") != "0.0"
        ]
        conv = (
            "(" + conv + " + "
            + " + ".join(f"({v[s]} * p_{s}_CONV)" for s in srcs)
            + ")"
        )
        v = {
            t: "(" + " + ".join(f"({v[s]} * p_{s}_{t})" for s in srcs) + ")"
            for t in _MKV_CH
        }
    return conv


def _mkv_variant_exprs() -> list[tuple[str, str, str, str]]:
    """(channel, base, removal, effect) expression texts per channel."""
    base = _mkv_absorb_expr(None)
    out = []
    for c in _MKV_CH:
        rm = _mkv_absorb_expr(c)
        eff = (
            f"CASE WHEN ({base}) > 0 "
            f"THEN (({base}) - ({rm})) / ({base}) END"
        )
        out.append((c, base, rm, eff))
    return out


def _mkv_p_sql() -> str:
    cols = []
    for s in _MKV_SRC:
        tot = f"sum(CASE WHEN src = '{s}' THEN 1 ELSE 0 END)"
        for d in _MKV_CH + ["CONV"]:
            n = f"sum(CASE WHEN src = '{s}' AND dst = '{d}' THEN 1 ELSE 0 END)"
            cols.append(
                f"CASE WHEN {tot} > 0 THEN CAST({n} AS DOUBLE) / {tot} "
                f"ELSE 0.0 END AS p_{s}_{d}"
            )
    return ",\n           ".join(cols)


def _markov_oracle() -> str:
    variants = "\n    UNION ALL\n    ".join(
        f"SELECT '{c}' AS channel, round({b}, 6) AS base_p,"
        f" round({r}, 6) AS removal_p, round({e}, 6) AS removal_effect"
        f" FROM pr"
        for c, b, r, e in _mkv_variant_exprs()
    )
    return f"""
    WITH o AS (SELECT event_id, user_id, ts, event_type,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
               FROM events),
    m AS (SELECT *, CASE WHEN pts IS NULL OR ts >= pts + INTERVAL '15 minutes'
                         THEN 1 ELSE 0 END AS new_s FROM o),
    s AS (SELECT event_id, user_id, ts, event_type,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM m),
    r AS (SELECT user_id, session_id, ts, event_id,
                 CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS st,
                 row_number() OVER (PARTITION BY user_id, session_id
                                    ORDER BY ts, event_id) AS rn
          FROM s),
    pz AS (SELECT user_id, session_id,
                  min(CASE WHEN st = 'CONV' THEN rn END) AS prn,
                  max(rn) AS mrn
           FROM r GROUP BY 1, 2),
    k AS (SELECT r.*, pz.prn, pz.mrn FROM r
          JOIN pz ON pz.user_id = r.user_id AND pz.session_id = r.session_id
          WHERE pz.prn IS NULL OR r.rn <= pz.prn),
    t1 AS (SELECT coalesce(lag(st) OVER (PARTITION BY user_id, session_id
                                         ORDER BY rn), 'START') AS src,
                  st AS dst FROM k),
    t2 AS (SELECT st AS src, 'NULL' AS dst FROM k
           WHERE prn IS NULL AND rn = mrn),
    tr AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2),
    pr AS (SELECT {_mkv_p_sql()} FROM tr)
    {variants}
    """


@query("markov_attribution", oracle=_markov_oracle())
def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution — the data-driven alternative
    to last-touch: sessionize (15-minute gaps), map 'purchase' to the
    absorbing CONV state and truncate each journey at its first
    conversion (unconverted sessions absorb into NULL), estimate the
    first-order channel transition matrix, then for every channel
    compare P(convert within 4 transitions from START) with that
    channel's outgoing edges removed — mass that enters a removed
    channel dies, the classic removal effect. The absorption
    polynomial is generated ONCE as expression text and fed verbatim
    to both engines (F.expr here, the same string in the oracle), so
    the float evaluation order is identical opcode-for-opcode — an
    inherently iterative metric with an exact value oracle (the
    mmr_topk convention).

    Scale shape: sessionization + journey truncation ride ONE user_id
    exchange (three window passes over the same sort); the transition
    aggregate collapses the data to a ONE-ROW frame of |states|²
    conditional probabilities, and all 5 absorption variants are pure
    column arithmetic on that single row — whole-stage-codegen'd,
    zero further data motion at any corpus size."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") >= F.lag("ts").over(w) + F.expr("INTERVAL 15 MINUTES")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    s = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type"))
        .alias("st"),
        F.sum(new_s).over(run).alias("session_id"),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    wsz = Window.partitionBy("user_id", "session_id")
    r = s.select(
        "user_id",
        "session_id",
        "st",
        F.row_number().over(ws).alias("rn"),
    ).select(
        "*",
        F.min(F.when(F.col("st") == "CONV", F.col("rn"))).over(wsz).alias("prn"),
        F.max("rn").over(wsz).alias("mrn"),
    )
    k = r.filter(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
    wk = Window.partitionBy("user_id", "session_id").orderBy("rn")
    t1 = k.select(
        F.coalesce(F.lag("st").over(wk), F.lit("START")).alias("src"),
        F.col("st").alias("dst"),
    )
    t2 = k.filter(
        F.col("prn").isNull() & (F.col("rn") == F.col("mrn"))
    ).select(F.col("st").alias("src"), F.lit("NULL").alias("dst"))
    tr = t1.unionAll(t2)
    p_cols = []
    for src in _MKV_SRC:
        tot = F.sum(F.when(F.col("src") == src, 1).otherwise(0))
        for dst in _MKV_CH + ["CONV"]:
            n = F.sum(
                F.when(
                    (F.col("src") == src) & (F.col("dst") == dst), 1
                ).otherwise(0)
            )
            p_cols.append(
                F.when(tot > 0, n.cast("double") / tot)
                .otherwise(F.lit(0.0))
                .alias(f"p_{src}_{dst}")
            )
    # ONE pin: the five absorption variants below each re-reference
    # this 1-row frame, and without the checkpoint every union branch
    # re-runs the whole sessionize→truncate→aggregate pipeline (5× the
    # work and 5× the plan text)
    pr = tr.agg(*p_cols).localCheckpoint(eager=False)
    out = None
    for c, b, rm, eff in _mkv_variant_exprs():
        row = pr.select(
            F.lit(c).alias("channel"),
            F.round(F.expr(b), 6).alias("base_p"),
            F.round(F.expr(rm), 6).alias("removal_p"),
            F.round(F.expr(eff), 6).alias("removal_effect"),
        )
        out = row if out is None else out.unionAll(row)
    return out




def _sssp_oracle(rounds: int = 3) -> str:
    """Unrolled Bellman-Ford rounds over the weighted trading graph —
    each round the same relax-join + min aggregate the engine runs
    (graph.sssp_bounded); all-integer arithmetic, exact comparison."""
    ctes = [
        """WITH pairs AS (
      SELECT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s,
             CAST(min(l_quantity) AS BIGINT) AS w
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    edges AS (SELECT c AS src, s AS dst, w FROM pairs
              UNION ALL SELECT s, c, w FROM pairs),
    d0 AS (SELECT 'c:' || c_custkey AS node, CAST(0 AS BIGINT) AS dist
           FROM customer WHERE c_custkey <= 3)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""d{r} AS (SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{p}
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d{p} d JOIN edges e ON e.src = d.node) GROUP BY node)"""
        )
    return (
        ",\n    ".join(ctes)
        + f"\n    SELECT node, dist FROM d{rounds}"
    )


@query("sssp_bounded_costs", oracle=_sssp_oracle(3))
def sssp_bounded_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop WEIGHTED shortest paths (graph.sssp_bounded —
    Bellman-Ford, 3 relaxation rounds) over the customer↔supplier
    trading graph, edge weight = the pair's minimum order quantity
    (integral doubles cast to BIGINT — truncation and rounding agree
    on integral values, so the cast is engine-identical). The weighted
    sibling of bfs_distances: same per-round join + combinable min
    aggregate with eagerly pinned state, exact integer arithmetic, and
    an oracle that unrolls the identical rounds. Multi-source from the
    c_custkey ≤ 3 customers (the BFS convention)."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .agg(F.min("l_quantity").cast("bigint").alias("w"))
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst"), "w"
    ).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
    )
    srcs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 3)
        .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"))
    )
    return gr.sssp_bounded(edges, srcs, rounds=3)


@query(
    "chi2_drift_source",
    oracle=f"""
    WITH d AS (SELECT doc_id % 2 AS grp, source AS cat FROM documents
               WHERE source IS NOT NULL),
    o AS (SELECT grp, cat, count(*) AS o FROM d GROUP BY 1, 2),
    rt AS (SELECT grp, sum(o) AS nr FROM o GROUP BY 1),
    ct AS (SELECT cat, sum(o) AS nc FROM o GROUP BY 1),
    nn AS (SELECT sum(o) AS nn FROM o),
    grid AS (SELECT rt.grp, ct.cat, rt.nr, ct.nc, coalesce(o.o, 0) AS o
             FROM rt CROSS JOIN ct
             LEFT JOIN o ON o.grp = rt.grp AND o.cat = ct.cat),
    terms AS (SELECT (o - (nr * nc / nn.nn)) * (o - (nr * nc / nn.nn))
                     / (nr * nc / nn.nn) AS t,
                     grp, cat, nn.nn
              FROM grid CROSS JOIN nn)
    SELECT round({_sql_dsum('t')}, 6) AS chi2,
           CAST((count(DISTINCT grp) - 1) * (count(DISTINCT cat) - 1)
                AS BIGINT) AS dof,
           CAST(first(nn) AS BIGINT) AS n
    FROM terms
    """,
)
def chi2_drift_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact χ² homogeneity drift test (selection.chi2_statistic) over
    the documents source distribution between the doc_id-parity splits
    — the CATEGORICAL member of the drift family (PSI/KL = binned
    numeric, KS = exact ordered, χ² = exact categorical). One
    (group, category) aggregate collapses the input; margins and the
    full-grid expected counts run on the reduced frame; the cell-term
    sum is a fixed-point decimal fold, so the statistic is
    bit-identical cross-engine."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    d = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("grp"), F.col("source")
    )
    return sel.chi2_statistic(d, "grp", "source")


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled k-core peeling rounds over the trading graph — each
    round the same degree→filter→restrict block the engine runs
    (graph.kcore_peel)."""
    ctes = [
        """WITH pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    e0 AS (SELECT c AS src, s AS dst FROM pairs
           UNION ALL SELECT s, c FROM pairs)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""s{r} AS (SELECT src FROM e{p} GROUP BY src
           HAVING count(*) >= {k}),
    e{r} AS (SELECT e.src, e.dst FROM e{p} e
           JOIN s{r} a ON a.src = e.src JOIN s{r} b ON b.src = e.dst)"""
        )
    return (
        ",\n    ".join(ctes)
        + f"""
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY src"""
    )


@query("kcore_trading_graph", oracle=_kcore_oracle(4, 3))
def kcore_trading_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling (graph.kcore_peel, k=4, 3 rounds) over
    the customer↔supplier trading graph: iteratively drop nodes with
    degree < 4 and restrict edges to survivors — the standard dense-
    subgraph / spam-cluster screen (a k-core survivor trades with ≥4
    counterparties who EACH trade with ≥4 others). The round count is
    a hyper-parameter, so the oracle unrolls the identical rounds
    (the label_propagation convention). Per round: one combinable
    degree aggregate + two semi-joins, all keyed on the node — and
    the frame only SHRINKS, so unlike frontier algorithms the
    per-round cost is monotonically decreasing at any scale."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    return gr.kcore_peel(edges, k=4, rounds=3)


@query(
    "wasserstein_drift_promo",
    oracle=f"""
    WITH j AS (SELECT l.l_extendedprice AS v,
                      CASE WHEN p.p_type LIKE 'PROMO%' THEN 'promo'
                           ELSE 'other' END AS g
               FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
               WHERE l.l_extendedprice IS NOT NULL),
    pv AS (SELECT v,
                  sum(CASE WHEN g = 'promo' THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN g = 'other' THEN 1 ELSE 0 END) AS cb
           FROM j GROUP BY v),
    c AS (SELECT sum(ca) OVER w AS fa, sum(cb) OVER w AS fb,
                 lead(v) OVER (ORDER BY v) - v AS gap
          FROM pv WINDOW w AS (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    t AS (SELECT CAST(sum(CASE WHEN g = 'promo' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN g = 'other' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM j),
    terms AS (SELECT abs(c.fa::DOUBLE / t.n_a - c.fb::DOUBLE / t.n_b)
                     * c.gap AS trm, t.n_a, t.n_b
              FROM c, t)
    SELECT n_a, n_b, round({_sql_dsum('trm')}, 6) AS w1
    FROM terms GROUP BY n_a, n_b
    """,
)
def wasserstein_drift_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein drift distance (selection.wasserstein_1)
    between promo-part and other-part extended prices — the AREA
    between the two ECDFs where ks_drift_promo takes their supremum.
    KS answers "did the distribution shift?"; W1 answers "by how many
    DOLLARS did mass move?" — the drift magnitude in the value's own
    units, robust to saturation when distributions barely overlap.
    Same reduced-frame two-phase prefix-sum as KS (per-distinct-value
    counts, pinned range exchange, ≤num_partitions-row carry — which
    here also ships each partition's min value leftward so the
    ECDF-step widths cross partition boundaries without a second
    exchange); the term sum is fixed-point, so the statistic is
    bit-identical cross-engine."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = (
        l.join(F.broadcast(pt), l.l_partkey == pt.p_partkey)
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            F.col("l_extendedprice").alias("v"),
            F.when(F.col("p_type").startswith("PROMO"), "promo")
            .otherwise("other")
            .alias("g"),
        )
    )
    return sel.wasserstein_1(j, "v", "g", "promo", "other")


@query(
    "cusum_changepoint_revenue",
    oracle=f"""
    WITH d AS (SELECT o_orderdate AS t, {_sql_dsum('o_totalprice')} AS x
               FROM orders
               WHERE o_orderdate IS NOT NULL GROUP BY 1),
    c AS (SELECT t,
                 sum(CAST(x AS DECIMAL(38,6))) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx,
                 row_number() OVER (ORDER BY t) AS rn
          FROM d),
    tot AS (SELECT {_sql_dsum('x')} AS tt, count(*) AS n FROM d),
    s AS (SELECT c.t,
                 CAST(c.cx AS DOUBLE)
                 - CAST(c.rn AS DOUBLE) * (tot.tt / tot.n) AS s
          FROM c, tot),
    m AS (SELECT max(abs(s)) AS m FROM s)
    SELECT CAST(s.t AS VARCHAR) AS day, round(s.s, 6) + 0.0 AS cusum,
           abs(s.s) = m.m AS is_peak
    FROM s, m
    """,
)
def cusum_changepoint_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint scan (selection.cusum_series, Page
    1954) over the daily order-revenue series: S_t = Σ_{i≤t} x_i −
    t·μ peaks exactly where the series' level shifts, so the flagged
    row is the single-changepoint estimate — the LEVEL-SHIFT member
    of the drift family (PSI/KL/χ²/KS/W1 compare two snapshots; CUSUM
    localizes WHEN the shift happened inside one series). Emits the
    full series with the peak flagged, so every cumulative value is
    driver-audited, not just the argmax. The daily frame is
    calendar-reduced, but the cumulative sum still runs the pinned
    two-phase prefix-sum — nothing funnels through one task at finer
    grains; fixed-point accumulation keeps S_t bit-identical
    cross-engine."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderdate", "o_totalprice")
    )
    daily = o.groupBy(F.col("o_orderdate").alias("t")).agg(
        ops.dsum(F.col("o_totalprice")).alias("x")
    )
    out = sel.cusum_series(daily, "t", "x")
    return out.select(
        F.col("t").cast("string").alias("day"), "cusum", "is_peak"
    )


_IND_CANDIDATES = [
    # (label, child table, child col, parent table, parent col)
    ("orders.o_custkey in customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_partkey in part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey in supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.c_nationkey in nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("part.p_size in nation.n_nationkey", "part", "p_size", "nation", "n_nationkey"),
    ("events.user_id in customer.c_custkey", "events", "user_id", "customer", "c_custkey"),
]


def _ind_oracle() -> str:
    blocks = []
    for label, ct, cc, pt, pc in _IND_CANDIDATES:
        blocks.append(
            f"""SELECT '{label}' AS candidate,
           CAST(count(*) AS BIGINT) AS n_lhs_distinct,
           CAST(sum(CASE WHEN r.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unmatched,
           sum(CASE WHEN r.v IS NULL THEN 1 ELSE 0 END) = 0 AS holds
    FROM (SELECT DISTINCT {cc} AS v FROM {ct} WHERE {cc} IS NOT NULL) l
    LEFT JOIN (SELECT DISTINCT {pc} AS v FROM {pt}
               WHERE {pc} IS NOT NULL) r ON r.v = l.v"""
        )
    return "\n    UNION ALL\n    ".join(blocks)


@query("ind_audit", oracle=_ind_oracle())
def ind_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency discovery (quality.inclusion_audit): test
    six candidate foreign keys across the star schema — the four real
    FK edges (orders→customer, lineitem→part, lineitem→supplier,
    customer→nation), one decoy with overlapping domains
    (part.p_size vs nation keys — 1..50 vs 0..24, so it VIOLATES with
    a measurable unmatched count), and the cross-dataset probe
    events.user_id vs customer keys. The BETWEEN-tables sibling of
    fd_audit's within-table profiling: both distill to "does a
    combinable distinct + one value-keyed join say the constraint
    holds?", the shape that survives any scale because the fact table
    collapses to distinct values before any join."""
    from covid_custom_sql_engine_spark.operators import quality as ql

    cands = [
        (label, load_table(spark, sf_dir, ct), cc, load_table(spark, sf_dir, pt), pc)
        for label, ct, cc, pt, pc in _IND_CANDIDATES
    ]
    return ql.inclusion_audit(cands)


# Exact Shapley attribution: channels and bit assignments shared by the
# engine and the generated oracle. weight(|S|) = |S|!·(n−1−|S|)! — the
# integer numerator of the Shapley kernel; Σ_S weight = n! = 24.
_SHAP_CH = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
_SHAP_WGT = {0: 6, 1: 2, 2: 2, 3: 6}  # s!·(3−s)! for n = 4


def _shap_rows() -> list[tuple[str, int, int, int]]:
    rows = []
    for ch, bit in _SHAP_CH:
        for s in range(16):
            if s & bit == 0:
                rows.append((ch, s, s | bit, _SHAP_WGT[bin(s).count("1")]))
    return rows


def _shapley_oracle() -> str:
    wvals = ", ".join(f"('{c}', {s}, {si}, {w})" for c, s, si, w in _shap_rows())
    coal = ", ".join(f"({s})" for s in range(16))
    maskexpr = " + ".join(
        f"max(CASE WHEN ch = '{c}' THEN {b} ELSE 0 END)" for c, b in _SHAP_CH
    )
    chans = ", ".join(f"'{c}'" for c, _ in _SHAP_CH)
    return f"""
    WITH fp AS (SELECT user_id, min(ts) AS fpt FROM events
                WHERE event_type = 'purchase' GROUP BY 1),
    tc AS (SELECT DISTINCT e.user_id, e.event_type AS ch
           FROM events e JOIN fp ON fp.user_id = e.user_id
           WHERE e.ts < fp.fpt AND e.event_type IN ({chans})),
    um AS (SELECT user_id, {maskexpr} AS mask FROM tc GROUP BY user_id),
    cnt AS (SELECT mask, count(*) AS c FROM um GROUP BY mask),
    coal AS (SELECT * FROM (VALUES {coal}) t(s)),
    v AS (SELECT coal.s, coalesce(sum(cnt.c), 0) AS v
          FROM coal LEFT JOIN cnt ON (cnt.mask & coal.s) = cnt.mask
          GROUP BY coal.s),
    w AS (SELECT * FROM (VALUES {wvals}) t(channel, s, si, wgt))
    SELECT w.channel, round(sum(w.wgt * (vi.v - vs.v)) / 24.0, 6) AS shapley
    FROM w JOIN v vs ON vs.s = w.s JOIN v vi ON vi.s = w.si
    GROUP BY w.channel
    """


@query("shapley_attribution", oracle=_shapley_oracle())
def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution over pre-conversion
    touchpoints — the axiomatic counterpart of markov_attribution's
    removal effects: each channel's credit is its average marginal
    contribution across all 2^(n−1) coalitions of the other channels,
    the unique allocation satisfying efficiency/symmetry/dummy. Per
    converted user (first 'purchase'), the touch SET is the distinct
    channels seen strictly before that purchase; coalition value
    v(S) = conversions whose touch set ⊆ S. With n = 4 channels the
    kernel is fully enumerable: 16 coalition masks, 32 (channel,
    S∌channel) terms with INTEGER weights |S|!(3−|S|)! (Σ = 4! = 24),
    so φ = Σ w·(v(S∪i)−v(S))/24 is exact rational arithmetic —
    bit-identical cross-engine, the markov exact-value convention.
    Scale shape: the only full-width work is the first-purchase
    aggregate and one user-keyed join + distinct; everything after
    runs on a ≤15-row mask-count frame joined against 16-row literal
    coalition tables (broadcast crosses of literals — never data)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    chans = [c for c, _ in _SHAP_CH]
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fpt"))
    )
    tc = (
        ev.join(fp, "user_id")
        .filter((F.col("ts") < F.col("fpt")) & F.col("event_type").isin(chans))
        .select("user_id", F.col("event_type").alias("ch"))
        .distinct()
    )
    mask = None
    for c, b in _SHAP_CH:
        term = F.max(F.when(F.col("ch") == c, b).otherwise(0))
        mask = term if mask is None else mask + term
    um = tc.groupBy("user_id").agg(mask.alias("mask"))
    cnt = um.groupBy("mask").agg(F.count(F.lit(1)).alias("c"))
    spark_sess = ev.sparkSession
    coal = spark_sess.range(16).select(F.col("id").cast("int").alias("s"))
    v = (
        coal.join(
            F.broadcast(cnt),
            F.expr("mask & s") == F.col("mask"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("v"))
    )
    v = v.localCheckpoint(eager=False)  # both coalition branches read one eval
    w = parallelize_small(
        spark_sess.createDataFrame(
            _shap_rows(), "channel string, s int, si int, wgt int"
        )
    )
    vs = v.select(F.col("s").alias("s"), F.col("v").alias("v_s"))
    vi = v.select(F.col("s").alias("si"), F.col("v").alias("v_si"))
    return (
        w.join(F.broadcast(vs), "s")
        .join(F.broadcast(vi), "si")
        .groupBy("channel")
        .agg(
            F.round(
                F.sum(F.col("wgt") * (F.col("v_si") - F.col("v_s"))) / 24.0, 6
            ).alias("shapley")
        )
    )


@query(
    "t_closeness_audit",
    oracle=f"""
    WITH d AS (SELECT c_nationkey AS g1, c_mktsegment AS g2,
                      CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
               FROM customer),
    o AS (SELECT g1, g2, band, count(*) AS c FROM d GROUP BY 1, 2, 3),
    gt AS (SELECT g1, g2, sum(c) AS ng FROM o GROUP BY 1, 2),
    bt AS (SELECT band, sum(c) AS nb FROM o GROUP BY 1),
    nn AS (SELECT sum(c) AS n FROM o),
    grid AS (SELECT gt.g1, gt.g2, gt.ng, bt.band, bt.nb,
                    coalesce(o.c, 0) AS c
             FROM gt CROSS JOIN bt
             LEFT JOIN o ON o.g1 = gt.g1 AND o.g2 = gt.g2
                        AND o.band = bt.band),
    tg AS (SELECT g1, g2,
                  0.5 * {_sql_dsum('abs(CAST(c AS DOUBLE) / ng'
                                   ' - CAST(nb AS DOUBLE) / nn.n)')} AS t
           FROM grid CROSS JOIN nn GROUP BY g1, g2)
    SELECT CAST(0.2 AS DOUBLE) AS threshold,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN t > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           round(max(t), 6) AS max_t
    FROM tg
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third privacy gate, completing the triad: k-anonymity
    bounds group SIZE, l-diversity bounds sensitive-value VARIETY,
    t-closeness bounds sensitive-value DISTRIBUTION — a group whose
    account-balance bands skew far from the table-wide distribution
    leaks attribute information even when large and diverse. Per
    quasi-identifier group (nation × market segment), t = total-
    variation distance ½·Σ_band |p_group − p_global| (the categorical
    Earth-Mover's distance the t-closeness paper defaults to — the
    same ECDF-area idea as wasserstein_drift_promo, specialized to
    categories). One (group, band) aggregate collapses the table;
    margins and the zero-filled grid run on the reduced frame (the
    chi2 discipline); per-group sums are fixed-point so max_t is
    bit-identical cross-engine. Flags groups with t > 0.2."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("g1"),
        F.col("c_mktsegment").alias("g2"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("band"),
    )
    o = c.groupBy("g1", "g2", "band").agg(F.count(F.lit(1)).alias("c"))
    o = o.localCheckpoint(eager=False)  # grid + three margins read it
    gt = o.groupBy("g1", "g2").agg(F.sum("c").alias("ng"))
    bt = o.groupBy("band").agg(F.sum("c").alias("nb"))
    nn = o.agg(F.sum("c").alias("n"))
    grid = (
        gt.crossJoin(F.broadcast(bt))
        .join(o, ["g1", "g2", "band"], "left")
        .select(
            "g1",
            "g2",
            "ng",
            "nb",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .crossJoin(F.broadcast(nn))
    )
    term = F.abs(
        F.col("c").cast("double") / F.col("ng")
        - F.col("nb").cast("double") / F.col("n")
    )
    tg = grid.groupBy("g1", "g2").agg((0.5 * ops.dsum(term)).alias("t"))
    return tg.agg(
        F.lit(0.2).alias("threshold"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("t") > 0.2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.round(F.max("t"), 6).alias("max_t"),
    )


# A/B experimentation readout: the Wilson/z formulas are generated ONCE
# as SQL text and fed verbatim to both engines (F.expr + the oracle) —
# identical opcode order, so sqrt (correctly rounded per IEEE-754) and
# arithmetic give bit-identical doubles with no decimal folds needed.
_AB_P = "(CAST(x AS DOUBLE) / n)"
_AB_Z2 = "(1.96 * 1.96)"
_AB_MARG = (
    f"(1.96 * sqrt({_AB_P} * (1.0 - {_AB_P}) / n"
    f" + {_AB_Z2} / (4.0 * n * n)))"
)


def _ab_wilson(sign: str) -> str:
    return (
        f"(({_AB_P} + {_AB_Z2} / (2.0 * n) {sign} {_AB_MARG})"
        f" / (1.0 + {_AB_Z2} / n))"
    )


# outcome: a HIGH-VALUE purchase (value >= 100) — plain "any purchase"
# saturates at 100% on the synthetic log, which degenerates the pooled
# z denominator (p(1-p) = 0)
_AB_ARMS = """(SELECT user_id,
                      CAST(user_id % 2 AS BIGINT) AS arm,
                      max(CASE WHEN event_type = 'purchase'
                               AND value >= 100.0
                               THEN 1 ELSE 0 END) AS conv
               FROM events GROUP BY user_id)"""


@query(
    "ab_wilson_bounds",
    oracle=f"""
    WITH u AS {_AB_ARMS},
    a AS (SELECT arm, count(*) AS n, sum(conv) AS x FROM u GROUP BY arm)
    SELECT arm, CAST(n AS BIGINT) AS n_users, CAST(x AS BIGINT) AS n_converted,
           round({_AB_P}, 6) AS cvr,
           round({_ab_wilson('-')}, 6) AS wilson_low,
           round({_ab_wilson('+')}, 6) AS wilson_high
    FROM a
    """,
)
def ab_wilson_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into two arms by id parity
    (the split_divergence convention), outcome = converted (any
    'purchase' event); per arm the conversion rate with its Wilson
    95% score interval — the binomial CI that stays inside [0,1] and
    behaves at small n where the normal approximation fails, i.e.
    what an experimentation dashboard should actually print. Scale
    shape: ONE per-user max aggregate collapses the event log, then a
    two-row arm aggregate; the interval is pure per-row arithmetic on
    (n, x) — sqrt is correctly rounded per IEEE-754, and the formula
    text is shared verbatim with the oracle, so the bounds are
    bit-identical cross-engine."""
    u = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "value")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 100.0),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("arm"), "conv")
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    return a.select(
        "arm",
        F.col("n").cast("bigint").alias("n_users"),
        F.col("x").cast("bigint").alias("n_converted"),
        F.round(F.expr(_AB_P), 6).alias("cvr"),
        F.round(F.expr(_ab_wilson("-")), 6).alias("wilson_low"),
        F.round(F.expr(_ab_wilson("+")), 6).alias("wilson_high"),
    )


_AB_ZEXPR = (
    "((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)"
    " / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
    " * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
    " * (1.0 / n1 + 1.0 / n2)))"
)


@query(
    "ab_ztest_conversion",
    oracle=f"""
    WITH u AS {_AB_ARMS},
    a AS (SELECT arm, count(*) AS n, sum(conv) AS x FROM u GROUP BY arm),
    p AS (SELECT CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS x1,
                 CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n2,
                 CAST(sum(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS x2
          FROM a)
    SELECT n1, x1, n2, x2,
           round({_AB_ZEXPR}, 6) AS z_stat,
           abs({_AB_ZEXPR}) > 1.96 AS significant
    FROM p
    """,
)
def ab_ztest_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision companion to ab_wilson_bounds: the pooled
    two-proportion z-test between the arms' conversion rates, with
    the 5%-level verdict — the "is the difference real?" gate an
    experiment readout ends with. Same collapsed per-user frame; the
    two-arm aggregate pivots to one row and the statistic is shared-
    text arithmetic (IEEE sqrt), bit-identical cross-engine. On the
    id-parity split of synthetic data the verdict should be NOT
    significant — a seeded A/A test, which is itself the standard
    sanity check that the pipeline doesn't manufacture lift."""
    u = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "value")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 100.0),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("arm"), "conv")
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    p = a.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("x"))).cast("bigint").alias("x1"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("arm") == 1, F.col("x"))).cast("bigint").alias("x2"),
    )
    return p.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.round(F.expr(_AB_ZEXPR), 6).alias("z_stat"),
        (F.abs(F.expr(_AB_ZEXPR)) > 1.96).alias("significant"),
    )


@query(
    "theil_sen_trend",
    oracle=f"""
    WITH d AS (SELECT o_orderdate AS t, {_sql_dsum('o_totalprice')} AS y
               FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
    m AS (SELECT min(t) AS t0 FROM d),
    dx AS (SELECT datediff('day', m.t0, d.t) AS x, d.y FROM d, m),
    s AS (SELECT (b.y - a.y) / (b.x - a.x) AS sl
          FROM dx a JOIN dx b ON a.x < b.x),
    o AS (SELECT count(*) AS n,
                 sum(x) AS sx, sum(CAST(x AS BIGINT) * x) AS sxx,
                 {_sql_dsum('y')} AS sy, {_sql_dsum('x * y')} AS sxy
          FROM dx),
    ms AS (SELECT median(sl) AS med FROM s)
    SELECT round(ms.med, 6) AS slope_theil_sen,
           round((o.n * o.sxy - o.sx * o.sy)
                 / (o.n * CAST(o.sxx AS DOUBLE) - CAST(o.sx AS DOUBLE) * o.sx),
                 6) AS slope_ols,
           CAST(o.n AS BIGINT) AS n_days
    FROM o, ms
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily order revenue — the MEDIAN of
    all pairwise slopes (y_j−y_i)/(x_j−x_i), the estimator with a 29%
    breakdown point where OLS has 0% (one corrupted day can move OLS
    arbitrarily; Theil–Sen shrugs off outliers) — reported next to
    the OLS slope so the gap itself is the outlier diagnostic. Scale
    shape: the fact table collapses to the calendar-bounded daily
    frame FIRST, so the quadratic pair generation is over days, not
    rows — bounded at any data scale (the deliberate reduced-frame
    broadcast cross, the range_join_bands convention); the slope
    median runs the two-phase distributed selection
    (selection.exact_median — never a global sort), and the OLS side
    is exact fixed-point/integer sums. Per-pair slope arithmetic is
    IEEE-deterministic; median picks/averages two exact order
    statistics, matching the oracle's median() semantics."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderdate", "o_totalprice")
    )
    d = o.groupBy(F.col("o_orderdate").alias("t")).agg(
        ops.dsum(F.col("o_totalprice")).alias("y")
    )
    t0 = d.agg(F.min("t").alias("t0"))
    dx = d.crossJoin(F.broadcast(t0)).select(
        F.datediff("t", "t0").alias("x"), "y"
    )
    dx = dx.localCheckpoint(eager=False)  # pairs (x4 median passes) + OLS
    a = dx.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = dx.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    # try_divide, not /: Catalyst merges downstream isNotNull(sl)
    # filters into the join condition, where ANSI division would
    # evaluate on the xa == xb rows the join itself excludes
    slopes = a.join(b, F.col("xa") < F.col("xb")).select(
        F.try_divide(
            F.col("yb") - F.col("ya"),
            (F.col("xb") - F.col("xa")).cast("double"),
        ).alias("sl")
    )
    med = sel.exact_median(slopes, "sl")
    ols = dx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("bigint") * F.col("x")).alias("sxx"),
        ops.dsum(F.col("y")).alias("sy"),
        ops.dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return ols.select(
        F.round(F.lit(float(med)), 6).alias("slope_theil_sen"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            ),
            6,
        ).alias("slope_ols"),
        F.col("n").cast("bigint").alias("n_days"),
    )


# Round 10, third wave — survival analysis, link prediction, partition
# quality, multiple-testing control, periodicity, and feature relevance
# ---------------------------------------------------------------------------


@query(
    "kaplan_meier_fulfillment",
    oracle=f"""
    WITH per_o AS (
      SELECT datediff('day', o.o_orderdate, max(l.l_shipdate)) AS t,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
      HAVING datediff('day', o.o_orderdate, max(l.l_shipdate)) >= 0),
    g AS (SELECT t, sum(ev) AS d, count(*) AS a FROM per_o GROUP BY t),
    tot AS (SELECT sum(a) AS n FROM g),
    c AS (SELECT t, d, a,
                 tot.n - (sum(a) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - a)
                 AS nrisk
          FROM g, tot),
    s AS (SELECT t, d, a, nrisk,
                 sum(CAST(ln(greatest(
                         1.0 - CAST(d AS DOUBLE) / CAST(nrisk AS DOUBLE),
                         1e-300)) AS DECIMAL(38,6)))
                   OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS ls
          FROM c)
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(nrisk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           CAST(a - d AS BIGINT) AS c_censored,
           round(exp(CAST(ls AS DOUBLE)), 6) AS survival
    FROM s
    """,
)
def kaplan_meier_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve (selection.kaplan_meier) of order
    fulfillment time: per order, duration = days from o_orderdate to
    its LAST lineitem shipment; status 'F' (fulfilled) is the event,
    'O'/'P' orders are right-censored at their last observed shipment
    — the censoring-aware "how long until an order completes" curve
    where a naive average of completed orders is biased optimistic
    (slow orders are exactly the still-open ones). Scale shape: one
    fact⋈fact join collapses to a per-order frame, then to one row
    per distinct duration (calendar-bounded); both cumulative passes
    (at-risk counts, log-survival) run the pinned two-phase
    prefix-sum — no single-partition window. Determinism: exact
    integer d/n, fixed-point log-sum, round(exp, 6) on both sides."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", "o_orderdate", "o_orderstatus")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").isNotNull())
        .select("l_orderkey", "l_shipdate")
    )
    per_o = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(F.max("l_shipdate").alias("_last"))
        .select(
            F.datediff("_last", "o_orderdate").alias("t"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
        )
    )
    return sel.kaplan_meier(per_o, "t", "ev")


@query(
    "adamic_adar_links",
    oracle=f"""
    WITH seeds AS (SELECT c_custkey FROM customer
                   ORDER BY c_acctbal DESC, c_custkey LIMIT 20),
    e AS (SELECT DISTINCT o_custkey AS u, l_suppkey AS w
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL),
    deg AS (SELECT w, count(*) AS dw FROM e GROUP BY 1),
    se AS (SELECT s.c_custkey AS seed, e.w
           FROM e JOIN seeds s ON e.u = s.c_custkey),
    sc AS (SELECT se.seed, e.u AS cand,
                  {_sql_dsum('1.0 / ln(CAST(deg.dw AS DOUBLE))')} AS score
           FROM se JOIN deg ON deg.w = se.w AND deg.dw >= 2
                   JOIN e ON e.w = se.w
           WHERE e.u <> se.seed
           GROUP BY 1, 2),
    r AS (SELECT seed, cand, score,
                 row_number() OVER (PARTITION BY seed
                                    ORDER BY score DESC, cand) AS rank
          FROM sc)
    SELECT CAST(seed AS BIGINT) AS seed,
           CAST(cand AS BIGINT) AS candidate,
           round(score, 6) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 5
    """,
)
def adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Adamic–Adar link prediction (graph.adamic_adar) on the
    customer→supplier bipartite trading graph: for the 20 largest
    accounts (by acctbal, deterministic id tie-break), rank the other
    customers sharing suppliers by Σ 1/ln(deg(supplier)) — common
    counterparties, hubs logarithmically down-weighted; top-5 each.
    The "find accounts that trade like these" screen. Scale posture:
    seeding IS the design — all-pairs AA explodes through hub
    neighbors (Σ deg²), so the API fans out only through the seeds'
    neighborhoods, linear in touched edges; the seed frame itself is
    a 20-row broadcast from a TakeOrdered top-k, never a global sort.
    Fixed-point score fold makes ties exact → (score DESC, candidate
    ASC) ranking is total and cross-engine deterministic."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey")
    )
    aa = gr.adamic_adar(edges, seeds, k=5)
    return aa.select(
        F.col("seed").cast("bigint").alias("seed"),
        F.col("candidate").cast("bigint").alias("candidate"),
        "score",
        "rank",
    )


@query(
    "modularity_nations",
    oracle=f"""
    WITH sp AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
                FROM lineitem
                WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
    ed AS (SELECT DISTINCT a.sk AS s, b.sk AS d
           FROM sp a JOIN sp b ON a.pk = b.pk AND a.sk < b.sk),
    j AS (SELECT ca.s_nationkey AS ca, cb.s_nationkey AS cb
          FROM ed JOIN supplier ca ON ca.s_suppkey = ed.s
                  JOIN supplier cb ON cb.s_suppkey = ed.d),
    m AS (SELECT count(*) AS m FROM j),
    w AS (SELECT ca AS cc, count(*) AS ec FROM j WHERE ca = cb GROUP BY 1),
    dg AS (SELECT cc, count(*) AS dc
           FROM (SELECT ca AS cc FROM j UNION ALL SELECT cb FROM j)
           GROUP BY 1),
    t AS (SELECT dg.cc, coalesce(w.ec, 0) AS ec, dg.dc, m.m
          FROM dg LEFT JOIN w USING (cc), m),
    terms AS (SELECT CAST(ec AS DOUBLE) / CAST(m AS DOUBLE)
                     - (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
                     * (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
                     AS trm, m
              FROM t)
    SELECT round({_sql_dsum('trm')}, 6) AS modularity,
           CAST(first(m) AS BIGINT) AS m_edges,
           CAST(count(*) AS BIGINT) AS n_communities
    FROM terms
    """,
)
def modularity_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity (graph.modularity) of the partition-by-nation
    of the supplier co-sourcing graph (suppliers adjacent iff they
    supply a common part, deduplicated undirected edges): Q = Σ_c
    [e_c/m − (deg_c/2m)²] — the "is this clustering better than
    chance?" score, here grading a schema attribute as a community
    structure (near 0 = nations don't cluster sourcing, the expected
    null on synthetic data; the same function grades
    label_propagation output on one comparable scale). Scale shape:
    edge generation fans through parts with bounded per-part supplier
    count (TPC-H: ~4) — never all-pairs over suppliers; the community
    map is a dim projection joined on both endpoints; m/e_c/deg_c are
    combinable aggregates and Q folds fixed-point over ≤25 rows."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    sp = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull())
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    a = sp.select(F.col("pk"), F.col("sk").alias("s"))
    b = sp.select(F.col("pk"), F.col("sk").alias("d"))
    edges = (
        a.join(b, "pk")
        .filter(F.col("s") < F.col("d"))
        .select("s", "d")
        .distinct()
    )
    cm = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node"),
        F.col("s_nationkey").alias("community"),
    )
    return gr.modularity(
        edges, F.broadcast(cm), src_col="s", dst_col="d"
    )


def _sql_pnorm2(z: str) -> str:
    """Two-sided normal p-value 2·(1−Φ(|z|)) via the Abramowitz–Stegun
    26.2.17 polynomial tail approximation (|error| < 7.5e-8) — pure
    +,·,exp arithmetic, so the TEXT is shared verbatim between the
    Spark expression and the DuckDB oracle and evaluates bit-identically
    (the engine convention for statistics with no closed-form SQL)."""
    az = f"abs({z})"
    t = f"(1.0 / (1.0 + 0.2316419 * {az}))"
    pdf = f"(0.3989422804014327 * exp(-({az} * {az}) / 2.0))"
    poly = (
        f"((((((1.330274429 * {t}) - 1.821255978) * {t} + 1.781477937)"
        f" * {t} - 0.356563782) * {t} + 0.319381530) * {t})"
    )
    return f"(2.0 * {pdf} * {poly})"


# z is pre-rounded to 6dp (cross-engine identical), so the p-value
# arithmetic runs on identical inputs on both engines.
_BH_P = _sql_pnorm2("z6")


@query(
    "bh_fdr_segments",
    oracle=f"""
    WITH j AS (SELECT c.c_mktsegment AS seg,
                      CAST(o.o_orderkey % 2 AS BIGINT) AS arm,
                      CASE WHEN o.o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END AS conv
               FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    a AS (SELECT seg,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x1,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                 CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x2
          FROM j GROUP BY seg),
    zt AS (SELECT seg, round({_AB_ZEXPR}, 6) AS z6 FROM a),
    pt AS (SELECT seg, z6, round({_BH_P}, 8) AS p FROM zt),
    rk AS (SELECT seg, z6, p,
                  row_number() OVER (ORDER BY p, seg) AS rnk,
                  count(*) OVER () AS m
           FROM pt),
    km AS (SELECT max(CASE WHEN p <= 0.05 * rnk / m THEN rnk ELSE 0 END)
                  AS kmax
           FROM rk)
    SELECT seg AS segment, z6 AS z_stat, p AS p_value,
           CAST(rnk AS BIGINT) AS p_rank,
           rnk <= km.kmax AS rejected
    FROM rk, km
    """,
)
def bh_fdr_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over a FAMILY of hypothesis
    tests — the missing closure of the experimentation stack
    (ab_ztest decides ONE test; a per-segment readout runs five, and
    at α=.05 per test the family-wise false-positive rate is ~23%):
    per market segment, the pooled two-proportion z-test of urgent-
    order rate between the id-parity arms, p-values via the shared-
    text Abramowitz–Stegun normal tail, then the BH step-up — sort
    p ascending, find the largest k with p_(k) ≤ k·α/m, reject ranks
    ≤ k. On an A/A split every segment should survive (no rejections)
    — the standard "does the pipeline manufacture lift under multiple
    looks?" audit. Scale shape: ONE fact⋈dim join + per-segment
    conditional aggregate collapses everything; the BH windows run
    over the m=5 segment rows (schema-bounded, like nation).
    Determinism: z from exact integer counts rounded 6dp, p is pure
    shared-text arithmetic on that rounded z, ranking ties broken by
    segment name."""
    j = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .join(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_orderkey") % 2).cast("bigint").alias("arm"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("conv"),
        )
    )
    a = j.groupBy("seg").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x2"),
    )
    pt = a.select(
        "seg", F.round(F.expr(_AB_ZEXPR), 6).alias("z6")
    ).select("seg", "z6", F.round(F.expr(_BH_P), 8).alias("p"))
    # BH step-up over the m-row segment frame (m schema-bounded at 5)
    rk = pt.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.asc("p"), F.asc("seg")))
        .alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .alias("m"),
    )
    rk = rk.localCheckpoint(eager=False)  # rows + kmax read one eval
    km = rk.agg(
        F.max(
            F.when(
                F.col("p") <= 0.05 * F.col("rnk") / F.col("m"), F.col("rnk")
            ).otherwise(0)
        ).alias("kmax")
    )
    return rk.crossJoin(F.broadcast(km)).select(
        F.col("seg").alias("segment"),
        F.col("z6").alias("z_stat"),
        F.col("p").alias("p_value"),
        F.col("rnk").cast("bigint").alias("p_rank"),
        (F.col("rnk") <= F.col("kmax")).alias("rejected"),
    )


@query(
    "dominant_period_dft",
    oracle=f"""
    WITH d AS (SELECT o_orderdate AS t, count(*) AS y FROM orders
               WHERE o_orderdate IS NOT NULL GROUP BY 1),
    m0 AS (SELECT min(t) AS t0 FROM d),
    dx AS (SELECT CAST(datediff('day', m0.t0, d.t) AS DOUBLE) AS x, d.y
           FROM d, m0),
    st AS (SELECT CAST(sum(y) AS DOUBLE) / count(*) AS ybar FROM dx),
    pr AS (SELECT CAST(p AS DOUBLE) AS p FROM generate_series(2, 30) t(p)),
    terms AS (SELECT pr.p,
                     (dx.y - st.ybar) * cos(2.0 * pi() * dx.x / pr.p) AS tc,
                     (dx.y - st.ybar) * sin(2.0 * pi() * dx.x / pr.p) AS ts
              FROM dx CROSS JOIN pr CROSS JOIN st),
    pw AS (SELECT p, {_sql_dsum('tc')} * {_sql_dsum('tc')}
                     + {_sql_dsum('ts')} * {_sql_dsum('ts')} AS power
           FROM terms GROUP BY p),
    r AS (SELECT p, power,
                 row_number() OVER (ORDER BY power DESC, p) AS rank
          FROM pw)
    SELECT CAST(p AS BIGINT) AS period_days,
           round(power, 4) AS power,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def dominant_period_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodicity detection: a Fourier periodogram scan of the daily
    order-count series over candidate periods 2..30 days — power(p) =
    (Σ ŷ·cos 2πx/p)² + (Σ ŷ·sin 2πx/p)² on the mean-centered series,
    top-3 periods reported (the seasonality screen behind
    seasonal_baseline: it DETECTS the cycle length that query assumes;
    flat synthetic data should show no dominant spike, which is itself
    the honest null). Scale shape: the fact table collapses to the
    calendar-bounded daily frame FIRST; the 29-row period spine
    broadcast-crosses the reduced frame (the range_join_bands
    convention), and each period's power is two fixed-point folds —
    map-side combinable, no shuffle wider than the daily frame.
    Determinism: mean/centering from exact integer sums; per-term
    cos/sin are IEEE doubles pre-rounded by the fixed-point fold; the
    top-3 ranking breaks ties by period."""
    d = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.col("o_orderdate").alias("t"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    t0 = d.agg(F.min("t").alias("t0"))
    dx = d.crossJoin(F.broadcast(t0)).select(
        F.datediff("t", "t0").cast("double").alias("x"), "y"
    )
    dx = dx.localCheckpoint(eager=False)  # stats + terms read one eval
    st = dx.agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("ybar")
    )
    pr = spark.range(2, 31).select(F.col("id").cast("double").alias("p"))
    ang = 2.0 * F.lit(math.pi) * F.col("x") / F.col("p")
    terms = (
        dx.crossJoin(F.broadcast(pr))
        .crossJoin(F.broadcast(st))
        .select(
            "p",
            ((F.col("y") - F.col("ybar")) * F.cos(ang)).alias("tc"),
            ((F.col("y") - F.col("ybar")) * F.sin(ang)).alias("ts"),
        )
    )
    pw = terms.groupBy("p").agg(
        (
            ops.dsum(F.col("tc")) * ops.dsum(F.col("tc"))
            + ops.dsum(F.col("ts")) * ops.dsum(F.col("ts"))
        ).alias("power")
    )
    r = pw.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("power"), F.asc("p")))
        .alias("rank"),
    ).filter(F.col("rank") <= 3)
    return r.select(
        F.col("p").cast("bigint").alias("period_days"),
        F.round("power", 4).alias("power"),
        F.col("rank").cast("bigint").alias("rank"),
    )


@query(
    "mutual_info_docs",
    oracle=f"""
    WITH o AS (SELECT lang AS x, source AS y, count(*) AS n
               FROM documents
               WHERE lang IS NOT NULL AND source IS NOT NULL
               GROUP BY 1, 2),
    rx AS (SELECT x, sum(n) AS nx FROM o GROUP BY 1),
    ry AS (SELECT y, sum(n) AS ny FROM o GROUP BY 1),
    nn AS (SELECT sum(n) AS nn FROM o),
    mi AS (SELECT {_sql_dsum('''(CAST(o.n AS DOUBLE) / nn.nn)
                     * ln(CAST(o.n AS DOUBLE) * nn.nn
                          / (CAST(rx.nx AS DOUBLE) * ry.ny))''')} AS mi
           FROM o JOIN rx USING (x) JOIN ry USING (y), nn),
    hx AS (SELECT {_sql_dsum('''-(CAST(nx AS DOUBLE) / nn.nn)
                     * ln(CAST(nx AS DOUBLE) / nn.nn)''')} AS hx
           FROM rx, nn),
    hy AS (SELECT {_sql_dsum('''-(CAST(ny AS DOUBLE) / nn.nn)
                     * ln(CAST(ny AS DOUBLE) / nn.nn)''')} AS hy
           FROM ry, nn)
    SELECT round(mi.mi, 6) AS mi_nats,
           round(hx.hx, 6) AS h_lang,
           round(hy.hy, 6) AS h_source,
           CASE WHEN hx.hx * hy.hy > 0
                THEN round(mi.mi / sqrt(hx.hx * hy.hy), 6) END AS nmi
    FROM mi, hx, hy
    """,
)
def mutual_info_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) over the documents table —
    Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) in nats, with the marginal
    entropies and the normalized MI (I/√(H_x·H_y)) — the feature-
    relevance / redundancy screen between two categorical columns
    that chi2_drift tests for DEPENDENCE but doesn't QUANTIFY in
    information units (near 0 = knowing the source tells you nothing
    about language; near 1 = duplicated columns — both are curation
    signals for stratification design). Scale shape: ONE (x,y) hash
    aggregate collapses the corpus; margins and all three information
    folds run on the ≤|langs|×|sources| reduced grid with the total
    broadcast back — the chi2_statistic discipline. Per-cell terms
    are IEEE ln/division on exact integer counts; folds are
    fixed-point — cross-engine bit-identical before the final round."""
    o = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull() & F.col("source").isNotNull())
        .groupBy(F.col("lang").alias("x"), F.col("source").alias("y"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    o = o.localCheckpoint(eager=False)  # margins + joint read one eval
    rx = o.groupBy("x").agg(F.sum("n").alias("nx"))
    ry = o.groupBy("y").agg(F.sum("n").alias("ny"))
    nn = o.agg(F.sum("n").alias("nn"))
    joint = (
        o.join(rx, "x")
        .join(F.broadcast(ry), "y")
        .crossJoin(F.broadcast(nn))
    )
    mi_term = (F.col("n").cast("double") / F.col("nn")) * F.log(
        F.col("n").cast("double")
        * F.col("nn")
        / (F.col("nx").cast("double") * F.col("ny"))
    )
    mi = joint.agg(ops.dsum(mi_term).alias("mi"))
    hx_term = -(F.col("nx").cast("double") / F.col("nn")) * F.log(
        F.col("nx").cast("double") / F.col("nn")
    )
    hx = rx.crossJoin(F.broadcast(nn)).agg(ops.dsum(hx_term).alias("hx"))
    hy_term = -(F.col("ny").cast("double") / F.col("nn")) * F.log(
        F.col("ny").cast("double") / F.col("nn")
    )
    hy = ry.crossJoin(F.broadcast(nn)).agg(ops.dsum(hy_term).alias("hy"))
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.round("mi", 6).alias("mi_nats"),
            F.round("hx", 6).alias("h_lang"),
            F.round("hy", 6).alias("h_source"),
            F.when(
                F.col("hx") * F.col("hy") > 0,
                F.round(F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6),
            ).alias("nmi"),
        )
    )


# shared log-rank term text: d = d1+d2, n = r1+r2 at each event time
_LR_D = "CAST(d1 + d2 AS DOUBLE)"
_LR_N = "CAST(r1 + r2 AS DOUBLE)"
_LR_R1 = "CAST(r1 AS DOUBLE)"
_LR_R2 = "CAST(r2 AS DOUBLE)"
_LR_OME = f"(CAST(d1 AS DOUBLE) - {_LR_D} * {_LR_R1} / {_LR_N})"
_LR_VAR = (
    f"(CASE WHEN r1 + r2 > 1 THEN {_LR_D} * ({_LR_R1} / {_LR_N})"
    f" * ({_LR_R2} / {_LR_N}) * ({_LR_N} - {_LR_D}) / ({_LR_N} - 1.0)"
    f" ELSE 0.0 END)"
)
_LR_CHI2 = "(CASE WHEN v > 0 THEN round(o * o / v, 6) END)"


@query(
    "logrank_priority",
    oracle=f"""
    WITH per_o AS (
      SELECT datediff('day', o.o_orderdate, max(l.l_shipdate)) AS t,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS ga
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus,
               o.o_orderpriority
      HAVING datediff('day', o.o_orderdate, max(l.l_shipdate)) >= 0),
    g AS (SELECT t, sum(ev * ga) AS d1, sum(ev * (1 - ga)) AS d2,
                 sum(ga) AS a1, sum(1 - ga) AS a2
          FROM per_o GROUP BY t),
    tot AS (SELECT sum(a1) AS n1t, sum(a2) AS n2t FROM g),
    c AS (SELECT d1, d2,
                 tot.n1t - (sum(a1) OVER w - a1) AS r1,
                 tot.n2t - (sum(a2) OVER w - a2) AS r2
          FROM g, tot WINDOW w AS (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    s AS (SELECT {_sql_dsum(_LR_OME)} AS o, {_sql_dsum(_LR_VAR)} AS v
          FROM c)
    SELECT CAST(tot.n1t AS BIGINT) AS n_a,
           CAST(tot.n2t AS BIGINT) AS n_b,
           {_LR_CHI2} AS chi2_logrank,
           {_LR_CHI2} > 3.841459 AS significant
    FROM s, tot
    """,
)
def logrank_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test (selection.logrank_test) between the
    fulfillment survival curves of high-priority ('1-URGENT'/'2-HIGH')
    and other orders — the hypothesis-test companion of
    kaplan_meier_fulfillment: do rush orders actually complete faster,
    counting censored (still-open) orders correctly, where a t-test on
    completed durations drops exactly the slow open ones? On synthetic
    data with priority assigned independently of dates the verdict
    should be NOT significant — the A/A-test discipline of
    ab_ztest_conversion applied to durations. Scale shape: the same
    per-order collapse as the KM curve, both groups' at-risk counts on
    ONE pinned two-phase prefix-sum pass, fixed-point folds of the
    observed-minus-expected and variance terms over the
    calendar-bounded frame."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").isNotNull())
        .select("l_orderkey", "l_shipdate")
    )
    per_o = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority")
        .agg(F.max("l_shipdate").alias("_last"))
        .select(
            F.datediff("_last", "o_orderdate").alias("t"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hi"
            )
            .otherwise("lo")
            .alias("grp"),
        )
    )
    return sel.logrank_test(per_o, "t", "ev", "grp", "hi", "lo")


def _ppr_oracle(iterations: int = 3) -> str:
    """Statically-unrolled personalized-PageRank oracle matching
    functions/graph.personalized_pagerank: identical IEEE expression
    tree ((1.0 - 0.85) evaluated in DOUBLE on both engines), identical
    DECIMAL(38,18) contribution folding, seed-restart teleport."""
    base = """
    WITH pairs AS (
        SELECT DISTINCT 'c:' || o.o_custkey AS c, 's:' || l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
    ew AS (SELECT e.src, e.dst, 1.0::DOUBLE / d.out_deg AS w
           FROM edges e JOIN deg d USING (src)),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    seeds AS (SELECT 'c:' || c_custkey AS node FROM customer
              ORDER BY c_acctbal DESC, c_custkey LIMIT 5),
    ns AS (SELECT count(*) AS _ns FROM seeds),
    sd AS (SELECT nodes.node,
                  CASE WHEN seeds.node IS NOT NULL
                       THEN 1.0::DOUBLE / ns._ns ELSE 0.0 END AS s
           FROM nodes LEFT JOIN seeds USING (node), ns),
    r0 AS (SELECT node, s AS pr FROM sd)"""
    for i in range(1, iterations + 1):
        base += f""",
    r{i} AS (
        SELECT sd.node,
               (1.0::DOUBLE - 0.85::DOUBLE) * sd.s
               + 0.85::DOUBLE * coalesce(ag{i}.c, 0.0) AS pr
        FROM sd LEFT JOIN (
            SELECT ew.dst AS node,
                   CAST(sum(CAST(r{i-1}.pr * ew.w AS DECIMAL(38,18)))
                        AS DOUBLE) AS c
            FROM r{i-1} JOIN ew ON r{i-1}.node = ew.src
            GROUP BY ew.dst) ag{i} USING (node)
    )"""
    # round(10): same double→DECIMAL(38,18) half-way-rounding rationale
    # as the global-PageRank oracle.
    return base + f"\n    SELECT node, round(pr, 10) AS pr FROM r{iterations}"


@query("ppr_trusted_sources", oracle=_ppr_oracle(3))
def ppr_trusted_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (graph.personalized_pagerank, 3 unrolled
    rounds, d = 0.85) over the customer↔supplier trading graph with
    the teleport restarting at the 5 largest accounts — random walks
    with restart rank every node by proximity to the TRUSTED set
    (TrustRank), where global pagerank_bipartite ranks by popularity
    alone; the "expand this whitelist of curated sources" primitive
    of corpus curation. Same per-round shape as PageRank (ONE rank⋈
    edge join + ONE combinable DECIMAL(38,18) fold + the damping
    projection against the broadcast seed distribution); seeds are a
    5-row TakeOrdered broadcast. The oracle replays the identical
    unrolled iterations (the pagerank/label_propagation convention)."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    seeds = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(5)
        .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"))
    )
    pr = gr.personalized_pagerank(edges, seeds, iterations=3)
    return pr.select("node", F.round("rank", 10).alias("pr"))


@query(
    "conformal_interval",
    oracle=f"""
    WITH f AS (SELECT o.o_orderkey AS k, CAST(count(*) AS DOUBLE) AS x,
                      o.o_totalprice AS y
               FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
               WHERE o.o_totalprice IS NOT NULL
               GROUP BY o.o_orderkey, o.o_totalprice),
    tr AS (SELECT * FROM f WHERE k % 2 = 0),
    st AS (SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
                  {_sql_dsum('y')} AS sy, {_sql_dsum('x * y')} AS sxy
           FROM tr),
    co AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
                  n, sx, sy
           FROM st),
    co2 AS (SELECT slope, (sy - slope * sx) / n AS icept, n FROM co),
    cal AS (SELECT abs(f.y - (co2.slope * f.x + co2.icept)) AS r
            FROM f, co2 WHERE k % 2 = 1),
    q AS (SELECT round(quantile_cont(r, 0.9), 6) AS q90 FROM cal),
    cv AS (SELECT count(*) AS nc,
                  sum(CASE WHEN cal.r <= q.q90 THEN 1 ELSE 0 END) AS inq
           FROM cal, q)
    SELECT round(co2.slope, 6) AS slope,
           round(co2.icept, 6) AS intercept,
           q.q90 AS q90_resid,
           CAST(co2.n AS BIGINT) AS n_train,
           CAST(cv.nc AS BIGINT) AS n_cal,
           round(CAST(cv.inq AS DOUBLE) / cv.nc, 6) AS cal_coverage
    FROM co2, q, cv
    """,
)
def conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval around a closed-form OLS
    fit: predict order value from its lineitem count, train on the
    even-orderkey half, then calibrate the 90% interval half-width as
    the empirical 90th percentile of |residual| on the held-out odd
    half — the distribution-free calibration step every "model score
    + guarantee" serving pipeline runs after training, with the
    reported cal_coverage (≈0.9 by construction) as its self-check.
    Scale shape: ONE fact⋈fact collapse to the per-order frame (the
    kaplan_meier join), exact-sum OLS (no iteration), the 1-row
    coefficient frame broadcast onto the calibration half, one exact
    percentile and one coverage aggregate. Determinism: x-sums are
    exact integers, y-folds fixed-point, slope/intercept shared
    left-to-right expression order (the theil_sen convention), and
    the coverage comparison uses the ROUNDED quantile on both engines
    so the boundary row can't flip."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select("o_orderkey", "o_totalprice")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    f = (
        o.join(l, o.o_orderkey == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .select(
            F.col("o_orderkey").alias("k"),
            "x",
            F.col("o_totalprice").alias("y"),
        )
    )
    f = f.localCheckpoint(eager=False)  # train + calibration read one eval
    tr = f.filter(F.col("k") % 2 == 0)
    st = tr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        ops.dsum(F.col("y")).alias("sy"),
        ops.dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    co = st.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope"),
        "n",
        "sx",
        "sy",
    )
    co2 = co.select(
        "slope",
        ((F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n")).alias(
            "icept"
        ),
        "n",
    )
    cal = (
        f.filter(F.col("k") % 2 == 1)
        .crossJoin(F.broadcast(co2))
        .select(
            F.abs(
                F.col("y") - (F.col("slope") * F.col("x") + F.col("icept"))
            ).alias("r")
        )
    )
    cal = cal.localCheckpoint(eager=False)  # quantile + coverage read one eval
    q = cal.agg(F.round(F.percentile("r", F.lit(0.9)), 6).alias("q90"))
    cv = cal.crossJoin(F.broadcast(q)).agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum(F.when(F.col("r") <= F.col("q90"), 1).otherwise(0)).alias(
            "inq"
        ),
    )
    return (
        co2.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(cv))
        .select(
            F.round("slope", 6).alias("slope"),
            F.round("icept", 6).alias("intercept"),
            F.col("q90").alias("q90_resid"),
            F.col("n").cast("bigint").alias("n_train"),
            F.col("nc").cast("bigint").alias("n_cal"),
            F.round(F.col("inq").cast("double") / F.col("nc"), 6).alias(
                "cal_coverage"
            ),
        )
    )


def _sql_binent(a: str, b: str) -> str:
    """Binary entropy −p·ln p − q·ln q over two exact counts, with the
    0·ln 0 = 0 convention — shared-text arithmetic (both engines see
    identical expression trees, the _sql_pnorm2 convention)."""
    t = f"CAST({a} + {b} AS DOUBLE)"
    pa = f"(CAST({a} AS DOUBLE) / {t})"
    pb = f"(CAST({b} AS DOUBLE) / {t})"
    return (
        f"(CASE WHEN {a} + {b} = 0 THEN 0.0 ELSE "
        f"(CASE WHEN {a} = 0 THEN 0.0 ELSE -{pa} * ln({pa}) END)"
        f" + (CASE WHEN {b} = 0 THEN 0.0 ELSE -{pb} * ln({pb}) END) END)"
    )


_IG_EXPR = (
    f"({_sql_binent('tp', 'tn')}"
    f" - (CAST(lp + ln_ AS DOUBLE) / CAST(tp + tn AS DOUBLE))"
    f" * {_sql_binent('lp', 'ln_')}"
    f" - (CAST(rp + rn AS DOUBLE) / CAST(tp + tn AS DOUBLE))"
    f" * {_sql_binent('rp', 'rn')})"
)


@query(
    "info_gain_split",
    oracle=f"""
    WITH base AS (SELECT l_discount AS d,
                         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                  FROM lineitem
                  WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL),
    g AS (SELECT d, sum(y) AS pos, count(*) - sum(y) AS neg
          FROM base GROUP BY d),
    tot AS (SELECT sum(pos) AS tp, sum(neg) AS tn FROM g),
    sp AS (SELECT c.d AS c,
                  sum(CASE WHEN g.d <= c.d THEN pos ELSE 0 END) AS lp,
                  sum(CASE WHEN g.d <= c.d THEN neg ELSE 0 END) AS ln_
           FROM (SELECT DISTINCT d FROM g) c CROSS JOIN g
           GROUP BY c.d),
    w AS (SELECT sp.c, sp.lp, sp.ln_,
                 tot.tp - sp.lp AS rp, tot.tn - sp.ln_ AS rn,
                 tot.tp, tot.tn
          FROM sp, tot),
    ig AS (SELECT c, lp, ln_, round({_IG_EXPR}, 9) AS gain FROM w),
    r AS (SELECT c, lp, ln_, gain,
                 row_number() OVER (ORDER BY gain DESC, c) AS rank
          FROM ig)
    SELECT round(c, 2) AS split_at,
           CAST(lp AS BIGINT) AS pos_left,
           CAST(ln_ AS BIGINT) AS neg_left,
           gain AS info_gain,
           CAST(rank AS BIGINT) AS rank
    FROM r
    """,
)
def info_gain_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search by information gain: for every
    candidate threshold c over l_discount, the gain
    H(parent) − Σ weight·H(child) of splitting the binary label
    (returned vs not) at discount ≤ c — the single-feature screen
    behind tree induction AND the feature-audit companion of
    mutual_info_docs for a NUMERIC feature (near-zero best gain =
    the feature doesn't separate the label; the honest null on
    synthetic data). Every candidate row is emitted with its gain and
    rank, so the argmax is auditable, not asserted. Scale shape: ONE
    (value, label) hash aggregate collapses the fact table to the
    ≤|distinct discounts| grid; the candidate×grid cross runs on that
    reduced frame (the theta-join-on-reduced-frame convention);
    entropies are shared-text arithmetic on exact integer counts —
    bit-identical cross-engine, ranking tie-broken by threshold."""
    base = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_discount").isNotNull() & F.col("l_returnflag").isNotNull()
        )
        .select(
            F.col("l_discount").alias("d"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
    )
    g = base.groupBy("d").agg(
        F.sum("y").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
    )
    g = g.localCheckpoint(eager=False)  # totals + candidates + grid
    tot = g.agg(F.sum("pos").alias("tp"), F.sum("neg").alias("tn"))
    cand = g.select(F.col("d").alias("c")).distinct()
    sp = (
        cand.crossJoin(g)
        .groupBy("c")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("c"), F.col("pos")).otherwise(0))
            .alias("lp"),
            F.sum(F.when(F.col("d") <= F.col("c"), F.col("neg")).otherwise(0))
            .alias("ln_"),
        )
    )
    w = sp.crossJoin(F.broadcast(tot)).select(
        "c",
        "lp",
        "ln_",
        (F.col("tp") - F.col("lp")).alias("rp"),
        (F.col("tn") - F.col("ln_")).alias("rn"),
        "tp",
        "tn",
    )
    ig = w.select(
        "c", "lp", "ln_", F.round(F.expr(_IG_EXPR), 9).alias("gain")
    )
    r = ig.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("gain"), F.asc("c")))
        .alias("rank"),
    )
    return r.select(
        F.round("c", 2).alias("split_at"),
        F.col("lp").cast("bigint").alias("pos_left"),
        F.col("ln_").cast("bigint").alias("neg_left"),
        F.col("gain").alias("info_gain"),
        F.col("rank").cast("bigint").alias("rank"),
    )
