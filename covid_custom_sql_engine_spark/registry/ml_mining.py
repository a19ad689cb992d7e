"""Closed-form ML and pattern-mining queries (round-10 continuation,
split from stats_ml.py in round 11).

kNN voting, naive Bayes language ID, Rocchio pseudo-relevance
feedback, one exact ALS half-step, a 2-round unrolled EM mixture,
association rules, RAKE keywords, readability grading, and ABC
classification. Same conventions as every family module (see _base).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid_custom_sql_engine_spark.catalog import load_table
from covid_custom_sql_engine_spark.operators import core as ops
from covid_custom_sql_engine_spark.registry._base import (
    _sql_dsum,
    _sql_dsum12,
    query,
)


@query(
    "knn_label_vote",
    oracle="""
    WITH te AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS true_label
                FROM embeddings WHERE vec_id % 10 = 0),
    tr AS (SELECT vec_id, embedding::DOUBLE[] AS cv, label FROM embeddings
           WHERE vec_id % 10 != 0),
    scored AS (SELECT te.query_id, te.true_label, tr.vec_id, tr.label,
                      list_dot_product(qv, cv)
                        / (sqrt(list_dot_product(qv, qv))
                           * sqrt(list_dot_product(cv, cv))) AS cos
               FROM te CROSS JOIN tr),
    nn AS (SELECT query_id, true_label, label
           FROM scored
           QUALIFY row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, vec_id) <= 5),
    votes AS (SELECT query_id, true_label, label AS pred_label,
                     count(*) AS n_votes
              FROM nn GROUP BY 1, 2, 3),
    pick AS (SELECT query_id, true_label, pred_label, n_votes
             FROM votes
             QUALIFY row_number() OVER (PARTITION BY query_id
                                        ORDER BY n_votes DESC, pred_label) = 1)
    SELECT CAST(query_id AS BIGINT) AS vec_id,
           CAST(true_label AS BIGINT) AS true_label,
           CAST(pred_label AS BIGINT) AS pred_label,
           CAST(n_votes AS BIGINT) AS n_votes,
           true_label = pred_label AS correct
    FROM pick
    """,
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification (k = 5, exact cosine, majority vote with
    smallest-label tie-break) of the held-out tenth of the embeddings
    table against the rest — the supervised consumer of the retrieval
    stack: sim.brute_force_topk supplies the neighbors (broadcast query
    side, ONE corpus scan for all queries, two-phase per-query top-k —
    never a corpus sort), and the vote is a tiny per-query aggregate +
    argmax window over ≤k rows per query.  At 100 TB the brute-force
    stage swaps for the IVF/IVFPQ ladder unchanged (ann_recall measures
    exactly that substitution's cost).  Vote counts are integers;
    cosine ties break on neighbor id (the cosine_topk convention)."""
    from covid_custom_sql_engine_spark.catalog import parallelize_small
    from covid_custom_sql_engine_spark.functions import similarity as sim
    from pyspark.sql import Window

    e = parallelize_small(load_table(spark, sf_dir, "embeddings"))
    te = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        "embedding",
        F.col("label").alias("true_label"),
    )
    tr = e.filter(F.col("vec_id") % 10 != 0)
    nn = sim.brute_force_topk(tr, te.select("query_id", "embedding"), k=5)
    votes = (
        nn.join(
            tr.select(F.col("vec_id"), F.col("label").alias("pred_label")),
            "vec_id",
        )
        .join(F.broadcast(te.select("query_id", "true_label")), "query_id")
        .groupBy("query_id", "true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("pred_label")
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("query_id").cast("bigint").alias("vec_id"),
            F.col("true_label").cast("bigint").alias("true_label"),
            F.col("pred_label").cast("bigint").alias("pred_label"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
            (F.col("true_label") == F.col("pred_label")).alias("correct"),
        )
    )


_NB_SQL_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '')"
)


@query(
    "naive_bayes_lang",
    oracle=f"""
    WITH docs AS (SELECT doc_id, lang, {_NB_SQL_TOKS} AS toks FROM documents),
    tr AS (SELECT * FROM docs WHERE doc_id % 5 != 0),
    te AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
    trt AS (SELECT lang, unnest(toks) AS w FROM tr),
    cwl AS (SELECT lang, w, count(*) AS cnt FROM trt GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot FROM cwl GROUP BY 1),
    voc AS (SELECT count(DISTINCT w) AS v FROM cwl),
    pri AS (SELECT lang, round(ln(CAST(count(*) AS DOUBLE)
                                  / (SELECT count(*) FROM tr)), 6) AS prior
            FROM tr GROUP BY 1),
    tet AS (SELECT doc_id, w, count(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS w FROM te) GROUP BY 1, 2),
    term AS (SELECT tet.doc_id, tot.lang,
                    tet.c * ln((coalesce(cwl.cnt, 0) + 1.0)
                               / CAST(tot.tot + voc.v AS DOUBLE)) AS tv
             FROM tet
             CROSS JOIN tot
             CROSS JOIN voc
             LEFT JOIN cwl ON cwl.w = tet.w AND cwl.lang = tot.lang),
    ds AS (SELECT doc_id, lang, {_sql_dsum('tv')} AS s
           FROM term GROUP BY 1, 2),
    sc AS (SELECT te.doc_id, te.lang AS true_lang, pri.lang AS cand,
                  pri.prior + coalesce(ds.s, 0.0) AS score
           FROM te
           CROSS JOIN pri
           LEFT JOIN ds ON ds.doc_id = te.doc_id AND ds.lang = pri.lang),
    pick AS (SELECT doc_id, true_lang, cand AS pred_lang
             FROM sc
             QUALIFY row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, cand) = 1)
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM pick GROUP BY 1, 2
    """,
)
def naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language identification trained ON THE
    CORPUS ITSELF (doc_id % 5 ≠ 0 trains, the held-out fifth is
    classified) with add-one smoothing — the learned companion of the
    fixed-stopword-list `lang_id` heuristic, and "ML training as two
    hash aggregates": the model IS the (lang, token) count table plus
    per-lang totals and a vocabulary size.  Scoring joins each test
    document's per-token counts against the 4-language model — tokens
    collapse per (doc, token) BEFORE the join so hot stopwords carry
    one row per doc, the language axis is a tiny broadcast cross, and
    unseen tokens fall through the LEFT join to the smoothed floor
    ln(1/(tot+V)).  Per-term log arithmetic folds fixed-point (dsum);
    priors round(6); argmax breaks score ties on language code.
    Output is the confusion matrix (true_lang, pred_lang, n_docs)."""
    from covid_custom_sql_engine_spark.catalog import parallelize_small
    from covid_custom_sql_engine_spark.functions import text as tx
    from pyspark.sql import Window

    docs = parallelize_small(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", tx.tokens("text").alias("toks")
    )
    tr = docs.filter(F.col("doc_id") % 5 != 0)
    te = docs.filter(F.col("doc_id") % 5 == 0)
    trt = tr.select("lang", F.explode("toks").alias("w"))
    cwl = trt.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("cnt"))
    cwl = cwl.localCheckpoint(eager=False)  # totals + vocab + score join
    tot = cwl.groupBy("lang").agg(F.sum("cnt").cast("bigint").alias("tot"))
    voc = cwl.agg(F.countDistinct("w").alias("v"))
    n_tr = tr.count()
    pri = tr.groupBy("lang").agg(
        F.round(
            F.log(F.count(F.lit(1)).cast("double") / F.lit(n_tr)), 6
        ).alias("prior")
    )
    tet = (
        te.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    term = (
        tet.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(voc))
        .join(
            cwl.select(
                F.col("lang").alias("_cl"),
                F.col("w").alias("_cw"),
                F.col("cnt"),
            ),
            (F.col("_cw") == F.col("w")) & (F.col("_cl") == F.col("lang")),
            "left",
        )
        .select(
            "doc_id",
            "lang",
            (
                F.col("c")
                * F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                    / (F.col("tot") + F.col("v")).cast("double")
                )
            ).alias("tv"),
        )
    )
    ds = term.groupBy("doc_id", "lang").agg(ops.dsum(F.col("tv")).alias("s"))
    sc = (
        te.select("doc_id", F.col("lang").alias("true_lang"))
        .crossJoin(F.broadcast(pri.select(F.col("lang").alias("cand"), "prior")))
        .join(
            ds.select(
                F.col("doc_id").alias("_sd"),
                F.col("lang").alias("_sl"),
                F.col("s"),
            ),
            (F.col("_sd") == F.col("doc_id")) & (F.col("_sl") == F.col("cand")),
            "left",
        )
        .select(
            "doc_id",
            "true_lang",
            "cand",
            (F.col("prior") + F.coalesce(F.col("s"), F.lit(0.0))).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand")
    )
    pick = (
        sc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("true_lang", F.col("cand").alias("pred_lang"))
    )
    return pick.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


def _bm25_scored_sql(qcte: str, pfx: str, k: int) -> str:
    """The bm25_search oracle's scoring chain, parameterized on the
    query-terms CTE so the PRF oracle runs it twice (seed + expanded)
    without drift. Requires sibling CTEs tk/stats/toks."""
    return f"""
    {pfx}tf AS (SELECT q.query_id, t.doc_id, t.term, count(*) AS tf,
                       min(t.dl) AS dl
                FROM toks t JOIN {qcte} q USING (term) GROUP BY 1, 2, 3),
    {pfx}df AS (SELECT term, count(DISTINCT doc_id) AS df
                FROM {pfx}tf GROUP BY term),
    {pfx}sc AS (
        SELECT tf.query_id, tf.doc_id,
               sum(CAST(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                        * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
                        AS DECIMAL(38,18))) AS s
        FROM {pfx}tf tf JOIN {pfx}df USING (term) CROSS JOIN stats
        GROUP BY 1, 2
    ),
    {pfx}rk AS (
        SELECT query_id, doc_id, round(s::DOUBLE, 6) + 0.0 AS score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id) AS rk
        FROM {pfx}sc
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY s DESC, doc_id) <= {k}
    )"""


@query(
    "rocchio_prf",
    oracle=(
        lambda QV: f"""
    WITH q(query_id, term) AS (VALUES {QV}),
    tk AS (SELECT doc_id, {_NB_SQL_TOKS} AS tks FROM documents),
    stats AS (SELECT count(*) AS n_docs, avg(len(tks)::DOUBLE) AS avgdl FROM tk),
    toks AS (SELECT doc_id, len(tks) AS dl, unnest(tks) AS term FROM tk),
    {_bm25_scored_sql('q', 'r1', 3)},
    cand AS (SELECT r.query_id, t.term, count(*) AS occ
             FROM r1rk r JOIN toks t USING (doc_id)
             WHERE NOT EXISTS (SELECT 1 FROM q
                               WHERE q.query_id = r.query_id
                                 AND q.term = t.term)
             GROUP BY 1, 2),
    cdf AS (SELECT c.term, count(DISTINCT t.doc_id) AS df
            FROM (SELECT DISTINCT term FROM cand) c
            JOIN toks t USING (term) GROUP BY 1),
    exp AS (SELECT query_id, term
            FROM (SELECT cand.query_id, cand.term,
                         cand.occ * ln(1 + (n_docs - cdf.df + 0.5)
                                       / (cdf.df + 0.5)) AS es
                  FROM cand JOIN cdf USING (term) CROSS JOIN stats)
            QUALIFY row_number() OVER (PARTITION BY query_id
                                       ORDER BY es DESC, term) <= 2),
    q2 AS (SELECT query_id, term FROM q
           UNION ALL SELECT query_id, term FROM exp),
    {_bm25_scored_sql('q2', 'r2', 5)},
    es AS (SELECT query_id,
                  string_agg(term, ',' ORDER BY term) AS expansion_terms
           FROM exp GROUP BY 1)
    SELECT r.query_id, r.doc_id, r.score, CAST(r.rk AS BIGINT) AS rk,
           coalesce(es.expansion_terms, '') AS expansion_terms
    FROM r2rk r LEFT JOIN es USING (query_id)
    """
    )(", ".join("('{}', '{}')".format(q, t) for q, t in (
        ("q1", "fast"), ("q1", "hash"),
        ("q2", "table"), ("q2", "scan"),
        ("q3", "merge"), ("q3", "sort"),
        ("q4", "window"), ("q4", "agg"),
    ))),
)
def rocchio_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio-style query expansion): run
    BM25, take each query's top-3 documents as assumed-relevant
    feedback, pick the 2 highest idf-weighted non-query terms from
    them, re-run BM25 with the expanded query — the classic recall
    lever a lexical retrieval stack adds right after plain BM25 (and
    the lexical sibling of embedding-side query refinement).  Both
    retrieval rounds are functions/text.bm25_topk (broadcast query
    terms, postings pruned at the map stage, DECIMAL(38,18) score
    folds); the expansion stage is one join of the ≤3·|queries|
    feedback rows against the postings + a per-query top-2 window, and
    the term-selection idf reuses BM25's own Lucene form so no second
    convention appears.  Output: expanded top-5 per query with the
    chosen expansion terms alongside; ties break on doc_id / term."""
    from covid_custom_sql_engine_spark.catalog import parallelize_small
    from covid_custom_sql_engine_spark.functions import text as tx
    from covid_custom_sql_engine_spark.registry.bm25_spans import (
        BM25_QUERIES,
    )
    from pyspark.sql import Window

    d = parallelize_small(load_table(spark, sf_dir, "documents"))
    qdf = spark.createDataFrame(BM25_QUERIES, ["query_id", "term"])
    # ONE tokenization of the documents frame, eagerly pinned, threaded
    # through BOTH bm25_topk rounds and the expansion pass below
    # (optimization r13 — this query used to tokenize the same corpus
    # THREE times, once per bm25_topk call plus once here; eager
    # because the frame feeds several same-job consumers, the r12
    # double-evaluation case)
    tk = d.select(
        "doc_id", tx.tokens("text").alias("_tk")
    ).localCheckpoint(eager=True)
    r1 = tx.bm25_topk(d, qdf, k=3, tokens_df=tk)
    toks = tk.select(
        "doc_id", F.explode("_tk").alias("term")
    ).localCheckpoint(eager=False)  # feedback join + df join
    stats = F.broadcast(tk.agg(F.count(F.lit(1)).alias("n_docs")))
    cand = (
        r1.select("query_id", "doc_id")
        .join(toks, "doc_id")
        .join(
            F.broadcast(qdf.select("query_id", "term")),
            ["query_id", "term"],
            "left_anti",
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    cdf = (
        cand.select("term")
        .distinct()
        .join(toks, "term")
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    es = F.col("occ") * F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("es"), F.asc("term")
    )
    exp = (
        cand.join(cdf, "term")
        .crossJoin(stats)
        .select("query_id", "term", es.alias("es"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
        .select("query_id", "term")
        .localCheckpoint(eager=False)  # q2 + expansion-string reuse
    )
    q2 = qdf.unionByName(exp)
    r2 = tx.bm25_topk(d, q2, k=5, tokens_df=tk)
    estr = exp.groupBy("query_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("term"))).alias(
            "expansion_terms"
        )
    )
    return r2.join(F.broadcast(estr), "query_id", "left").select(
        "query_id",
        "doc_id",
        "score",
        F.col("rk").cast("bigint").alias("rk"),
        F.coalesce(F.col("expansion_terms"), F.lit("")).alias(
            "expansion_terms"
        ),
    )


# ---------------------------------------------------------------------------
# Recommender training step, seed-set betweenness, bootstrap CI
# ---------------------------------------------------------------------------

# Per-user 2x2 ridge solve (Cramer), shared expression text.
_ALS_LAM = "0.1"
_ALS_DET = (
    f"((s11 + {_ALS_LAM}) * (s22 + {_ALS_LAM}) - s12 * s12)"
)
_ALS_P1 = f"((b1 * (s22 + {_ALS_LAM}) - s12 * b2) / {_ALS_DET})"
_ALS_P2 = f"(((s11 + {_ALS_LAM}) * b2 - s12 * b1) / {_ALS_DET})"


@query(
    "als_user_step",
    oracle=f"""
    WITH r AS (SELECT o.o_custkey AS u, l.l_partkey AS i,
                      count(*) AS rating
               FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
               GROUP BY 1, 2),
    qf AS (SELECT DISTINCT i,
                  ('0x' || substr(md5('q1:' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                    % 2000 / 1000.0 - 1 AS q1,
                  ('0x' || substr(md5('q2:' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                    % 2000 / 1000.0 - 1 AS q2
           FROM r),
    s AS (SELECT r.u,
                 {_sql_dsum12('qf.q1 * qf.q1')} AS s11,
                 {_sql_dsum12('qf.q1 * qf.q2')} AS s12,
                 {_sql_dsum12('qf.q2 * qf.q2')} AS s22,
                 {_sql_dsum12('r.rating * qf.q1')} AS b1,
                 {_sql_dsum12('r.rating * qf.q2')} AS b2
          FROM r JOIN qf USING (i) GROUP BY r.u)
    SELECT CAST(u AS BIGINT) AS custkey,
           round({_ALS_P1}, 6) AS p1,
           round({_ALS_P2}, 6) AS p2
    FROM s
    """,
)
def als_user_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact ALS half-step at rank 2 over the implicit
    customer×part purchase-count matrix: item factors are fixed
    (deterministic md5-hash initialization — the dataset_split hashing
    convention), and every user's factor pair solves its own 2×2 ridge
    normal equations in closed form (Cramer, λ=0.1) — alternating
    least squares' defining property that the per-user solves are
    EMBARRASSINGLY PARALLEL expressed as one groupBy: at 100 TB this is
    a single combinable aggregate over the interaction table keyed by
    user, no gradient loop, no parameter server.  The item half-step is
    the identical query transposed.  Per-user second moments fold
    fixed-point at 12 digits (factor products are ≪1); the solve is ONE
    shared expression string both engines evaluate verbatim; round(6).
    Complements `item_cf_topk` (memory-based CF) with model-based CF."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    r = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(F.count(F.lit(1)).alias("rating"))
    )
    ikey = F.col("i").cast("string")

    def h(salt: str) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), ikey)), 1, 15), 16, 10
        ).cast("bigint")

    qf = r.select("i").distinct().select(
        "i",
        (h("q1:") % 2000 / 1000.0 - 1).alias("q1"),
        (h("q2:") % 2000 / 1000.0 - 1).alias("q2"),
    )
    s = r.join(qf, "i").groupBy("u").agg(
        ops.dsum12(F.col("q1") * F.col("q1")).alias("s11"),
        ops.dsum12(F.col("q1") * F.col("q2")).alias("s12"),
        ops.dsum12(F.col("q2") * F.col("q2")).alias("s22"),
        ops.dsum12(F.col("rating") * F.col("q1")).alias("b1"),
        ops.dsum12(F.col("rating") * F.col("q2")).alias("b2"),
    )
    return s.select(
        F.col("u").cast("bigint").alias("custkey"),
        F.round(F.expr(_ALS_P1), 6).alias("p1"),
        F.round(F.expr(_ALS_P2), 6).alias("p2"),
    )


# ---------------------------------------------------------------------------
# EM: two-component 1-D Gaussian mixture, fixed rounds
# ---------------------------------------------------------------------------

# E-step responsibility γ = π₁N(x|μ₁,v₁) / Σ — ONE shared expression
# string (the MMR/Markov discipline); per-row IEEE exp/sqrt.
_EM_G = (
    "(pi1 / sqrt(v1) * exp(-((x - mu1) * (x - mu1)) / (2 * v1)))"
    " / (pi1 / sqrt(v1) * exp(-((x - mu1) * (x - mu1)) / (2 * v1))"
    " + (1 - pi1) / sqrt(v2) * exp(-((x - mu2) * (x - mu2)) / (2 * v2)))"
)
# M-step updates over the per-round sums (same text both engines).
_EM_UPD = {
    "pi1": "(sg / n)",
    "mu1": "(sgx / sg)",
    "v1": "greatest(sgx2 / sg - (sgx / sg) * (sgx / sg), 1e-6)",
    "mu2": "(hgx / hg)",
    "v2": "greatest(hgx2 / hg - (hgx / hg) * (hgx / hg), 1e-6)",
}
_EM_ROUNDS = 2


def _em_oracle() -> str:
    upd = ", ".join(f"{expr} AS {k}" for k, expr in _EM_UPD.items())
    ctes = [
        """x AS (SELECT value AS x FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL),
    st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  min(x) AS xmin, max(x) AS xmax,
                  CAST(sum(CAST((x) AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                  CAST(sum(CAST((x * x) AS DECIMAL(38,6))) AS DOUBLE) AS sxx
           FROM x),
    p0 AS (SELECT n,
                  xmin + 0.25 * (xmax - xmin) AS mu1,
                  xmin + 0.75 * (xmax - xmin) AS mu2,
                  greatest((n * sxx - sx * sx) / (n * n), 1e-6) AS v1,
                  greatest((n * sxx - sx * sx) / (n * n), 1e-6) AS v2,
                  0.5 AS pi1
           FROM st)"""
    ]
    for r in range(1, _EM_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""e{r} AS (SELECT x.x, {_EM_G} AS g FROM x, p{p}),
    s{r} AS (SELECT max(p{p}.n) AS n,
                    CAST(sum(CAST((g) AS DECIMAL(38,12))) AS DOUBLE) AS sg,
                    CAST(sum(CAST((g * x) AS DECIMAL(38,12))) AS DOUBLE) AS sgx,
                    CAST(sum(CAST((g * x * x) AS DECIMAL(38,12))) AS DOUBLE) AS sgx2,
                    CAST(sum(CAST(((1 - g)) AS DECIMAL(38,12))) AS DOUBLE) AS hg,
                    CAST(sum(CAST(((1 - g) * x) AS DECIMAL(38,12))) AS DOUBLE) AS hgx,
                    CAST(sum(CAST(((1 - g) * x * x) AS DECIMAL(38,12))) AS DOUBLE) AS hgx2
             FROM e{r}, p{p}),
    p{r} AS (SELECT n, {upd} FROM s{r})"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(n AS BIGINT) AS n,
           round(pi1, 6) AS pi1,
           round(mu1, 6) AS mu1, round(v1, 6) AS var1,
           round(mu2, 6) AS mu2, round(v2, 6) AS var2
    FROM p{_EM_ROUNDS}"""
    )


@query("em_gaussian_mixture", oracle=_em_oracle())
def em_gaussian_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of EM for a 1-D two-component Gaussian mixture over
    purchase values — soft clustering where kmeans_step is hard: the
    E-step computes per-row responsibilities from the previous round's
    (π, μ, v) 1-row broadcast, the M-step is ONE combinable weighted
    aggregate (responsibility-weighted count/mean/second-moment folds
    at 12 digits for the ≪1 γ terms).  Deterministic quartile-spread
    initialization (no rand()); the round count is a hyper-parameter
    and the oracle unrolls identical rounds (the kmeans/label_prop
    convention).  The E-step expression is ONE shared string evaluated
    verbatim by both engines; M-step quotients mirror textually;
    round(6) on the reported parameters."""
    x = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .select(F.col("value").alias("x"))
    )
    x = x.localCheckpoint(eager=False)  # reused every round
    st = x.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        ops.dsum(F.col("x")).alias("sx"),
        ops.dsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    p = st.select(
        "n",
        F.expr("xmin + 0.25 * (xmax - xmin)").alias("mu1"),
        F.expr("xmin + 0.75 * (xmax - xmin)").alias("mu2"),
        F.expr("greatest((n * sxx - sx * sx) / (n * n), 1e-6)").alias("v1"),
        F.expr("greatest((n * sxx - sx * sx) / (n * n), 1e-6)").alias("v2"),
        F.lit(0.5).alias("pi1"),
    )
    for _ in range(_EM_ROUNDS):
        e = x.crossJoin(F.broadcast(p)).select(
            "x", F.expr(_EM_G).alias("g"), "n"
        )
        s = e.agg(
            F.max("n").alias("n"),
            ops.dsum12(F.col("g")).alias("sg"),
            ops.dsum12(F.col("g") * F.col("x")).alias("sgx"),
            ops.dsum12(F.col("g") * F.col("x") * F.col("x")).alias("sgx2"),
            ops.dsum12(1 - F.col("g")).alias("hg"),
            ops.dsum12((1 - F.col("g")) * F.col("x")).alias("hgx"),
            ops.dsum12((1 - F.col("g")) * F.col("x") * F.col("x")).alias(
                "hgx2"
            ),
        )
        p = s.select(
            "n", *[F.expr(expr).alias(k) for k, expr in _EM_UPD.items()]
        )
    return p.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("pi1"), 6).alias("pi1"),
        F.round(F.col("mu1"), 6).alias("mu1"),
        F.round(F.col("v1"), 6).alias("var1"),
        F.round(F.col("mu2"), 6).alias("mu2"),
        F.round(F.col("v2"), 6).alias("var2"),
    )


# ---------------------------------------------------------------------------
# Association rules, Neyman-allocated sampling, Markov entropy rate
# ---------------------------------------------------------------------------


@query(
    "association_rules",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
           FROM li),
    item AS (SELECT l_partkey AS p, count(*) AS supp FROM li GROUP BY 1),
    pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                     count(*) AS supp_ab
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2),
    top AS (SELECT * FROM pairs
            ORDER BY supp_ab DESC, pa, pb LIMIT 10),
    rules AS (
      SELECT pa AS antecedent, pb AS consequent, supp_ab,
             ia.supp AS supp_a, ib.supp AS supp_b
      FROM top JOIN item ia ON ia.p = top.pa
               JOIN item ib ON ib.p = top.pb
      UNION ALL
      SELECT pb, pa, supp_ab, ib.supp, ia.supp
      FROM top JOIN item ia ON ia.p = top.pa
               JOIN item ib ON ib.p = top.pb)
    SELECT CAST(antecedent AS BIGINT) AS antecedent,
           CAST(consequent AS BIGINT) AS consequent,
           CAST(supp_ab AS BIGINT) AS support,
           round(CAST(supp_ab AS DOUBLE) / supp_a, 6) AS confidence,
           round(nb.n * CAST(supp_ab AS DOUBLE) / (supp_a * CAST(supp_b AS DOUBLE)), 6)
             AS lift,
           round(CAST(supp_ab AS DOUBLE) / nb.n
                 - (CAST(supp_a AS DOUBLE) / nb.n)
                   * (CAST(supp_b AS DOUBLE) / nb.n), 6) AS leverage
    FROM rules, nb
    """,
)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association RULES over the top-10 co-purchase pairs — the
    second half of market-basket mining that `frequent_part_pairs`
    (support) and `apriori_triples` (candidate generation) set up:
    per directed rule a→b, confidence supp(ab)/supp(a), lift
    N·supp(ab)/(supp(a)·supp(b)), and leverage — the three measures
    that separate "bought together often" from "bought together more
    than chance".  Scale shape: item supports are one hash aggregate,
    pair supports the basket-bounded self equi-join, the top-10 a
    TakeOrdered, and the rule math integer ratios on a 20-row frame.
    round(6)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    li = li.localCheckpoint(eager=False)  # n + item + pair passes
    nb = F.broadcast(
        li.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n"))
    )
    item = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("supp")
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("pa"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pb")
    )
    top = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("supp_ab"))
        .filter(F.col("supp_ab") >= 2)
        .orderBy(F.desc("supp_ab"), "pa", "pb")
        .limit(10)
    )
    j = top.join(
        F.broadcast(item.select(F.col("p").alias("pa"), F.col("supp").alias("supp_a"))),
        "pa",
    ).join(
        F.broadcast(item.select(F.col("p").alias("pb"), F.col("supp").alias("supp_b"))),
        "pb",
    )
    fwd = j.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "supp_ab",
        F.col("supp_a").alias("s_ante"),
        F.col("supp_b").alias("s_cons"),
    )
    rev = j.select(
        F.col("pb").alias("antecedent"),
        F.col("pa").alias("consequent"),
        "supp_ab",
        F.col("supp_b").alias("s_ante"),
        F.col("supp_a").alias("s_cons"),
    )
    rules = fwd.unionByName(rev)
    return rules.crossJoin(nb).select(
        F.col("antecedent").cast("bigint").alias("antecedent"),
        F.col("consequent").cast("bigint").alias("consequent"),
        F.col("supp_ab").cast("bigint").alias("support"),
        F.round(F.col("supp_ab").cast("double") / F.col("s_ante"), 6).alias(
            "confidence"
        ),
        F.round(
            F.col("n")
            * F.col("supp_ab").cast("double")
            / (F.col("s_ante") * F.col("s_cons").cast("double")),
            6,
        ).alias("lift"),
        F.round(
            F.col("supp_ab").cast("double") / F.col("n")
            - (F.col("s_ante").cast("double") / F.col("n"))
            * (F.col("s_cons").cast("double") / F.col("n")),
            6,
        ).alias("leverage"),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction and forecast backtesting
# ---------------------------------------------------------------------------

def _rake_sw_values() -> str:
    from covid_custom_sql_engine_spark.functions.text import LANG_STOPWORDS

    return ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(LANG_STOPWORDS)
        for w in LANG_STOPWORDS[lang]
    )


@query(
    "rake_keywords",
    oracle=f"""
    WITH sw(lang, word) AS (VALUES {_rake_sw_values()}),
    tk AS (SELECT doc_id, lang, {_NB_SQL_TOKS} AS toks FROM documents),
    pos AS (SELECT tk.doc_id, tk.lang, u.i, tk.toks[u.i] AS tok
            FROM tk, UNNEST(generate_series(1, len(tk.toks))) AS u(i)),
    ns AS (SELECT p.doc_id, p.lang, p.i, p.tok,
                  row_number() OVER (PARTITION BY p.doc_id
                                     ORDER BY p.i) AS rn
           FROM pos p LEFT JOIN sw ON sw.lang = p.lang AND sw.word = p.tok
           WHERE sw.word IS NULL),
    pw AS (SELECT doc_id, lang, i - rn AS grp, i, tok FROM ns),
    ph AS MATERIALIZED (
      SELECT doc_id, lang, grp,
             string_agg(tok, ' ' ORDER BY i) AS phrase,
             count(*) AS plen
      FROM pw GROUP BY 1, 2, 3),
    ws AS (SELECT pw.lang, pw.tok, count(*) AS freq,
                  CAST(sum(ph.plen) AS BIGINT) AS deg
           FROM pw JOIN ph ON ph.doc_id = pw.doc_id AND ph.grp = pw.grp
           GROUP BY 1, 2),
    psc AS (SELECT pw.doc_id, pw.lang, pw.grp,
                   {_sql_dsum12('CAST(ws.deg AS DOUBLE) / ws.freq')} AS sc
            FROM pw JOIN ws ON ws.lang = pw.lang AND ws.tok = pw.tok
            GROUP BY 1, 2, 3),
    agg AS (SELECT ph.lang, ph.phrase,
                   count(*) AS n_occurrences, max(psc.sc) AS sc
            FROM ph JOIN psc ON psc.doc_id = ph.doc_id
                            AND psc.grp = ph.grp
            GROUP BY 1, 2)
    SELECT lang, phrase, CAST(n_occurrences AS BIGINT) AS n_occurrences,
           round(sc, 6) AS score,
           row_number() OVER (PARTITION BY lang
                              ORDER BY sc DESC, phrase) AS rk
    FROM agg
    QUALIFY row_number() OVER (PARTITION BY lang
                               ORDER BY sc DESC, phrase) <= 10
    """,
)
def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010), corpus-level per
    language: candidate phrases are maximal stopword-free token runs
    (gaps-and-islands over token positions — the repeated-span
    machinery's discipline), each word scores deg/freq over ALL
    phrases of its language (deg = Σ length of phrases containing it),
    and a phrase scores the sum of its words — top-10 per language.
    The keyword-extraction member of the text-analysis family
    (tfidf_top_terms ranks single tokens; RAKE surfaces multi-word
    phrases without any n-gram enumeration).  Scale shape: islands
    come from a per-DOCUMENT window (bounded partitions), word stats
    are one hash aggregate keyed (lang, token), the per-phrase score
    folds fixed-point at 12 digits, and the final top-10 is a window
    over the per-language distinct-phrase frame.  Ties break on the
    phrase text; deg/freq ratios are exact-integer-derived doubles."""
    from covid_custom_sql_engine_spark.catalog import parallelize_small
    from covid_custom_sql_engine_spark.functions import text as tx
    from pyspark.sql import Window

    d = parallelize_small(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", tx.tokens("text").alias("toks")
    )
    sw = F.broadcast(
        spark.createDataFrame(
            [
                (lang, w)
                for lang in sorted(tx.LANG_STOPWORDS)
                for w in tx.LANG_STOPWORDS[lang]
            ],
            "slang string, word string",
        )
    )
    pos = d.select(
        "doc_id", "lang", F.posexplode("toks").alias("i0", "tok")
    ).select("doc_id", "lang", (F.col("i0") + 1).alias("i"), "tok")
    ns = (
        pos.join(
            sw,
            (F.col("slang") == F.col("lang")) & (F.col("word") == F.col("tok")),
            "left",
        )
        .filter(F.col("word").isNull())
        .select("doc_id", "lang", "i", "tok")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    pw = ns.withColumn("rn", F.row_number().over(w_doc)).select(
        "doc_id", "lang", (F.col("i") - F.col("rn")).alias("grp"), "i", "tok"
    )
    pw = pw.localCheckpoint(eager=False)  # phrase agg + word stats + score
    ph = pw.groupBy("doc_id", "lang", "grp").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("i"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    ph = ph.localCheckpoint(eager=False)  # word-deg join + phrase agg
    ws = (
        pw.join(
            ph.select(
                F.col("doc_id").alias("_pd"),
                F.col("grp").alias("_pg"),
                "plen",
            ),
            (F.col("_pd") == F.col("doc_id")) & (F.col("_pg") == F.col("grp")),
        )
        .groupBy("lang", "tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
    )
    psc = (
        pw.join(
            ws.select(
                F.col("lang").alias("_wl"),
                F.col("tok").alias("_wt"),
                "freq",
                "deg",
            ),
            (F.col("_wl") == F.col("lang")) & (F.col("_wt") == F.col("tok")),
        )
        .groupBy("doc_id", "lang", "grp")
        .agg(
            ops.dsum12(
                F.col("deg").cast("double") / F.col("freq")
            ).alias("sc")
        )
    )
    agg = (
        ph.join(
            psc.select(
                F.col("doc_id").alias("_sd"),
                F.col("grp").alias("_sg"),
                "sc",
            ),
            (F.col("_sd") == F.col("doc_id")) & (F.col("_sg") == F.col("grp")),
        )
        .groupBy("lang", "phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("sc").alias("sc"),
        )
    )
    w_l = Window.partitionBy("lang").orderBy(
        F.desc("sc"), F.asc("phrase")
    )
    return (
        agg.withColumn("rk", F.row_number().over(w_l))
        .filter(F.col("rk") <= 10)
        .select(
            "lang",
            "phrase",
            F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
            F.round(F.col("sc"), 6).alias("score"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


@query(
    "readability_ari",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, text,
                      list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  x -> x != '') AS toks,
                      greatest(length(text)
                               - length(regexp_replace(text, '[.!?]', '', 'g')),
                               1) AS n_sent
               FROM documents),
    m AS (SELECT doc_id, lang,
                 length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS n_chars,
                 greatest(len(toks), 1) AS n_words,
                 n_sent
          FROM t),
    r AS (SELECT lang,
                 4.71 * (CAST(n_chars AS DOUBLE) / n_words)
                 + 0.5 * (CAST(n_words AS DOUBLE) / n_sent) - 21.43 AS ari
          FROM m)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round({_sql_dsum12('ari')} / count(*), 6) AS avg_ari
    FROM r GROUP BY lang
    """,
)
def readability_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated Readability Index per language — 4.71·(chars/word) +
    0.5·(words/sentence) − 21.43 on alphanumeric character counts,
    whitespace words, and terminal-punctuation sentence counts — the
    syllable-free readability screen (ARI was designed for exactly
    this: machine scoring without dictionaries), complementing the
    length/punct/stopword heuristics in `text_profile` as a corpus-
    quality gate.  One pass of per-row regexp/length codegen + one
    hash aggregate; per-doc ratios fold fixed-point.  round(6)."""
    from covid_custom_sql_engine_spark.catalog import parallelize_small
    from covid_custom_sql_engine_spark.functions import text as tx

    d = parallelize_small(load_table(spark, sf_dir, "documents")).select(
        "lang",
        F.length(F.regexp_replace("text", "[^a-zA-Z0-9]", "")).alias(
            "n_chars"
        ),
        F.greatest(tx.token_count("text"), F.lit(1)).alias("n_words"),
        F.greatest(
            F.length("text")
            - F.length(F.regexp_replace("text", "[.!?]", "")),
            F.lit(1),
        ).alias("n_sent"),
    )
    r = d.select(
        "lang",
        (
            4.71 * (F.col("n_chars").cast("double") / F.col("n_words"))
            + 0.5 * (F.col("n_words").cast("double") / F.col("n_sent"))
            - 21.43
        ).alias("ari"),
    )
    return r.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(ops.dsum12(F.col("ari")) / F.count(F.lit(1)), 6).alias(
            "avg_ari"
        ),
    )


@query(
    "abc_classification",
    oracle=f"""
    WITH pr AS (SELECT l_partkey AS p,
                       {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS rev
                FROM lineitem GROUP BY 1),
    r AS (SELECT p, rev,
                 row_number() OVER (ORDER BY rev DESC, p) AS rk
          FROM pr),
    t AS (SELECT {_sql_dsum('rev')} AS tot FROM pr),
    c AS (SELECT p, rev,
                 sum(CAST(rev AS DECIMAL(38,6)))
                   OVER (ORDER BY rk
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
          FROM r),
    k AS (SELECT p, rev,
                 CASE WHEN CAST(cum AS DOUBLE) <= 0.7 * t.tot THEN 'A'
                      WHEN CAST(cum AS DOUBLE) <= 0.9 * t.tot THEN 'B'
                      ELSE 'C' END AS klass
          FROM c, t)
    SELECT klass, CAST(count(*) AS BIGINT) AS n_parts,
           round({_sql_dsum('rev')} / max(t.tot), 6) AS revenue_share
    FROM k, t GROUP BY klass
    """,
)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by net
    revenue, class A = the head covering 70% of cumulative revenue,
    B to 90%, C the tail — the operational sibling of
    `revenue_concentration`'s Gini (that one scores the whole curve,
    this one CUTS it into actionable tiers).  Scale shape: one fact
    aggregate to per-part revenue, the two-phase distributed
    global_rank for the descending order, ONE pinned prefix-sum pass
    (selection.running_sums on the rank axis) for the cumulative —
    never a single-partition window over parts — and a 3-row class
    aggregate.  Fixed-point folds make the cumulative and the cuts
    bit-identical cross-engine; round(6) on the shares."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    pr = li.groupBy(F.col("l_partkey").alias("p")).agg(
        ops.dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("rev")
    )
    # global_rank orders ascending; the oracle ranks by (rev DESC,
    # p ASC) — mirror it by ranking the NEGATED revenue with the id
    # tiebreak
    r = sel.global_rank(
        pr.select("p", "rev", (-F.col("rev")).alias("_neg")),
        ["_neg", "p"],
        out_col="rk",
    ).drop("_neg")
    pv = r.select("rk", "p", F.col("rev").alias("_rv"))
    cum = sel.running_sums(
        pv.select("rk", "p", F.col("_rv").cast("decimal(38,6)").alias("_rd")),
        "rk",
        ["_rd"],
    ).select(
        "p",
        F.col("_rd").cast("double").alias("rev"),
        F.col("_cum__rd").cast("double").alias("cum"),
    )
    t = F.broadcast(pr.agg(ops.dsum(F.col("rev")).alias("tot")))
    k = cum.crossJoin(t).select(
        "rev",
        "tot",
        F.when(F.col("cum") <= 0.7 * F.col("tot"), F.lit("A"))
        .when(F.col("cum") <= 0.9 * F.col("tot"), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("klass"),
    )
    return k.groupBy("klass").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(ops.dsum(F.col("rev")) / F.max("tot"), 6).alias(
            "revenue_share"
        ),
    )
