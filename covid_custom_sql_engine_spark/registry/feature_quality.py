"""Feature engineering, record linkage, and model/data quality audits
(round-10 continuation, split from stats_ml.py in round 11).

Trigram fuzzy name matching (lossless PPJoin reuse), WOE/IV feature
screening, leakage-free out-of-fold target encoding, the expectation
suite, and the calibration report. Same conventions as every family
module (see _base).
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


# ---------------------------------------------------------------------------
# Entity resolution: trigram fuzzy name matching (lossless PPJoin reuse)
# ---------------------------------------------------------------------------

_TRI_TAU = 0.45
_TRI_SQL_GRAMS = (
    "(SELECT list(DISTINCT substr({s}, i, 3)) "
    "FROM UNNEST(generate_series(1, length({s}) - 2)) AS u(i))"
)


def _trigrams(col: str) -> F.Column:
    """Distinct character trigrams of ``col``. Guard length < 3:
    Spark's sequence(1, 0) steps DOWN ([1, 0]), producing bogus
    substrings, while the oracle's generate_series(1, 0) is empty —
    gate to an empty array so both engines agree on sub-trigram
    strings."""
    return F.when(
        F.length(col) >= 3,
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, length({col}) - 2),"
                f" i -> substr({col}, i, 3))"
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _trigram_match_oracle(orig_cte: str, tau: float = _TRI_TAU) -> str:
    """The trigram-match spec oracle parameterized over the name
    universe: shared-trigram posting-list candidates + exact Jaccard +
    per-corruption argmax — the same text for the TPC-H-name and the
    synthesized-name variants, so the two queries differ ONLY in where
    `orig` comes from."""
    return f"""
    WITH orig AS ({orig_cte}),
    corr AS (SELECT id + 1000000 AS cid, id AS true_id,
                    substr(name, 1, pos - 1) || substr(name, pos + 1) AS cname
             FROM (SELECT id, name,
                          1 + ('0x' || substr(md5('typo:' || CAST(id AS VARCHAR)), 1, 15))::BIGINT
                              % length(name) AS pos
                   FROM orig)),
    ot AS (SELECT id, {_TRI_SQL_GRAMS.format(s='name')} AS tg FROM orig),
    ct AS (SELECT cid, true_id, {_TRI_SQL_GRAMS.format(s='cname')} AS tg
           FROM corr),
    oe AS (SELECT id, unnest(tg) AS t FROM ot),
    ce AS (SELECT cid, unnest(tg) AS t FROM ct),
    cand AS (SELECT DISTINCT ce.cid, oe.id FROM ce JOIN oe USING (t)),
    sc AS (SELECT cand.cid, cand.id,
                  len(list_intersect(ct.tg, ot.tg))::DOUBLE
                    / len(list_distinct(list_concat(ct.tg, ot.tg))) AS j
           FROM cand JOIN ct ON ct.cid = cand.cid
                     JOIN ot ON ot.id = cand.id),
    best AS (SELECT cid, id, j
             FROM sc
             WHERE j >= {tau}
             QUALIFY row_number() OVER (PARTITION BY cid
                                        ORDER BY j DESC, id) = 1)
    SELECT CAST((SELECT count(*) FROM corr) AS BIGINT) AS n_names,
           CAST(count(*) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN om.name = ot2.name THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(sum(CASE WHEN om.name = ot2.name THEN 1 ELSE 0 END)
                 / CAST((SELECT count(*) FROM corr) AS DOUBLE), 6)
             AS accuracy
    FROM best
    JOIN corr ON corr.cid = best.cid
    JOIN orig om ON om.id = best.id
    JOIN orig ot2 ON ot2.id = corr.true_id
    """


def _trigram_match_summary(orig: DataFrame, tau: float = _TRI_TAU) -> DataFrame:
    """Corrupt every name with a deterministic one-char deletion, match
    the corrupted names back via PPJoin trigram Jaccard (τ = ``tau``),
    and score accuracy at the name level. `orig` must have (id, name)
    with id < 1000000."""
    pos = 1 + F.conv(
        F.substring(
            F.md5(F.concat(F.lit("typo:"), F.col("id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint") % F.length("name")
    corr = (
        orig.withColumn("pos", pos)
        .select(
            (F.col("id") + 1000000).alias("cid"),
            F.col("id").alias("true_id"),
            F.concat(
                F.expr("substr(name, 1, cast(pos - 1 as int))"),
                F.expr("substr(name, cast(pos + 1 as int), length(name))"),
            ).alias("cname"),
        )
        .localCheckpoint(eager=False)  # match join + truth join
    )
    from covid_custom_sql_engine_spark.functions import dedup as dd

    # Bipartite PPJoin (optimization r12): only ORIGINAL×CORRUPTED
    # pairs are ever kept (id_a < 1000000 ≤ id_b in the old self-join
    # formulation), so generate exactly those — the R-S prefix join
    # produces the identical surviving pair set (ids disjoint across
    # sides) with ~4× fewer candidate-join rows than the union
    # self-join whose A×A / B×B combinations a post-filter discarded.
    pairs = dd.prefix_filter_pairs_sets_rs(
        orig.select(F.col("id").alias("nid"), _trigrams("name").alias("tg")),
        corr.select(
            F.col("cid").alias("nid"), _trigrams("cname").alias("tg")
        ),
        threshold=tau,
        id_col="nid",
        set_col="tg",
    )
    # per-corruption argmax: ONE combinable aggregate — min over
    # (−jaccard, id_a) structs ≡ max jaccard then min id_a (the window
    # ordering it replaces: desc jaccard, asc id_a, row_number = 1).
    # jaccard values are small-integer ratios (|∆| ≥ 1/1600 between
    # distinct values, so round(6) never merges two) and > 0, so the
    # negation is exact and the orderings coincide bit-for-bit.
    best = (
        pairs.groupBy(F.col("id_b").alias("cid"))
        .agg(
            F.min(
                F.struct(
                    (-F.col("jaccard")).alias("_nj"),
                    F.col("id_a").alias("_i"),
                )
            ).alias("_b")
        )
        .select("cid", F.col("_b._i").alias("mid"))
    )
    n_names = F.broadcast(corr.agg(F.count(F.lit(1)).alias("n_names")))
    return (
        best.join(corr.select("cid", "true_id"), "cid")
        .join(
            orig.select(F.col("id").alias("mid"), F.col("name").alias("_mn")),
            "mid",
        )
        .join(
            orig.select(
                F.col("id").alias("true_id"), F.col("name").alias("_tn")
            ),
            "true_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum(
                F.when(F.col("_mn") == F.col("_tn"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
        )
        .crossJoin(n_names)
        .select(
            F.col("n_names").cast("bigint").alias("n_names"),
            F.col("n_matched").cast("bigint").alias("n_matched"),
            "n_correct",
            F.round(
                F.col("n_correct") / F.col("n_names").cast("double"), 6
            ).alias("accuracy"),
        )
    )


@query(
    "trigram_name_match",
    oracle=_trigram_match_oracle(
        "SELECT p_partkey AS id, p_name AS name FROM part"
        " WHERE p_partkey <= 2000"
    ),
)
def trigram_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by character-TRIGRAM fuzzy matching: every
    part name gets a deterministic one-character-deletion typo (md5
    position), and each corrupted name is matched back by trigram-set
    Jaccard (τ = 0.45) with the LOSSLESS PPJoin prefix-filter engine
    (dedup.prefix_filter_pairs_sets — the same rarity-ordered prefix +
    length + positional pruning the token-level near-dup join uses,
    now on character n-grams).  Ground truth is known by construction
    and scored at the NAME level (part names repeat ~30× in TPC-H data,
    so key-level identity is unrecoverable by design), so the output IS
    the matcher's audited accuracy — the
    data-integration record-linkage shape (match customer/vendor name
    variants at 100 TB without an all-pairs cross).  The oracle is the
    pure all-pairs specification (shared-trigram candidates + exact
    Jaccard) — feasible at oracle scale, which is exactly why the
    engine side must prune and the spec side need not.  Argmax ties
    break on the original key; round(6) on the accuracy."""
    orig = (
        load_table(spark, sf_dir, "part")
        # fixed 2000-name universe at every SF: TPC-H names draw from a
        # ~64-word vocabulary, so at sf0.1 the 20k-part corpus is 300×
        # duplicated names — the degenerate-vocabulary PPJoin worst
        # case (SCALE.md round-9: prefixes can't be rare when every
        # set repeats), where candidate generation is inherently
        # quadratic in the duplicate count. The capped universe keeps
        # the audited matching task identical across SFs; realistic
        # high-entropy vocabularies are the UNCAPPED path, driver-
        # verified at 20k names by trigram_match_scaled below.
        .filter(F.col("p_partkey") <= 2000)
        .select(
            F.col("p_partkey").alias("id"), F.col("p_name").alias("name")
        )
    )
    return _trigram_match_summary(orig)


_TRI_SCALED_N = 20000
# one deletion on a 16-char name destroys ≤3 of ~14 trigrams and adds
# ≤2, so true-pair Jaccard ≥ ~0.65 — τ=0.6 keeps every true match
# while shortening the PPJoin prefix (⌈0.4·|T|⌉+1 vs ⌈0.55·|T|⌉+1 at
# 0.45), which is what bounds candidate fan-out at 20k names
_TRI_SCALED_TAU = 0.6


@query(
    "trigram_match_scaled",
    oracle=_trigram_match_oracle(
        "SELECT i AS id, substr(md5('nm:' || CAST(i AS VARCHAR)), 1, 16)"
        f" AS name FROM generate_series(1, {_TRI_SCALED_N}) AS t(i)",
        tau=_TRI_SCALED_TAU,
    ),
)
def trigram_match_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trigram_name_match at 10× the capped universe with NO cap — the
    prefix_jaccard_zipf treatment applied to record linkage.  TPC-H
    part names draw from ~64 strings, so raw sf0.1 parts are the
    degenerate-vocabulary PPJoin worst case (275 s, SCALE.md round-10)
    — a property of THAT vocabulary, not of scale.  Here the 20,000
    names are synthesized inside both engines as 16-hex-char md5
    digests (≈14 distinct trigrams each over a 4096-trigram space, so
    every trigram posting list stays ~O(N/300) and the rarity-ordered
    prefix prunes): realistic-entropy name matching, driver-verified
    uncapped.  Same corruption scheme, τ, tie-break, and scoring as
    trigram_name_match; the oracle differs only in the `orig` CTE."""
    orig = spark.range(1, _TRI_SCALED_N + 1).select(
        F.col("id"),
        F.substring(
            F.md5(F.concat(F.lit("nm:"), F.col("id").cast("string"))), 1, 16
        ).alias("name"),
    )
    return _trigram_match_summary(orig, tau=_TRI_SCALED_TAU)


@query(
    "woe_iv_binning",
    oracle="""
    WITH x AS (SELECT CAST(least(floor((l_quantity - 1) / 5), 9) AS BIGINT)
                        AS bin,
                      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
               FROM lineitem WHERE l_quantity IS NOT NULL),
    g AS (SELECT bin, count(*) AS n, sum(bad) AS n_bad,
                 count(*) - sum(bad) AS n_good
          FROM x GROUP BY bin),
    t AS (SELECT CAST(sum(n_bad) AS DOUBLE) AS tb,
                 CAST(sum(n_good) AS DOUBLE) AS tg
          FROM g),
    w AS (SELECT g.bin, g.n, g.n_bad,
                 ln(greatest(g.n_good / t.tg, 0.5 / t.tg)
                    / greatest(g.n_bad / t.tb, 0.5 / t.tb)) AS woe,
                 (g.n_good / t.tg - g.n_bad / t.tb)
                   * ln(greatest(g.n_good / t.tg, 0.5 / t.tg)
                        / greatest(g.n_bad / t.tb, 0.5 / t.tb)) AS ivc
          FROM g, t),
    iv AS (SELECT CAST(sum(CAST(ivc AS DECIMAL(38,12))) AS DOUBLE) AS iv
           FROM w)
    SELECT w.bin, CAST(w.n AS BIGINT) AS n,
           CAST(w.n_bad AS BIGINT) AS n_bad,
           round(w.woe, 6) AS woe,
           round(iv.iv, 6) AS iv_total
    FROM w, iv
    """,
)
def woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / Information-Value profile of quantity
    against the return flag — the credit-scoring feature screen: per
    bin, WOE = ln((good share)/(bad share)); the IV total (Σ(Δshare)·
    WOE) grades the feature's separating power on the standard
    <0.02 useless … >0.3 strong scale.  Deterministic integer binning
    (width-5 buckets over the 1–50 quantity domain), one hash
    aggregate, 1-row totals broadcast, fixed-point IV fold — the
    feature-engineering audit shape for any (feature, binary target)
    pair at any scale.  round(6)."""
    x = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").isNotNull())
        .select(
            F.least(F.floor((F.col("l_quantity") - 1) / 5), F.lit(9))
            .cast("bigint")
            .alias("bin"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("bad"),
        )
    )
    g = x.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bad").alias("n_bad"),
        (F.count(F.lit(1)) - F.sum("bad")).alias("n_good"),
    )
    t = F.broadcast(
        g.agg(
            F.sum("n_bad").cast("double").alias("tb"),
            F.sum("n_good").cast("double").alias("tg"),
        )
    )
    # A bin with only goods (or only bads) would put a 0 inside the ln;
    # the standard half-count adjustment clamps each share at 0.5/total
    # — exact-unchanged for nonzero cells, finite for empty ones, and
    # applied identically in the oracle.
    woe = F.log(
        F.greatest(F.col("n_good") / F.col("tg"), F.lit(0.5) / F.col("tg"))
        / F.greatest(F.col("n_bad") / F.col("tb"), F.lit(0.5) / F.col("tb"))
    )
    w = g.crossJoin(t).select(
        "bin",
        "n",
        "n_bad",
        woe.alias("woe"),
        (
            (F.col("n_good") / F.col("tg") - F.col("n_bad") / F.col("tb"))
            * woe
        ).alias("ivc"),
    )
    w = w.localCheckpoint(eager=False)  # iv fold + per-bin output
    iv = F.broadcast(w.agg(ops.dsum12(F.col("ivc")).alias("iv")))
    return w.crossJoin(iv).select(
        "bin",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_bad").cast("bigint").alias("n_bad"),
        F.round(F.col("woe"), 6).alias("woe"),
        F.round(F.col("iv"), 6).alias("iv_total"),
    )


@query(
    "target_encode_oof",
    oracle="""
    WITH x AS (SELECT p.p_brand AS brand,
                      CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
                      ('0x' || substr(md5('te:' || CAST(l.l_orderkey AS VARCHAR)
                         || ':' || CAST(l.l_linenumber AS VARCHAR)), 1, 15))::BIGINT
                        % 5 AS fold
               FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    bf AS (SELECT brand, fold, count(*) AS n, sum(y) AS s
           FROM x GROUP BY 1, 2),
    bt AS (SELECT brand, CAST(sum(n) AS BIGINT) AS nb,
                  CAST(sum(s) AS BIGINT) AS sb
           FROM bf GROUP BY 1),
    gt AS (SELECT CAST(sum(n) AS DOUBLE) AS ng,
                  CAST(sum(s) AS DOUBLE) AS sg
           FROM bf)
    SELECT bf.brand, CAST(bf.fold AS BIGINT) AS fold,
           CAST(bf.n AS BIGINT) AS n_rows,
           round((CAST(bt.sb - bf.s AS DOUBLE) + 20.0 * (gt.sg / gt.ng))
                 / (CAST(bt.nb - bf.n AS DOUBLE) + 20.0), 6) AS oof_te
    FROM bf JOIN bt USING (brand) CROSS JOIN gt
    """,
)
def target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-FOLD target encoding of part brand against the return
    flag with prior smoothing (strength 20): each (brand, fold) cell's
    encoding uses only the OTHER folds' rows — exactly how leakage-
    free mean-target features are built for GBMs, and the same
    total-minus-fold arithmetic trick as `ridge_cv_lambda` (one
    aggregate serves all folds, no per-fold rescans).  md5 fold
    assignment; all-integer counts into one final smoothed quotient;
    round(6)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("te:"),
                            F.col("l_orderkey").cast("string"),
                            F.lit(":"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 5
        ).alias("fold"),
    )
    bf = x.groupBy("brand", "fold").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    bf = bf.localCheckpoint(eager=False)  # brand totals + global + output
    bt = bf.groupBy("brand").agg(
        F.sum("n").cast("bigint").alias("nb"),
        F.sum("s").cast("bigint").alias("sb"),
    )
    gt = F.broadcast(
        bf.agg(
            F.sum("n").cast("double").alias("ng"),
            F.sum("s").cast("double").alias("sg"),
        )
    )
    return (
        bf.join(bt, "brand")
        .crossJoin(gt)
        .select(
            "brand",
            F.col("fold").cast("bigint").alias("fold"),
            F.col("n").cast("bigint").alias("n_rows"),
            F.round(
                (
                    (F.col("sb") - F.col("s")).cast("double")
                    + 20.0 * (F.col("sg") / F.col("ng"))
                )
                / ((F.col("nb") - F.col("n")).cast("double") + 20.0),
                6,
            ).alias("oof_te"),
        )
    )


# ---------------------------------------------------------------------------
# Data contracts and score calibration
# ---------------------------------------------------------------------------


@query(
    "expectation_suite",
    oracle="""
    WITH o AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CASE WHEN o_totalprice <= 0 OR o_totalprice IS NULL
                                    THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
                      CAST(sum(CASE WHEN o_orderdate IS NULL
                                    THEN 1 ELSE 0 END) AS BIGINT) AS v_date,
                      CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                                     OR o_orderstatus IS NULL
                                    THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
                      CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                        AS v_unique
               FROM orders),
    l AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                                OR l_discount IS NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
                 CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                                OR l_quantity IS NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS v_qty
          FROM lineitem)
    SELECT * FROM (
      SELECT 'orders.totalprice_positive' AS expectation, o.n AS n_checked,
             o.v_price AS n_violations, o.v_price = 0 AS passed FROM o
      UNION ALL
      SELECT 'orders.orderdate_not_null', o.n, o.v_date, o.v_date = 0 FROM o
      UNION ALL
      SELECT 'orders.status_in_domain', o.n, o.v_status, o.v_status = 0 FROM o
      UNION ALL
      SELECT 'orders.orderkey_unique', o.n, o.v_unique, o.v_unique = 0 FROM o
      UNION ALL
      SELECT 'lineitem.discount_in_range', l.n, l.v_disc, l.v_disc = 0 FROM l
      UNION ALL
      SELECT 'lineitem.quantity_in_range', l.n, l.v_qty, l.v_qty = 0 FROM l)
    """,
)
def expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract suite (the Great-Expectations shape):
    six expectations — positivity, null policy, value domain, key
    uniqueness, and two range contracts — each reported as (n_checked,
    n_violations, passed).  ONE conditional-aggregation scan per table
    evaluates every expectation on that table simultaneously (never
    one scan per rule — at 100 TB the contract suite must amortize),
    then a 6-row literal unpivot.  All-integer; exact."""
    o = load_table(spark, sf_dir, "orders")
    oa = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(
                (F.col("o_totalprice") <= 0)
                | F.col("o_totalprice").isNull(),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("v_price"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("v_date"),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin("F", "O", "P")
                | F.col("o_orderstatus").isNull(),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("v_status"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("v_unique"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    la = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0)
                | (F.col("l_discount") > 0.1)
                | F.col("l_discount").isNull(),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("v_disc"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50)
                | F.col("l_quantity").isNull(),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("v_qty"),
    )

    def row(src, name, viol):
        return src.select(
            F.lit(name).alias("expectation"),
            F.col("n").alias("n_checked"),
            F.col(viol).alias("n_violations"),
            (F.col(viol) == 0).alias("passed"),
        )

    return (
        row(oa, "orders.totalprice_positive", "v_price")
        .unionByName(row(oa, "orders.orderdate_not_null", "v_date"))
        .unionByName(row(oa, "orders.status_in_domain", "v_status"))
        .unionByName(row(oa, "orders.orderkey_unique", "v_unique"))
        .unionByName(row(la, "lineitem.discount_in_range", "v_disc"))
        .unionByName(row(la, "lineitem.quantity_in_range", "v_qty"))
    )


@query(
    "calibration_report",
    oracle="""
    WITH x AS (SELECT p.p_brand AS brand,
                      CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
                      ('0x' || substr(md5('te:' || CAST(l.l_orderkey AS VARCHAR)
                         || ':' || CAST(l.l_linenumber AS VARCHAR)), 1, 15))::BIGINT
                        % 5 AS fold
               FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    bf AS (SELECT brand, fold, count(*) AS n, sum(y) AS s
           FROM x GROUP BY 1, 2),
    bt AS (SELECT brand, sum(n) AS nb, sum(s) AS sb FROM bf GROUP BY 1),
    gt AS (SELECT CAST(sum(n) AS DOUBLE) AS ng,
                  CAST(sum(s) AS DOUBLE) AS sg FROM bf),
    te AS (SELECT bf.brand, bf.fold,
                  (CAST(bt.sb - bf.s AS DOUBLE) + 20.0 * (gt.sg / gt.ng))
                    / (CAST(bt.nb - bf.n AS DOUBLE) + 20.0) AS p
           FROM bf JOIN bt USING (brand) CROSS JOIN gt),
    sc AS (SELECT x.y, te.p FROM x JOIN te ON te.brand = x.brand
                                         AND te.fold = x.fold),
    mm AS (SELECT min(p) AS lo, max(p) AS hi FROM sc),
    b AS (SELECT y, p,
                 least(CAST(floor((p - mm.lo) / ((mm.hi - mm.lo) / 5 + 1e-12))
                            AS BIGINT), 4) AS bin
          FROM sc, mm),
    cal AS (SELECT bin, count(*) AS n,
                   CAST(sum(CAST((p) AS DECIMAL(38,12))) AS DOUBLE)
                     / count(*) AS mean_pred,
                   CAST(sum(y) AS DOUBLE) / count(*) AS obs_rate
            FROM b GROUP BY bin),
    br AS (SELECT CAST(sum(CAST(((p - y) * (p - y)) AS DECIMAL(38,12)))
                       AS DOUBLE) / count(*) AS brier
           FROM b)
    SELECT cal.bin, CAST(cal.n AS BIGINT) AS n,
           round(cal.mean_pred, 6) AS mean_pred,
           round(cal.obs_rate, 6) AS obs_rate,
           round(br.brier, 6) AS brier_total
    FROM cal, br
    """,
)
def calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of the leakage-free `target_encode_oof`
    score: rows join their own fold's out-of-fold encoding as a
    predicted return probability, scores bin into 5 equal-width bins
    over the observed score range, and each bin reports mean predicted
    vs observed rate — the reliability-diagram table — with the
    overall Brier score alongside.  A well-calibrated encoder tracks
    the diagonal; this is the standard "can I trust the score as a
    probability?" gate before thresholding.  Scale shape: the score
    table is (brands × folds) and broadcasts back onto one fact pass;
    binning bounds are a 1-row broadcast; fixed-point folds for the
    fractional sums.  round(6)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("te:"),
                            F.col("l_orderkey").cast("string"),
                            F.lit(":"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 5
        ).alias("fold"),
    )
    x = x.localCheckpoint(eager=False)  # encoding pass + scoring pass
    bf = x.groupBy("brand", "fold").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    bf = bf.localCheckpoint(eager=False)
    bt = bf.groupBy("brand").agg(
        F.sum("n").alias("nb"), F.sum("s").alias("sb")
    )
    gt = F.broadcast(
        bf.agg(
            F.sum("n").cast("double").alias("ng"),
            F.sum("s").cast("double").alias("sg"),
        )
    )
    te = (
        bf.join(bt, "brand")
        .crossJoin(gt)
        .select(
            F.col("brand").alias("_tb"),
            F.col("fold").alias("_tf"),
            (
                (
                    (F.col("sb") - F.col("s")).cast("double")
                    + 20.0 * (F.col("sg") / F.col("ng"))
                )
                / ((F.col("nb") - F.col("n")).cast("double") + 20.0)
            ).alias("p"),
        )
    )
    sc = x.join(
        F.broadcast(te),
        (F.col("_tb") == F.col("brand")) & (F.col("_tf") == F.col("fold")),
    ).select("y", "p")
    sc = sc.localCheckpoint(eager=False)  # bounds + binning passes
    mm = F.broadcast(sc.agg(F.min("p").alias("lo"), F.max("p").alias("hi")))
    b = sc.crossJoin(mm).select(
        "y",
        "p",
        F.least(
            F.floor(
                (F.col("p") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / 5 + 1e-12)
            ).cast("bigint"),
            F.lit(4),
        ).alias("bin"),
    )
    b = b.localCheckpoint(eager=False)  # per-bin + Brier passes
    cal = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        (ops.dsum12(F.col("p")) / F.count(F.lit(1))).alias("mean_pred"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("obs_rate"),
    )
    br = F.broadcast(
        b.agg(
            (
                ops.dsum12((F.col("p") - F.col("y")) * (F.col("p") - F.col("y")))
                / F.count(F.lit(1))
            ).alias("brier")
        )
    )
    return cal.crossJoin(br).select(
        "bin",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("mean_pred"), 6).alias("mean_pred"),
        F.round(F.col("obs_rate"), 6).alias("obs_rate"),
        F.round(F.col("brier"), 6).alias("brier_total"),
    )


# ---------------------------------------------------------------------------
# Bounded edit-distance join (count-filtered trigram blocking)
# ---------------------------------------------------------------------------

_LEV_N = 10000


@query(
    "levenshtein_linkage",
    oracle=f"""
    WITH orig AS (SELECT i AS id,
                         substr(md5('nm:' || CAST(i AS VARCHAR)), 1, 16) AS name
                  FROM generate_series(1, {_LEV_N}) AS t(i)),
    corr AS (SELECT id + 1000000 AS cid, id AS true_id,
                    CASE WHEN id % 2 = 0
                         THEN substr(name, 1, pos - 1) || substr(name, pos + 1)
                         ELSE substr(name, 1, pos - 1) || 'z'
                              || substr(name, pos + 1) END AS cname
             FROM (SELECT id, name,
                          1 + ('0x' || substr(md5('typo:' || CAST(id AS VARCHAR)), 1, 15))::BIGINT
                              % length(name) AS pos
                   FROM orig)),
    ot AS (SELECT id, name, {_TRI_SQL_GRAMS.format(s='name')} AS tg FROM orig),
    ct AS (SELECT cid, true_id, cname,
                  {_TRI_SQL_GRAMS.format(s='cname')} AS tg FROM corr),
    oe AS (SELECT id, unnest(tg) AS t FROM ot),
    ce AS (SELECT cid, unnest(tg) AS t FROM ct),
    cand AS (SELECT ce.cid, oe.id, count(*) AS shared
             FROM ce JOIN oe USING (t) GROUP BY ce.cid, oe.id),
    blocked AS (SELECT cand.cid, cand.id
                FROM cand JOIN ct ON ct.cid = cand.cid
                          JOIN ot ON ot.id = cand.id
                WHERE cand.shared >= least(len(ct.tg), len(ot.tg)) - 3),
    pairs AS (SELECT b.cid, b.id,
                     levenshtein(ct.cname, ot.name) AS d
              FROM blocked b JOIN ct ON ct.cid = b.cid
                             JOIN ot ON ot.id = b.id
              WHERE levenshtein(ct.cname, ot.name) <= 1),
    best AS (SELECT cid, id FROM pairs
             QUALIFY row_number() OVER (PARTITION BY cid
                                        ORDER BY d, id) = 1)
    SELECT CAST((SELECT count(*) FROM corr) AS BIGINT) AS n_names,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_pairs,
           CAST(count(*) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN best.id = corr.true_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM best JOIN corr ON corr.cid = best.cid
    """,
)
def levenshtein_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded EDIT-DISTANCE join — the record-linkage primitive where
    set-similarity is the wrong metric (typos are edits, not token
    swaps): match every corrupted name (even ids: one deletion, odd
    ids: one substitution) back to originals within Levenshtein
    distance ≤ 1, without an all-pairs scan.  Blocking is the
    count-filtered trigram posting join, and the filter is PROVABLY
    LOSSLESS for d ≤ 1: a single edit touches ≤ 3 trigram windows, so
    any trigram in one set but not the other occurs only in touched
    windows — |Ta ∩ Tb| ≥ min(|Ta|, |Tb|) − 3.  Survivors get the
    exact `levenshtein` verification (a built-in on BOTH engines);
    ties break (distance, id).  Scale shape: posting join on the
    trigram key (posting lists ~N/4096 on the hex-digest universe),
    one combinable pair-count aggregate, broadcast-free equi-joins —
    the same candidates-then-verify discipline as the PPJoin stack,
    with an absolute-edit budget instead of a Jaccard threshold."""
    orig = spark.range(1, _LEV_N + 1).select(
        F.col("id"),
        F.substring(
            F.md5(F.concat(F.lit("nm:"), F.col("id").cast("string"))), 1, 16
        ).alias("name"),
    )
    pos = 1 + F.conv(
        F.substring(
            F.md5(F.concat(F.lit("typo:"), F.col("id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint") % F.length("name")
    head = F.expr("substr(name, 1, cast(pos - 1 as int))")
    tail = F.expr("substr(name, cast(pos + 1 as int), length(name))")
    corr = (
        orig.withColumn("pos", pos)
        .select(
            (F.col("id") + 1000000).alias("cid"),
            F.col("id").alias("true_id"),
            F.when(F.col("id") % 2 == 0, F.concat(head, tail))
            .otherwise(F.concat(head, F.lit("z"), tail))
            .alias("cname"),
        )
    )
    ot = orig.select(
        "id", "name", _trigrams("name").alias("tg")
    ).localCheckpoint(eager=False)  # posting + size + verify joins
    ct = corr.select(
        "cid", "true_id", "cname", _trigrams("cname").alias("tg")
    ).localCheckpoint(eager=False)
    oe = ot.select("id", F.explode("tg").alias("t"))
    ce = ct.select("cid", F.explode("tg").alias("t"))
    cand = (
        ce.join(oe, "t")
        .groupBy("cid", "id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    blocked = (
        cand.join(ot.select("id", F.size("tg").alias("_so")), "id")
        .join(ct.select("cid", F.size("tg").alias("_sc")), "cid")
        .filter(
            F.col("shared") >= F.least(F.col("_so"), F.col("_sc")) - 3
        )
        .select("cid", "id")
    )
    pairs = (
        blocked.join(ot.select("id", "name"), "id")
        .join(ct.select("cid", "cname"), "cid")
        .select(
            "cid",
            "id",
            F.levenshtein(F.col("cname"), F.col("name")).alias("d"),
        )
        .filter(F.col("d") <= 1)
        .localCheckpoint(eager=False)  # pair count + argmax
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cid").orderBy("d", "id")
    best = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cid", "id")
    )
    nn = F.broadcast(corr.agg(F.count(F.lit(1)).alias("n_names")))
    np_ = F.broadcast(pairs.agg(F.count(F.lit(1)).alias("n_pairs")))
    return (
        best.join(corr.select("cid", "true_id"), "cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.sum(F.when(F.col("id") == F.col("true_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
        )
        .crossJoin(nn)
        .crossJoin(np_)
        .select(
            F.col("n_names").cast("bigint").alias("n_names"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            "n_matched",
            "n_correct",
        )
    )
