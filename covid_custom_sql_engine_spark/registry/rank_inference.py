"""Rank statistics, resampling inference, and causal estimators
(round-10 continuation, split from stats_ml.py in round 11).

Nonparametric level-shift and association tests, bootstrap and
permutation resampling, stratified sampling design, the
difference-in-differences placebo, and the Mann-Whitney-identity ROC
AUC. Same conventions as every family module (see _base).
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
# Rank-based statistics
# ---------------------------------------------------------------------------


@query(
    "mann_whitney_value_shift",
    oracle="""
    WITH base AS (
      SELECT value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ga
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')),
    pv AS (SELECT v, sum(ga) AS ca, count(*) - sum(ga) AS cb,
                  count(*) AS t
           FROM base GROUP BY v),
    c AS (SELECT *,
                 sum(t) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
                 AS below
          FROM pv),
    s AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                 CAST(sum(cb) AS BIGINT) AS n_b,
                 CAST(sum(ca * (2 * below + t + 1)) AS BIGINT) AS r2x,
                 CAST(sum(t * t * t - t) AS BIGINT) AS ties
          FROM c),
    d AS (SELECT n_a, n_b, r2x, ties,
                 CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
                 CAST(n_a + n_b AS DOUBLE) AS nd
          FROM s),
    e AS (SELECT n_a, n_b,
                 CAST(r2x AS DOUBLE) / 2 - nad * (nad + 1) / 2 AS u,
                 (nad * nbd / 12.0)
                 * ((nd + 1) - CAST(ties AS DOUBLE) / (nd * (nd - 1)))
                 AS var,
                 nad, nbd
          FROM d),
    f AS (SELECT n_a, n_b, round(u, 6) AS u_stat,
                 CASE WHEN n_a > 0 AND n_b > 0 AND var > 0
                      THEN round((u - nad * nbd / 2) / sqrt(var), 6)
                 END AS z_stat
          FROM e)
    SELECT n_a, n_b, u_stat, z_stat,
           abs(z_stat) > 1.959964 AS significant
    FROM f
    """,
)
def mann_whitney_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann–Whitney U between purchase and view event values
    (selection.mann_whitney_u) — the nonparametric level-shift test for
    skewed metrics where a t-test's normality assumption is wrong, and
    the median-shift companion of the shape-sensitive `ks_drift_promo`.
    Scale shape: per-distinct-value group counts (one combinable hash
    aggregate), ONE pinned two-phase prefix-sum pass for the
    strictly-below counts (the ks_statistic discipline — never a
    single-partition window), and an exact-integer rank-sum fold:
    2·R_a = Σ ca·(2·below + t + 1) is a BIGINT, the tie term Σ(t³−t)
    likewise. U is an exact multiple of ½; z is one-row shared IEEE
    arithmetic on those integers, round(6) before the 5% verdict."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    return sel.mann_whitney_u(e, "value", "event_type", "purchase", "view")


@query(
    "rank_correlation_daily",
    oracle=f"""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS t,
                      count(*) AS x,
                      {_sql_dsum('o_totalprice')} AS y
               FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
    r AS (SELECT t, x, y,
                 rank() OVER (ORDER BY x)
                   + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
                 rank() OVER (ORDER BY y)
                   + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
          FROM d),
    s AS (SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
                 sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
                 sum(rx * ry) AS sxy
          FROM r),
    p AS (SELECT CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                               OR (a.x > b.x AND a.y > b.y)
                              THEN 1 ELSE 0 END) AS BIGINT) AS conc,
                 CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
                               OR (a.x > b.x AND a.y < b.y)
                              THEN 1 ELSE 0 END) AS BIGINT) AS disc,
                 CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT)
                   AS tie_x,
                 CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT)
                   AS tie_y,
                 count(*) AS n0
          FROM d a JOIN d b ON a.t < b.t)
    SELECT CAST(s.n AS BIGINT) AS n_days,
           round((s.n * s.sxy - s.sx * s.sy)
                 / sqrt((s.n * s.sxx - s.sx * s.sx)
                        * (s.n * s.syy - s.sy * s.sy)), 6) AS spearman_rho,
           round((p.conc - p.disc)
                 / sqrt(CAST(p.n0 - p.tie_x AS DOUBLE)
                        * CAST(p.n0 - p.tie_y AS DOUBLE)), 6)
             AS kendall_tau_b
    FROM s, p
    """,
)
def rank_correlation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman's ρ and Kendall's τ-b between daily order COUNT and
    daily order REVENUE — the monotone-association pair that survives
    outliers and nonlinearity where Pearson (safe_corr_qty_price) does
    not, and the natural "are volume and value moving together?"
    readout.  Scale shape: the fact table collapses to the
    calendar-bounded daily frame FIRST; Spearman's midranks come from
    selection.average_ranks (per-distinct-value collapse + ONE pinned
    two-phase prefix-sum each — never a global window over data rows),
    and every rank is an exact multiple of ½ so the Pearson-on-ranks
    sums are exact double arithmetic at any summation order; Kendall's
    concordant/discordant counts are a quadratic pair join over DAYS
    (the theil_sen_trend reduced-frame broadcast-cross convention),
    all-integer until the final one-row τ-b quotient.  round(6) both."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(F.to_date("o_orderdate").alias("t"), "o_totalprice")
    )
    d = o.groupBy("t").agg(
        F.count(F.lit(1)).alias("x"),
        ops.dsum(F.col("o_totalprice")).alias("y"),
    )
    d = d.localCheckpoint(eager=False)  # ranks ×2 + pair join reuse
    r = sel.average_ranks(d, "x", "rx")
    r = sel.average_ranks(r, "y", "ry")
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    a = d.select(
        F.col("t").alias("ta"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = d.select(
        F.col("t").alias("tb"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    one = F.lit(1)
    zero = F.lit(0)
    p = (
        a.join(b, F.col("ta") < F.col("tb"))
        .agg(
            F.sum(
                F.when(
                    ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
                    | (
                        (F.col("xa") > F.col("xb"))
                        & (F.col("ya") > F.col("yb"))
                    ),
                    one,
                ).otherwise(zero)
            )
            .cast("bigint")
            .alias("conc"),
            F.sum(
                F.when(
                    ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
                    | (
                        (F.col("xa") > F.col("xb"))
                        & (F.col("ya") < F.col("yb"))
                    ),
                    one,
                ).otherwise(zero)
            )
            .cast("bigint")
            .alias("disc"),
            F.sum(F.when(F.col("xa") == F.col("xb"), one).otherwise(zero))
            .cast("bigint")
            .alias("tie_x"),
            F.sum(F.when(F.col("ya") == F.col("yb"), one).otherwise(zero))
            .cast("bigint")
            .alias("tie_y"),
            F.count(one).alias("n0"),
        )
    )
    return s.crossJoin(F.broadcast(p)).select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
        F.round(
            (F.col("conc") - F.col("disc"))
            / F.sqrt(
                (F.col("n0") - F.col("tie_x")).cast("double")
                * (F.col("n0") - F.col("tie_y")).cast("double")
            ),
            6,
        ).alias("kendall_tau_b"),
    )


@query(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS t,
                      {_sql_dsum('o_totalprice')} AS y
               FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
    r AS MATERIALIZED (SELECT y, row_number() OVER (ORDER BY t) AS rk,
                              count(*) OVER () AS n
               FROM d),
    b AS (SELECT unnest(generate_series(1, 50)) AS bi),
    g AS (SELECT b.bi, r.rk AS i, max(r.n) OVER () AS n FROM b, r),
    pick AS (SELECT bi,
                    1 + ('0x' || substr(md5('boot:' || CAST(bi AS VARCHAR)
                          || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % n
                    AS idx
             FROM g),
    bm AS (SELECT pick.bi, {_sql_dsum('r.y')} / count(*) AS m
           FROM pick JOIN r ON r.rk = pick.idx GROUP BY pick.bi),
    ci AS (SELECT quantile_cont(m, 0.025) AS lo,
                  quantile_cont(m, 0.975) AS hi,
                  count(*) AS n_boot
           FROM bm),
    ob AS (SELECT count(*) AS n_days, {_sql_dsum('y')} / count(*) AS mo
           FROM d)
    SELECT CAST(ob.n_days AS BIGINT) AS n_days,
           CAST(ci.n_boot AS BIGINT) AS n_boot,
           round(ob.mo, 6) AS mean_obs,
           round(ci.lo, 6) AS ci_low,
           round(ci.hi, 6) AS ci_high
    FROM ob, ci
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric bootstrap 95% CI for the mean daily revenue with
    DETERMINISTIC md5-hash resampling (the dataset_split convention —
    reproducible under reruns and any partitioning, unlike rand()):
    50 replicates × n positions hash to day indices, each replicate
    joins the globally-ranked daily frame by index and folds its mean
    fixed-point, and the percentile CI reads off the 50-row replicate
    frame.  Scale shape: the fact table collapses to the daily frame
    first; ranking is the two-phase distributed global_rank (never a
    single-partition window over data); the B×n resample grid lives
    ONLY on the reduced frame and joins back by rank equality — at
    100 TB the grid is (replicates × days), not (replicates × rows).
    Uncertainty quantification as three hash aggregates."""
    from covid_custom_sql_engine_spark.operators.selection import global_rank

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(F.to_date("o_orderdate").alias("t"), "o_totalprice")
    )
    d = o.groupBy("t").agg(ops.dsum(F.col("o_totalprice")).alias("y"))
    d = d.localCheckpoint(eager=False)  # rank pass + observed-mean pass
    r = global_rank(d, ["t"], out_col="rk").select("y", "rk")
    r = r.localCheckpoint(eager=False)  # grid source + index-join target
    n1 = F.broadcast(r.agg(F.count(F.lit(1)).alias("n")))
    b = F.broadcast(
        spark.createDataFrame([(i,) for i in range(1, 51)], "bi int")
    )
    g = r.select(F.col("rk").alias("i")).crossJoin(b).crossJoin(n1)
    pick = g.select(
        "bi",
        (
            1
            + F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("boot:"),
                            F.col("bi").cast("string"),
                            F.lit(":"),
                            F.col("i").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % F.col("n")
        ).alias("idx"),
    )
    bm = pick.join(r, r["rk"] == pick["idx"]).groupBy("bi").agg(
        (ops.dsum(F.col("y")) / F.count(F.lit(1))).alias("m")
    )
    ci = bm.agg(
        F.expr("percentile(m, 0.025)").alias("lo"),
        F.expr("percentile(m, 0.975)").alias("hi"),
        F.count(F.lit(1)).alias("n_boot"),
    )
    ob = d.agg(
        F.count(F.lit(1)).alias("n_days"),
        (ops.dsum(F.col("y")) / F.count(F.lit(1))).alias("mo"),
    )
    return ob.crossJoin(F.broadcast(ci)).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("n_boot").cast("bigint").alias("n_boot"),
        F.round(F.col("mo"), 6).alias("mean_obs"),
        F.round(F.col("lo"), 6).alias("ci_low"),
        F.round(F.col("hi"), 6).alias("ci_high"),
    )


@query(
    "permutation_test_weekend",
    oracle=f"""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS t,
                      {_sql_dsum('o_totalprice')} AS y,
                      isodow(CAST(o_orderdate AS DATE)) >= 6 AS is_we
               FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
    ob AS (SELECT count(*) AS n_days,
                  CAST(sum(CASE WHEN is_we THEN 1 ELSE 0 END) AS BIGINT) AS n_we,
                  abs({_sql_dsum('CASE WHEN is_we THEN y END')}
                        / sum(CASE WHEN is_we THEN 1 END)
                      - {_sql_dsum('CASE WHEN NOT is_we THEN y END')}
                        / sum(CASE WHEN NOT is_we THEN 1 END)) AS obs
           FROM d),
    b AS (SELECT unnest(generate_series(1, 99)) AS bi),
    g AS (SELECT b.bi, d.t, d.y,
                 ('0x' || substr(md5('perm:' || CAST(b.bi AS VARCHAR)
                    || ':' || strftime(d.t, '%Y-%m-%d')), 1, 15))::BIGINT AS h
          FROM b, d),
    r AS (SELECT bi, y,
                 row_number() OVER (PARTITION BY bi ORDER BY h, t) AS rk
          FROM g),
    pm AS (SELECT r.bi,
                  abs({_sql_dsum('CASE WHEN r.rk <= ob.n_we THEN r.y END')}
                        / sum(CASE WHEN r.rk <= ob.n_we THEN 1 END)
                      - {_sql_dsum('CASE WHEN r.rk > ob.n_we THEN r.y END')}
                        / sum(CASE WHEN r.rk > ob.n_we THEN 1 END)) AS diff
           FROM r, ob GROUP BY r.bi),
    pv AS (SELECT count(*) AS n_perm,
                  CAST(sum(CASE WHEN pm.diff >= ob.mx THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_ge
           FROM pm, (SELECT max(obs) AS mx FROM ob) ob)
    SELECT CAST(ob.n_days AS BIGINT) AS n_days, ob.n_we AS n_weekend,
           round(ob.obs, 6) AS obs_diff,
           round((1.0 + pv.n_ge) / (pv.n_perm + 1), 6) AS p_value
    FROM ob, pv
    """,
)
def permutation_test_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-label PERMUTATION test for a weekend effect on daily
    revenue: the observed |weekend mean − weekday mean| is compared
    against 99 deterministic md5-keyed permutations of the weekend
    labels over the SAME days (each permutation preserves the exact
    group sizes — a true relabeling, not a bootstrap), p = (1+#≥)/(B+1)
    — the assumption-free significance companion of
    `mann_whitney_value_shift` for the designed two-group question.
    Scale shape: the fact table collapses to the calendar-bounded
    daily frame first; the 99× grid and its per-replicate ranking
    windows live ONLY on that reduced frame (99 bounded partitions);
    all means fold fixed-point, so cross-engine the diff/threshold
    comparisons see identical bits.  Deterministic under any
    partitioning; round(6) on the reported statistic and p."""
    from pyspark.sql import Window

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(F.to_date("o_orderdate").alias("t"), "o_totalprice")
    )
    d = o.groupBy("t").agg(ops.dsum(F.col("o_totalprice")).alias("y"))
    d = d.select(
        "t", "y", ((F.weekday("t") + 1) >= 6).alias("is_we")
    ).localCheckpoint(eager=False)  # observed stat + 99x grid
    we_y = F.when(F.col("is_we"), F.col("y"))
    wd_y = F.when(~F.col("is_we"), F.col("y"))
    ob = d.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(F.col("is_we"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_we"),
        F.abs(
            ops.dsum(we_y) / F.sum(F.when(F.col("is_we"), 1))
            - ops.dsum(wd_y) / F.sum(F.when(~F.col("is_we"), 1))
        ).alias("obs"),
    )
    b = F.broadcast(
        spark.createDataFrame([(i,) for i in range(1, 100)], "bi int")
    )
    g = d.crossJoin(b).select(
        "bi",
        "t",
        "y",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("perm:"),
                        F.col("bi").cast("string"),
                        F.lit(":"),
                        F.date_format("t", "yyyy-MM-dd"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    w = Window.partitionBy("bi").orderBy("h", "t")
    r = g.withColumn("rk", F.row_number().over(w)).select("bi", "y", "rk")
    a_y = F.when(F.col("rk") <= F.col("n_we"), F.col("y"))
    b_y = F.when(F.col("rk") > F.col("n_we"), F.col("y"))
    pm = (
        r.crossJoin(F.broadcast(ob.select("n_we")))
        .groupBy("bi")
        .agg(
            F.abs(
                ops.dsum(a_y) / F.sum(F.when(F.col("rk") <= F.col("n_we"), 1))
                - ops.dsum(b_y) / F.sum(F.when(F.col("rk") > F.col("n_we"), 1))
            ).alias("diff")
        )
    )
    pv = pm.crossJoin(F.broadcast(ob.select("obs"))).agg(
        F.count(F.lit(1)).alias("n_perm"),
        F.sum(F.when(F.col("diff") >= F.col("obs"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_ge"),
    )
    return ob.crossJoin(F.broadcast(pv)).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("n_we").alias("n_weekend"),
        F.round(F.col("obs"), 6).alias("obs_diff"),
        F.round((1.0 + F.col("n_ge")) / (F.col("n_perm") + 1), 6).alias(
            "p_value"
        ),
    )


@query(
    "neyman_poisson_sample",
    oracle=f"""
    WITH e AS (SELECT event_id, event_type AS h, value AS v FROM events
               WHERE value IS NOT NULL),
    st AS (SELECT h, count(*) AS nh,
                  {_sql_dsum('v')} / count(*) AS mean_h,
                  round(sqrt(greatest(
                      (count(*) * {_sql_dsum('v * v')}
                       - {_sql_dsum('v')} * {_sql_dsum('v')})
                      / (count(*) * (count(*) - 1.0)), 0.0)), 6) AS sh
           FROM e GROUP BY h),
    tot AS (SELECT {_sql_dsum12('nh * sh')} AS denom FROM st),
    al AS (SELECT st.h, st.nh, st.sh, st.mean_h,
                  least(500.0 * st.nh * st.sh / tot.denom / st.nh, 1.0)
                    AS rate
           FROM st, tot),
    sm AS (SELECT al.h,
                  count(*) AS n_sampled,
                  {_sql_dsum('e.v')} / count(*) AS est_mean
           FROM e JOIN al ON al.h = e.h
           WHERE ('0x' || substr(md5('ney:' || CAST(e.event_id AS VARCHAR)), 1, 15))::BIGINT
                 % 1000000 < al.rate * 1000000
           GROUP BY al.h)
    SELECT al.h AS stratum,
           CAST(al.nh AS BIGINT) AS n_stratum,
           al.sh AS std_h,
           round(al.rate, 6) AS rate,
           CAST(sm.n_sampled AS BIGINT) AS n_sampled,
           round(sm.est_mean, 6) AS est_mean,
           round(al.mean_h, 6) AS true_mean
    FROM al JOIN sm ON sm.h = al.h
    """,
)
def neyman_poisson_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-ALLOCATED Poisson sampling: per-stratum inclusion rates
    proportional to N_h·S_h (the variance-optimal survey allocation
    for a fixed total budget of 500), realized as deterministic
    md5-hash Bernoulli draws — every row decides its own membership
    map-side, no per-stratum ranking or sort, which is what makes the
    design scale where exact-n_h sampling needs a two-phase rank (the
    quota_sample path).  Reports the allocation and the sampled-vs-
    true stratum means so the estimator audit rides along.  Stratum
    std uses the deterministic round(6) formula; rate comparisons are
    exact integer-vs-scaled-rate; round(6) outputs."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", F.col("event_type").alias("h"), F.col("value").alias("v"))
    )
    e = e.localCheckpoint(eager=False)  # stats pass + sampling pass
    n = F.count(F.lit(1))
    sv, svv = ops.dsum(F.col("v")), ops.dsum(F.col("v") * F.col("v"))
    st = e.groupBy("h").agg(
        n.alias("nh"),
        (sv / n).alias("mean_h"),
        F.round(
            F.sqrt(
                F.greatest(
                    (n * svv - sv * sv) / (n * (n - F.lit(1.0))),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("sh"),
    )
    tot = F.broadcast(
        st.agg(ops.dsum12(F.col("nh") * F.col("sh")).alias("denom"))
    )
    al = st.crossJoin(tot).select(
        "h",
        "nh",
        "sh",
        "mean_h",
        F.least(
            F.lit(500.0) * F.col("nh") * F.col("sh") / F.col("denom") / F.col("nh"),
            F.lit(1.0),
        ).alias("rate"),
    )
    alb = F.broadcast(
        al.select(
            F.col("h").alias("_ah"), F.col("rate").alias("_rate")
        )
    )
    hash_u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ney:"), F.col("event_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    sm = (
        e.join(alb, F.col("_ah") == F.col("h"))
        .filter(hash_u < F.col("_rate") * 1000000)
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            (ops.dsum(F.col("v")) / F.count(F.lit(1))).alias("est_mean"),
        )
    )
    return al.join(sm, "h").select(
        F.col("h").alias("stratum"),
        F.col("nh").cast("bigint").alias("n_stratum"),
        F.col("sh").alias("std_h"),
        F.round(F.col("rate"), 6).alias("rate"),
        F.col("n_sampled").cast("bigint").alias("n_sampled"),
        F.round(F.col("est_mean"), 6).alias("est_mean"),
        F.round(F.col("mean_h"), 6).alias("true_mean"),
    )


# ---------------------------------------------------------------------------
# Causal inference, graph statistics, and feature engineering
# ---------------------------------------------------------------------------


@query(
    "did_estimator",
    oracle=f"""
    WITH m AS (SELECT min(ts) AS a, max(ts) AS b FROM events),
    e AS (SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat,
                 CASE WHEN ts >= m.a + to_microseconds(
                        date_diff('microsecond', m.a, m.b) // 2)
                      THEN 1 ELSE 0 END AS post,
                 value AS v
          FROM events, m WHERE value IS NOT NULL),
    g AS (SELECT treat, post, count(*) AS n,
                 {_sql_dsum('v')} / count(*) AS mu
          FROM e GROUP BY 1, 2),
    w AS (SELECT max(CASE WHEN treat = 1 AND post = 1 THEN mu END) AS tp,
                 max(CASE WHEN treat = 1 AND post = 0 THEN mu END) AS tq,
                 max(CASE WHEN treat = 0 AND post = 1 THEN mu END) AS cp,
                 max(CASE WHEN treat = 0 AND post = 0 THEN mu END) AS cq,
                 CAST(sum(n) AS BIGINT) AS n_rows
          FROM g)
    SELECT n_rows,
           round(tp - tq, 6) AS delta_treated,
           round(cp - cq, 6) AS delta_control,
           round((tp - tq) - (cp - cq), 6) AS did
    FROM w
    """,
)
def did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences point estimate on an id-parity
    treatment split with a calendar-midpoint pre/post boundary — the
    workhorse quasi-experimental estimator: the treated group's
    pre→post change minus the control group's, which nets out any
    common time trend.  On synthetic data with a placebo treatment the
    estimate should hover near zero — the standard DiD placebo check,
    the causal sibling of `ab_ztest_conversion`'s A/A discipline.
    Scale shape: ONE hash aggregate over (treat × post) after a 1-row
    broadcast min/max for the boundary; the 2×2 pivot and the
    estimate are one-row arithmetic.  Fixed-point means; round(6)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    m = F.broadcast(e.agg(F.min("ts").alias("a"), F.max("ts").alias("b")))
    x = e.crossJoin(m).select(
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("treat"),
        F.when(
            F.col("ts")
            >= F.expr(
                "timestampadd(MICROSECOND,"
                " CAST(timestampdiff(MICROSECOND, a, b) / 2 AS BIGINT), a)"
            ),
            1,
        )
        .otherwise(0)
        .alias("post"),
        F.col("value").alias("v"),
    )
    g = x.groupBy("treat", "post").agg(
        F.count(F.lit(1)).alias("n"),
        (ops.dsum(F.col("v")) / F.count(F.lit(1))).alias("mu"),
    )
    w = g.agg(
        F.max(F.when((F.col("treat") == 1) & (F.col("post") == 1), F.col("mu"))).alias("tp"),
        F.max(F.when((F.col("treat") == 1) & (F.col("post") == 0), F.col("mu"))).alias("tq"),
        F.max(F.when((F.col("treat") == 0) & (F.col("post") == 1), F.col("mu"))).alias("cp"),
        F.max(F.when((F.col("treat") == 0) & (F.col("post") == 0), F.col("mu"))).alias("cq"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    return w.select(
        "n_rows",
        F.round(F.col("tp") - F.col("tq"), 6).alias("delta_treated"),
        F.round(F.col("cp") - F.col("cq"), 6).alias("delta_control"),
        F.round(
            (F.col("tp") - F.col("tq")) - (F.col("cp") - F.col("cq")), 6
        ).alias("did"),
    )


@query(
    "auc_return_score",
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
    pv AS (SELECT p AS v, sum(y) AS ca, count(*) - sum(y) AS cb,
                  count(*) AS t
           FROM sc GROUP BY p),
    c AS (SELECT *,
                 sum(t) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
                 AS below
          FROM pv),
    s AS (SELECT CAST(sum(ca) AS BIGINT) AS n_pos,
                 CAST(sum(cb) AS BIGINT) AS n_neg,
                 CAST(sum(ca * (2 * below + t + 1)) AS BIGINT) AS r2x
          FROM c)
    SELECT n_pos, n_neg,
           round((CAST(r2x AS DOUBLE) / 2
                  - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2)
                 / (CAST(n_pos AS DOUBLE) * n_neg), 6) AS auc
    FROM s
    """,
)
def auc_return_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the leakage-free `target_encode_oof` score as a
    return-probability ranker, computed EXACTLY via the Mann–Whitney
    identity AUC = U/(n₊·n₋) on the same pinned prefix-sum rank-sum
    machinery as `mann_whitney_value_shift` (selection.mann_whitney_u's
    midrank arithmetic handles the heavy score ties a 25-brand encoder
    produces — ties count ½, the textbook AUC convention).  Closes the
    ML-evaluation family: train accuracy (`logistic_newton`),
    reliability + Brier (`calibration_report`), and now
    threshold-free ranking quality.  All-integer rank sums; one final
    one-row quotient; round(6)."""
    from covid_custom_sql_engine_spark.operators import selection as sel

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
    x = x.localCheckpoint(eager=False)  # encoding + scoring passes
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
    ).select(
        F.col("p").alias("score"),
        F.when(F.col("y") == 1, F.lit("pos")).otherwise(F.lit("neg")).alias(
            "cls"
        ),
    )
    mw = sel.mann_whitney_u(sc, "score", "cls", "pos", "neg")
    return mw.select(
        F.col("n_a").alias("n_pos"),
        F.col("n_b").alias("n_neg"),
        F.round(
            F.col("u_stat")
            / (F.col("n_a").cast("double") * F.col("n_b")),
            6,
        ).alias("auc"),
    )
