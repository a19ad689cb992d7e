"""Round-10 continuation — rank statistics, time-series diagnostics,
and closed-form ML-as-SQL query families.

Same conventions as every family module (see _base): identical aliases
both sides, deterministic fixed-point folds for double sums, round(6)
on computed doubles, reduced-frame justification documented wherever a
quadratic pair join or broadcast cross appears.
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


# ---------------------------------------------------------------------------
# Time-series diagnostics on the zero-filled daily revenue spine
# ---------------------------------------------------------------------------

_ACF_LAGS = [1, 2, 7, 14, 28]

_SQL_DAILY_SPINE = f"""
    d0 AS (SELECT CAST(o_orderdate AS DATE) AS t,
                  {_sql_dsum('o_totalprice')} AS y
           FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
    m AS (SELECT min(t) AS a, max(t) AS b FROM d0),
    sp AS (SELECT unnest(generate_series(a, b, INTERVAL 1 DAY))::DATE AS d
           FROM m),
    s AS (SELECT sp.d, coalesce(d0.y, 0.0) AS y
          FROM sp LEFT JOIN d0 ON d0.t = sp.d)
"""


@query(
    "acf_daily_revenue",
    oracle=f"""
    WITH {_SQL_DAILY_SPINE},
    g AS (SELECT count(*) AS n, {_sql_dsum('y')} AS sy FROM s),
    mu AS (SELECT sy / n AS ybar FROM g),
    den AS (SELECT {_sql_dsum('(s.y - mu.ybar) * (s.y - mu.ybar)')} AS d2
            FROM s, mu),
    lags AS (SELECT unnest([{", ".join(str(k) for k in _ACF_LAGS)}]) AS lag),
    num AS (SELECT l.lag,
                   count(*) AS n_pairs,
                   {_sql_dsum(
                       '(s1.y - mu.ybar) * (s2.y - mu.ybar)'
                   )} AS nk
            FROM s s1
            CROSS JOIN lags l
            JOIN s s2 ON s2.d = s1.d + l.lag * INTERVAL 1 DAY
            CROSS JOIN mu
            GROUP BY l.lag)
    SELECT CAST(num.lag AS BIGINT) AS lag,
           CAST(num.n_pairs AS BIGINT) AS n_pairs,
           round(num.nk / den.d2, 6) AS acf
    FROM num, den
    """,
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily order revenue at lags
    {1, 2, 7, 14, 28} on the ZERO-FILLED calendar spine — the
    periodicity diagnostic that motivates (and validates) the DFT scan
    in `dominant_period_dft`: a weekly cycle surfaces as elevated
    r(7)/r(14)/r(28).  Scale shape: the fact table collapses to the
    daily frame first; the spine is one sequence-explode off a 1-row
    min/max aggregate; each lag's numerator is ONE equi-join of the
    spine against itself shifted by the broadcast 5-row lag table —
    no window, no per-lag rescan of the fact table.  Sums of products
    fold fixed-point (dsum) so the quotient is bit-identical
    cross-engine; round(6)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(F.to_date("o_orderdate").alias("t"), "o_totalprice")
    )
    d0 = o.groupBy("t").agg(ops.dsum(F.col("o_totalprice")).alias("y"))
    m = d0.agg(F.min("t").alias("a"), F.max("t").alias("b"))
    sp = m.select(F.explode(F.sequence("a", "b")).alias("d"))
    s = (
        sp.join(d0, sp["d"] == d0["t"], "left")
        .select("d", F.coalesce(F.col("y"), F.lit(0.0)).alias("y"))
        .localCheckpoint(eager=False)  # reused by mean, denom, both join sides
    )
    g = s.agg(F.count(F.lit(1)).alias("n"), ops.dsum(F.col("y")).alias("sy"))
    mu = F.broadcast(g.select((F.col("sy") / F.col("n")).alias("ybar")))
    den = (
        s.crossJoin(mu)
        .agg(
            ops.dsum(
                (F.col("y") - F.col("ybar")) * (F.col("y") - F.col("ybar"))
            ).alias("d2")
        )
    )
    lags = F.broadcast(
        spark.createDataFrame([(k,) for k in _ACF_LAGS], "lag int")
    )
    s1 = s.select(F.col("d").alias("d1"), F.col("y").alias("y1"))
    s2 = s.select(F.col("d").alias("d2x"), F.col("y").alias("y2"))
    num = (
        s1.crossJoin(lags)
        .join(s2, F.date_add(F.col("d1"), F.col("lag")) == F.col("d2x"))
        .crossJoin(mu)
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            ops.dsum(
                (F.col("y1") - F.col("ybar")) * (F.col("y2") - F.col("ybar"))
            ).alias("nk"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round(F.col("nk") / F.col("d2"), 6).alias("acf"),
    )


@query(
    "seasonal_dow_decompose",
    oracle=f"""
    WITH {_SQL_DAILY_SPINE},
    offs AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS o),
    tr AS (SELECT s1.d, {_sql_dsum('s2.y')} / 7 AS trend
           FROM s s1
           CROSS JOIN offs
           JOIN s s2 ON s2.d = s1.d + offs.o * INTERVAL 1 DAY
           GROUP BY s1.d
           HAVING count(*) = 7),
    det AS (SELECT s.d, s.y - tr.trend AS detr
            FROM s JOIN tr ON tr.d = s.d),
    raw AS (SELECT isodow(d) AS dow, count(*) AS n_days,
                   {_sql_dsum('detr')} / count(*) AS raw_idx
            FROM det GROUP BY 1),
    gm AS (SELECT {_sql_dsum('raw_idx')} / count(*) AS mean_raw FROM raw)
    SELECT CAST(raw.dow AS BIGINT) AS dow,
           CAST(raw.n_days AS BIGINT) AS n_days,
           round(raw.raw_idx - gm.mean_raw, 6) AS seasonal_idx
    FROM raw, gm
    """,
)
def seasonal_dow_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue,
    day-of-week component: centered 7-day moving-average trend
    (interior days only — exactly the textbook construction), detrend,
    average the residual per ISO day-of-week, and normalize the seven
    indices to mean zero so they read as pure ± revenue effects.  The
    de-seasonalization companion of `seasonal_baseline` (hour-of-day
    anomalies) and the structural readout behind `acf_daily_revenue`'s
    weekly peaks.  Scale shape: everything runs on the reduced daily
    spine; the centered MA is ONE equi-join against the broadcast 7-row
    offset table with a count-7 gate (no global ordered window); the
    seven-row index frame folds fixed-point and the grand-mean
    adjustment is a 1-row broadcast.  ISO dow (1=Mon) on both engines;
    round(6)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(F.to_date("o_orderdate").alias("t"), "o_totalprice")
    )
    d0 = o.groupBy("t").agg(ops.dsum(F.col("o_totalprice")).alias("y"))
    m = d0.agg(F.min("t").alias("a"), F.max("t").alias("b"))
    sp = m.select(F.explode(F.sequence("a", "b")).alias("d"))
    s = (
        sp.join(d0, sp["d"] == d0["t"], "left")
        .select("d", F.coalesce(F.col("y"), F.lit(0.0)).alias("y"))
        .localCheckpoint(eager=False)  # MA join (both sides) + detrend reuse
    )
    offs = F.broadcast(
        spark.createDataFrame([(i,) for i in range(-3, 4)], "o int")
    )
    s1 = s.select(F.col("d").alias("d1"))
    s2 = s.select(F.col("d").alias("d2x"), F.col("y").alias("y2"))
    tr = (
        s1.crossJoin(offs)
        .join(s2, F.date_add(F.col("d1"), F.col("o")) == F.col("d2x"))
        .groupBy("d1")
        .agg(
            F.count(F.lit(1)).alias("_k"),
            (ops.dsum(F.col("y2")) / 7).alias("trend"),
        )
        .filter(F.col("_k") == 7)
    )
    det = s.join(tr, s["d"] == tr["d1"]).select(
        "d", (F.col("y") - F.col("trend")).alias("detr")
    )
    raw = det.groupBy((F.weekday("d") + 1).alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"),
        (ops.dsum(F.col("detr")) / F.count(F.lit(1))).alias("raw_idx"),
    )
    gm = F.broadcast(
        raw.agg(
            (ops.dsum(F.col("raw_idx")) / F.count(F.lit(1))).alias("mean_raw")
        )
    )
    return raw.crossJoin(gm).select(
        F.col("dow").cast("bigint").alias("dow"),
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(F.col("raw_idx") - F.col("mean_raw"), 6).alias("seasonal_idx"),
    )


# ---------------------------------------------------------------------------
# Closed-form / compositional ML-as-SQL
# ---------------------------------------------------------------------------

# Shared expression text (verbatim on both engines — identical IEEE
# opcode order, the MMR/Markov discipline) for the ridge closed form.
_RIDGE_LAM = "10.0"
_RIDGE_DET = (
    f"((s11 + {_RIDGE_LAM}) * (s22 + {_RIDGE_LAM}) - s12 * s12)"
)
_RIDGE_B1 = f"((s1y * (s22 + {_RIDGE_LAM}) - s12 * s2y) / {_RIDGE_DET})"
_RIDGE_B2 = f"(((s11 + {_RIDGE_LAM}) * s2y - s12 * s1y) / {_RIDGE_DET})"
_RIDGE_B0 = "(my - b1 * m1 - b2 * m2)"
_RIDGE_SSE = (
    "(syy - 2 * b1 * s1y - 2 * b2 * s2y"
    " + b1 * b1 * s11 + 2 * b1 * b2 * s12 + b2 * b2 * s22)"
)


@query(
    "ridge_regression_price",
    oracle=f"""
    WITH m AS (SELECT count(*) AS n,
                      {_sql_dsum('l_quantity')} / count(*) AS m1,
                      {_sql_dsum('l_discount')} / count(*) AS m2,
                      {_sql_dsum('l_extendedprice')} / count(*) AS my
               FROM lineitem),
    s AS (SELECT n, m1, m2, my,
                 {_sql_dsum12('(l_quantity - m1) * (l_quantity - m1)')} AS s11,
                 {_sql_dsum12('(l_quantity - m1) * (l_discount - m2)')} AS s12,
                 {_sql_dsum12('(l_discount - m2) * (l_discount - m2)')} AS s22,
                 {_sql_dsum12('(l_quantity - m1) * (l_extendedprice - my)')} AS s1y,
                 {_sql_dsum12('(l_discount - m2) * (l_extendedprice - my)')} AS s2y,
                 {_sql_dsum12('(l_extendedprice - my) * (l_extendedprice - my)')} AS syy
          FROM lineitem, m
          GROUP BY n, m1, m2, my),
    b AS (SELECT *, {_RIDGE_B1} AS b1, {_RIDGE_B2} AS b2 FROM s),
    o AS (SELECT *, {_RIDGE_B0} AS b0, {_RIDGE_SSE} AS sse FROM b)
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(b1, 6) AS beta_quantity,
           round(b2, 6) AS beta_discount,
           round(b0, 6) AS intercept,
           round(1 - sse / syy, 6) AS r2
    FROM o
    """,
)
def ridge_regression_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form 2-feature RIDGE regression of extended price on
    quantity and discount (λ = 10): centered normal equations solved by
    Cramer's rule — the multivariate upgrade of the per-group OLS in
    `ols_trend_by_type`, with the L2 term that keeps the solve stable
    when features correlate.  Scale shape: two combinable full-scan
    aggregates (means, then centered second moments against the 1-row
    broadcast means) and a one-row solve — model fitting at 100 TB as
    exactly two distributed passes, no gradient loop, no driver-side
    matrix library.  The centered two-pass sums avoid the n·Σx²−(Σx)²
    cancellation; every fold is fixed-point, and the solve/SSE
    arithmetic is ONE shared expression string evaluated verbatim by
    both engines (the MMR/Markov determinism discipline), so the
    coefficients are bit-identical before the final round(6)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    )
    n = F.count(F.lit(1))
    m = li.agg(
        n.alias("n"),
        (ops.dsum(F.col("l_quantity")) / n).alias("m1"),
        (ops.dsum(F.col("l_discount")) / n).alias("m2"),
        (ops.dsum(F.col("l_extendedprice")) / n).alias("my"),
    )
    c = li.crossJoin(F.broadcast(m))
    s = c.groupBy("n", "m1", "m2", "my").agg(
        ops.dsum12(
            (F.col("l_quantity") - F.col("m1"))
            * (F.col("l_quantity") - F.col("m1"))
        ).alias("s11"),
        ops.dsum12(
            (F.col("l_quantity") - F.col("m1"))
            * (F.col("l_discount") - F.col("m2"))
        ).alias("s12"),
        ops.dsum12(
            (F.col("l_discount") - F.col("m2"))
            * (F.col("l_discount") - F.col("m2"))
        ).alias("s22"),
        ops.dsum12(
            (F.col("l_quantity") - F.col("m1"))
            * (F.col("l_extendedprice") - F.col("my"))
        ).alias("s1y"),
        ops.dsum12(
            (F.col("l_discount") - F.col("m2"))
            * (F.col("l_extendedprice") - F.col("my"))
        ).alias("s2y"),
        ops.dsum12(
            (F.col("l_extendedprice") - F.col("my"))
            * (F.col("l_extendedprice") - F.col("my"))
        ).alias("syy"),
    )
    b = s.withColumn("b1", F.expr(_RIDGE_B1)).withColumn(
        "b2", F.expr(_RIDGE_B2)
    )
    o = b.withColumn("b0", F.expr(_RIDGE_B0)).withColumn(
        "sse", F.expr(_RIDGE_SSE)
    )
    return o.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("b1"), 6).alias("beta_quantity"),
        F.round(F.col("b2"), 6).alias("beta_discount"),
        F.round(F.col("b0"), 6).alias("intercept"),
        F.round(F.expr("1 - sse / syy"), 6).alias("r2"),
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


# ---------------------------------------------------------------------------
# Graph: shortest-path counting and k-truss cohesion
# ---------------------------------------------------------------------------


@query(
    "bfs_path_counts",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    walks AS (
      SELECT 'c:' || c_custkey AS node, 0 AS d
      FROM customer WHERE c_custkey <= 3
      UNION ALL
      SELECT e.dst, w.d + 1
      FROM walks w JOIN edges e ON e.src = w.node
      WHERE w.d < 3),
    md AS (SELECT node, min(d) AS dist FROM walks GROUP BY node)
    SELECT w.node, CAST(md.dist AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM walks w JOIN md ON md.node = w.node AND w.d = md.dist
    GROUP BY w.node, md.dist
    """,
)
def bfs_path_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-path COUNTS from the seed customers over the trading
    graph (graph.bfs_path_counts) — bfs_distances upgraded with Brandes'
    σ DP: how MANY minimum-hop routes reach each node, the
    reachable-vs-robustly-reachable distinction and the betweenness
    building block.  Same per-level join + combinable σ-sum + anti-join
    discipline as bfs_layers (eager-pinned state, fixed depth 3, empty-
    frontier early exit).  The oracle counts bounded walks at each
    node's minimal depth — provably equal to σ because a length-dist(v)
    walk cannot contain a non-shortest prefix.  All integers — exact."""
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
    return gr.bfs_path_counts(edges, srcs, max_depth=3)


def _ktruss_oracle(k: int, rounds: int) -> str:
    """Unrolled k-truss rounds (the kcore/label_propagation generated-
    oracle convention): each round recomputes per-edge triangle support
    over the surviving edges and keeps support ≥ k−2."""
    parts = [
        """
    e_0 AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY pa, pb HAVING count(*) >= 2
    )"""
    ]
    for r in range(rounds):
        parts.append(
            f"""
    a_{r} AS MATERIALIZED (SELECT pa AS x, pb AS y FROM e_{r}
              UNION ALL SELECT pb, pa FROM e_{r}),
    s_{r} AS MATERIALIZED (SELECT e.pa, e.pb, count(*) AS sup
              FROM e_{r} e
              JOIN a_{r} w1 ON w1.x = e.pa
              JOIN a_{r} w2 ON w2.x = e.pb AND w2.y = w1.y
              GROUP BY e.pa, e.pb),
    e_{r + 1} AS MATERIALIZED (SELECT e.pa, e.pb FROM e_{r} e
                  JOIN s_{r} s ON s.pa = e.pa AND s.pb = e.pb
                  WHERE s.sup >= {k - 2})"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CAST(pa AS BIGINT) AS src, CAST(pb AS BIGINT) AS dst
    FROM e_{rounds}
    """
    )


@query("ktruss_copurchase", oracle=_ktruss_oracle(3, 3))
def ktruss_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 3-truss peeling (graph.ktruss_edges, 3 rounds) of the
    part co-purchase graph — every surviving edge sits in ≥ 1 triangle
    among survivors, the edge-level cohesion screen that is strictly
    stronger than `kcore_trading_graph`'s degree test and the standard
    community-backbone extraction (`triangle_counts`' graph, upgraded
    from counting to peeling).  Per round ONE wedge join over the
    shrinking edge frame + a combinable support count + an inner join
    back; state eagerly pinned per round; the oracle unrolls the
    identical rounds.  All-integer — exact."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("ea"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("eb")
    )
    edges = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("ea") < F.col("eb")))
        .groupBy(F.col("ea").alias("src"), F.col("eb").alias("dst"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("src", "dst")
    )
    out = gr.ktruss_edges(edges, k=3, rounds=3)
    return out.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )


# ---------------------------------------------------------------------------
# Spatial blocking join and pseudo-relevance-feedback retrieval
# ---------------------------------------------------------------------------

# Shared float-sensitive expression text (verbatim both engines).
_SP_D2 = (
    "((lat_a - lat_b) * (lat_a - lat_b)"
    " + (lon_a - lon_b) * (lon_a - lon_b))"
)

_SP_COORDS_SQL = """
    pts AS (SELECT c_custkey AS ck,
                   ('0x' || substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                     % 1200000 / 10000.0 - 60 AS lat,
                   ('0x' || substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                     % 3600000 / 10000.0 - 180 AS lon
            FROM customer)
"""


@query(
    "spatial_grid_join",
    oracle=f"""
    WITH {_SP_COORDS_SQL},
    cells AS (SELECT ck, lat, lon,
                     CAST(floor(lon) AS BIGINT) AS cx,
                     CAST(floor(lat) AS BIGINT) AS cy
              FROM pts),
    offs AS (SELECT a.dx, b.dy
             FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
                  (SELECT unnest([-1, 0, 1]) AS dy) b),
    repl AS (SELECT ck AS ck_a, lat AS lat_a, lon AS lon_a,
                    cx + dx AS jx, cy + dy AS jy
             FROM cells CROSS JOIN offs),
    cand AS (SELECT r.ck_a, r.lat_a, r.lon_a,
                    c.ck AS ck_b, c.lat AS lat_b, c.lon AS lon_b
             FROM repl r JOIN cells c ON c.cx = r.jx AND c.cy = r.jy
             WHERE r.ck_a < c.ck)
    SELECT CAST(ck_a AS BIGINT) AS cust_a, CAST(ck_b AS BIGINT) AS cust_b,
           round(sqrt({_SP_D2}), 6) AS dist_deg
    FROM cand
    WHERE {_SP_D2} <= 1.0
    """,
)
def spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join by GRID BLOCKING: deterministic synthetic
    coordinates per customer (md5-hash arithmetic — the dataset_split
    convention, identical on both engines), 1°×1° grid cells, each
    point replicated to its 3×3 neighborhood so every ≤1°-radius pair
    co-locates in at least one cell, then the exact planar-degree
    distance filter keeps true neighbors — the classic distributed
    spatial-join shape (replicate-left, partition-right equi-join on
    the cell key; never an all-pairs cross).  At 100 TB the cell key IS
    the shuffle/bucketing key and the 9× replication is the bounded
    price of single-pass blocking; skewed cells (cities) ride AQE's
    skew-join split.  Pair dedup by ck_a < ck_b keeps each unordered
    pair exactly once (a pair is found in the left point's replica cell
    that contains the right point, and the mirrored candidate fails the
    id inequality).  Distance arithmetic is ONE shared expression
    string; coordinates are md5-derived exact integers / 1e4 — bit-
    identical cross-engine; round(6) on the reported distance."""
    ck = F.col("c_custkey").cast("string")

    def h(salt: str) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), ck)), 1, 15), 16, 10
        ).cast("bigint")

    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        (h("lat:") % 1200000 / 10000.0 - 60).alias("lat"),
        (h("lon:") % 3600000 / 10000.0 - 180).alias("lon"),
    )
    cells = pts.select(
        "ck",
        "lat",
        "lon",
        F.floor("lon").cast("bigint").alias("cx"),
        F.floor("lat").cast("bigint").alias("cy"),
    ).localCheckpoint(eager=False)  # both join sides
    offs = F.broadcast(
        spark.createDataFrame(
            [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
            "dx int, dy int",
        )
    )
    repl = cells.crossJoin(offs).select(
        F.col("ck").alias("ck_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    right = cells.select(
        F.col("ck").alias("ck_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
    )
    cand = repl.join(
        right,
        (F.col("bx") == F.col("jx"))
        & (F.col("by") == F.col("jy"))
        & (F.col("ck_a") < F.col("ck_b")),
    )
    return cand.filter(F.expr(_SP_D2) <= 1.0).select(
        F.col("ck_a").cast("bigint").alias("cust_a"),
        F.col("ck_b").cast("bigint").alias("cust_b"),
        F.round(F.sqrt(F.expr(_SP_D2)), 6).alias("dist_deg"),
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
    r1 = tx.bm25_topk(d, qdf, k=3)
    tk = d.select("doc_id", tx.tokens("text").alias("_tk"))
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
    r2 = tx.bm25_topk(d, q2, k=5)
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


@query(
    "seed_betweenness",
    oracle="""
    WITH RECURSIVE pairs AS MATERIALIZED (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    walks AS (
      SELECT 'c:' || c_custkey AS node, 0 AS d
      FROM customer WHERE c_custkey <= 3
      UNION ALL
      SELECT e.dst, w.d + 1
      FROM walks w JOIN edges e ON e.src = w.node
      WHERE w.d < 3),
    md AS MATERIALIZED (SELECT node, min(d) AS dist FROM walks GROUP BY node),
    sig AS MATERIALIZED (
      SELECT w.node, md.dist, count(*) AS np
      FROM walks w JOIN md ON md.node = w.node AND w.d = md.dist
      GROUP BY w.node, md.dist),
    c2 AS (SELECT v.node,
                  CAST(sum(CAST(v.np::DOUBLE / w.np * (1 + 0.0)
                                AS DECIMAL(38,12))) AS DOUBLE) AS delta
           FROM sig v JOIN edges e ON e.src = v.node
           JOIN sig w ON w.node = e.dst AND w.dist = 3
           WHERE v.dist = 2 GROUP BY v.node),
    l2 AS MATERIALIZED (
      SELECT v.node, coalesce(c2.delta, 0.0) AS delta
      FROM sig v LEFT JOIN c2 USING (node) WHERE v.dist = 2),
    c1 AS (SELECT v.node,
                  CAST(sum(CAST(v.np::DOUBLE / w.np * (1 + l2.delta)
                                AS DECIMAL(38,12))) AS DOUBLE) AS delta
           FROM sig v JOIN edges e ON e.src = v.node
           JOIN sig w ON w.node = e.dst AND w.dist = 2
           JOIN l2 ON l2.node = w.node
           WHERE v.dist = 1 GROUP BY v.node),
    l1 AS (SELECT v.node, coalesce(c1.delta, 0.0) AS delta
           FROM sig v LEFT JOIN c1 USING (node) WHERE v.dist = 1)
    SELECT node, CAST(2 AS BIGINT) AS dist, round(delta, 6) AS dependency
    FROM l2
    UNION ALL
    SELECT node, CAST(1 AS BIGINT) AS dist, round(delta, 6) AS dependency
    FROM l1
    """,
)
def seed_betweenness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brandes dependency accumulation from the seed customers over the
    trading graph (graph.seed_betweenness) — the backward pass paired
    with `bfs_path_counts`' forward σ DP: how much of the seeds'
    shortest-path traffic each intermediate node carries, i.e. the
    exact betweenness CONTRIBUTION of this seed set (sampled-seed
    averaging is the standard betweenness approximation at scale).
    Per level one equi-join against the pinned forward frame +
    a DECIMAL(38,12) fold of σ-ratio terms; levels descend with
    eagerly pinned δ state.  round(6) on the reported dependency."""
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
    out = gr.seed_betweenness(edges, srcs, max_depth=3)
    return out.select(
        "node", "dist", F.round(F.col("delta"), 6).alias("dependency")
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


# Shared OLS/prediction expression text (verbatim both engines).
_FB_SLOPE = (
    "((n * sxy - sx * sy) / (n * sxx - sx * sx))"
)
_FB_ICEPT = "((sy - slope * sx) / n)"
_FB_PRED = "(icept + slope * x)"


@query(
    "forecast_backtest",
    oracle=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      {_sql_dsum('value')} AS y
               FROM events GROUP BY 1, 2),
    m AS (SELECT min(day) AS a,
                 min(day) + CAST(floor(0.8 * datediff('day', min(day), max(day)))
                                 AS INTEGER) * INTERVAL 1 DAY AS split
          FROM d),
    dx AS (SELECT d.event_type, datediff('day', m.a, d.day) AS x, d.y,
                  d.day <= m.split AS is_train
           FROM d, m),
    tr AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
                  CAST(sum(x) AS DOUBLE) AS sx,
                  {_sql_dsum('y')} AS sy,
                  CAST(sum(CAST(x AS BIGINT) * x) AS DOUBLE) AS sxx,
                  {_sql_dsum('x * y')} AS sxy
           FROM dx WHERE is_train GROUP BY 1),
    co AS (SELECT event_type, n, {_FB_SLOPE} AS slope
           FROM tr),
    co2 AS (SELECT co.event_type, co.n, co.slope,
                   ((tr.sy - co.slope * tr.sx) / co.n) AS icept
            FROM co JOIN tr USING (event_type)),
    te AS (SELECT dx.event_type, count(*) AS n_test,
                  {_sql_dsum12('abs(y - ' + _FB_PRED + ') / abs(y)')} / count(*) AS mape,
                  sqrt({_sql_dsum('(y - ' + _FB_PRED + ') * (y - ' + _FB_PRED + ')')}
                       / count(*)) AS rmse
           FROM dx JOIN co2 USING (event_type)
           WHERE NOT is_train AND y != 0
           GROUP BY 1)
    SELECT co2.event_type,
           CAST(co2.n AS BIGINT) AS n_train,
           CAST(te.n_test AS BIGINT) AS n_test,
           round(co2.slope, 6) AS slope,
           round(co2.icept, 6) AS intercept,
           round(te.mape, 6) AS mape,
           round(te.rmse, 6) AS rmse
    FROM co2 JOIN te USING (event_type)
    """,
)
def forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-split forecast BACKTEST per event type: fit the per-type
    OLS daily-value trend on the first 80% of the calendar (the
    ols_trend_by_type model), score the held-out tail, and report
    MAPE + RMSE — the train/validate discipline (`dataset_split`)
    applied on the TIME axis, which is the only split that doesn't
    leak for forecasting.  Scale shape: the fact table collapses to
    the per-(type, day) frame first; the calendar split is a 1-row
    broadcast min/max; training sums are one combinable aggregate per
    type; the 5-row coefficient table broadcasts back onto the test
    slice.  OLS solve and prediction are shared expression strings
    (the ridge convention); error sums fold fixed-point (12 digits for
    the ≪1 APE terms); round(6)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    d = e.groupBy("event_type", "day").agg(
        ops.dsum(F.col("value")).alias("y")
    )
    d = d.localCheckpoint(eager=False)  # min/max + train + test passes
    m = F.broadcast(
        d.agg(
            F.min("day").alias("a"),
            F.date_add(
                F.min("day"),
                F.floor(
                    0.8 * F.datediff(F.max("day"), F.min("day"))
                ).cast("int"),
            ).alias("split"),
        )
    )
    dx = d.crossJoin(m).select(
        "event_type",
        F.datediff("day", "a").alias("x"),
        "y",
        (F.col("day") <= F.col("split")).alias("is_train"),
    )
    dx = dx.localCheckpoint(eager=False)  # train + test branches
    tr = (
        dx.filter(F.col("is_train"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").cast("double").alias("sx"),
            ops.dsum(F.col("y")).alias("sy"),
            F.sum(F.col("x").cast("bigint") * F.col("x"))
            .cast("double")
            .alias("sxx"),
            ops.dsum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    co = tr.withColumn("slope", F.expr(_FB_SLOPE))
    co2 = co.withColumn("icept", F.expr(_FB_ICEPT)).select(
        F.col("event_type").alias("_et"), "n", "slope", "icept"
    )
    te = (
        dx.join(
            F.broadcast(co2), F.col("_et") == F.col("event_type")
        )
        .filter(~F.col("is_train") & (F.col("y") != 0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            (
                ops.dsum12(
                    F.expr(f"abs(y - {_FB_PRED}) / abs(y)")
                )
                / F.count(F.lit(1))
            ).alias("mape"),
            F.sqrt(
                ops.dsum(
                    F.expr(f"(y - {_FB_PRED}) * (y - {_FB_PRED})")
                )
                / F.count(F.lit(1))
            ).alias("rmse"),
        )
    )
    return (
        co2.join(te, co2["_et"] == te["event_type"])
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_train"),
            F.col("n_test").cast("bigint").alias("n_test"),
            F.round(F.col("slope"), 6).alias("slope"),
            F.round(F.col("icept"), 6).alias("intercept"),
            F.round(F.col("mape"), 6).alias("mape"),
            F.round(F.col("rmse"), 6).alias("rmse"),
        )
    )


# ---------------------------------------------------------------------------
# Temporal reachability and quantile normalization
# ---------------------------------------------------------------------------


def _temporal_reach_oracle(rounds: int = 3) -> str:
    """Unrolled earliest-arrival relaxation rounds (the sssp_bounded
    generated-oracle convention); date comparisons are exact."""
    ctes = [
        """WITH pairs AS MATERIALIZED (
      SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s,
             CAST(o_orderdate AS DATE) AS d
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS MATERIALIZED (SELECT c AS src, s AS dst, d FROM pairs
              UNION ALL SELECT s, c, d FROM pairs),
    t0 AS (SELECT 'c:' || c_custkey AS node, DATE '1970-01-01' AS ea
           FROM customer WHERE c_custkey <= 3)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""t{r} AS MATERIALIZED (SELECT node, min(ea) AS ea FROM (
        SELECT node, ea FROM t{p}
        UNION ALL
        SELECT e.dst AS node, e.d AS ea
        FROM t{p} t JOIN edges e ON e.src = t.node AND e.d >= t.ea)
        GROUP BY node)"""
        )
    return (
        ",\n    ".join(ctes)
        + f"""
    SELECT node, strftime(t{rounds}.ea, '%Y-%m-%d') AS earliest
    FROM t{rounds}"""
    )


@query("temporal_reachability", oracle=_temporal_reach_oracle(3))
def temporal_reachability_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest time-respecting arrival from the seed customers over
    the DATED trading graph (graph.temporal_reachability, 3
    interaction rounds): each hop must depart no earlier than the
    node's own earliest arrival — the contact-tracing/diffusion
    primitive static BFS gets wrong.  Per round one time-gated relax
    join + a combinable MIN; monotone state, eagerly pinned; unrolled
    identically in the oracle.  Dates compare exactly and are emitted
    as formatted strings on both sides (the house timestamp rule)."""
    from covid_custom_sql_engine_spark.functions import graph as gr

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
            "d",
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst"), F.col("d").alias("edate")
    ).unionAll(
        pairs.select(
            F.col("s").alias("src"), F.col("c").alias("dst"), F.col("d").alias("edate")
        )
    )
    srcs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 3)
        .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"))
    )
    out = gr.temporal_reachability(edges, srcs, rounds=3)
    return out.select(
        "node", F.date_format("earliest", "yyyy-MM-dd").alias("earliest")
    )


@query(
    "quantile_normalize_events",
    oracle="""
    WITH e AS (SELECT event_id, event_type, value AS v FROM events
               WHERE value IS NOT NULL),
    gv AS (SELECT event_type, v, count(*) AS cnt FROM e GROUP BY 1, 2),
    gw AS (SELECT event_type, v, cnt,
                  sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
                  AS cumb
           FROM gv),
    ng AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_g
           FROM gv GROUP BY 1),
    gl AS (SELECT v, count(*) AS cnt,
                  sum(count(*)) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - count(*) AS cumb
           FROM e GROUP BY v),
    nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM gl),
    kk AS (SELECT v, cumb + u.i AS k
           FROM gl, UNNEST(generate_series(1, cnt)) AS u(i)),
    m AS (SELECT e.event_id, e.event_type,
                 CAST(floor(((2 * gw.cumb + gw.cnt) * nn.n + 2 * ng.n_g - 1)
                            / (2.0 * ng.n_g)) AS BIGINT) AS k
          FROM e
          JOIN gw ON gw.event_type = e.event_type AND gw.v = e.v
          JOIN ng ON ng.event_type = e.event_type
          CROSS JOIN nn)
    SELECT m.event_id, m.event_type, kk.v AS mapped_value
    FROM m JOIN kk ON kk.k = m.k
    """,
)
def quantile_normalize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of each event type's value distribution
    onto the POOLED distribution: a row at within-group midrank r maps
    to the pooled type-1 empirical quantile at p = (r−½)/n_g — after
    the transform every group has (up to ties) the same marginal, the
    batch-effect correction used before cross-source comparisons
    (microarray lineage; here: cross-event-type value comparability).
    Scale shape: both rank passes run on per-distinct-value collapsed
    frames (the within-group cumulative is a window over the per-GROUP
    reduced frame, bounded by distinct values; at hot-group scale swap
    in the pinned prefix-sum of selection.running_sums); the pooled
    quantile lookup EXPLODES the global reduced frame to one row per
    rank and equi-joins on the integer rank index — never a per-row
    range join.  Rank arithmetic is all-integer (2·midrank−1 is an
    integer; k = ⌈(2r−1)·N / (2n_g)⌉ via exact integer/double floor);
    mapped values are raw pass-through column values — exact."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", F.col("value").alias("v"))
    )
    e = e.localCheckpoint(eager=False)  # group ranks + global ranks + map
    gv = e.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w_g = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gw = gv.select(
        F.col("event_type").alias("_gt"),
        F.col("v").alias("_gv"),
        "cnt",
        (F.sum("cnt").over(w_g) - F.col("cnt")).alias("cumb"),
    )
    ng = gv.groupBy(F.col("event_type").alias("_nt")).agg(
        F.sum("cnt").cast("bigint").alias("n_g")
    )
    gl = e.groupBy(F.col("v").alias("_lv")).agg(
        F.count(F.lit(1)).alias("lcnt")
    )
    from covid_custom_sql_engine_spark.operators import selection as sel

    glc = sel.running_sums(gl, "_lv", ["lcnt"]).select(
        "_lv", "lcnt", (F.col("_cum_lcnt") - F.col("lcnt")).alias("lcumb")
    )
    nn = F.broadcast(gl.agg(F.sum("lcnt").cast("bigint").alias("n")))
    kk = glc.select(
        F.col("_lv").alias("mapped_value"),
        F.explode(
            F.sequence(F.col("lcumb") + 1, F.col("lcumb") + F.col("lcnt"))
        ).alias("k"),
    )
    m = (
        e.join(
            gw,
            (F.col("_gt") == F.col("event_type")) & (F.col("_gv") == F.col("v")),
        )
        .join(F.broadcast(ng), F.col("_nt") == F.col("event_type"))
        .crossJoin(nn)
        .select(
            "event_id",
            "event_type",
            F.floor(
                ((2 * F.col("cumb") + F.col("cnt")) * F.col("n")
                 + 2 * F.col("n_g") - 1)
                / (2.0 * F.col("n_g"))
            )
            .cast("bigint")
            .alias("k"),
        )
    )
    return m.join(kk, "k").select(
        "event_id", "event_type", "mapped_value"
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
# k-fold cross-validated ridge (hyperparameter search as SQL)
# ---------------------------------------------------------------------------

# Leave-one-fold-out train moments from per-fold raw sums, then the
# Cramer solve per λ — ALL shared expression text (both engines
# evaluate these strings verbatim, in this chained order).
_CV_STAGE1 = {
    "tn": "(t_n - nf)",
    "tmx1": "((t_sx1 - sx1) / (t_n - nf))",
    "tmx2": "((t_sx2 - sx2) / (t_n - nf))",
    "tmy": "((t_sy - sy) / (t_n - nf))",
}
_CV_STAGE2 = {
    "c11": "((t_s11 - s11) - tn * tmx1 * tmx1)",
    "c12": "((t_s12 - s12) - tn * tmx1 * tmx2)",
    "c22": "((t_s22 - s22) - tn * tmx2 * tmx2)",
    "c1y": "((t_s1y - s1y) - tn * tmx1 * tmy)",
    "c2y": "((t_s2y - s2y) - tn * tmx2 * tmy)",
}
_CV_DET = "((c11 + lam) * (c22 + lam) - c12 * c12)"
_CV_STAGE3 = {
    "b1": f"((c1y * (c22 + lam) - c12 * c2y) / {_CV_DET})",
    "b2": f"(((c11 + lam) * c2y - c12 * c1y) / {_CV_DET})",
}
_CV_B0 = "(tmy - b1 * tmx1 - b2 * tmx2)"
_CV_ERR = "(y - (b0 + b1 * x1 + b2 * x2))"
_CV_LAMBDAS = [0.1, 10.0, 1000.0]


@query(
    "ridge_cv_lambda",
    oracle=f"""
    WITH base AS (SELECT l_quantity AS x1, l_discount AS x2,
                         l_extendedprice AS y,
                         ('0x' || substr(md5('fold:' || CAST(l_orderkey AS VARCHAR)
                            || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
                           % 5 AS fold
                  FROM lineitem),
    pf AS (SELECT fold, CAST(count(*) AS DOUBLE) AS nf,
                  {_sql_dsum12('x1')} AS sx1, {_sql_dsum12('x2')} AS sx2,
                  {_sql_dsum12('y')} AS sy,
                  {_sql_dsum12('x1 * x1')} AS s11,
                  {_sql_dsum12('x1 * x2')} AS s12,
                  {_sql_dsum12('x2 * x2')} AS s22,
                  {_sql_dsum12('x1 * y')} AS s1y,
                  {_sql_dsum12('x2 * y')} AS s2y
           FROM base GROUP BY fold),
    tt AS (SELECT CAST(count(*) AS DOUBLE) AS t_n,
                  {_sql_dsum12('x1')} AS t_sx1, {_sql_dsum12('x2')} AS t_sx2,
                  {_sql_dsum12('y')} AS t_sy,
                  {_sql_dsum12('x1 * x1')} AS t_s11,
                  {_sql_dsum12('x1 * x2')} AS t_s12,
                  {_sql_dsum12('x2 * x2')} AS t_s22,
                  {_sql_dsum12('x1 * y')} AS t_s1y,
                  {_sql_dsum12('x2 * y')} AS t_s2y
           FROM base),
    st1 AS (SELECT pf.*, tt.*, {", ".join(f"{e} AS {k}" for k, e in _CV_STAGE1.items())}
            FROM pf, tt),
    st2 AS (SELECT st1.*, {", ".join(f"{e} AS {k}" for k, e in _CV_STAGE2.items())}
            FROM st1),
    lams AS (SELECT unnest(CAST([{", ".join(str(v) for v in _CV_LAMBDAS)}] AS DOUBLE[])) AS lam),
    st3 AS (SELECT st2.fold, lams.lam, st2.tmx1, st2.tmx2, st2.tmy,
                   {", ".join(f"{e} AS {k}" for k, e in _CV_STAGE3.items())}
            FROM st2, lams),
    co AS (SELECT fold, lam, b1, b2, {_CV_B0} AS b0 FROM st3),
    mse AS (SELECT co.lam,
                   {_sql_dsum12(_CV_ERR + " * " + _CV_ERR)} / count(*) AS cv_mse
            FROM base JOIN co ON co.fold = base.fold
            GROUP BY co.lam),
    best AS (SELECT min(cv_mse) AS mn FROM mse)
    SELECT mse.lam, round(mse.cv_mse, 6) AS cv_mse,
           mse.cv_mse = best.mn AS is_best
    FROM mse, best
    """,
)
def ridge_cv_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated λ selection for the 2-feature ridge
    (`ridge_regression_price`'s model) over the grid {{0.1, 10, 1000}}
    — hyperparameter search expressed as TWO distributed aggregates:
    per-fold raw moment sums (md5-deterministic fold assignment, the
    dataset_split convention) plus the grand totals, from which every
    leave-one-fold-out training moment is EXACT ARITHMETIC
    (train = total − fold), so 5 folds × 3 λ = 15 models cost the same
    scan count as one.  The pooled held-out MSE joins each row to its
    own fold's coefficients (15-row broadcast).  The entire
    moments→solve→prediction chain is shared expression text evaluated
    verbatim by both engines; per-row products fold fixed-point at 12
    digits.  Output: one row per λ with the winner flagged."""
    base = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("fold:"),
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
    base = base.localCheckpoint(eager=False)  # fold sums + totals + test join
    sums = [
        ("sx1", F.col("x1")),
        ("sx2", F.col("x2")),
        ("sy", F.col("y")),
        ("s11", F.col("x1") * F.col("x1")),
        ("s12", F.col("x1") * F.col("x2")),
        ("s22", F.col("x2") * F.col("x2")),
        ("s1y", F.col("x1") * F.col("y")),
        ("s2y", F.col("x2") * F.col("y")),
    ]
    pf = base.groupBy("fold").agg(
        F.count(F.lit(1)).cast("double").alias("nf"),
        *[ops.dsum12(c).alias(k) for k, c in sums],
    )
    tt = base.agg(
        F.count(F.lit(1)).cast("double").alias("t_n"),
        *[ops.dsum12(c).alias(f"t_{k}") for k, c in sums],
    )
    st1 = pf.crossJoin(F.broadcast(tt))
    for k, e in _CV_STAGE1.items():
        st1 = st1.withColumn(k, F.expr(e))
    st2 = st1
    for k, e in _CV_STAGE2.items():
        st2 = st2.withColumn(k, F.expr(e))
    lams = F.broadcast(
        spark.createDataFrame([(v,) for v in _CV_LAMBDAS], "lam double")
    )
    st3 = st2.crossJoin(lams)
    for k, e in _CV_STAGE3.items():
        st3 = st3.withColumn(k, F.expr(e))
    co = st3.withColumn("b0", F.expr(_CV_B0)).select(
        F.col("fold").alias("_cf"), "lam", "b1", "b2", "b0"
    )
    mse = (
        base.join(F.broadcast(co), F.col("_cf") == F.col("fold"))
        .groupBy("lam")
        .agg(
            (
                ops.dsum12(F.expr(_CV_ERR + " * " + _CV_ERR))
                / F.count(F.lit(1))
            ).alias("cv_mse")
        )
    )
    best = F.broadcast(mse.agg(F.min("cv_mse").alias("mn")))
    return mse.crossJoin(best).select(
        "lam",
        F.round(F.col("cv_mse"), 6).alias("cv_mse"),
        (F.col("cv_mse") == F.col("mn")).alias("is_best"),
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


@query(
    "trigram_name_match",
    oracle=f"""
    WITH orig AS (SELECT p_partkey AS id, p_name AS name FROM part
                  WHERE p_partkey <= 2000),
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
             WHERE j >= {_TRI_TAU}
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
    """,
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
        # (Zipfian) vocabularies are the uncapped path, measured by
        # prefix_jaccard_zipf.
        .filter(F.col("p_partkey") <= 2000)
        .select(
            F.col("p_partkey").alias("id"), F.col("p_name").alias("name")
        )
    )
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

    grams = _trigrams

    both = orig.select(
        F.col("id").alias("nid"), grams("name").alias("tg")
    ).unionByName(
        corr.select(F.col("cid").alias("nid"), grams("cname").alias("tg"))
    )
    from covid_custom_sql_engine_spark.functions import dedup as dd

    pairs = dd.prefix_filter_pairs_sets(
        both, threshold=_TRI_TAU, id_col="nid", set_col="tg"
    )
    # id_a < id_b, originals < 1000000 < corrupted: keep cross pairs
    m = pairs.filter(
        (F.col("id_a") < 1000000) & (F.col("id_b") >= 1000000)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id_b").orderBy(
        F.desc("jaccard"), F.asc("id_a")
    )
    best = (
        m.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("id_b").alias("cid"), F.col("id_a").alias("mid"))
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


# ---------------------------------------------------------------------------
# Restricted mean survival time (KM-curve consumer)
# ---------------------------------------------------------------------------

_RMST_TAU = 90


@query(
    "rmst_fulfillment",
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
    s AS (SELECT t,
                 sum(CAST(ln(greatest(
                         1.0 - CAST(d AS DOUBLE) / CAST(nrisk AS DOUBLE),
                         1e-300)) AS DECIMAL(38,6)))
                   OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS ls
          FROM c),
    km AS (SELECT CAST(t AS BIGINT) AS t_days,
                  round(exp(CAST(ls AS DOUBLE)), 6) AS survival
           FROM s),
    r AS (SELECT t_days, survival,
                 lead(t_days) OVER (ORDER BY t_days) AS nt
          FROM km),
    area AS (SELECT {_sql_dsum12(
        f'survival * (least(coalesce(nt, 1000000), {_RMST_TAU})'
        f' - least(t_days, {_RMST_TAU}))')} AS a2,
                    count(*) AS n_times
             FROM r),
    head AS (SELECT least(CAST(min(t_days) AS DOUBLE), {_RMST_TAU}) AS a1
             FROM km)
    SELECT CAST({_RMST_TAU} AS BIGINT) AS tau_days,
           CAST(area.n_times AS BIGINT) AS n_times,
           round(head.a1 + area.a2, 6) AS rmst_days
    FROM area, head
    """,
)
def rmst_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time at τ = 90 days — the area under
    the `kaplan_meier_fulfillment` curve up to τ: the expected days an
    order stays open within the first 90, the single-number summary
    clinicians/SLAs prefer over eyeballing the curve (and, unlike
    median survival, always defined under heavy censoring).  The step
    integral needs each distinct time's SUCCESSOR — obtained by an
    equi-join on the two-phase distributed rank (rank ↔ rank+1), never
    a single-partition lead() over data; segment areas are rounded-
    survival × integer-width products folded fixed-point.  One-row
    output, round(6)."""
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
    km = sel.kaplan_meier(per_o, "t", "ev").select("t_days", "survival")
    rk = sel.global_rank(km, ["t_days"], out_col="rk").localCheckpoint(
        eager=False
    )  # both sides of the successor join + head min
    nxt = rk.select(
        (F.col("rk") - 1).alias("_prk"), F.col("t_days").alias("nt")
    )
    r = rk.join(nxt, F.col("_prk") == F.col("rk"), "left")
    tau = F.lit(_RMST_TAU)
    area = r.agg(
        ops.dsum12(
            F.col("survival")
            * (
                F.least(F.coalesce(F.col("nt"), F.lit(1000000)), tau)
                - F.least(F.col("t_days"), tau)
            )
        ).alias("a2"),
        F.count(F.lit(1)).alias("n_times"),
    )
    head = rk.agg(
        F.least(F.min("t_days").cast("double"), tau.cast("double")).alias(
            "a1"
        )
    )
    return area.crossJoin(F.broadcast(head)).select(
        F.lit(_RMST_TAU).cast("bigint").alias("tau_days"),
        F.col("n_times").cast("bigint").alias("n_times"),
        F.round(F.col("a1") + F.col("a2"), 6).alias("rmst_days"),
    )


# ---------------------------------------------------------------------------
# Logistic regression, two unrolled Newton–Raphson steps
# ---------------------------------------------------------------------------

_LOGIT_P = "(1.0 / (1.0 + exp(-(b0 + b1 * x))))"
_LOGIT_DET = "(sw * swxx - swx * swx)"
_LOGIT_NB0 = f"(b0 + (swxx * sg0 - swx * sg1) / {_LOGIT_DET})"
_LOGIT_NB1 = f"(b1 + (sw * sg1 - swx * sg0) / {_LOGIT_DET})"
_LOGIT_STEPS = 2


def _logit_oracle() -> str:
    ctes = [
        """x AS (SELECT l_quantity AS x,
                       CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
                FROM lineitem),
    p0 AS (SELECT 0.0 AS b0, 0.0 AS b1)"""
    ]
    for r in range(1, _LOGIT_STEPS + 1):
        p = r - 1
        ctes.append(
            f"""e{r} AS (SELECT x.x, x.y, {_LOGIT_P} AS pr FROM x, p{p}),
    s{r} AS (SELECT max(p{p}.b0) AS b0, max(p{p}.b1) AS b1,
                    CAST(sum(CAST((pr * (1 - pr)) AS DECIMAL(38,12))) AS DOUBLE) AS sw,
                    CAST(sum(CAST((pr * (1 - pr) * x) AS DECIMAL(38,12))) AS DOUBLE) AS swx,
                    CAST(sum(CAST((pr * (1 - pr) * x * x) AS DECIMAL(38,12))) AS DOUBLE) AS swxx,
                    CAST(sum(CAST((y - pr) AS DECIMAL(38,12))) AS DOUBLE) AS sg0,
                    CAST(sum(CAST(((y - pr) * x) AS DECIMAL(38,12))) AS DOUBLE) AS sg1
             FROM e{r}, p{p}),
    p{r} AS (SELECT {_LOGIT_NB0} AS b0, {_LOGIT_NB1} AS b1 FROM s{r})"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    , fin AS (SELECT count(*) AS n,
                     CAST(sum(CASE WHEN (CASE WHEN b0 + b1 * x >= 0
                                         THEN 1.0 ELSE 0.0 END) = y
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_right
              FROM x, p{_LOGIT_STEPS})
    SELECT CAST(fin.n AS BIGINT) AS n_rows,
           round(p{_LOGIT_STEPS}.b0, 6) AS b0,
           round(p{_LOGIT_STEPS}.b1, 6) AS b1,
           round(CAST(fin.n_right AS DOUBLE) / fin.n, 6) AS train_acc
    FROM fin, p{_LOGIT_STEPS}"""
    )


@query("logistic_newton", oracle=_logit_oracle())
def logistic_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression of return probability on quantity, fit by
    two unrolled Newton–Raphson steps from β = 0 — the DISCRIMINATIVE
    classifier next to the generative `naive_bayes_lang`, and the IRLS
    shape every GLM fit at scale reduces to: each step is ONE
    combinable weighted aggregate (w = p(1−p) Hessian terms + score
    terms, fixed-point folds at 12 digits) and a 1-row closed-form 2×2
    solve (shared Cramer text).  The sigmoid/update expressions are
    shared strings both engines evaluate verbatim; the train-accuracy
    readout compares the linear score's sign — integer-stable.
    Round(6) on the reported coefficients and accuracy."""
    x = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
    )
    x = x.localCheckpoint(eager=False)  # reused every Newton step
    p = spark.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1")
    )
    for _ in range(_LOGIT_STEPS):
        e = x.crossJoin(F.broadcast(p)).select(
            "x", "y", "b0", "b1", F.expr(_LOGIT_P).alias("pr")
        )
        s = e.agg(
            F.max("b0").alias("b0"),
            F.max("b1").alias("b1"),
            ops.dsum12(F.col("pr") * (1 - F.col("pr"))).alias("sw"),
            ops.dsum12(F.col("pr") * (1 - F.col("pr")) * F.col("x")).alias(
                "swx"
            ),
            ops.dsum12(
                F.col("pr") * (1 - F.col("pr")) * F.col("x") * F.col("x")
            ).alias("swxx"),
            ops.dsum12(F.col("y") - F.col("pr")).alias("sg0"),
            ops.dsum12((F.col("y") - F.col("pr")) * F.col("x")).alias("sg1"),
        )
        p = s.select(
            F.expr(_LOGIT_NB0).alias("b0"), F.expr(_LOGIT_NB1).alias("b1")
        )
    fin = x.crossJoin(F.broadcast(p)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.when(F.col("b0") + F.col("b1") * F.col("x") >= 0, 1.0)
                .otherwise(0.0)
                == F.col("y"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_right"),
        F.max("b0").alias("b0"),
        F.max("b1").alias("b1"),
    )
    return fin.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("b0"), 6).alias("b0"),
        F.round(F.col("b1"), 6).alias("b1"),
        F.round(F.col("n_right").cast("double") / F.col("n"), 6).alias(
            "train_acc"
        ),
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


_MER_STEPS = 3


def _markov_entropy_oracle() -> str:
    ctes = [
        """x AS (SELECT event_type AS cur,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS nxt
                FROM events),
    t AS (SELECT cur, nxt, count(*) AS c FROM x
          WHERE nxt IS NOT NULL GROUP BY 1, 2),
    rs AS (SELECT cur, CAST(sum(c) AS DOUBLE) AS rc FROM t GROUP BY 1),
    pm AS MATERIALIZED (SELECT t.cur, t.nxt, t.c / rs.rc AS p
                        FROM t JOIN rs USING (cur)),
    ns AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM rs),
    pi0 AS (SELECT cur AS state, 1.0 / ns.k AS pi FROM rs, ns)"""
    ]
    for r in range(1, _MER_STEPS + 1):
        p = r - 1
        ctes.append(
            f"""pi{r} AS (SELECT pm.nxt AS state,
                    CAST(sum(CAST((pi{p}.pi * pm.p) AS DECIMAL(38,12))) AS DOUBLE) AS pi
             FROM pi{p} JOIN pm ON pm.cur = pi{p}.state
             GROUP BY pm.nxt)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    , h AS (SELECT {_sql_dsum12('pi.pi * pm.p * (-ln(pm.p))')} AS ent,
                   CAST(sum(pm.p * 0 + 1) AS BIGINT) AS n_cells
            FROM pi{_MER_STEPS} pi JOIN pm ON pm.cur = pi.state),
    nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_trans,
                  CAST(count(DISTINCT cur) AS DOUBLE) AS k
           FROM t)
    SELECT nt.n_trans AS n_transitions,
           CAST(nt.k AS BIGINT) AS n_states,
           round(h.ent, 6) AS entropy_rate_nats,
           round(1.0 - h.ent / ln(nt.k), 6) AS predictability
    FROM h, nt"""
    )


@query("markov_entropy_rate", oracle=_markov_entropy_oracle())
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy RATE of the user-behavior Markov chain — how
    fundamentally predictable the next event is: H = Σᵢ πᵢ Σⱼ
    −p_ij ln p_ij with the stationary distribution π approximated by
    3 unrolled power steps from uniform (the ppr/pagerank convention;
    the oracle unrolls the identical rounds), reported with the
    normalized predictability 1 − H/ln k.  Consumes the same per-user
    lead() transition bigrams as `event_transitions`; everything after
    the transition-count aggregate runs on the k×k REDUCED matrix
    frame (k = event types), so the π iteration and the entropy fold
    cost nothing at any data scale.  Fixed-point folds; round(6)."""
    from covid_custom_sql_engine_spark.operators import composites as comp

    e = load_table(spark, sf_dir, "events")
    t = (
        comp.event_transitions(e, "user_id", ["ts", "event_id"], "event_type")
        .select(
            F.col("from_state").alias("cur"),
            F.col("to_state").alias("nxt"),
            F.col("n_transitions").alias("c"),
        )
    )
    t = t.localCheckpoint(eager=False)  # row sums + pm + totals
    rs = t.groupBy("cur").agg(F.sum("c").cast("double").alias("rc"))
    pm = (
        t.join(rs, "cur")
        .select("cur", "nxt", (F.col("c") / F.col("rc")).alias("p"))
        .localCheckpoint(eager=False)  # pi rounds + entropy fold
    )
    ns = rs.agg(F.count(F.lit(1)).cast("double").alias("k"))
    pi = rs.crossJoin(F.broadcast(ns)).select(
        F.col("cur").alias("state"), (F.lit(1.0) / F.col("k")).alias("pi")
    )
    for _ in range(_MER_STEPS):
        pi = (
            pi.join(pm, pm["cur"] == pi["state"])
            .groupBy(F.col("nxt").alias("state"))
            .agg(ops.dsum12(F.col("pi") * F.col("p")).alias("pi"))
        )
    h = pi.join(pm, pm["cur"] == pi["state"]).agg(
        ops.dsum12(F.col("pi") * F.col("p") * (-F.log(F.col("p")))).alias(
            "ent"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    nt = t.agg(
        F.sum("c").cast("bigint").alias("n_trans"),
        F.countDistinct("cur").cast("double").alias("k"),
    )
    return h.crossJoin(F.broadcast(nt)).select(
        F.col("n_trans").alias("n_transitions"),
        F.col("k").cast("bigint").alias("n_states"),
        F.round(F.col("ent"), 6).alias("entropy_rate_nats"),
        F.round(1.0 - F.col("ent") / F.log(F.col("k")), 6).alias(
            "predictability"
        ),
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
    "degree_assortativity",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY pa, pb HAVING count(*) >= 2),
    und AS (SELECT pa AS u, pb AS v FROM e0
            UNION ALL SELECT pb, pa FROM e0),
    deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
    pairs AS (SELECT du.d AS dx, dv.d AS dy
              FROM und JOIN deg du ON du.u = und.u
                       JOIN deg dv ON dv.u = und.v),
    s AS (SELECT count(*) AS m,
                 CAST(sum(dx) AS DOUBLE) AS sx, CAST(sum(dy) AS DOUBLE) AS sy,
                 CAST(sum(CAST(dx AS BIGINT) * dx) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(dy AS BIGINT) * dy) AS DOUBLE) AS syy,
                 CAST(sum(CAST(dx AS BIGINT) * dy) AS DOUBLE) AS sxy
          FROM pairs),
    nn AS (SELECT count(*) AS n_nodes FROM deg)
    SELECT CAST(s.m / 2 AS BIGINT) AS n_edges,
           CAST(nn.n_nodes AS BIGINT) AS n_nodes,
           round((s.m * s.sxy - s.sx * s.sy)
                 / sqrt((s.m * s.sxx - s.sx * s.sx)
                        * (s.m * s.syy - s.sy * s.sy)), 6)
             AS assortativity
    FROM s, nn
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — the Pearson
    correlation of endpoint degrees across (both-orientation) edges:
    do popular parts co-occur with other popular parts (r > 0, social-
    network-like) or with niche ones (r < 0, hub-and-spoke)?  The
    one-number structural summary next to `modularity_nations` and
    `triangle_counts`.  Scale shape: degrees are one hash aggregate,
    endpoint-degree pairs one double equi-join of the edge list
    against it, and the correlation exact-integer one-row arithmetic.
    round(6)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("pa"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pb")
    )
    e0 = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("pa", "pb")
    )
    und = e0.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        e0.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    und = und.localCheckpoint(eager=False)  # degree agg + pair join
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    pairs = und.join(
        deg.select(F.col("u").alias("_du"), F.col("d").alias("dx")),
        F.col("_du") == F.col("u"),
    ).join(
        deg.select(F.col("u").alias("_dv"), F.col("d").alias("dy")),
        F.col("_dv") == F.col("v"),
    )
    s = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").cast("double").alias("sx"),
        F.sum("dy").cast("double").alias("sy"),
        F.sum(F.col("dx").cast("bigint") * F.col("dx")).cast("double").alias("sxx"),
        F.sum(F.col("dy").cast("bigint") * F.col("dy")).cast("double").alias("syy"),
        F.sum(F.col("dx").cast("bigint") * F.col("dy")).cast("double").alias("sxy"),
    )
    nn = F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
    return s.crossJoin(nn).select(
        (F.col("m") / 2).cast("bigint").alias("n_edges"),
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("assortativity"),
    )


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
# Clustering coefficient, grid DBSCAN, readability
# ---------------------------------------------------------------------------


@query(
    "clustering_coefficient",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY pa, pb HAVING count(*) >= 2),
    und AS (SELECT pa AS u, pb AS v FROM e0
            UNION ALL SELECT pb, pa FROM e0),
    deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
    tri AS (SELECT x.u, count(*) AS t2
            FROM und x JOIN und y ON y.u = x.v
            JOIN e0 z ON z.pa = least(x.u, y.v) AND z.pb = greatest(x.u, y.v)
            WHERE x.u != y.v
            GROUP BY x.u),
    cc AS (SELECT deg.u, deg.d,
                  CASE WHEN deg.d >= 2
                       THEN coalesce(tri.t2, 0)
                            / (CAST(deg.d AS DOUBLE) * (deg.d - 1))
                       ELSE 0.0 END AS c
           FROM deg LEFT JOIN tri ON tri.u = deg.u)
    SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_eligible,
           round(CAST(sum(CAST((c) AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 6) AS avg_clustering
    FROM cc
    """,
)
def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average LOCAL clustering coefficient of the co-purchase graph —
    per node, the fraction of its neighbor pairs that are themselves
    connected (wedges closed into triangles, counted as ordered
    neighbor pairs over d·(d−1)), averaged over all nodes (Watts–
    Strogatz).  The "how cliquish is each neighborhood" companion of
    the global `triangle_counts` / `degree_assortativity` statistics.
    Scale shape: one wedge join anchored at each node (the adjacency
    joined to itself on the shared neighbor) closed by an equi-join
    against the canonical edge list, then one combinable aggregate;
    per-node ratios fold fixed-point for the average.  round(6)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("pa"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pb")
    )
    e0 = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("pa", "pb")
        .localCheckpoint(eager=False)  # adjacency + closure joins
    )
    und = e0.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        e0.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    x = und.select(F.col("u").alias("xu"), F.col("v").alias("xv"))
    y = und.select(F.col("u").alias("yu"), F.col("v").alias("yv"))
    tri = (
        x.join(y, F.col("yu") == F.col("xv"))
        .filter(F.col("xu") != F.col("yv"))
        .join(
            e0,
            (F.col("pa") == F.least(F.col("xu"), F.col("yv")))
            & (F.col("pb") == F.greatest(F.col("xu"), F.col("yv"))),
        )
        .groupBy(F.col("xu").alias("u"))
        .agg(F.count(F.lit(1)).alias("t2"))
    )
    cc = deg.join(tri, "u", "left").select(
        "d",
        F.when(
            F.col("d") >= 2,
            F.coalesce(F.col("t2"), F.lit(0))
            / (F.col("d").cast("double") * (F.col("d") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("c"),
    )
    return cc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.when(F.col("d") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_eligible"),
        F.round(ops.dsum12(F.col("c")) / F.count(F.lit(1)), 6).alias(
            "avg_clustering"
        ),
    )


_DB_D2 = (
    "((ax - bx) * (ax - bx) + (ay - by) * (ay - by))"
)


@query(
    "dbscan_spatial",
    oracle=f"""
    WITH RECURSIVE pts AS MATERIALIZED (
      SELECT c_custkey AS id,
             ('0x' || substr(md5('dbx:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
               % 40000 / 1000.0 - 20 AS x,
             ('0x' || substr(md5('dby:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
               % 40000 / 1000.0 - 20 AS y
      FROM customer WHERE c_custkey <= 1500),
    nb AS MATERIALIZED (
      SELECT a.id AS ia, b.id AS ib
      FROM (SELECT id, x AS ax, y AS ay FROM pts) a
      JOIN (SELECT id, x AS bx, y AS by FROM pts) b
        ON a.id != b.id AND {_DB_D2} <= 1.0),
    core AS MATERIALIZED (
      SELECT ia AS id FROM nb GROUP BY ia HAVING count(*) + 1 >= 4),
    ce AS MATERIALIZED (
      SELECT nb.ia, nb.ib FROM nb
      JOIN core ca ON ca.id = nb.ia
      JOIN core cb ON cb.id = nb.ib),
    reach(id, r) AS (
      SELECT id, id FROM core
      UNION
      SELECT reach.id, ce.ib FROM reach JOIN ce ON ce.ia = reach.r),
    comp AS MATERIALIZED (
      SELECT id, min(r) AS cluster FROM reach GROUP BY id),
    border AS MATERIALIZED (
      SELECT nb.ia AS id, min(comp.cluster) AS cluster
      FROM nb JOIN comp ON comp.id = nb.ib
      WHERE nb.ia NOT IN (SELECT id FROM core)
      GROUP BY nb.ia),
    agg AS (
      SELECT comp.cluster, count(*) AS n_core FROM comp GROUP BY 1),
    bagg AS (
      SELECT cluster, count(*) AS n_border FROM border GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM pts),
    lab AS (SELECT agg.cluster, agg.n_core,
                   coalesce(bagg.n_border, 0) AS n_border
            FROM agg LEFT JOIN bagg USING (cluster))
    SELECT CAST(cluster AS BIGINT) AS cluster_id,
           CAST(n_core AS BIGINT) AS n_core,
           CAST(n_border AS BIGINT) AS n_border
    FROM lab
    UNION ALL
    SELECT -1, 0,
           CAST(tot.n - (SELECT coalesce(sum(n_core + n_border), 0) FROM lab)
                AS BIGINT)
    FROM tot
    """,
)
def dbscan_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over deterministic synthetic planar points (md5
    coordinates on [−20, 20]², ε = 1, minPts = 4): core points by
    ε-neighborhood count, clusters as CONNECTED COMPONENTS of the
    core-core adjacency (dedup.connected_components — the pointer-
    jumping min-label machinery), borders assigned to their smallest
    adjacent core cluster, the rest noise — density clustering built
    ENTIRELY from pieces this engine already ships at scale: the grid-
    blocked spatial join (`spatial_grid_join`'s replicate-to-3×3-cells
    shape, cells of ε) for neighbor pairs, and the dedup CC loop for
    cluster formation.  The oracle is the all-pairs spec + recursive
    reachability — feasible at oracle scale only, which is the point.
    Output: per-cluster core/border counts + the noise row (−1)."""
    from covid_custom_sql_engine_spark.functions import dedup as dd

    ck = F.col("c_custkey").cast("string")

    def h(salt: str) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), ck)), 1, 15), 16, 10
        ).cast("bigint")

    pts = (
        load_table(spark, sf_dir, "customer")
        # fixed 1500-point universe at every SF: keeps the cluster
        # structure (density) SF-stable and the quadratic all-pairs
        # ORACLE bounded (the prefix_jaccard_pairs doc_id-cap
        # precedent; 2000 points sit near the percolation threshold
        # where the oracle's recursive reachability goes quadratic in
        # the giant component — 1500 keeps clusters small); the engine
        # path itself is cell-blocked + pointer-jump CC and needs no
        # cap
        .filter(F.col("c_custkey") <= 1500)
        .select(
            F.col("c_custkey").alias("id"),
            (h("dbx:") % 40000 / 1000.0 - 20).alias("x"),
            (h("dby:") % 40000 / 1000.0 - 20).alias("y"),
        )
    )
    cells = pts.select(
        "id",
        "x",
        "y",
        F.floor("x").cast("bigint").alias("cx"),
        F.floor("y").cast("bigint").alias("cy"),
    ).localCheckpoint(eager=False)  # both sides of the blocking join
    offs = F.broadcast(
        spark.createDataFrame(
            [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
            "dx int, dy int",
        )
    )
    left = cells.crossJoin(offs).select(
        F.col("id").alias("ia"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    right = cells.select(
        F.col("id").alias("ib"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("rx"),
        F.col("cy").alias("ry"),
    )
    nb = (
        left.join(
            right,
            (F.col("rx") == F.col("jx"))
            & (F.col("ry") == F.col("jy"))
            & (F.col("ia") != F.col("ib")),
        )
        .filter(F.expr(_DB_D2) <= 1.0)
        .select("ia", "ib")
        .localCheckpoint(eager=False)  # core count + core edges + border
    )
    core = (
        nb.groupBy("ia")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") + 1 >= 4)
        .select(F.col("ia").alias("id"))
        .localCheckpoint(eager=False)  # CC seed + border anti-join
    )
    ce = nb.join(
        core.select(F.col("id").alias("ia")), "ia"
    ).join(core.select(F.col("id").alias("ib")), "ib")
    # CC over core-core edges; isolated cores keep their own label via
    # the union with self-pairs
    pairs = ce.select(
        F.col("ia").alias("id_a"), F.col("ib").alias("id_b")
    ).unionByName(
        core.select(F.col("id").alias("id_a"), F.col("id").alias("id_b"))
    )
    comp = dd.connected_components(pairs).select(
        F.col("id"), F.col("component").alias("cluster")
    )
    comp = comp.localCheckpoint(eager=False)  # agg + border join
    border = (
        nb.join(core.select(F.col("id").alias("ia")), "ia", "left_anti")
        .join(
            comp.select(F.col("id").alias("ib"), F.col("cluster")), "ib"
        )
        .groupBy(F.col("ia").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    agg = comp.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_core"))
    bagg = border.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_border")
    )
    lab = agg.join(bagg, "cluster", "left").select(
        "cluster",
        "n_core",
        F.coalesce(F.col("n_border"), F.lit(0)).alias("n_border"),
    )
    lab = lab.localCheckpoint(eager=False)  # output + noise total
    tot = pts.agg(F.count(F.lit(1)).alias("n"))
    assigned = lab.agg(
        F.coalesce(F.sum(F.col("n_core") + F.col("n_border")), F.lit(0)).alias(
            "a"
        )
    )
    noise = tot.crossJoin(F.broadcast(assigned)).select(
        F.lit(-1).cast("bigint").alias("cluster_id"),
        F.lit(0).cast("bigint").alias("n_core"),
        (F.col("n") - F.col("a")).cast("bigint").alias("n_border"),
    )
    return lab.select(
        F.col("cluster").cast("bigint").alias("cluster_id"),
        F.col("n_core").cast("bigint").alias("n_core"),
        F.col("n_border").cast("bigint").alias("n_border"),
    ).unionByName(noise)


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


# ---------------------------------------------------------------------------
# Cox proportional hazards (Breslow ties), two unrolled Newton steps
# ---------------------------------------------------------------------------

_COX_STEPS = 2
_COX_D12 = "DECIMAL(38,12)"


def _cox_oracle() -> str:
    ctes = [
        """base AS MATERIALIZED (
      SELECT datediff('day', o.o_orderdate, max(l.l_shipdate)) AS t,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
             max(o.o_totalprice) / 100000.0 AS x
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
      HAVING datediff('day', o.o_orderdate, max(l.l_shipdate)) >= 0),
    p0 AS (SELECT 0.0 AS beta)"""
    ]
    for r in range(1, _COX_STEPS + 1):
        p = r - 1
        ctes.append(
            f"""g{r} AS (SELECT t,
             CAST(sum(ev) AS DOUBLE) AS d,
             CAST(sum(CAST((ev * x) AS {_COX_D12})) AS DOUBLE) AS sx,
             CAST(sum(CAST((exp(beta * x)) AS {_COX_D12})) AS DOUBLE) AS a0,
             CAST(sum(CAST((x * exp(beta * x)) AS {_COX_D12})) AS DOUBLE) AS a1,
             CAST(sum(CAST((x * x * exp(beta * x)) AS {_COX_D12})) AS DOUBLE) AS a2
      FROM base, p{p} GROUP BY t),
    c{r} AS (SELECT t, d, sx,
                    tt.t0 - (sum(a0) OVER w - a0) AS s0,
                    tt.t1 - (sum(a1) OVER w - a1) AS s1,
                    tt.t2 - (sum(a2) OVER w - a2) AS s2
             FROM g{r}, (SELECT CAST(sum(CAST((a0) AS {_COX_D12})) AS DOUBLE) AS t0,
                                CAST(sum(CAST((a1) AS {_COX_D12})) AS DOUBLE) AS t1,
                                CAST(sum(CAST((a2) AS {_COX_D12})) AS DOUBLE) AS t2
                         FROM g{r}) tt
             WINDOW w AS (ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    ui{r} AS (SELECT CAST(sum(CAST((sx - d * s1 / s0) AS {_COX_D12})) AS DOUBLE) AS u,
                     CAST(sum(CAST((d * (s2 / s0 - (s1 / s0) * (s1 / s0)))
                                   AS {_COX_D12})) AS DOUBLE) AS i
              FROM c{r} WHERE d > 0),
    p{r} AS (SELECT p{p}.beta + ui{r}.u / ui{r}.i AS beta
             FROM p{p}, ui{r})"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    , nn AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
                    CAST(sum(ev) AS BIGINT) AS n_events FROM base)
    SELECT nn.n_total, nn.n_events,
           round(p{_COX_STEPS}.beta, 6) AS beta,
           round(exp(p{_COX_STEPS}.beta), 6) AS hazard_ratio
    FROM nn, p{_COX_STEPS}"""
    )


@query("cox_ph_newton", oracle=_cox_oracle())
def cox_ph_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox proportional-hazards regression of order fulfillment on
    (scaled) order value — TWO unrolled Newton steps on the Breslow
    partial likelihood, the regression companion of the
    kaplan_meier/logrank/rmst survival stack: β answers "do expensive
    orders complete faster?" with censoring handled correctly, and
    exp(β) is the reported hazard ratio.  Scale shape per step: one
    combinable per-distinct-time aggregate of the β-weighted sums
    (e^{{βx}}, x·e^{{βx}}, x²·e^{{βx}} and the event-side d, Σx), ONE
    pinned two-phase prefix-sum pass (selection.running_sums — the
    kaplan_meier at-risk discipline) whose SUFFIX form total−before
    yields every risk-set sum, and a 1-row score/information fold →
    closed-form update.  All folds fixed-point at 12 digits; the
    weight/update expressions mirror textually; round(6)."""
    from covid_custom_sql_engine_spark.operators import selection as sel

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").isNotNull())
        .select("l_orderkey", "l_shipdate")
    )
    base = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(
            F.max("l_shipdate").alias("_last"),
            (F.max("o_totalprice") / 100000.0).alias("x"),
        )
        .select(
            F.datediff("_last", "o_orderdate").alias("t"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
            "x",
        )
        .filter(F.col("t") >= 0)
        .localCheckpoint(eager=False)  # reused every Newton step
    )
    beta = spark.range(1).select(F.lit(0.0).alias("beta"))
    for _ in range(_COX_STEPS):
        g = (
            base.crossJoin(F.broadcast(beta))
            .groupBy("t")
            .agg(
                F.sum("ev").cast("double").alias("d"),
                ops.dsum12(F.col("ev") * F.col("x")).alias("sx"),
                ops.dsum12(F.exp(F.col("beta") * F.col("x"))).alias("a0"),
                ops.dsum12(
                    F.col("x") * F.exp(F.col("beta") * F.col("x"))
                ).alias("a1"),
                ops.dsum12(
                    F.col("x") * F.col("x") * F.exp(F.col("beta") * F.col("x"))
                ).alias("a2"),
            )
        )
        g = g.localCheckpoint(eager=False)  # totals + prefix pass
        tt = F.broadcast(
            g.agg(
                ops.dsum12(F.col("a0")).alias("t0"),
                ops.dsum12(F.col("a1")).alias("t1"),
                ops.dsum12(F.col("a2")).alias("t2"),
            )
        )
        cum = sel.running_sums(g, "t", ["a0", "a1", "a2"])
        c = cum.crossJoin(tt).select(
            "t",
            "d",
            "sx",
            (F.col("t0") - (F.col("_cum_a0") - F.col("a0"))).alias("s0"),
            (F.col("t1") - (F.col("_cum_a1") - F.col("a1"))).alias("s1"),
            (F.col("t2") - (F.col("_cum_a2") - F.col("a2"))).alias("s2"),
        )
        ui = c.filter(F.col("d") > 0).agg(
            ops.dsum12(
                F.col("sx") - F.col("d") * F.col("s1") / F.col("s0")
            ).alias("u"),
            ops.dsum12(
                F.col("d")
                * (
                    F.col("s2") / F.col("s0")
                    - (F.col("s1") / F.col("s0")) * (F.col("s1") / F.col("s0"))
                )
            ).alias("i"),
        )
        beta = beta.crossJoin(F.broadcast(ui)).select(
            (F.col("beta") + F.col("u") / F.col("i")).alias("beta")
        )
    nn = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("ev").cast("bigint").alias("n_events"),
    )
    return nn.crossJoin(F.broadcast(beta)).select(
        "n_total",
        "n_events",
        F.round(F.col("beta"), 6).alias("beta"),
        F.round(F.exp(F.col("beta")), 6).alias("hazard_ratio"),
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
