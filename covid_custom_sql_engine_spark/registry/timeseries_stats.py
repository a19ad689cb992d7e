"""Time-series diagnostics and forecasting on the calendar-reduced
daily frame (round-10 continuation, split from stats_ml.py in round 11).

Autocorrelation, day-of-week decomposition, backtested linear
forecasts, the Markov entropy rate, and cross-distribution quantile
normalization. Same conventions as every family module (see _base).
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
# Holt-Winters additive one-step forecast (unrolled recurrence)
# ---------------------------------------------------------------------------

_HW_K = 28  # recurrence window: last 4 weekly cycles, unrolled
_HW_A, _HW_B, _HW_G = "0.3", "0.1", "0.2"
# s[dow] lookup and the update expressions, generated ONCE as text and
# evaluated verbatim by both engines (the markov_attribution / mmr
# convention) — identical opcode order, no decimal folds needed inside
# the 1-row recurrence.
_HW_SD = (
    "(CASE dow WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3 WHEN 4 THEN s4"
    " WHEN 5 THEN s5 WHEN 6 THEN s6 ELSE s7 END)"
)
_HW_FC = f"(l + b + {_HW_SD})"
_HW_NL = f"({_HW_A} * (y - {_HW_SD}) + (1 - {_HW_A}) * (l + b))"
_HW_NB = f"({_HW_B} * ({_HW_NL} - l) + (1 - {_HW_B}) * b)"


def _hw_ns(d: int) -> str:
    return (
        f"(CASE WHEN dow = {d} THEN {_HW_G} * (y - {_HW_NL})"
        f" + (1 - {_HW_G}) * s{d} ELSE s{d} END)"
    )


def _hw_oracle() -> str:
    upd = ",\n           ".join(
        [f"{_HW_NL} AS l", f"{_HW_NB} AS b",
         f"sae + abs(y - {_HW_FC}) AS sae"]
        + [f"{_hw_ns(d)} AS s{d}" for d in range(1, 8)]
    )
    ctes = [
        _SQL_DAILY_SPINE.strip(),
        f"""tl AS (SELECT 28 - (m.b - s.d) AS i, s.y, isodow(s.d) AS dow
          FROM s, m WHERE m.b - s.d < {_HW_K}),
    pre AS (SELECT s.y, isodow(s.d) AS dow, (m.b - s.d) AS dd
            FROM s, m WHERE m.b - s.d >= {_HW_K}),
    l0c AS (SELECT {_sql_dsum('y')} / 7 AS l0 FROM pre
            WHERE dd BETWEEN 28 AND 34),
    pw AS (SELECT {_sql_dsum('y')} / 7 AS lp FROM pre
           WHERE dd BETWEEN 35 AND 41),
    mu AS (SELECT {_sql_dsum('y')} / count(*) AS mu FROM pre),
    sea AS (SELECT dow, {_sql_dsum('y')} / count(*) - max(mu.mu) AS sd
            FROM pre, mu GROUP BY dow),
    p0 AS (SELECT l0c.l0 AS l, (l0c.l0 - pw.lp) / 7 AS b, 0.0 AS sae,
       {", ".join(f"coalesce(max(CASE WHEN dow = {d} THEN sd END), 0.0) AS s{d}" for d in range(1, 8))}
            FROM sea, l0c, pw GROUP BY l0c.l0, pw.lp)""",
    ]
    for r in range(1, _HW_K + 1):
        ctes.append(
            f"""p{r} AS (SELECT {upd}
            FROM p{r - 1}, tl WHERE tl.i = {r})"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    nxt AS (SELECT isodow(b + INTERVAL 1 DAY) AS dow FROM m),
    cnt AS (SELECT count(*) AS n FROM s)
    SELECT CAST(cnt.n AS BIGINT) AS n_days,
           round(p.l, 6) AS level, round(p.b, 6) AS trend,
           round(p.sae / {_HW_K}, 6) AS mae_1step,
           round(p.l + p.b + (CASE nxt.dow WHEN 1 THEN p.s1 WHEN 2 THEN p.s2
                 WHEN 3 THEN p.s3 WHEN 4 THEN p.s4 WHEN 5 THEN p.s5
                 WHEN 6 THEN p.s6 ELSE p.s7 END), 6) AS forecast_next
    FROM p{_HW_K} p, nxt, cnt"""
    )


@query("holt_winters_forecast", oracle=_hw_oracle())
def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + trend + weekly seasonality,
    α=0.3 β=0.1 γ=0.2) one-step revenue forecast — the ORDER-DEPENDENT
    smoothing recurrence `ewma_smooth` solved in closed form at window
    scale, lifted to the seasonal case where no closed form exists:
    the last 28 days of the zero-filled calendar spine run the exact
    per-day recurrence UNROLLED (28 rounds, 1-row state of
    level/trend/7 seasonal indices/absolute-error sum), initialized in
    closed form from the prefix (level = last prefix week's mean,
    trend = week-over-week delta / 7, seasonal = per-DOW prefix mean −
    prefix mean — all decimal-fold aggregates).  The TPC-H calendar is
    ~2,400 days at EVERY SF, so the 28-round unroll is a fixed cost
    while init scales with data; day indexing is date arithmetic off
    the 1-row min/max frame — no single-partition window.  All update
    expressions are generated once as text and evaluated verbatim by
    both engines; outputs round(6).  Beats-the-mean readout: mae_1step
    is the 28-day one-step backtest next to `forecast_backtest`'s OLS
    baseline."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(F.to_date("o_orderdate").alias("t"), "o_totalprice")
    )
    d0 = o.groupBy("t").agg(ops.dsum(F.col("o_totalprice")).alias("y"))
    m = d0.agg(F.min("t").alias("a"), F.max("t").alias("b")).localCheckpoint(
        eager=False
    )  # 1-row min/max with THREE consumers (spine explode, bm, nxt) —
    # pinned so the orders scan + daily aggregate runs once, not thrice
    sp = m.select(F.explode(F.sequence("a", "b")).alias("d"))
    s = (
        sp.join(d0, sp["d"] == d0["t"], "left")
        .select("d", F.coalesce(F.col("y"), F.lit(0.0)).alias("y"))
        .localCheckpoint(eager=False)  # tail + prefix + count reuse
    )
    bm = F.broadcast(m.select(F.col("b").alias("_b")))
    dd = F.datediff(F.col("_b"), F.col("d"))
    tl = (
        s.crossJoin(bm)
        .filter(dd < _HW_K)
        .select(
            (F.lit(_HW_K) - dd).alias("i"),
            "y",
            F.dayofweek(F.date_sub(F.col("d"), 1)).alias("dow"),
        )
        .localCheckpoint(eager=False)  # one 1-row probe per round
    )
    pre = (
        s.crossJoin(bm)
        .filter(dd >= _HW_K)
        .select(
            "y",
            F.dayofweek(F.date_sub(F.col("d"), 1)).alias("dow"),
            dd.alias("dd"),
        )
        .localCheckpoint(eager=False)  # four init aggregates
    )
    l0c = pre.filter(F.col("dd").between(28, 34)).agg(
        (ops.dsum(F.col("y")) / 7).alias("l0")
    )
    pw = pre.filter(F.col("dd").between(35, 41)).agg(
        (ops.dsum(F.col("y")) / 7).alias("lp")
    )
    mu = F.broadcast(
        pre.agg((ops.dsum(F.col("y")) / F.count(F.lit(1))).alias("mu"))
    )
    sea = (
        pre.crossJoin(mu)
        .groupBy("dow")
        .agg(
            (ops.dsum(F.col("y")) / F.count(F.lit(1)) - F.max("mu")).alias(
                "sd"
            )
        )
    )
    p = (
        sea.crossJoin(F.broadcast(l0c))
        .crossJoin(F.broadcast(pw))
        .groupBy("l0", "lp")
        .agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("dow") == d, F.col("sd"))), F.lit(0.0)
                ).alias(f"s{d}")
                for d in range(1, 8)
            ]
        )
        .select(
            F.col("l0").alias("l"),
            ((F.col("l0") - F.col("lp")) / 7).alias("b"),
            F.lit(0.0).alias("sae"),
            *[f"s{d}" for d in range(1, 8)],
        )
    )
    # Optimization r13 (the r12 pivot kept 28 chained 1-row
    # localCheckpoint projections — 28 driver plan-compile round trips
    # — and the builder's own bench floors showed it REGRESSING
    # 3.3 → 5.2 s; the r13 verdict's item 2): the whole 28-round
    # recurrence is now ONE sequential ``aggregate()`` fold over the
    # 28-day tail collected into a single sorted array-of-structs row.
    # The fold's lambda evaluates the SAME generated update texts the
    # oracle unrolls — state fields rewritten onto the accumulator
    # struct (l → acc.l, …), the day's observation onto the element
    # (y → e.y, dow → e.dow) in one word-boundary pass — so every
    # double is produced by the identical opcode sequence in the
    # identical order and the oracle does not move. One projection,
    # no per-round pins, no broadcast-per-round: the plan is O(1) in
    # the round count.
    import re as _re

    tarr = F.broadcast(
        tl.groupBy().agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("i"), F.col("y"), F.col("dow")))
            ).alias("_tl")
        )
    )

    def _on_fold(text: str) -> str:
        return _re.sub(
            r"\b(sae|dow|s[1-7]|l|b|y)\b",
            lambda mm: (
                f"e.{mm.group(1)}"
                if mm.group(1) in ("y", "dow")
                else f"acc.{mm.group(1)}"
            ),
            text,
        )

    state0 = "named_struct(" + ", ".join(
        f"'{c}', {c}" for c in ["l", "b", "sae"] + [f"s{d}" for d in range(1, 8)]
    ) + ")"
    upd = "named_struct(" + ", ".join(
        [
            f"'l', {_on_fold(_HW_NL)}",
            f"'b', {_on_fold(_HW_NB)}",
            f"'sae', {_on_fold(f'sae + abs(y - {_HW_FC})')}",
        ]
        + [f"'s{d}', {_on_fold(_hw_ns(d))}" for d in range(1, 8)]
    ) + ")"
    p = (
        p.crossJoin(tarr)
        .select(F.expr(f"aggregate(_tl, {state0}, (acc, e) -> {upd})").alias("_st"))
        .select(
            *[F.col(f"_st.{c}").alias(c) for c in ["l", "b", "sae"]],
            *[F.col(f"_st.s{d}").alias(f"s{d}") for d in range(1, 8)],
        )
    )
    nxt = F.broadcast(
        m.select(
            F.dayofweek(F.col("b")).alias("ndow")
        )  # dayofweek(b+1-1): isodow(b+1) == dayofweek(b) shifted; see below
    )
    # isodow(b + 1) expressed via Spark: dayofweek is 1=Sunday..7=Saturday;
    # isodow is 1=Monday..7=Sunday. isodow(x) = dayofweek(date_sub(x, 1)).
    # So isodow(b + 1) = dayofweek(b).
    cnt = F.broadcast(s.agg(F.count(F.lit(1)).alias("n")))
    return (
        p.crossJoin(nxt)
        .crossJoin(cnt)
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.round(F.col("l"), 6).alias("level"),
            F.round(F.col("b"), 6).alias("trend"),
            F.round(F.col("sae") / _HW_K, 6).alias("mae_1step"),
            F.round(
                F.col("l")
                + F.col("b")
                + F.expr(
                    "CASE ndow WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3"
                    " WHEN 4 THEN s4 WHEN 5 THEN s5 WHEN 6 THEN s6 ELSE s7 END"
                ),
                6,
            ).alias("forecast_next"),
        )
    )
