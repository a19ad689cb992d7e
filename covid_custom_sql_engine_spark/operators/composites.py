"""Composite dataflow operators (SURVEY §2.2, A1-A20).

The reference app hand-rolls these in Python loops over column lists;
each is re-expressed here as a single declarative Spark idiom. These are
first-class engine capabilities, not app code.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def latest_per_group(df: DataFrame, key: str, metrics: Sequence[str]) -> DataFrame:
    """A3 — latest (max) value per group for many metrics in ONE pass.

    Reference builds ``LATEST_TBL`` with one groupby per metric
    (app.py:129-158, 303-337); Spark does all metrics in a single hash
    aggregate, sorted by group key (app sorts countries).
    """
    return (
        df.groupBy(key)
        .agg(*[F.max(m).alias(m) for m in metrics])
        .orderBy(key)
    )


def distinct_sorted(df: DataFrame, col: str) -> DataFrame:
    """A4 — ``sorted(list(set(col)))`` (app.py:143, 225, 324)."""
    return df.select(col).distinct().orderBy(col)


def argmax_latest(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    require_not_null: Sequence[str] = (),
) -> DataFrame:
    """A8/A9 — per-group row with the max ``order_col``.

    Reference scans forward keeping the max-date row with non-null data
    (app.py:712-729) / reverse-scan first-hit (app.py:812-828) — both
    collapse to one window idiom: row_number over desc order, keep rank 1.
    ``tiebreak`` makes the choice deterministic when order_col ties.
    """
    out = df
    if require_not_null:
        cond = None
        for c in require_not_null:
            cur = F.col(c).isNotNull()
            cond = cur if cond is None else (cond | cur)
        out = out.filter(cond)
    w = Window.partitionBy(key).orderBy(
        F.col(order_col).desc_nulls_last(), F.col(tiebreak).desc()
    )
    return out.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def pivot_wide(
    df: DataFrame,
    index: str,
    pivot_col: str,
    pivot_values: Sequence[str],
    metric: str,
    agg: str = "max",
) -> DataFrame:
    """A10 — long→wide pivot with max tie-break.

    Reference builds ``{date: {country: value}}`` row-by-row with max
    tie-break (app.py:1013-1024, 1123-1133). Passing explicit
    ``pivot_values`` avoids the extra distinct-collection job — at scale,
    an unbounded pivot is a driver-side collect; bound it.
    """
    from covid_custom_sql_engine_spark.operators.core import dsum

    agg_expr = {
        "max": F.max,
        "sum": F.sum,
        "avg": F.avg,
        "sum_det": lambda c: dsum(F.col(c)),  # order-independent sum
    }[agg](metric)
    return df.groupBy(index).pivot(pivot_col, list(pivot_values)).agg(agg_expr)


def _order_cols(order_col: str | Sequence[str]) -> list[str]:
    return [order_col] if isinstance(order_col, str) else list(order_col)


def locf(
    df: DataFrame,
    key: str,
    order_col: str | Sequence[str],
    value_col: str,
    out_col: str | None = None,
    initial: float | None = 0.0,
) -> DataFrame:
    """A11 — forward fill / last-observation-carried-forward.

    Reference carries ``last_val`` across sorted dates, starting at 0
    (app.py:1038-1046). Spark: ``last(ignorenulls)`` over an unbounded
    preceding window per group. This is a single sort-within-partition —
    no extra shuffle beyond partitioning by key. Pass multiple order
    columns to make the fill deterministic under timestamp ties.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*_order_cols(order_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = F.last(value_col, ignorenulls=True).over(w)
    if initial is not None:
        filled = F.coalesce(filled, F.lit(initial))
    return df.withColumn(out_col or f"{value_col}_filled", filled)


def rolling_avg(
    df: DataFrame,
    key: str,
    order_col: str | Sequence[str],
    value_col: str,
    window_rows: int = 7,
    out_col: str | None = None,
) -> DataFrame:
    """A19 — trailing k-row rolling mean (the OWID 7-day smoothing).

    ``avg over rowsBetween(-(k-1), 0)`` partitioned by series key
    (SURVEY A19 mapping).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*_order_cols(order_col))
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(out_col or f"{value_col}_smoothed", F.avg(value_col).over(w))


def stat_summary(
    df: DataFrame,
    metrics: Sequence[str],
    deterministic: bool = False,
    median_mode: str = "builtin",
) -> DataFrame:
    """A14 — multi-metric 7-fn statistical summary, one row per metric.

    Reference loops metrics × {count,sum,avg,min,max,median,std}
    (app.py:1343-1379). Here: one global aggregate computing all
    metric×fn cells, then an unpivot to the display shape (metric rows).
    The aggregate is a single pass; the unpivot is free (no shuffle).
    """
    from covid_custom_sql_engine_spark.operators.core import _agg_exprs

    # Exact percentiles aggregate on the object path (no codegen) and
    # drag every co-located function onto it; keeping them in a separate
    # aggregate leaves the sum/min/max/std block in whole-stage codegen
    # and lets the two single-row subtrees' stages run concurrently —
    # ~2× faster than one fused ObjectHashAggregate at sf0.1.
    #
    # Scale note: F.median's per-partition value→count maps all merge on
    # ONE reducer, so its memory grows with the global distinct count —
    # fine to ~10⁸ distinct values, a wall at a 100 TB scan. For that
    # regime pass median_mode="selection": exact two-phase bucketed
    # selection (operators/selection.exact_medians_plan — every phase a
    # codegen hash agg or a sliver scan, memory O(buckets)). Same values
    # to the last bit; a few extra stages, so the object path stays the
    # default at interactive scale.
    exprs: list[Column] = []
    for m in metrics:
        exprs.extend(
            _agg_exprs(m, ("count", "sum", "avg", "min", "max", "std"), deterministic)
        )
        exprs.append(F.count(F.col(m)).alias(f"_nn_{m}"))
    basic = df.agg(*exprs)
    if median_mode == "selection":
        from covid_custom_sql_engine_spark.operators.selection import exact_medians_plan

        # phase 1 (n/lo/hi) fused into the display aggregate: reference
        # count is COUNT(*) (dataframe.py:53-54) while the median needs
        # non-null counts, hence the hidden _nn columns.
        stats = basic.select(
            *[
                e
                for m in metrics
                for e in (
                    F.col(f"_nn_{m}").alias(f"count_{m}"),
                    F.col(f"min_{m}").alias(f"min_{m}"),
                    F.col(f"max_{m}").alias(f"max_{m}"),
                )
            ]
        )
        medians = exact_medians_plan(df, metrics, stats=stats)
    else:
        medians = df.agg(*[F.median(m).alias(f"median_{m}") for m in metrics])
    wide = basic.crossJoin(medians)
    structs = [
        F.struct(
            F.lit(m).alias("metric"),
            *[F.col(f"{fn}_{m}").cast("double").alias(fn) for fn in ("count", "sum", "avg", "min", "max", "median", "std")],
        )
        for m in metrics
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def rename_pretty(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """A15 — display-name projection (app.py:160-167)."""
    return df.select([F.col(c).alias(mapping.get(c, c)) for c in df.columns])


def lagged_corr_best(
    df: DataFrame,
    key: str,
    order_col: str | Sequence[str],
    x_col: str,
    y_col: str,
    max_lag: int,
    min_pairs: int = 3,
) -> DataFrame:
    """A20 — best-lag correlation search (the implied vaccination-effect
    analysis; primitive at dataframe.py:250-273, names at app.py:63-69).

    For each lag k in [0, max_lag]: safe-corr(x, y lagged k rows within
    each key series) with the reference's guards (min-pairs → NULL, zero
    denominator → 0.0), deterministic fixed-point sums. Returns one row
    per lag; callers pick the argmax. All lags compute in one pass over
    a single window sort.
    """
    from covid_custom_sql_engine_spark.operators.core import det_corr_exprs

    w = Window.partitionBy(key).orderBy(*_order_cols(order_col))
    lagged = df.select(
        F.col(x_col),
        *[F.lag(y_col, k).over(w).alias(f"_y_lag_{k}") for k in range(max_lag + 1)],
    )
    rows = []
    for k in range(max_lag + 1):
        n, corr = det_corr_exprs(F.col(x_col), F.col(f"_y_lag_{k}"), min_pairs)
        rows.append(
            F.struct(
                F.lit(k).alias("lag"),
                n.alias("n_pairs"),
                F.round(corr, 6).alias("corr"),
            )
        )
    return lagged.agg(F.array(*rows).alias("a")).select(F.explode("a").alias("s")).select("s.*")


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each step i, how many users
    completed steps 0..i IN ORDER (each step strictly after the
    previous one's first completion). Returns (step_idx, step, n_users,
    conversion) with conversion relative to step 0.

    Shape: step i is one equi-join of the step-i events against the
    survivors of step i−1 plus a hash aggregate — every shuffle is on
    the user key, so consecutive steps reuse the same partitioning; no
    window over raw events, no per-user sort. Funnel depth multiplies
    plan width, not data volume (survivors shrink monotonically).
    """
    base = events.select(
        F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"), F.col(type_col).alias("_ty")
    )
    counts = []
    cur: DataFrame | None = None
    for i, step in enumerate(steps):
        f = base.filter(F.col("_ty") == step)
        if cur is None:
            cur = f.groupBy("_u").agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                f.join(cur, "_u")
                .filter(F.col("_ts") > F.col("_t"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_t"))
            )
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).cast("bigint").alias("step_idx"),
                F.lit(step).alias("step"),
                F.col("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    w = Window.orderBy("step_idx").rowsBetween(Window.unboundedPreceding, 0)
    first = F.first("n_users").over(w)
    # NULL conversion when step 0 matched nobody (ANSI mode raises on /0)
    return out.withColumn(
        "conversion",
        F.round(F.when(first > 0, F.col("n_users") / first), 6),
    )


def time_weighted_avg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key time-weighted average: each value is held from its event
    until the next event of the same key; TWA = Σ value·Δt / Σ Δt. The
    aggregate a metrics/monitoring pipeline wants when samples arrive at
    irregular intervals (a plain avg over-weights bursts). The last
    event of each key carries no holding time; keys with one event (or
    zero elapsed time) yield NULL.

    Shape: one shuffle on the key for the lead() window, then a hash
    aggregate on the same partitioning (no second exchange). Holding
    times are exact microsecond integers (``timestampdiff`` — works on
    both TIMESTAMP and TIMESTAMP_NTZ), and both sums run as fixed-point
    decimals (core.dsum), so the final division is bit-identical across
    engines and partitionings.
    """
    from covid_custom_sql_engine_spark.operators.core import dsum

    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    dt_us = F.expr(f"timestampdiff(MICROSECOND, {ts_col}, _next_ts)")
    num = dsum(F.col(value_col) * F.col("_dt_us"))
    den = dsum(F.col("_dt_us"))
    return (
        df.withColumn("_next_ts", F.lead(ts_col).over(w))
        .filter(F.col("_next_ts").isNotNull())
        .withColumn("_dt_us", dt_us)
        .groupBy(key)
        .agg(
            F.when(den != 0, num / den).alias("twa"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


def event_transitions(
    df: DataFrame,
    key: str,
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """First-order transition counts: for each key's event sequence,
    count (state → next_state) bigrams — the Markov-chain / user-path
    building block. One shuffle on the key for the lead() window, then
    a hash aggregate on the tiny (state, next_state) domain.
    """
    w = Window.partitionBy(key).orderBy(*order_cols)
    return (
        df.withColumn("_next", F.lead(state_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(F.col(state_col).alias("from_state"), F.col("_next").alias("to_state"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def debounce_events(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    ts_col: str,
    gap: str = "5 minutes",
) -> DataFrame:
    """Keep the FIRST event of each rapid burst: events of the same key
    within ``gap`` of the previous kept-or-dropped event chain collapse
    to their first row (gaps-and-islands, chained proximity — the
    debounce a clickstream cleaning pass applies to double-fires and
    retry storms).

    One shuffle on the key; burst membership is a lag comparison plus a
    running sum over the same sort (no second exchange), then the
    burst's first row wins by row_number.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    brk = F.when(
        F.lag(ts_col).over(w).isNull()
        | (F.col(ts_col) >= F.lag(ts_col).over(w) + F.expr(f"INTERVAL {gap}")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = (
        df.withColumn("_brk", brk)
        .withColumn("_burst", F.sum("_brk").over(run))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*key_cols, "_burst").orderBy(*order_cols)
            ),
        )
    )
    return ranked.filter(F.col("_rn") == 1).drop("_brk", "_burst", "_rn")


def retention_cohorts(
    df: DataFrame,
    key: str,
    ts_col: str,
    granularity: str = "week",
) -> DataFrame:
    """Retention triangle: users bucketed by first-activity period
    (cohort), counted distinct per (cohort, periods-since-cohort).

    Shape: one aggregate keyed on the entity for first-seen (shuffle on
    the key), broadcast-joined back onto the activity scan (the cohort
    frame is one row per entity — at extreme entity counts swap the
    broadcast for a shuffle join, semantics unchanged), then a
    count_distinct on the small (cohort, offset) grid.
    """
    period = F.date_trunc(granularity, F.col(ts_col))
    first = df.groupBy(key).agg(F.min(period).alias("_cohort"))
    return (
        df.join(first, key)
        .select(
            F.col("_cohort").alias("cohort"),
            F.floor(
                F.expr(
                    f"timestampdiff({'WEEK' if granularity == 'week' else 'DAY'}, "
                    f"_cohort, date_trunc('{granularity}', {ts_col}))"
                )
            ).cast("bigint").alias("period_offset"),
            F.col(key).alias("_k"),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct("_k").alias("n_active"))
    )


def retention_matrix(
    df: DataFrame,
    key: str,
    ts_col: str,
    granularity: str = "week",
) -> DataFrame:
    """:func:`retention_cohorts` normalized to retention ratios.

    Cohort size needs no extra pass over the data: every entity is
    active in its own first period by definition, so the offset-0 row
    of the triangle IS the cohort size. The triangle is pinned (it has
    two consumers) and the size row broadcasts back onto it.

    Output: (cohort, period_offset, n_active, cohort_size,
    retention = n_active / cohort_size as exact int division → double).
    """
    per = retention_cohorts(df, key, ts_col, granularity).localCheckpoint(
        eager=False
    )
    sizes = per.filter(F.col("period_offset") == 0).select(
        "cohort", F.col("n_active").alias("cohort_size")
    )
    return per.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "period_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active") / F.col("cohort_size")).alias("retention"),
    )


def ewma(
    df: DataFrame,
    value_col: str,
    order_col: str | Sequence[str],
    partition_col: str | None = None,
    alpha: float = 0.9,
    span: int = 32,
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated exponentially-weighted moving average.

    The textbook EWMA is an order-dependent recurrence over the entire
    history — undistributable as stated. Truncating to the trailing
    ``span`` rows (residual weight α^span) makes it a window
    computation: collect the frame's values in order and fold them with
    a higher-order aggregate, acc = α·acc + x, normalized by the same
    fold over ones. α is multiplied step-by-step — never pow(), whose
    libm implementations differ in the last ulp across engines — so the
    result is bit-identical everywhere. Per-row cost is O(span)
    arithmetic; the only shuffle is the window's partition sort.

    NULL values must be pre-filtered by the caller when cross-engine
    parity matters: Spark's collect_list drops NULLs (DuckDB's list()
    keeps them), which silently shifts the frame.
    """
    orders = [order_col] if isinstance(order_col, str) else list(order_col)
    base = Window.partitionBy(partition_col) if partition_col is not None else Window
    w = base.orderBy(*orders).rowsBetween(-(span - 1), 0)
    a = F.lit(alpha)
    num = F.aggregate(F.col("_ewma_arr"), F.lit(0.0), lambda acc, x: acc * a + x)
    den = F.aggregate(
        F.col("_ewma_arr"), F.lit(0.0), lambda acc, x: acc * a + F.lit(1.0)
    )
    return (
        df.withColumn("_ewma_arr", F.collect_list(value_col).over(w))
        .withColumn(out_col, num / den)
        .drop("_ewma_arr")
    )
