"""The reference's implied derived analytics (SURVEY §1.4 stretch).

The reference's PRETTY display map names four computed metrics that no
code in its snapshot actually produces (app.py:63-69):

- ``herd_threshold_estimate`` — "Herd Threshold Est. (%)"
- ``eff_40`` / ``eff_60`` — "Effect at 40% / 60% Vaccination (Δ cases)"
- ``economic_resilience_score`` — "Economic Resilience Score (Computed)"

A dashboard user sees those column headers with no numbers behind
them. This module supplies the missing computations with the obvious
public-knowledge definitions, built on the same deterministic-sum
discipline as the reference-parity ``safe_corr`` (operators/core.py):

- **Vaccination effect** = simple OLS of an outcome series y (new
  cases) on a vaccination-percent series x, pairwise-complete, with
  the safe-corr guards (min-pairs → NULL, zero denominator → 0.0
  slope). ``eff_k`` is the modeled Δ outcome going 0% → k%
  vaccination, i.e. ``slope · k``; ``herd_threshold_estimate`` is the
  x-intercept ``−intercept/slope`` (the vaccination percent at which
  the modeled outcome reaches zero), reported only when the fit says
  vaccination reduces the outcome (slope < 0) and clamped to [0, 100].
- **Economic resilience score** = the mean of min-max-normalized
  positive capacity indicators (GDP per capita, HDI, hospital beds)
  minus the min-max-normalized burden (deaths per million), one score
  per location in [−1, 1]. Min-max bounds are global aggregates —
  exact min/max, no float-sum order sensitivity.

Every aggregate uses fixed-point sums (:func:`ops.dsum`) so results
are bit-identical across partitionings and engines; the final
quotients are single IEEE ops evaluated in the same order on both
sides.

Scale shape: both metrics are ONE pass — a single whole-table (or
per-group) hash aggregate with map-side combine for the OLS sums, and
for the resilience score one global min/max aggregate broadcast back
over the rows (Spark plans the scalar agg as a separate stage and the
join is a broadcast of ONE row). No shuffle of the fact table beyond
the aggregates themselves; at 100 TB the OLS reduces to five decimal
sums per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from covid_custom_sql_engine_spark.operators.core import davg, dsum


def ols_exprs(
    x: Column, y: Column, min_pairs: int = 3
) -> tuple[Column, Column, Column]:
    """(n_pairs, slope, intercept) aggregate expressions for simple OLS
    over pairwise-complete (x, y), deterministic fixed-point sums, with
    the safe-corr guard discipline: n < min_pairs → NULL, zero variance
    in x → slope 0.0 (and intercept = mean(y))."""
    both = x.isNotNull() & y.isNotNull()
    xx, yy = F.when(both, x), F.when(both, y)
    n = F.count(xx)
    sx, sy = dsum(xx), dsum(yy)
    sxx, sxy = dsum(xx * xx), dsum(xx * yy)
    denom = n * sxx - sx * sx
    slope = (
        F.when(n < min_pairs, F.lit(None))
        .otherwise(
            F.when(denom <= 0, F.lit(0.0)).otherwise(
                (n * sxy - sx * sy) / denom
            )
        )
    )
    intercept = F.when(n >= min_pairs, (sy - slope * sx) / n)
    return n, slope, intercept


def vaccination_effect(
    df: DataFrame,
    x_col: str,
    y_col: str,
    effect_points: tuple[float, ...] = (40.0, 60.0),
    min_pairs: int = 3,
) -> DataFrame:
    """One-row frame with the reference's implied vaccination-effect
    metrics (display names app.py:63-69): ``n_pairs``, ``slope``,
    ``intercept``, ``eff_{k}`` per requested point, and
    ``herd_threshold_estimate``.

    ``eff_k = slope·k`` — the modeled Δ outcome at k% vaccination
    relative to 0%. ``herd_threshold_estimate = −intercept/slope``
    clamped to [0, 100], NULL unless slope < 0 (an estimate only
    exists when the fit says more vaccination → fewer cases). All
    doubles rounded to 6 for cross-engine display; the guards follow
    the reference's safe-corr conventions (dataframe.py:250-273).
    """
    n, slope, intercept = ols_exprs(F.col(x_col), F.col(y_col), min_pairs)
    row = df.agg(
        n.alias("n_pairs"), slope.alias("_b"), intercept.alias("_a")
    )
    herd = F.when(
        F.col("_b") < 0,
        F.least(
            F.greatest(-F.col("_a") / F.col("_b"), F.lit(0.0)), F.lit(100.0)
        ),
    )
    return row.select(
        "n_pairs",
        F.round("_b", 6).alias("slope"),
        F.round("_a", 6).alias("intercept"),
        *[
            F.round(F.col("_b") * F.lit(float(k)), 6).alias(
                f"eff_{int(k) if float(k).is_integer() else k}"
            )
            for k in effect_points
        ],
        F.round(herd, 6).alias("herd_threshold_estimate"),
    )


def economic_resilience_score(
    df: DataFrame,
    key_col: str,
    positive_cols: tuple[str, ...],
    burden_col: str,
) -> DataFrame:
    """Per-``key_col`` composite score: mean of min-max-normalized
    ``positive_cols`` minus min-max-normalized ``burden_col``; range
    [−1, 1], higher = more resilient (the reference's implied
    "Economic Resilience Score (Computed)", app.py:63).

    NULL indicator values drop out of that row's mean (pairwise-
    complete, the reference's null discipline); a column whose global
    max equals its min contributes nothing (0/0 guard → skipped). One
    hash aggregate per key plus one global min/max row broadcast back.
    """
    per_key = df.groupBy(F.col(key_col).alias("k")).agg(
        *[
            davg(F.col(c)).alias(f"_v_{c}")
            for c in (*positive_cols, burden_col)
        ]
    )
    bounds = per_key.agg(
        *[
            e
            for c in (*positive_cols, burden_col)
            for e in (
                F.min(f"_v_{c}").alias(f"_lo_{c}"),
                F.max(f"_v_{c}").alias(f"_hi_{c}"),
            )
        ]
    )

    def norm(c: str) -> Column:
        rng = F.col(f"_hi_{c}") - F.col(f"_lo_{c}")
        return F.when(
            rng > 0, (F.col(f"_v_{c}") - F.col(f"_lo_{c}")) / rng
        )

    pos = F.array(*[norm(c) for c in positive_cols])
    present = F.filter(pos, lambda v: v.isNotNull())
    pos_mean = F.when(
        F.size(present) > 0,
        F.aggregate(
            present, F.lit(0.0), lambda acc, v: acc + v
        )
        / F.size(present),
    )
    score = F.when(
        pos_mean.isNotNull() | norm(burden_col).isNotNull(),
        F.coalesce(pos_mean, F.lit(0.0))
        - F.coalesce(norm(burden_col), F.lit(0.0)),
    )
    return per_key.crossJoin(F.broadcast(bounds)).select(
        F.col("k").alias(key_col),
        F.round(score, 6).alias("economic_resilience_score"),
    )
