"""Declarative data-quality expectations: validate a DataFrame against
a rule list and emit a violation report — the contract-checking layer a
training-data pipeline runs before (and after) every transform stage.

Design for scale: ALL row-level rules (not-null, set membership, range,
arbitrary boolean SQL) plus uniqueness fold into ONE aggregation pass
over the data — a single scan, conditional `sum` counters that combine
map-side, and one `count(distinct struct(...))` per uniqueness rule.
Referential-integrity rules each add one left-anti equi-join (the dim
side broadcasts when small). Nothing is collected; the report itself is
a ≤len(rules)-row DataFrame.

Beyond-reference scope (the reference's only validation is schema
checking at CSV load, src/schema.py); modeled on the expectation styles
of public tools like Great Expectations / dbt tests, re-expressed as
single-pass Spark aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule. ``kind`` ∈ {not_null, in_set, in_range, unique,
    satisfies, ref_integrity}. ``condition`` is a Column evaluating
    TRUE for rows that SATISFY the rule (unused for unique /
    ref_integrity)."""

    name: str
    kind: str
    condition: Column | None = None
    cols: tuple[str, ...] = field(default=())
    ref: DataFrame | None = None
    ref_col: str | None = None
    broadcast_ref: bool = False


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"{col}_not_null", "not_null", F.col(col).isNotNull())


def expect_in_set(col: str, values: list) -> Expectation:
    return Expectation(
        f"{col}_in_set", "in_set", F.col(col).isin(values) | F.col(col).isNull()
    )


def expect_in_range(col: str, lo, hi) -> Expectation:
    """NULLs pass (compose with not_null to reject them)."""
    c = F.col(col)
    return Expectation(
        f"{col}_in_range", "in_range", c.between(F.lit(lo), F.lit(hi)) | c.isNull()
    )


def expect_unique(*cols: str) -> Expectation:
    return Expectation("unique_" + "_".join(cols), "unique", None, tuple(cols))


def expect_satisfies(name: str, condition: Column) -> Expectation:
    return Expectation(name, "satisfies", condition)


def expect_ref_integrity(
    col: str, ref: DataFrame, ref_col: str, *, broadcast_ref: bool = False
) -> Expectation:
    """Every non-null ``col`` value must exist in ``ref[ref_col]``.

    ``broadcast_ref=True`` force-broadcasts the distinct reference keys
    — opt in ONLY when the caller knows the dim is small. The default
    leaves the join strategy to AQE / autoBroadcastJoinThreshold, so a
    large reference table cannot be driver-OOM'd by an unconditional
    hint."""
    return Expectation(
        f"{col}_ref_integrity", "ref_integrity", None, (col,), ref, ref_col,
        broadcast_ref,
    )


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Violation report: one row per rule —
    ``(rule, kind, violations, total, passed)``.

    One aggregation job covers every non-referential rule; uniqueness
    counts duplicate rows as ``total − count(distinct key)`` inside the
    same pass. Each ref-integrity rule contributes a broadcast-anti-join
    count unioned in (its scan prunes to the key column)."""
    agg_exprs: list[Column] = [F.count(F.lit(1)).alias("_total")]
    inline: list[Expectation] = []
    for e in expectations:
        if e.kind == "ref_integrity":
            continue
        if e.kind == "unique":
            agg_exprs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(F.struct(*[F.col(c) for c in e.cols]))
                ).alias(f"_v_{len(inline)}")
            )
        else:
            agg_exprs.append(
                F.sum(F.when(~e.condition, 1).otherwise(0)).alias(f"_v_{len(inline)}")
            )
        inline.append(e)

    spark = df.sparkSession
    reports: list[DataFrame] = []
    if inline:
        one = df.agg(*agg_exprs)
        stack = ", ".join(
            f"'{e.name}', '{e.kind}', bigint(_v_{i})" for i, e in enumerate(inline)
        )
        reports.append(
            one.select(
                F.expr(
                    f"stack({len(inline)}, {stack}) AS (rule, kind, violations)"
                ),
                F.col("_total").alias("total"),
            )
        )

    total_col = None
    for e in expectations:
        if e.kind != "ref_integrity":
            continue
        col = e.cols[0]
        ref_keys = e.ref.select(F.col(e.ref_col).alias(col)).distinct()
        if e.broadcast_ref:
            ref_keys = F.broadcast(ref_keys)
        missing = (
            df.select(F.col(col))
            .filter(F.col(col).isNotNull())
            .join(ref_keys, col, "left_anti")
            .agg(F.count(F.lit(1)).alias("violations"))
        )
        if total_col is None:
            total_col = df.agg(F.count(F.lit(1)).alias("total"))
        reports.append(
            missing.crossJoin(F.broadcast(total_col)).select(
                F.lit(e.name).alias("rule"),
                F.lit(e.kind).alias("kind"),
                F.col("violations").cast("long").alias("violations"),
                F.col("total"),
            )
        )

    if not reports:
        raise ValueError("validate requires at least one expectation")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule", "kind", "violations", "total", (F.col("violations") == 0).alias("passed")
    )


def inclusion_audit(
    candidates: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Inclusion-dependency (candidate foreign-key) discovery: for each
    ``(label, child_df, child_col, parent_df, parent_col)`` candidate,
    test whether every non-NULL child value appears in the parent
    column — the profiling primitive behind FK inference, referential-
    integrity monitoring, and join-key validation before a backfill
    (the IND sibling of the FD audit: FDs profile WITHIN a table, INDs
    BETWEEN tables). NULLs are excluded on both sides (SQL IND
    semantics — a NULL child never violates).

    Per candidate: collapse BOTH sides to distinct values first (two
    combinable aggregates — the full fact table never reaches the
    join), then ONE left join keyed on the value, already
    co-partitioned from the distincts, with a null-probe count. The
    result is one row per candidate; the union of per-candidate
    aggregates is a few-row frame regardless of input size.

    Returns (candidate, n_lhs_distinct, n_unmatched, holds).
    """
    rows = []
    for label, child, ccol, parent, pcol in candidates:
        lhs = (
            child.select(F.col(ccol).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .distinct()
        )
        rhs = (
            parent.select(F.col(pcol).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        miss = F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
        rows.append(
            lhs.join(rhs, "_v", "left").agg(
                F.lit(label).alias("candidate"),
                F.count(F.lit(1)).cast("bigint").alias("n_lhs_distinct"),
                miss.cast("bigint").alias("n_unmatched"),
                (miss == 0).alias("holds"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
