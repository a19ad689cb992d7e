"""Incremental-maintenance operators: MERGE-style upsert and SCD2.

The reference engine is batch-only over immutable CSVs; any production
deployment of the same pipelines needs the maintenance half — applying
a change set to a dimension (MERGE INTO semantics) and keeping row
history (slowly-changing dimension type 2). Both are expressed as pure
DataFrame plans so they run identically on any table source and stay
inside whole-stage codegen.

Scale posture: ``merge_upsert`` is ONE full-outer equi-join on the key
(broadcast when the change set is small — the common case for
dimension maintenance); ``scd2_intervals`` is one window function pass
partitioned by the key. Neither collects anything to the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE INTO semantics as a plan: rows matched on ``key`` take the
    update's non-null column values (partial-column updates — a NULL in
    the update means "keep the base value"); unmatched update rows are
    inserts; unmatched base rows pass through. Output schema = base
    schema; update columns not in the base are ignored.

    Plan shape: Spark cannot broadcast a FULL OUTER hash join, so the
    naive full-outer formulation sort-merge-shuffles the whole base.
    With ``broadcast_updates=True`` (default — dimension change sets
    are small relative to the dimension) the merge decomposes so the
    base is NEVER shuffled:

    - updated rows: base LEFT OUTER broadcast(updates) — a broadcast
      hash join, base stays in place;
    - inserts: updates LEFT ANTI broadcast(matched keys), where the
      matched keys come from a broadcast semi-join — small by
      construction (⊆ update keys).

    Two base scans instead of one, but scans are cheap and shuffles are
    not. Pass ``broadcast_updates=False`` for fact-sized change sets:
    one full-outer shuffle join on the key (AQE handles skew).

    The change set must be pre-deduplicated to one row per key (use
    ``composites.latest_per_group`` / ``argmax_latest``) — enforced
    nowhere here because checking would cost a scan; DuckDB's MERGE has
    the same contract.
    """
    upd_cols = set(updates.columns)
    u = updates.select(
        F.col(key).alias("_uk"),
        *[F.col(c).alias(f"_u_{c}") for c in updates.columns if c != key],
    )
    base_types = dict(zip(base.columns, [f.dataType for f in base.schema.fields]))

    if not broadcast_updates:
        joined = base.join(u, base[key] == u["_uk"], "full_outer")
        out_cols = []
        for c in base.columns:
            if c == key:
                out_cols.append(F.coalesce(base[key], F.col("_uk")).alias(key))
            elif c in upd_cols:
                out_cols.append(F.coalesce(F.col(f"_u_{c}"), base[c]).alias(c))
            else:
                out_cols.append(base[c].alias(c))
        return joined.select(*out_cols)

    matched = base.join(F.broadcast(u), base[key] == u["_uk"], "left").select(
        *[
            F.coalesce(F.col(f"_u_{c}"), base[c]).alias(c)
            if c in upd_cols and c != key
            else base[c].alias(c)
            for c in base.columns
        ]
    )
    matched_keys = base.select(F.col(key).alias("_uk")).join(
        F.broadcast(u.select("_uk")), "_uk", "left_semi"
    )
    inserts = u.join(F.broadcast(matched_keys), "_uk", "left_anti").select(
        *[
            F.col("_uk").cast(base_types[c]).alias(c)
            if c == key
            else (
                F.col(f"_u_{c}").cast(base_types[c]).alias(c)
                if c in upd_cols
                else F.lit(None).cast(base_types[c]).alias(c)
            )
            for c in base.columns
        ]
    )
    return matched.unionByName(inserts)


def scd2_intervals(
    changes: DataFrame,
    key: str,
    order_col: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: one validity
    interval per change row — ``valid_from`` = the row's ``order_col``,
    ``valid_to`` = the next change for the same key (NULL while
    current), ``is_current`` on the last row per key.

    One window pass partitioned by key, ordered by (order_col, and the
    full attr tuple as a deterministic tiebreak for same-instant
    changes). No shuffle beyond the window's key partitioning.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(order_col), *[F.col(a) for a in attrs]
    )
    nxt = F.lead(order_col).over(w)
    return changes.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(order_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of the same table: one row per key that was
    added, removed, or changed (unchanged keys drop out) — the change
    data feed between versions, and MERGE's inverse: applying the diff
    to ``old`` reproduces ``new``.

    Output: (key, change_type ∈ {'added','removed','changed'}). One
    full-outer shuffle join on the key; change detection compares the
    requested columns null-safely (``<=>``) so NULL→value edits count
    as changes. At warehouse scale both sides hash-partition on the
    key — AQE splits skew; no broadcast (snapshots are both large).

    ``compare_cols=None`` derives the shared non-key columns;
    ``compare_cols=[]`` (or tables sharing only the key) is an explicit
    added/removed-only diff — matched keys count as unchanged when
    there is nothing to compare.
    """
    cols = (
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c != key and c in new.columns]
    )
    o = old.select(
        F.col(key).alias("_ok"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        F.col(key).alias("_nk"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    j = o.join(n, o["_ok"] == n["_nk"], "full_outer")
    same = F.lit(True)  # no compare columns → matched keys are unchanged
    for c in cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_ok").isNull(), F.lit("added"))
        .when(F.col("_nk").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.select(
            F.coalesce(F.col("_ok"), F.col("_nk")).alias(key),
            change.alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )


# --- Incremental materialized-view maintenance (mergeable rollup state) ---
#
# The pattern that makes a 100 TB rollup affordable: never re-aggregate
# history. Keep the view as per-key PARTIAL aggregate state whose fields
# form commutative monoids (count/sum/min/max), fold each new batch to
# the same state shape, and merge states key-wise. merge(state(A),
# state(B)) == state(A ∪ B) exactly — with the decimal sum the equality
# is bit-level under ANY batch split, which is what the registry query's
# oracle (a direct full recompute) verifies. Deletes/retractions are NOT
# supported: min/max are not groups (no inverse), the classic MV
# limitation — route deletes through snapshot_diff + full refresh of the
# affected keys instead.


def rollup_state(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Fold a batch into per-key mergeable state:
    (keys..., _n, _sum decimal(38,6), _min, _max).

    One map-side-combinable hash aggregate — O(|keys|) state per
    partition regardless of batch size. ``_sum`` stays fixed-point so
    later merges are order-independent (associative AND commutative to
    the bit)."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("_n"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("_sum"),
        F.min(value_col).alias("_min"),
        F.max(value_col).alias("_max"),
    )


def merge_rollup_states(*states: DataFrame) -> DataFrame:
    """Key-wise merge of rollup states (count adds, sum adds, min mins,
    max maxes). Union + re-aggregate: the natural Spark shape — partial
    merge happens map-side, one shuffle of O(|keys|) rows total, and a
    key present in only some states needs no special case (absent =
    monoid identity = simply not in the union)."""
    keys = [c for c in states[0].columns if not c.startswith("_")]
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.sum("_n").alias("_n"),
        F.sum("_sum").alias("_sum"),
        F.min("_min").alias("_min"),
        F.max("_max").alias("_max"),
    )


def finalize_rollup(state: DataFrame, value_col: str) -> DataFrame:
    """Render state as the user-facing view:
    (keys..., n_{v}, sum_{v}, avg_{v}, min_{v}, max_{v}) with the
    engine's deterministic double conventions (sum cast from the exact
    decimal; avg = sum/n, NULL on zero count). A projection — no
    shuffle; run it on the merged state each refresh."""
    keys = [c for c in state.columns if not c.startswith("_")]
    v = value_col
    return state.select(
        *keys,
        F.col("_n").alias(f"n_{v}"),
        F.col("_sum").cast("double").alias(f"sum_{v}"),
        F.when(
            F.col("_n") > 0, (F.col("_sum").cast("double") / F.col("_n"))
        ).alias(f"avg_{v}"),
        F.col("_min").alias(f"min_{v}"),
        F.col("_max").alias(f"max_{v}"),
    )
