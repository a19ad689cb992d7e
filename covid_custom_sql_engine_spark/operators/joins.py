"""Extended join family beyond the reference (SURVEY §7 phase 3).

The reference implements inner/left hash join only (dataframe.py:214-248).
A complete engine needs semi/anti (built-in join types), plus as-of and
range joins, which Spark lacks as primitives — implemented here as
shuffle-friendly compositions (no cartesian products, no driver loops).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (backward) or the earliest with
    ``right_ts >= left_ts`` (forward), within the same ``key``;
    ``tolerance_seconds`` nulls matches farther than the tolerance
    (pandas ``merge_asof`` semantics).

    Scale design: instead of an O(n·m) inequality join, union both sides
    tagged, sort within each key partition by time, and carry the last
    right values forward with ``last(ignorenulls)`` — one shuffle on
    ``key``, one window sort, linear in n+m. This is the merge-scan
    formulation of as-of used by time-series engines, expressed with
    Spark windows so Catalyst/Tungsten execute it. ``forward`` is the
    same scan in reverse time order.

    Ties (right_ts == left_ts) match, right rows sort first at equal
    timestamps (side ordering 0 < 1).
    """
    if direction not in ("backward", "forward"):
        raise NotImplementedError(f"unsupported as-of direction: {direction}")
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "_side",
        "_lrow",
        "_ts",
        F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias("_matched_ts"),
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"r_{c}") for c in value_cols],
    )
    if tolerance_seconds is not None:
        # timestampdiff works uniformly on TIMESTAMP and TIMESTAMP_NTZ
        # (a double cast is illegal for NTZ), and microsecond units keep
        # sub-second tolerances exact.
        gap = (
            F.abs(F.expr("timestampdiff(MICROSECOND, _matched_ts, _ts)"))
            / F.lit(1_000_000.0)
        )
        within = F.col("_matched_ts").isNotNull() & (gap <= F.lit(float(tolerance_seconds)))
        carried = carried.select(
            "_side",
            "_lrow",
            *[F.when(within, F.col(f"r_{c}")).alias(f"r_{c}") for c in value_cols],
        )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"r_{c}") for c in value_cols],
    )


def range_join(
    events: DataFrame,
    ranges: DataFrame,
    point_col: str,
    range_start: str,
    range_end: str,
    broadcast_ranges: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Range (interval) join: event point ∈ [start, end).

    With a small ranges side, broadcast turns this into a
    BroadcastNestedLoopJoin with the band predicate evaluated in codegen
    — no shuffle at all. For two large sides, pre-bucket both on a
    time-bucket key first (bucketed variant in streaming/windows.py keeps
    the same semantics with an equi-join on the bucket).
    """
    r = F.broadcast(ranges) if broadcast_ranges else ranges
    cond = (F.col(point_col) >= F.col(range_start)) & (F.col(point_col) < F.col(range_end))
    return events.join(r, cond, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join: explode each RIGHT row into ``salt``
    copies tagged 0..salt-1, tag each LEFT row with a deterministic
    pseudo-random salt from its key's hash, and join on (key, salt).

    A hot key's rows — which would all land in one shuffle partition and
    make one task run ``salt×`` longer than the rest — spread across
    ``salt`` partitions; the right side pays a ``salt×`` duplication of
    (typically dim-sized) rows. AQE's skew-join split handles moderate
    skew automatically; this is the explicit tool for extreme, known-hot
    keys. Results are identical to the plain join (salting is physical,
    not semantic).

    The left salt MUST vary per row, not per key — hashing the key
    itself would give every row of the hot key the same salt and undo
    the whole mitigation. A row-unique id feeds the hash so the hot
    key's rows spread uniformly over the ``salt`` partitions.

    Only ``inner`` and ``left`` joins are supported: the exploded right
    side would surface ``salt`` copies of unmatched right rows under
    right/full semantics.
    """
    if how not in ("inner", "left"):
        raise NotImplementedError(f"salted_join supports inner/left, got: {how}")
    l_salted = left.withColumn(
        "_lsalt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    r_salted = right.withColumn(
        "_rsalt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(
        r_salted,
        (l_salted[left_key] == r_salted[right_key])
        & (l_salted["_lsalt"] == r_salted["_rsalt"]),
        how,
    )
    return out.drop("_lsalt", "_rsalt")


def interval_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval-overlap join (half-open [start, end) semantics) between
    two interval tables, scale-correct for big×big inputs.

    A naive theta join (``a.start < b.end AND b.start < a.end``) is a
    nested-loop product. Instead both sides explode into the time
    buckets each interval covers, equi-join on the bucket (a plain
    shuffled hash join), verify the exact overlap predicate, and keep
    each pair only in its FIRST shared bucket — two overlapping
    intervals both cover ``greatest(trunc(a_start), trunc(b_start))``,
    so that bucket emits the pair exactly once. Unlike a ``distinct()``
    over the output (which would also collapse pairs produced by
    genuinely duplicate input rows), this preserves the multiset
    semantics of the theta join it replaces. Cost is |rows| × avg
    buckets-per-interval — tune ``bucket`` to the typical interval
    length.

    Rows with ``end < start`` (invalid intervals — ``F.sequence`` would
    raise on them) are dropped from each side.
    """

    unit = bucket.split()[-1].rstrip("s")  # "1 hour" -> truncate to hour

    def buckets(df: DataFrame, start: str, end: str, alias: str) -> DataFrame:
        return df.filter(F.col(end) >= F.col(start)).withColumn(
            alias,
            F.explode(
                F.sequence(
                    F.date_trunc(unit, F.col(start)),
                    F.date_trunc(unit, F.col(end)),
                    F.expr(f"INTERVAL {bucket}"),
                )
            ),
        )

    ab = buckets(a, a_start, a_end, "_bkt")
    bb = buckets(b, b_start, b_end, "_bkt")
    first_shared = F.greatest(
        F.date_trunc(unit, F.col(a_start)), F.date_trunc(unit, F.col(b_start))
    )
    return (
        ab.join(bb, "_bkt")
        .filter((F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end)))
        .filter(F.col("_bkt") == first_shared)
        .drop("_bkt")
    )
