"""Z-order (Morton-curve) data layout: cluster rows so that parquet
row-group/file min-max statistics stay tight on SEVERAL columns at once,
giving multi-dimensional data skipping — filter on ANY of the z-ordered
columns prunes most files, where a linear sort helps only its leading
column.

Everything is integer bit arithmetic in Column expressions (whole-stage
codegen; DuckDB can mirror it exactly for oracles). The layout job is
the standard write-side pattern: quantize each dimension to a
``bits``-wide integer, interleave the bits into one Morton key, then
range-partition + sort by that key so each output file covers a small
2-D (or k-D) tile of the value space.

Beyond-reference scope (the reference has no storage layout control at
all); the technique is the public Z-order clustering used by lakehouse
table formats, re-expressed with plain Spark primitives.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BITS = 16


def quantize(col: Column, lo: float, hi: float, bits: int = DEFAULT_BITS) -> Column:
    """Map a numeric column into the integer grid [0, 2^bits): linear
    scale from the caller-supplied domain, clamped at both ends (values
    outside [lo, hi] land in the edge cells; NULL → cell 0). Explicit
    bounds keep the mapping deterministic and engine-portable — derive
    them from a stats pass if unknown."""
    cells = (1 << bits) - 1
    scaled = F.floor((col.cast("double") - lo) / (hi - lo) * (1 << bits))
    # coalesce INSIDE least/greatest: both engines' least/greatest skip
    # NULL args, so a NULL scaled value would otherwise win as the cap
    return F.greatest(
        F.lit(0), F.least(F.lit(cells), F.coalesce(scaled, F.lit(0)))
    ).cast("bigint")


def interleave_bits(cols: Sequence[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton key: bit i of column k lands at position i*len(cols)+k.
    k·bits total bits (keep ≤ 62 for bigint). Unrolled shift/mask terms
    — pure codegen integer ops, no UDF."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError(f"{k} cols × {bits} bits exceeds bigint range")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
            ).cast("bigint")
    return z


def sql_zvalue(
    col_exprs: Sequence[str],
    bounds: Sequence[tuple[float, float]],
    bits: int = DEFAULT_BITS,
) -> str:
    """DuckDB rendering of quantize+interleave (same arithmetic)."""
    cells = (1 << bits) - 1
    qs = [
        f"greatest(0, least({cells}, coalesce(floor((CAST({e} AS DOUBLE) - ({lo!r})) / ({hi!r} - ({lo!r})) * {1 << bits}), 0)))::BIGINT"
        for e, (lo, hi) in zip(col_exprs, bounds)
    ]
    k = len(qs)
    terms = [
        f"((({q} >> {i}) & 1) << {i * k + j})"
        for i in range(bits)
        for j, q in enumerate(qs)
    ]
    return "(" + " + ".join(terms) + ")"


def zvalue(
    cols: Sequence[Column],
    bounds: Sequence[tuple[float, float]],
    bits: int = DEFAULT_BITS,
) -> Column:
    """Quantize each column over its domain and interleave."""
    return interleave_bits(
        [quantize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)], bits
    )


def zorder_by(
    df: DataFrame,
    cols: Sequence[str],
    bounds: Sequence[tuple[float, float]],
    bits: int = DEFAULT_BITS,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` re-clustered along the Morton curve of ``cols`` —
    write the result and every output file covers a compact k-D tile,
    so parquet min-max stats prune on any of the dimensions.

    One range exchange on the z-key (samples only the key) + in-
    partition sort; the helper column is dropped before handing back.
    At 100 TB this is the layout job you run once per table/partition,
    amortized over every subsequent selective read."""
    z = zvalue([F.col(c) for c in cols], bounds, bits).alias("_z")
    base = df.withColumn("_z", z)
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        base.repartitionByRange(p, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted parquet table: rows
    are hash-distributed into ``n_buckets`` files per partition by
    ``bucket_col`` and sorted by it inside each bucket — the write-side
    half of the co-located join contract. Two fact tables bucketed the
    SAME way (same column semantics, same bucket count) join WITHOUT
    any Exchange: the planner proves both sides already share the
    required hash distribution and goes straight to a sort-merge join
    on pre-sorted buckets — at 100 TB that deletes the two largest
    shuffles a fact⋈fact query pays, paid once at ingest and amortized
    over every subsequent join (the same economics as
    :func:`zorder_by`, applied to join keys instead of filter
    columns).

    Spark's bucketing metadata lives in the session catalog, so this
    registers an EXTERNAL table at ``path`` (data outlives the catalog
    entry; re-registering is cheap). Bucket-pruning on point
    predicates over ``bucket_col`` comes free with the same layout.
    """
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )
