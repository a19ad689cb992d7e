"""Write paths (sinks) for the engine's outputs.

The reference's only sink is interactive display (SURVEY §3); these are
the production write paths a Spark pipeline needs:

- ``write_partitioned``: hive-style directory partitioning — partition
  pruning makes `WHERE pcol = x` skip whole directories at read time.
- ``write_bucketed``: hash-bucketed, sorted managed table — two tables
  bucketed on the same key join WITHOUT a shuffle (the Spark analogue of
  co-located joins; at 100 TB this turns the biggest repeated join cost
  into a one-time write cost).
- ``write_single_csv``: display/export edge (the reference's CSV shape),
  coalesced to one file — never used in engine paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Parquet partitioned by the given columns (partition pruning path).

    Partition columns should be low-cardinality (dates, categories); a
    high-cardinality partition column creates a small-files problem at
    scale — prefer bucketing for keys.
    """
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) managed table.

    Joins/aggregations between tables bucketed on the same keys with the
    same bucket count need no exchange — Catalyst recognizes the
    co-partitioning from the catalog. ``sort_by`` additionally enables
    shuffle-AND-sort-free sort-merge joins.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def write_single_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One-file CSV export (display edge only — single-writer bottleneck)."""
    df.coalesce(1).write.mode(mode).option("header", True).csv(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """ORC sink (Spark-native columnar alternative to parquet — some
    warehouses standardize on it). Same pruning/pushdown properties:
    Catalyst pushes filters and column selection into the ORC scan."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 128,
) -> int:
    """Compact a small-files parquet directory in place: rewrite to
    ⌈bytes / target⌉ files (streaming sinks and frequent appends leave
    hundreds of tiny files; scans then pay per-file open/footer cost).
    Returns the new file count.

    The rewrite stages into a sibling temp dir and swaps via two
    renames. A failed compaction never LOSES data, but the swap is not
    atomic: between the two renames the dataset is briefly absent at
    ``path`` (readers racing the swap can see a missing directory), and
    an interrupted run can leave the data parked at the ``._compact_old``
    backup — the next invocation detects that state and restores it
    before doing anything else, and clears any stale temp/backup
    leftovers so reruns never collide with dead directories. The backup
    is deleted only AFTER the swapped-in data is validated readable.
    Local-filesystem only (os.rename/os.walk — object stores need a
    manifest-swap pattern instead). Row order is not preserved (parquet
    directories are unordered sets anyway).
    """
    import math
    import os
    import shutil

    tmp = path.rstrip("/") + "._compact_tmp"
    backup = path.rstrip("/") + "._compact_old"
    # recover an interrupted swap: the backup holds the only copy
    if not os.path.exists(path) and os.path.exists(backup):
        os.rename(backup, path)
    # clear stale leftovers from dead runs (path exists → they're duplicates)
    for stale in (tmp, backup):
        if os.path.exists(stale):
            shutil.rmtree(stale)

    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, backup)
    os.rename(tmp, path)
    try:
        spark.read.parquet(path).schema  # footer read: swapped-in data is readable
    except Exception:
        shutil.rmtree(path, ignore_errors=True)  # roll back to the backup
        os.rename(backup, path)
        raise
    shutil.rmtree(backup)
    return len([f for f in os.listdir(path) if f.endswith(".parquet")])
