"""Sublinear-state sketches: count-min frequency estimation and
HyperLogLog distinct counting, built on deterministic md5-derived hash
functions so results are reproducible across engines, partitionings and
reruns (and therefore DuckDB-oracle-able).

Why sketches at all: at 100 TB an exact `GROUP BY key` for "which keys
are hot?" or an exact `COUNT(DISTINCT key)` shuffles the full key set.
Both sketches here reduce to ONE map-side-combinable aggregation whose
state is a few KB regardless of input size:

- count-min: `depth × width` counters (per-partition partial sketches
  merge by cell-wise addition — exactly what Spark's partial hash
  aggregate does for `count`);
- HyperLogLog: `m = 2^p` registers merged by cell-wise `max`.

Everything is Column expressions (whole-stage codegen, no Python in the
hot path); all cross-engine-sensitive arithmetic stays in exact
integers until one final division (see :func:`hll_estimate`).

Beyond-reference scope: the reference engine (angelaykang/
covid-custom-sql-engine, src/dataframe.py) has only exact aggregates;
these are the approximate counterparts a training-data pipeline needs
for frequency capping and cardinality monitoring at corpus scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# 15 hex chars = 60 bits: fits a signed BIGINT exactly, same parse on
# DuckDB via ('0x' || substr(md5(...), 1, 15))::BIGINT.
_HEX_CHARS = 15
_HASH_BITS = 4 * _HEX_CHARS


def _h60(prefix: str, col: Column) -> Column:
    """Deterministic 60-bit non-negative hash of ``prefix + value``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, _HEX_CHARS),
        16,
        10,
    ).cast("bigint")


def _sql_h60(prefix: str, col_sql: str) -> str:
    """DuckDB rendering of :func:`_h60` (same md5 → same value)."""
    return (
        f"('0x' || substr(md5('{prefix}' || CAST({col_sql} AS VARCHAR)),"
        f" 1, {_HEX_CHARS}))::BIGINT"
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a count-min sketch: ``(row, bucket, cnt)`` with at most
    ``depth × width`` rows. ONE shuffle of at most ``depth × width``
    distinct groups; the map side pre-aggregates, so each of N input
    partitions contributes ≤ depth × width partial rows no matter how
    many input rows it holds — the 100 TB shuffle is O(partitions ×
    sketch size), not O(data).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (_h60(f"cms{i}:", F.col(key_col)) % width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each key's frequency from a sketch: the MIN over
    the key's ``depth`` cells (count-min guarantees estimate ≥ true
    count, with overshoot ≤ 2·N/width at ~1−(1/2)^depth confidence).
    A cell absent from the sketch table means no build-side key hashed
    there, i.e. count 0 — hence the LEFT join + ``coalesce(cnt, 0)``,
    so probing a key the sketch never saw correctly estimates 0
    instead of vanishing or taking a min over colliding cells only.

    The sketch side is tiny (≤ depth × width rows) → broadcast join;
    the keys side streams map-side with no shuffle of its own beyond
    the final per-key min aggregate.
    """
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (_h60(f"cms{i}:", F.col(key_col)) % width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Keys whose estimated frequency ≥ ``threshold``. Because count-min
    never underestimates, this is a SUPERSET of the true heavy hitters —
    the cheap first pass that bounds an expensive exact follow-up to a
    handful of candidate keys.

    Output: (key, est_count), filtered to the heavy candidates.
    """
    sketch = cms_sketch(df, key_col, depth, width)
    keys = df.select(key_col).distinct()
    return cms_estimate(sketch, keys, key_col, depth, width).filter(
        F.col("est_count") >= threshold
    )


def sql_cms_heavy_hitters(
    table: str,
    key_sql: str,
    key_alias: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB oracle for :func:`cms_heavy_hitters` (same hashes, same
    min-over-cells arithmetic)."""

    def bucket_case(expr: str) -> str:
        whens = " ".join(
            f"WHEN {i} THEN {_sql_h60(f'cms{i}:', expr)} % {width}"
            for i in range(depth)
        )
        return f"CASE u.i {whens} END"

    return f"""
    WITH depths AS (SELECT unnest(range({depth})) AS i),
    sketch AS (
        SELECT row, bucket, count(*) AS cnt FROM (
            SELECT u.i AS row, {bucket_case(key_sql)} AS bucket
            FROM {table}, depths u
        ) GROUP BY row, bucket
    ),
    probes AS (
        SELECT k.{key_alias}, u.i AS row, {bucket_case('k.' + key_alias)} AS bucket
        FROM (SELECT DISTINCT {key_sql} AS {key_alias} FROM {table}) k, depths u
    )
    SELECT p.{key_alias}, min(s.cnt) AS est_count
    FROM probes p JOIN sketch s USING (row, bucket)
    GROUP BY p.{key_alias}
    HAVING min(s.cnt) >= {threshold}
    """


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def bloom_bits(
    df: DataFrame, key_col: str, num_bits: int = 4096, num_hashes: int = 7
) -> DataFrame:
    """Build-side of a Bloom filter: the DISTINCT set bit positions
    (≤ ``num_bits`` rows) from ``num_hashes`` md5-derived positions per
    key. Map-side-combinable (distinct = per-partition dedup first);
    merging two filters = union of their bit tables. This is the
    pre-join filter pattern: ship these ≤num_bits rows (or the packed
    bitmap they represent) to the probe side instead of the key set —
    at 100 TB the build side's keys may be billions of rows, the filter
    stays KBs."""
    positions = F.array(
        *[
            (_h60(f"bloom{i}:", F.col(key_col)) % num_bits).alias(f"p{i}")
            for i in range(num_hashes)
        ]
    )
    return (
        df.select(F.explode(positions).alias("bit"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    keys: DataFrame,
    key_col: str,
    num_bits: int = 4096,
    num_hashes: int = 7,
) -> DataFrame:
    """Probe keys against a Bloom bit table: ``maybe_present`` is TRUE
    iff ALL ``num_hashes`` positions are set (no false negatives;
    false-positive rate ≈ (1 − e^(−kn/m))^k). The bit table broadcasts;
    the probe side never shuffles beyond its per-key aggregate."""
    positions = F.array(
        *[
            (_h60(f"bloom{i}:", F.col(key_col)) % num_bits)
            for i in range(num_hashes)
        ]
    )
    probed = (
        keys.select(key_col, F.explode(positions).alias("bit"))
        .join(
            F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left"
        )
        .groupBy(key_col)
        .agg((F.min(F.coalesce("_set", F.lit(0))) == 1).alias("maybe_present"))
    )
    return probed


def sql_bloom_position(col_sql: str, num_bits: int, i: int) -> str:
    """DuckDB rendering of the i-th Bloom hash position."""
    return f"({_sql_h60(f'bloom{i}:', col_sql)} % {num_bits})"


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _alpha(m: int) -> float:
    # Flajolet et al. 2007 bias constant (m ≥ 128 branch).
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, key_col: str, p: int = 10) -> DataFrame:
    """HLL register table ``(bucket, m_rho)``: bucket = low ``p`` hash
    bits, m_rho = max over bucket members of (position of the first set
    bit in the remaining ``60−p`` bits). ≤ ``2^p`` rows after one
    map-side-combinable max aggregate — the canonical mergeable
    cardinality state (union of datasets = cell-wise max of registers).

    rho is computed EXACTLY with integer bit-length (``length(bin(w))``
    = floor(log2 w)+1; both engines' ``bin`` strips leading zeros — no
    float log), so Spark and the DuckDB oracle agree bit-for-bit. The
    hash is kept integer throughout: ``shiftright`` for the high bits,
    never a double-typed division.
    """
    m = 1 << p
    rest_bits = _HASH_BITS - p
    h = _h60("hll:", F.col(key_col))
    w = F.shiftright(h, p)  # high 60−p bits, exact
    rho = F.when(w == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits + 1) - F.length(F.bin(w))
    )
    return (
        df.select((h % m).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 10) -> DataFrame:
    """Fold ≤``2^p`` registers into the HLL cardinality estimate with
    EXACT integer arithmetic until the final division: the harmonic-mean
    denominator Σ 2^(−M_j) is computed as S / 2^Rmax where
    S = Σ 2^(Rmax − M_j) is an order-independent bigint sum (Rmax ≤ 51,
    ≤ 2^p terms → S < 2^61, no overflow), so the result cannot drift
    with aggregation order — hash-stable across engines. Small-range
    correction: linear counting m·ln(m/V) when E < 2.5·m and V > 0
    registers are empty. Empty register table → EMPTY (0-row) result
    (the groupBy has nothing to fold; callers wanting a literal 0 can
    coalesce against it).

    Output: 1 row, ``hll_distinct`` double rounded to 4 decimals.
    """
    m = 1 << p
    a = _alpha(m)
    rmax = F.broadcast(
        registers.agg(
            F.max("m_rho").alias("rmax"), F.count(F.lit(1)).alias("nbuckets")
        )
    )
    # pyspark's F.shiftleft only takes a literal numBits; the SQL form
    # accepts a column — still pure integer codegen.
    folded = (
        registers.crossJoin(rmax)
        .groupBy("rmax", "nbuckets")
        .agg(F.sum(F.expr("shiftleft(1L, int(rmax - m_rho))")).alias("s"))
    )
    v = F.lit(m) - F.col("nbuckets")  # empty registers (M_j = 0 ⇒ 2^0 = 1 each)
    denom = F.col("s") + v * F.expr("shiftleft(1L, int(rmax))")
    e_raw = F.lit(a * m * m) * F.pow(F.lit(2.0), F.col("rmax").cast("double")) / denom
    est = F.when(
        (e_raw < 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(e_raw)
    return folded.select(F.round(est, 4).alias("hll_distinct"))


def hll_distinct(df: DataFrame, key_col: str, p: int = 10) -> DataFrame:
    """End-to-end: registers → single-row estimate."""
    return hll_estimate(hll_registers(df, key_col, p), p)


def hll_distinct_grouped(
    df: DataFrame, key_col: str, group_cols: Sequence[str], p: int = 10
) -> DataFrame:
    """Per-group HLL cardinality: ``group_cols + (hll_distinct,)``.

    Same exact-integer folding as :func:`hll_estimate`, vectorized over
    groups: register build is one hash aggregate on (group, bucket)
    (≤ groups × 2^p rows, map-side combinable); the per-group Rmax
    comes from a window over the SAME (group)-partitioned data — no
    self-join, no second scan. State per group is ≤ 2^p rows at every
    stage, so a billion-group rollup (e.g. distinct users per hour ×
    type at 100 TB) never holds a key set anywhere."""
    m = 1 << p
    a = _alpha(m)
    gcols = list(group_cols)
    regs = (
        df.select(*gcols, *_hll_reg_cols(key_col, p))
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("m_rho"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*gcols)
    folded = (
        regs.withColumn("rmax", F.max("m_rho").over(w))
        .withColumn("nbuckets", F.count(F.lit(1)).over(w))
        .groupBy(*gcols, "rmax", "nbuckets")
        .agg(F.sum(F.expr("shiftleft(1L, int(rmax - m_rho))")).alias("s"))
    )
    v = F.lit(m) - F.col("nbuckets")
    denom = F.col("s") + v * F.expr("shiftleft(1L, int(rmax))")
    e_raw = F.lit(a * m * m) * F.pow(F.lit(2.0), F.col("rmax").cast("double")) / denom
    est = F.when(
        (e_raw < 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(e_raw)
    return folded.select(*gcols, F.round(est, 4).alias("hll_distinct"))


def _hll_reg_cols(key_col: str, p: int) -> list[Column]:
    """(bucket, rho) projection shared by the global and grouped builds."""
    m = 1 << p
    rest_bits = _HASH_BITS - p
    h = _h60("hll:", F.col(key_col))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits + 1) - F.length(F.bin(w))
    )
    return [(h % m).alias("bucket"), rho.alias("rho")]


def sql_hll_distinct(table: str, key_sql: str, p: int = 10) -> str:
    """DuckDB oracle for :func:`hll_distinct` (identical arithmetic:
    integer bit-length rho, integer shifted sum, one final division)."""
    m = 1 << p
    a = _alpha(m)
    rest = _HASH_BITS - p
    h = _sql_h60("hll:", key_sql)
    return f"""
    WITH regs AS (
        SELECT bucket, max(rho) AS m_rho FROM (
            SELECT ({h}) % {m} AS bucket,
                   CASE WHEN ({h}) >> {p} = 0 THEN {rest + 1}
                        ELSE {rest + 1} - length(bin(({h}) >> {p})) END AS rho
            FROM {table}
        ) GROUP BY bucket
    ),
    mx AS (SELECT max(m_rho) AS rmax, count(*) AS nbuckets FROM regs),
    folded AS (
        SELECT mx.rmax, mx.nbuckets,
               sum((1::BIGINT) << (mx.rmax - regs.m_rho))::BIGINT AS s
        FROM regs, mx GROUP BY mx.rmax, mx.nbuckets
    ),
    calc AS (
        SELECT (CAST({a!r} AS DOUBLE) * {m} * {m}) * power(2.0, rmax)
               / (s + ({m} - nbuckets) * ((1::BIGINT) << rmax)) AS e_raw,
               ({m} - nbuckets) AS v
        FROM folded
    )
    SELECT round(CASE WHEN e_raw < {2.5 * m} AND v > 0
                      THEN {float(m)!r} * ln({float(m)!r} / v)
                      ELSE e_raw END, 4) AS hll_distinct
    FROM calc
    """


def sql_hll_grouped(
    table: str, key_sql: str, group_sql: str, group_alias: str, p: int = 10
) -> str:
    """DuckDB oracle for :func:`hll_distinct_grouped` (identical
    arithmetic, one group column)."""
    m = 1 << p
    a = _alpha(m)
    rest = _HASH_BITS - p
    h = _sql_h60("hll:", key_sql)
    return f"""
    WITH base AS (
        SELECT {group_sql} AS {group_alias},
               ({h}) % {m} AS bucket,
               CASE WHEN ({h}) >> {p} = 0 THEN {rest + 1}
                    ELSE {rest + 1} - length(bin(({h}) >> {p})) END AS rho
        FROM {table}
    ),
    regs AS (SELECT {group_alias}, bucket, max(rho) AS m_rho
             FROM base GROUP BY {group_alias}, bucket),
    mx AS (SELECT {group_alias}, max(m_rho) AS rmax, count(*) AS nbuckets
           FROM regs GROUP BY {group_alias}),
    folded AS (
        SELECT regs.{group_alias}, mx.rmax, mx.nbuckets,
               sum((1::BIGINT) << (mx.rmax - regs.m_rho))::BIGINT AS s
        FROM regs JOIN mx USING ({group_alias})
        GROUP BY regs.{group_alias}, mx.rmax, mx.nbuckets
    )
    SELECT {group_alias},
           round(CASE WHEN (CAST({a!r} AS DOUBLE) * {m} * {m}) * power(2.0, rmax)
                           / (s + ({m} - nbuckets) * ((1::BIGINT) << rmax)) < {2.5 * m}
                       AND ({m} - nbuckets) > 0
                      THEN {float(m)!r} * ln({float(m)!r} / ({m} - nbuckets))
                      ELSE (CAST({a!r} AS DOUBLE) * {m} * {m}) * power(2.0, rmax)
                           / (s + ({m} - nbuckets) * ((1::BIGINT) << rmax)) END,
                 4) AS hll_distinct
    FROM folded
    """


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch: distinct counting with SET OPERATIONS
# ---------------------------------------------------------------------------


def kmv_minima(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
    splits: int = 32,
    prefix: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest 60-bit hash values of
    the group's distinct keys (Bar-Yossef et al. 2002). Where HLL
    (:func:`hll_registers`) only supports union, KMV sketches compose
    under union AND intersection: merging two sketches and re-taking
    the k minima gives the union sketch, and the fraction of those
    minima present in both input sketches estimates Jaccard — so
    |A∩B| ≈ ρ·|A∪B| falls out, the quantity overlap monitors actually
    want. Deterministic: the hash is the shared md5-based
    :func:`_h60`, so the sketch is a pure FUNCTION of the key set —
    bit-identical cross-engine, no seeds.

    Scale shape: distinct (group, hash) first (one combinable
    aggregate), then the classic two-level distributed top-k — k
    local minima per (group, hash-salt) bucket (each bucket sees
    ~distinct/splits values, and only k of them survive the local
    sort), then k global minima over the ≤splits·k survivors. The
    group key never becomes a shuffle hot-spot because the first
    level is salted; no window ever spans a whole group.

    Returns (group, hs) with ``hs`` the sorted array of ≤k minima.
    """
    g = F.col(group_col).alias("_g")
    d = df.select(g, _h60(prefix, F.col(key_col)).alias("_h")).distinct()
    local = (
        d.groupBy("_g", F.pmod(F.col("_h"), F.lit(splits)).alias("_salt"))
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_hs"))
        .select("_g", F.explode("_hs").alias("_h"))
    )
    return local.groupBy("_g").agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("hs")
    ).select(F.col("_g").alias(group_col), "hs")


def kmv_estimate_expr(hs_col: str, k: int) -> Column:
    """Distinct-count estimate from a KMV minima array: if the sketch
    is not full the count is EXACT (= array size); otherwise
    (k−1)·2^60 / h_k — the classic KMV estimator with h_k the k-th
    minimum normalized to (0,1). Pure arithmetic on the sketch."""
    hs = F.col(hs_col)
    full = F.size(hs) >= k
    hk = F.element_at(hs, k).cast("double")
    return F.when(
        full, (F.lit(float(k - 1)) * F.lit(float(1 << 60))) / hk
    ).otherwise(F.size(hs).cast("double"))
