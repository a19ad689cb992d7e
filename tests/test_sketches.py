"""Sketch family: count-min frequency estimation + HyperLogLog
cardinality (functions/sketches.py). Verifies the mathematical
guarantees (never-undercount, mergeability, error bounds) — the
properties that make the sketches trustworthy as 100 TB first-pass
filters."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.catalog import load_table
from covid_custom_sql_engine_spark.functions import sketches as sk


def test_cms_never_undercounts(spark, sf_dir):
    """Count-min estimates are ≥ the true count for EVERY key (the
    one-sided error guarantee the heavy-hitter superset relies on)."""
    l = load_table(spark, sf_dir, "lineitem")
    est = sk.cms_estimate(
        sk.cms_sketch(l, "l_partkey"), l.select("l_partkey").distinct(), "l_partkey"
    )
    true = l.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("true_count"))
    joined = est.join(true, "l_partkey").collect()
    assert len(joined) == true.count()
    assert all(r.est_count >= r.true_count for r in joined)


def test_cms_overestimate_bounded(spark, sf_dir):
    """With width=1024 and N rows, the expected overshoot per cell is
    N/1024; the min over 4 independent rows keeps the typical estimate
    close to truth. Assert the MEAN overshoot is within 3·N/width (a
    loose Markov-style bound that still catches a broken hash)."""
    l = load_table(spark, sf_dir, "lineitem")
    n = l.count()
    est = sk.cms_estimate(
        sk.cms_sketch(l, "l_partkey"), l.select("l_partkey").distinct(), "l_partkey"
    )
    true = l.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("true_count"))
    rows = est.join(true, "l_partkey").collect()
    mean_over = sum(r.est_count - r.true_count for r in rows) / len(rows)
    assert mean_over <= 3 * n / 1024


def test_cms_sketch_size_bounded(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    assert sk.cms_sketch(l, "l_partkey", depth=3, width=64).count() <= 3 * 64


def test_cms_heavy_hitters_superset(spark, sf_dir):
    """Every TRUE heavy hitter appears in the sketch-filtered output."""
    l = load_table(spark, sf_dir, "lineitem")
    hh = {r.l_partkey for r in sk.cms_heavy_hitters(l, "l_partkey", threshold=8).collect()}
    true = {
        r.l_partkey
        for r in l.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter("c >= 8")
        .collect()
    }
    assert true <= hh


def test_cms_sketch_merges_by_addition(spark, sf_dir):
    """Partial sketches over disjoint splits sum cell-wise to the full
    sketch — the property that makes the build map-side combinable (and
    lets incremental batches fold into a running sketch)."""
    l = load_table(spark, sf_dir, "lineitem")
    a = l.filter("l_orderkey % 2 = 0")
    b = l.filter("l_orderkey % 2 = 1")
    merged = (
        sk.cms_sketch(a, "l_partkey")
        .unionByName(sk.cms_sketch(b, "l_partkey"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = sk.cms_sketch(l, "l_partkey")
    key = lambda rows: sorted((r.row, r.bucket, r.cnt) for r in rows)
    assert key(merged.collect()) == key(full.collect())


def test_hll_close_to_true_distinct(spark):
    """p=10 → relative standard error ≈ 1.04/√1024 ≈ 3.3%. Assert the
    estimate of 20k synthetic keys lands within 4 std errors."""
    df = spark.range(20_000).select(F.col("id").alias("k"))
    est = sk.hll_distinct(df, "k", p=10).collect()[0].hll_distinct
    assert abs(est - 20_000) / 20_000 < 4 * 0.033


def test_hll_duplicates_do_not_move_estimate(spark):
    """Cardinality, not frequency: replicating every key 7× must give
    the identical register table, hence the identical estimate."""
    base = spark.range(5_000).select(F.col("id").alias("k"))
    dup = base.crossJoin(spark.range(7).select(F.lit(1).alias("_d"))).select("k")
    a = sk.hll_distinct(base, "k").collect()[0].hll_distinct
    b = sk.hll_distinct(dup, "k").collect()[0].hll_distinct
    assert a == b


def test_hll_registers_merge_by_max(spark):
    """Union cardinality from cell-wise max of per-split registers ==
    registers of the union (mergeable state: each split can be sketched
    where it lives and only ≤2^p rows travel)."""
    a = spark.range(0, 8_000).select(F.col("id").alias("k"))
    b = spark.range(4_000, 12_000).select(F.col("id").alias("k"))  # overlaps a
    merged_regs = (
        sk.hll_registers(a, "k")
        .unionByName(sk.hll_registers(b, "k"))
        .groupBy("bucket")
        .agg(F.max("m_rho").alias("m_rho"))
    )
    est_merged = sk.hll_estimate(merged_regs).collect()[0].hll_distinct
    est_union = sk.hll_distinct(a.unionByName(b), "k").collect()[0].hll_distinct
    assert est_merged == est_union


def test_hll_empty_input_returns_empty(spark):
    # Documented behavior: an empty register table folds to a 0-row
    # result (not a NULL row) — the groupBy has nothing to aggregate.
    df = spark.range(0).select(F.col("id").alias("k"))
    rows = sk.hll_distinct(df, "k").collect()
    assert rows == []


def test_sketch_plans_stay_in_codegen(spark, sf_dir):
    """No Python UDFs, no cartesian joins of data-sized sides: the only
    BroadcastNestedLoopJoin allowed is the 1-row rmax broadcast in the
    HLL fold."""
    l = load_table(spark, sf_dir, "lineitem")
    p1 = (
        sk.cms_heavy_hitters(l, "l_partkey", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonUDF" not in p1 and "CartesianProduct" not in p1
    p2 = sk.hll_distinct(l, "l_orderkey")._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in p2 and "CartesianProduct" not in p2


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    """Every built key must pass its own filter — the guarantee the
    pre-join filter pattern rests on."""
    build = spark.range(0, 3_000).select(F.col("id").alias("k"))
    bits = sk.bloom_bits(build, "k", num_bits=65536, num_hashes=3)
    probed = sk.bloom_probe(bits, build, "k", num_bits=65536, num_hashes=3)
    assert probed.filter(~F.col("maybe_present")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Non-members mostly fail the filter: with n=3000, m=65536, k=3
    the theoretical FP rate is ~0.2%; allow 2%."""
    build = spark.range(0, 3_000).select(F.col("id").alias("k"))
    bits = sk.bloom_bits(build, "k", num_bits=65536, num_hashes=3)
    outside = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    fp = sk.bloom_probe(bits, outside, "k", 65536, 3).filter("maybe_present").count()
    assert fp <= 200


def test_bloom_bits_merge_by_union(spark):
    """bits(A ∪ B) == bits(A) ∪ bits(B): filters build distributively,
    so per-partition partial filters union into the global one."""
    a = spark.range(0, 500).select(F.col("id").alias("k"))
    b = spark.range(400, 900).select(F.col("id").alias("k"))
    merged = (
        sk.bloom_bits(a, "k", 4096, 3)
        .unionByName(sk.bloom_bits(b, "k", 4096, 3))
        .distinct()
    )
    full = sk.bloom_bits(a.unionByName(b), "k", 4096, 3)
    assert sorted(r.bit for r in merged.collect()) == sorted(
        r.bit for r in full.collect()
    )


# ---------------------------------------------------------------------------
# Weighted sampling
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_weighted(spark):
    from covid_custom_sql_engine_spark.functions.corpus import weighted_sample

    rows = [(i, 100.0 if i < 100 else 1.0) for i in range(2_000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    s1 = [r.doc_id for r in weighted_sample(df, "w", 200).collect()]
    s2 = [r.doc_id for r in weighted_sample(df.repartition(17), "w", 200).collect()]
    assert sorted(s1) == sorted(s2)           # partitioning-invariant
    assert len(s1) == 200 and len(set(s1)) == 200   # without replacement
    # the 100 heavy docs (weight 100×) should nearly all be sampled
    heavy = sum(1 for d in s1 if d < 100)
    assert heavy >= 80


def test_weighted_sample_excludes_nonpositive(spark):
    from covid_custom_sql_engine_spark.functions.corpus import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = {r.doc_id for r in weighted_sample(df, "w", 10).collect()}
    assert got == {1, 5}


def test_hll_grouped_matches_global_per_group(spark):
    """The grouped build must produce, per group, exactly the estimate
    the global path gives on that group's rows alone."""
    from covid_custom_sql_engine_spark.functions.sketches import (
        hll_distinct, hll_distinct_grouped,
    )

    df = spark.range(30_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 7919).alias("k")
    )
    grouped = {
        r.g: r.hll_distinct
        for r in hll_distinct_grouped(df, "k", ["g"]).collect()
    }
    for g in range(3):
        solo = hll_distinct(df.filter(F.col("g") == g), "k").collect()[0].hll_distinct
        assert grouped[g] == solo


def test_kmv_setops_accuracy_and_exact_below_k(spark):
    """KMV: below k the sketch IS the distinct set (exact estimates);
    at scale the union/intersection estimates land near truth."""
    from covid_custom_sql_engine_spark.functions.sketches import (
        kmv_estimate_expr,
        kmv_minima,
    )
    from pyspark.sql import functions as F

    # 30 distinct keys in group a < k=64 -> exact
    small = spark.createDataFrame(
        [("a", i) for i in range(30) for _ in range(3)], "g string, k bigint"
    )
    sk = kmv_minima(small, "g", "k", k=64)
    row = sk.select(kmv_estimate_expr("hs", 64).alias("e")).collect()[0]
    assert row.e == 30.0

    # a = 0..1999, b = 1000..2999: union 3000, intersection 1000
    big = spark.createDataFrame(
        [("a", i) for i in range(2000)] + [("b", i) for i in range(1000, 3000)],
        "g string, k bigint",
    )
    sk2 = {r.g: r.hs for r in kmv_minima(big, "g", "k", k=256).collect()}
    merged = sorted(set(sk2["a"]) | set(sk2["b"]))[:256]
    hk = merged[-1]
    est_u = 255.0 * float(1 << 60) / hk
    rho = len([h for h in merged if h in set(sk2["a"]) and h in set(sk2["b"])]) / 256.0
    est_i = rho * est_u
    # KMV standard error ~ 1/sqrt(k-2) ≈ 6.3% at k=256; allow 4 sigma
    assert abs(est_u - 3000) / 3000 < 0.25
    assert abs(est_i - 1000) / 1000 < 0.5


def test_item_cf_cosine_on_known_baskets(spark, tmp_path):
    """Three baskets: parts 1,2 co-occur twice (c1=3, c2=2), parts 1,3
    once (pruned by min support 2) -> cosine(1,2) = 2/sqrt(6)."""
    import math

    rows = [
        (10, 1), (10, 2),
        (20, 1), (20, 2),
        (30, 1), (30, 3),
    ]
    df = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from covid_custom_sql_engine_spark.registry import sketches as rsk

    out = rsk.item_cf_topk(spark, str(tmp_path)).collect()
    got = {(r.part, r.neighbor): (r.support, r.cosine, r.rn) for r in out}
    assert set(got) == {(1, 2), (2, 1)}
    c = round(2 / math.sqrt(3 * 2), 6)
    assert got[(1, 2)] == (2, c, 1) and got[(2, 1)] == (2, c, 1)
