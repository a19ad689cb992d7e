"""Z-order layout (operators/layout.py): Morton-key arithmetic and the
actual clustering benefit — per-partition bounding boxes must be tight
on BOTH dimensions, which is what parquet min-max stats turn into
multi-dimensional file pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.operators import layout as zo


def test_interleave_known_value(spark):
    df = spark.range(1).select(
        zo.interleave_bits([F.lit(3).cast("bigint"), F.lit(1).cast("bigint")], bits=2).alias("z")
    )
    # a=0b11 → positions 0,2 ; b=0b01 → position 1 ⇒ 0b0111 = 7
    assert df.collect()[0].z == 7


def test_quantize_clamps_and_nulls(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (150.0,), (None,)], "v double"
    ).select(zo.quantize(F.col("v"), 0.0, 100.0, bits=8).alias("q"))
    got = [r.q for r in df.collect()]
    assert got[0] == 0          # below lo → clamped
    assert got[1] == 0
    assert got[2] == 128        # midpoint
    assert got[3] == 255        # hi → top cell (clamped from 256)
    assert got[4] == 255        # above hi → clamped
    assert got[5] == 0          # NULL → cell 0


def test_zvalue_matches_oracle_sql_shape(spark):
    """The SQL rendering and the Column rendering agree row-for-row."""
    import duckdb

    rows = [(i * 37 % 1000, float(i * 53 % 600)) for i in range(500)]
    df = spark.createDataFrame(rows, "a long, v double")
    bounds = [(0.0, 1000.0), (0.0, 600.0)]
    got = sorted(
        (r.a, r.v, r.z)
        for r in df.select(
            "a", "v", zo.zvalue([F.col("a"), F.col("v")], bounds, bits=8).alias("z")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    zsql = zo.sql_zvalue(["a", "v"], bounds, bits=8)
    want = sorted(map(tuple, con.execute(f"SELECT a, v, {zsql} FROM t").fetchall()))
    assert got == want


def test_zorder_preserves_rows(spark):
    df = spark.range(5_000).select(
        (F.col("id") % 97).alias("a"), (F.col("id") % 89).cast("double").alias("b")
    )
    out = zo.zorder_by(df, ["a", "b"], [(0.0, 97.0), (0.0, 89.0)])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))


def test_zorder_enables_second_dimension_pruning(spark):
    """The data-skipping claim, stated as a reader would experience it:
    a selective filter on the NON-leading dimension `b` can prune files
    whose [min_b, max_b] excludes the predicate range. Under a linear
    sort on `a`, every partition spans nearly all of `b` — nothing
    prunes. Under z-order, each partition covers a compact Morton tile
    (b-span ≈ 256-512 of 1024), so most partitions prune. (Total
    bounding-box AREA is roughly invariant between the two layouts —
    z-order trades leading-dimension tightness for tightness on every
    dimension, which is exactly the multi-dim skipping win.)"""
    n = 20_000
    df = spark.range(n).select(
        F.pmod(F.hash(F.col("id")), F.lit(1024)).cast("bigint").alias("a"),
        F.pmod(F.hash(F.col("id") + 7), F.lit(1024)).cast("double").alias("b"),
    )
    bounds = [(0.0, 1024.0), (0.0, 1024.0)]

    def b_boxes(frame):
        return [
            (r.lo, r.hi)
            for r in frame.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
            .collect()
        ]

    def pruned(boxes, q_lo, q_hi):
        return sum(1 for lo, hi in boxes if hi < q_lo or lo > q_hi)

    zboxes = b_boxes(zo.zorder_by(df, ["a", "b"], bounds, num_partitions=16))
    lboxes = b_boxes(df.repartitionByRange(16, "a").sortWithinPartitions("a"))
    assert len(zboxes) >= 8 and len(lboxes) >= 8
    # query: b in [0, 100] — a 10% slice of the domain
    assert pruned(lboxes, 0.0, 100.0) == 0          # linear layout: no file prunes
    assert pruned(zboxes, 0.0, 100.0) >= len(zboxes) // 2   # z-order: most prune
    # and every z-ordered partition is tight on b (≤ 2 Morton tiles)
    assert all(hi - lo <= 600 for lo, hi in zboxes)


def test_zorder_three_columns(spark):
    """k=3 interleave: rows survive intact and the clustering benefit
    extends to BOTH non-leading dimensions — with 32 partitions over a
    24-bit Morton key each partition fixes ~1.67 top bits per dim, so
    the AVERAGE b/c spans must sit well under the full domain, where a
    linear sort on `a` leaves b and c unconstrained (~full-domain span
    in every partition). Individual partitions may straddle a high-bit
    boundary (span up to the domain), so the assertion is on means."""
    df = spark.range(12_000).select(
        F.pmod(F.hash("id"), F.lit(256)).cast("bigint").alias("a"),
        F.pmod(F.hash(F.col("id") + 1), F.lit(256)).cast("double").alias("b"),
        F.pmod(F.hash(F.col("id") + 2), F.lit(256)).cast("double").alias("c"),
    )
    bounds = [(0.0, 256.0)] * 3
    out = zo.zorder_by(df, ["a", "b", "c"], bounds, bits=8, num_partitions=32)
    assert out.count() == 12_000

    def mean_spans(frame):
        rows = (
            frame.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(
                (F.max("b") - F.min("b")).alias("sb"),
                (F.max("c") - F.min("c")).alias("sc"),
            )
            .collect()
        )
        return (
            sum(r.sb for r in rows) / len(rows),
            sum(r.sc for r in rows) / len(rows),
        )

    zb, zc = mean_spans(out)
    lb, lc = mean_spans(df.repartitionByRange(32, "a").sortWithinPartitions("a"))
    assert zb < 0.6 * lb and zc < 0.6 * lc
    assert lb > 200 and lc > 200  # linear layout really is unconstrained on b/c


def test_bucketed_fact_join_runs_shuffle_free(spark, sf_dir, tmp_path):
    """The co-located join contract end-to-end: orders and lineitem
    written with write_bucketed on the join key (same bucket count)
    sort-merge-join with ZERO Exchange in the physical plan — the
    planner proves both sides already carry the required hash
    distribution. The same join over the raw parquet shuffles both
    sides. Values must agree between the two plans."""
    from pyspark.sql import functions as F

    from covid_custom_sql_engine_spark.catalog import load_table
    from covid_custom_sql_engine_spark.operators import layout as ly

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    ly.write_bucketed(o, "bjd_orders", str(tmp_path / "o"), "o_orderkey", 8)
    ly.write_bucketed(
        l, "bjd_lineitem", str(tmp_path / "l"), "l_orderkey", 8
    )
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    try:
        # force the SMJ path: broadcast would hide the distribution
        # question entirely, AQE re-plans mid-flight
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        bo, bl = spark.table("bjd_orders"), spark.table("bjd_lineitem")
        j = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point
        raw = o.join(l, o.o_orderkey == l.l_orderkey)
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert raw_plan.count("Exchange hashpartitioning") >= 2
        assert j.count() == raw.count()
        agg = lambda d: d.agg(  # noqa: E731
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("s")
        ).collect()[0].s
        assert agg(j) == agg(raw)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS bjd_orders")
        spark.sql("DROP TABLE IF EXISTS bjd_lineitem")
