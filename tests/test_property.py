"""Property-based differential tests (SURVEY §5): hypothesis-generated
small tables run through the engine's parity operators and through
DuckDB on the same data; results must agree.

Covers the parity-sensitive semantics: grouped aggregation (COUNT(*) vs
COUNT(col), exact median interpolation, sample std n<2 → NULL), null
join keys never matching, and reference null ordering in sort.
"""

from __future__ import annotations

import pytest

# Full-registry audit battery: excluded from the default (driver) test
# path by pytest.ini's `-m "not slow"` — run with `-m ""`. The same
# surface is gated standalone at round end (tools/check_oracle.py /
# check_plans.py / check_bare.py run the full 316-query versions).
pytestmark = pytest.mark.slow

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from covid_custom_sql_engine_spark.operators import core as ops

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Small value domain: ints, round floats, and NULLs — exercises null
# handling without float-noise flakiness.
vals = st.one_of(st.none(), st.integers(-5, 5).map(float))
keys = st.one_of(st.none(), st.integers(0, 2))
rows = st.lists(st.tuples(keys, vals), min_size=1, max_size=30)

ROW_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def _duck(rows_list):
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame(rows_list, columns=["k", "v"]).astype({"k": "Int64", "v": "float64"})
    )
    return con


@given(rows=rows)
@settings(**SETTINGS)
def test_grouped_agg_matches_duckdb(spark, rows):
    df = spark.createDataFrame(rows, ROW_SCHEMA)
    got = {
        r.k: r
        for r in ops.ref_group_agg(df, ["k"], {"v": ["count", "sum", "avg", "min", "max", "median", "std"]}).collect()
    }
    con = _duck(rows)
    exp = con.sql(
        """
        SELECT k, count(*) AS c, sum(v) AS s, avg(v) AS a, min(v) AS mn, max(v) AS mx,
               median(v) AS md, stddev_samp(v) AS sd
        FROM t GROUP BY k
        """
    ).fetchall()
    assert len(exp) == len(got)
    for k, c, s, a, mn, mx, md, sd in exp:
        r = got[k]
        assert r.count_v == c  # COUNT(*): nulls included
        for ours, theirs in [
            (r.sum_v, s), (r.avg_v, a), (r.min_v, mn), (r.max_v, mx), (r.median_v, md), (r.std_v, sd),
        ]:
            if theirs is None or (isinstance(theirs, float) and math.isnan(theirs)):
                assert ours is None or (isinstance(ours, float) and math.isnan(ours))
            else:
                assert ours == pytest.approx(theirs, abs=1e-9)


@given(rows=rows)
@settings(**SETTINGS)
def test_join_null_keys_never_match(spark, rows):
    df = spark.createDataFrame(rows, ROW_SCHEMA)
    dim_rows = [(0, "a"), (1, "b"), (None, "null-row")]
    dim = spark.createDataFrame(dim_rows, T.StructType([
        T.StructField("k", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
    ]))
    inner = ops.ref_join(df, dim, on=("k", "k"), how="inner")
    left = ops.ref_join(df, dim, on=("k", "k"), how="left")
    con = _duck(rows)
    con.register("d", pd.DataFrame(dim_rows, columns=["k", "name"]).astype({"k": "Int64"}))
    n_inner = con.sql("SELECT count(*) FROM t JOIN d ON t.k = d.k").fetchone()[0]
    n_left = con.sql("SELECT count(*) FROM t LEFT JOIN d ON t.k = d.k").fetchone()[0]
    assert inner.count() == n_inner
    assert left.count() == n_left
    # right columns arrive r_-prefixed; unmatched left rows carry nulls
    assert {"k", "v", "r_k", "r_name"} == set(left.columns)
    assert left.filter(F.col("k").isNull() & F.col("r_name").isNotNull()).count() == 0


@given(rows=rows, ascending=st.booleans())
@settings(**SETTINGS)
def test_ref_sort_null_placement(spark, rows, ascending):
    """Reference semantics (dataframe.py:180): ascending → nulls LAST,
    descending → nulls FIRST — the opposite of Spark defaults."""
    df = spark.createDataFrame(rows, ROW_SCHEMA)
    got = [r.v for r in ops.ref_sort(df, "v", ascending=ascending).collect()]
    non_null = sorted([v for v, in [(r[1],) for r in rows] if v is not None], reverse=not ascending)
    nulls = [None] * (len(rows) - len(non_null))
    exp = non_null + nulls if ascending else nulls + non_null
    assert got == exp


# --- merge_upsert vs DuckDB full-outer merge semantics ------------------

merge_base_rows = st.lists(
    st.tuples(st.integers(0, 6), st.one_of(st.none(), st.integers(-5, 5).map(float))),
    min_size=0,
    max_size=10,
    unique_by=lambda t: t[0],
)
merge_upd_rows = st.lists(
    st.tuples(st.integers(0, 9), st.one_of(st.none(), st.integers(-5, 5).map(float))),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)


@given(base=merge_base_rows, upd=merge_upd_rows)
@settings(**SETTINGS)
def test_merge_upsert_matches_duckdb_full_outer(spark, base, upd):
    from covid_custom_sql_engine_spark.operators.merge import merge_upsert

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    bdf = spark.createDataFrame([(int(k), v) for k, v in base], schema)
    udf_ = spark.createDataFrame([(int(k), v) for k, v in upd], schema)
    for mode in (True, False):
        got = sorted(
            [(r.id, r.v) for r in merge_upsert(bdf, udf_, "id", broadcast_updates=mode).collect()]
        )
        con = duckdb.connect()
        con.register("b", pd.DataFrame(base, columns=["id", "v"]).astype({"id": "int64", "v": "float64"}))
        con.register("u", pd.DataFrame(upd, columns=["id", "v"]).astype({"id": "int64", "v": "float64"}))
        exp = sorted(
            [
                (r[0], r[1] if r[1] is not None and not math.isnan(r[1]) else None)
                for r in con.execute(
                    """SELECT coalesce(b.id, u.id), coalesce(u.v, b.v)
                       FROM b FULL OUTER JOIN u ON b.id = u.id"""
                ).fetchall()
            ]
        )
        got = [(i, v if v is not None and not math.isnan(v) else None) for i, v in got]
        assert got == exp, mode


# --- funnel monotonicity invariant --------------------------------------

funnel_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.sampled_from(["a", "b", "c"])),
    min_size=1,
    max_size=40,
)


@given(evs=funnel_rows)
@settings(**SETTINGS)
def test_funnel_counts_monotone_nonincreasing(spark, evs):
    from covid_custom_sql_engine_spark.operators.composites import funnel_counts

    df = spark.createDataFrame(evs, "user_id long, ts long, event_type string")
    out = sorted(funnel_counts(df, ["a", "b", "c"]).collect(), key=lambda r: r.step_idx)
    ns = [r.n_users for r in out]
    assert ns == sorted(ns, reverse=True)
    n_users_a = df.filter(F.col("event_type") == "a").select("user_id").distinct().count()
    assert ns[0] == n_users_a


# --- global_rank / equidepth_buckets vs DuckDB window functions --------


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=60
    ),
    buckets=st.integers(min_value=1, max_value=9),
)
@settings(**SETTINGS)
def test_global_rank_and_ntile_match_duckdb(spark, vals, buckets):
    from covid_custom_sql_engine_spark.operators.selection import (
        equidepth_buckets,
        global_rank,
    )

    pdf = pd.DataFrame({"id": range(len(vals)), "v": vals})
    df = spark.createDataFrame(pdf).repartition(5)
    got_rank = {
        r.id: r.rank for r in global_rank(df, ["v", "id"]).collect()
    }
    got_bucket = {
        r.id: r.bucket
        for r in equidepth_buckets(df, ["v", "id"], buckets).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(
        f"""SELECT id,
                   row_number() OVER (ORDER BY v, id) AS rnk,
                   ntile({buckets}) OVER (ORDER BY v, id) AS nt
            FROM t"""
    ).fetchall()
    assert got_rank == {i: r for i, r, _ in exp}
    assert got_bucket == {i: n for i, _, n in exp}


# ---------------------------------------------------------------------------
# Sketch properties (round 3): the mathematical guarantees must hold on
# ADVERSARIAL small inputs, not just the benchmark tables.
# ---------------------------------------------------------------------------

sketch_keys = st.lists(st.integers(-50, 50), min_size=1, max_size=60)


@given(ks=sketch_keys)
@settings(**SETTINGS)
def test_cms_never_undercounts_property(spark, ks):
    from collections import Counter

    from covid_custom_sql_engine_spark.functions import sketches as sk

    df = spark.createDataFrame([(k,) for k in ks], "k long")
    est = {
        r.k: r.est_count
        for r in sk.cms_estimate(
            sk.cms_sketch(df, "k", depth=3, width=32),
            df.select("k").distinct(),
            "k",
            depth=3,
            width=32,
        ).collect()
    }
    true = Counter(ks)
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)


@given(ks=sketch_keys)
@settings(**SETTINGS)
def test_hll_split_merge_equals_whole_property(spark, ks):
    """For ANY split of the rows, merged registers == whole-input
    registers (associativity/commutativity of the max-merge)."""
    from covid_custom_sql_engine_spark.functions import sketches as sk

    mid = len(ks) // 2
    df_a = spark.createDataFrame([(k,) for k in ks[:mid]] or [(None,)], "k long").filter("k IS NOT NULL")
    df_b = spark.createDataFrame([(k,) for k in ks[mid:]], "k long")
    whole = spark.createDataFrame([(k,) for k in ks], "k long")
    merged = (
        sk.hll_registers(df_a, "k", p=6)
        .unionByName(sk.hll_registers(df_b, "k", p=6))
        .groupBy("bucket")
        .agg(F.max("m_rho").alias("m_rho"))
    )
    key = lambda d: sorted((r.bucket, r.m_rho) for r in d.collect())
    assert key(merged) == key(sk.hll_registers(whole, "k", p=6))


@given(ks=sketch_keys)
@settings(**SETTINGS)
def test_bloom_membership_property(spark, ks):
    """No member ever fails its own filter, for any key multiset."""
    from covid_custom_sql_engine_spark.functions import sketches as sk

    df = spark.createDataFrame([(k,) for k in ks], "k long")
    bits = sk.bloom_bits(df, "k", num_bits=256, num_hashes=4)
    probed = sk.bloom_probe(bits, df.select("k").distinct(), "k", 256, 4)
    assert probed.filter(~F.col("maybe_present")).count() == 0


# --- BM25 vs a pure-Python reference implementation -----------------------

words = st.sampled_from(["apple", "banana", "cherry", "durian", "elder"])
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=8), min_size=2, max_size=10
)


def _bm25_reference(doc_tokens, query_terms, k1=1.2, b=0.75):
    """Plain-Python BM25 (Lucene idf variant) over tokenized docs."""
    n = len(doc_tokens)
    avgdl = sum(len(d) for d in doc_tokens) / n
    df = {}
    for toks in doc_tokens:
        for t in set(toks):
            if t in query_terms:
                df[t] = df.get(t, 0) + 1
    scores = {}
    for i, toks in enumerate(doc_tokens):
        s = 0.0
        dl = len(toks)
        for t in query_terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        if s > 0.0:
            scores[i] = s
    return scores


@given(docs=docs_strategy)
@settings(**SETTINGS)
def test_bm25_matches_python_reference(spark, docs):
    from covid_custom_sql_engine_spark.functions.text import bm25_topk

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    qterms = ["apple", "cherry"]
    q = spark.createDataFrame(
        [("q0", t) for t in qterms], "query_id string, term string"
    )
    got = {
        r.doc_id: r.score
        for r in bm25_topk(df, q, k=len(docs)).collect()
    }
    want = _bm25_reference(docs, qterms)
    assert set(got) == set(want)
    for d, s in want.items():
        assert math.isclose(got[d], round(s, 6), abs_tol=2e-6), (d, got[d], s)


@given(
    rows_mix=st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["a", "b", "c"])),
        min_size=5,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_mixture_resample_bounds_and_determinism(spark, rows_mix):
    from covid_custom_sql_engine_spark.functions.corpus import mixture_resample

    df = spark.createDataFrame(rows_mix, "doc_id long, lang string")
    target = {"a": 0.5, "b": 0.5}  # 'c' dropped entirely
    out = mixture_resample(df, "lang", target).collect()
    # no 'c' rows; accepted set is a subset of input ids
    assert all(r.lang != "c" for r in out)
    ids = {r[0] for r in rows_mix}
    assert all(r.doc_id in ids for r in out)
    # accept_prob within (0, 1]
    assert all(0 < r.accept_prob <= 1.0 for r in out)
    # rerun under different partitioning -> identical sample
    again = mixture_resample(df.repartition(3), "lang", target).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# --- round 5: text-analytics helpers vs pure-Python references ---

texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=24), min_size=1, max_size=12
)


@given(ts=texts)
@settings(**SETTINGS)
def test_ngram_diversity_matches_python(spark, ts):
    from covid_custom_sql_engine_spark.functions import corpus as cp

    df = spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
    got = {r.doc_id: r for r in cp.ngram_diversity(df).collect()}
    for i, t in enumerate(ts):
        toks = [w for w in t.lower().strip().split() if w]
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            assert i not in got
            continue
        r = got[i]
        assert r.n_bigrams == len(grams)
        assert r.n_distinct == len(set(grams))
        assert r.distinct_ratio == round(len(set(grams)) / len(grams), 6)


@given(ts=texts)
@settings(**SETTINGS)
def test_vocab_stats_match_python(spark, tmp_path_factory, ts):
    """Differential-test the REGISTERED vocab_stats query against a
    pure-Python Counter on hypothesis corpora."""
    from collections import Counter

    from covid_custom_sql_engine_spark import queries_registry as qr

    d = str(tmp_path_factory.mktemp("vocab"))
    spark.createDataFrame(
        list(enumerate(ts)), "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    (r,) = qr.QUERIES["vocab_stats"](spark, d).collect()
    c = Counter(w for t in ts for w in t.lower().strip().split() if w)
    if not c:
        assert r.n_tokens is None and r.n_terms == 0
        return
    assert r.n_tokens == sum(c.values())
    assert r.n_terms == len(c)
    assert r.hapax_count == sum(1 for v in c.values() if v == 1)
    assert r.type_token_ratio == round(len(c) / sum(c.values()), 6)


@given(counts=st.lists(st.integers(1, 9), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_entropy_identity_matches_direct_formula(spark, counts):
    """ln(n) − Σc·ln c / n must equal −Σp·ln p computed directly."""
    import math as m

    n = sum(counts)
    via_identity = m.log(n) - sum(c * m.log(c) for c in counts) / n
    direct = -sum((c / n) * m.log(c / n) for c in counts)
    assert abs(via_identity - direct) < 1e-12
