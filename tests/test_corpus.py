"""Corpus-preparation operators: decontamination, chunking, packing,
k-means step."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.functions import corpus as cp
from covid_custom_sql_engine_spark.functions import similarity as sim


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_shared_8gram(spark):
    shared = "one two three four five six seven eight"
    docs = _docs(
        spark,
        [
            (1, f"prefix words {shared} suffix words here"),
            (2, "totally different text with no overlapping gram content at all"),
        ],
    )
    ev = _docs(spark, [(100, f"{shared} plus eval only tail")])
    out = {r.doc_id: r for r in cp.ngram_decontaminate(docs, ev).collect()}
    assert out[1].contaminated and out[1].n_contaminated_grams == 1
    assert not out[2].contaminated and out[2].n_contaminated_grams == 0


def test_decontaminate_counts_distinct_grams(spark):
    # doc repeating the same shared 8-gram twice still counts it once
    g = "a b c d e f g h"
    docs = _docs(spark, [(1, f"{g} x {g}")])
    ev = _docs(spark, [(9, g)])
    (r,) = cp.ngram_decontaminate(docs, ev).collect()
    assert r.n_contaminated_grams == 1


def test_chunk_tokens_windows_and_tail(spark):
    toks = " ".join(f"t{i}" for i in range(33))  # 33 tokens
    out = cp.chunk_tokens(_docs(spark, [(1, toks)])).orderBy("chunk_idx").collect()
    assert [(r.chunk_idx, r.start_token, r.n_tokens) for r in out] == [
        (0, 1, 32),
        (1, 25, 9),
    ]


def test_chunk_tokens_no_redundant_tail(spark):
    # 25 tokens: a chunk at start 25 would add no new tokens (covered by
    # chunk 0, which holds all 25) — only one chunk comes out
    toks = " ".join(f"t{i}" for i in range(25))
    out = cp.chunk_tokens(_docs(spark, [(1, toks)])).collect()
    assert [(r.chunk_idx, r.n_tokens) for r in out] == [(0, 25)]


def test_chunk_tokens_empty_doc_skipped(spark):
    out = cp.chunk_tokens(_docs(spark, [(1, "   "), (2, "a b")])).collect()
    assert {r.doc_id for r in out} == {2}


def test_chunk_fp_is_md5_of_chunk_text(spark):
    import hashlib

    out = cp.chunk_tokens(_docs(spark, [(1, "Alpha beta")])).collect()
    assert out[0].chunk_fp == hashlib.md5(b"alpha beta").hexdigest()


def test_pack_token_budget_exclusive_cumsum(spark):
    # token counts: 3, 4, 5, 2 -> exclusive cumsums 0, 3, 7, 9
    rows = [(1, "a b c"), (2, "a b c d"), (3, "a b c d e"), (4, "a b")]
    out = {
        r.doc_id: r
        for r in cp.pack_token_budget(_docs(spark, rows), budget=5).collect()
    }
    # exclusive cumsums 0, 3, 7, 12 -> shard = cum // 5, offset = cum % 5
    assert [(out[i].shard, out[i].shard_offset) for i in (1, 2, 3, 4)] == [
        (0, 0),
        (0, 3),
        (1, 2),
        (2, 2),
    ]
    assert out[3].n_tokens == 5


def test_pack_token_budget_deterministic_across_runs(spark):
    """Flakiness regression for the round-2 driver red row: the prefix
    sum must be identical across two independent constructions (two
    pinned exchanges). Before the fix, the offsets were collected in one
    job while an unpinned range exchange could re-sample different
    partition boundaries in the next — shard assignment then drifted
    nondeterministically. Ids arrive shuffled across many partitions to
    exercise the range exchange for real."""
    import random

    rng = random.Random(42)
    rows = [(i, " ".join("w" for _ in range(1 + rng.randrange(40)))) for i in range(8_000)]
    rng.shuffle(rows)
    docs = _docs(spark, rows).repartition(32)
    a = sorted(map(tuple, cp.pack_token_budget(docs, budget=500).collect()))
    b = sorted(map(tuple, cp.pack_token_budget(docs, budget=500).collect()))
    assert a == b
    # and the values are the true global prefix sum in id order
    cum, exp = 0, {}
    for i, text in sorted(rows):
        n = len(text.split())
        exp[i] = (n, cum // 500, cum % 500)
        cum += n
    got = {r.doc_id: (r.n_tokens, r.shard, r.shard_offset) for r in map(lambda t: t, cp.pack_token_budget(docs, budget=500).collect())}
    assert got == exp


def test_pack_token_budget_matches_global_window(spark, sf_dir):
    from covid_custom_sql_engine_spark.catalog import load_table
    from covid_custom_sql_engine_spark.functions.text import tokens
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    got = {r.doc_id: (r.shard, r.shard_offset) for r in cp.pack_token_budget(d).collect()}
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = (
        d.select(F.col("doc_id"), F.size(tokens("text")).cast("bigint").alias("n"))
        .withColumn("cum", F.coalesce(F.sum("n").over(w), F.lit(0)))
        .select(
            "doc_id",
            F.expr(f"CAST(cum DIV {cp.PACK_BUDGET} AS BIGINT)").alias("shard"),
            (F.col("cum") % cp.PACK_BUDGET).alias("off"),
        )
        .collect()
    )
    assert got == {r.doc_id: (r.shard, r.off) for r in ref}


def test_kmeans_step_assignment_and_update(spark):
    # centroids: vec 0 = (1,0), vec 1 = (0,1); vec 2 near cell 0, vec 3
    # near cell 1
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [2.0, 0.1]),
            (3, [0.1, 3.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = sim.kmeans_step(emb, k=2).collect()
    cells = {(r.cell, r.dim): r for r in out}
    assert len(out) == 4  # 2 cells x 2 dims
    assert all(cells[(c, d)].n_members == 2 for c in (0, 1) for d in (0, 1))
    # cell 0 mean of (1,0) and (2,0.1); float32 cast wobble -> round
    assert abs(cells[(0, 0)].centroid - 1.5) < 1e-4
    assert abs(cells[(1, 1)].centroid - 2.0) < 1e-4


def test_kmeans_step_tie_breaks_to_smaller_cell(spark):
    # identical centroids: every vector ties; all go to cell 0
    emb = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [3.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    out = sim.kmeans_step(emb, k=2).collect()
    assert {r.cell for r in out} == {0}
    assert all(r.n_members == 3 for r in out)


def test_bpe_pair_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b a b c"),
            (1, "a b x"),
            (2, "solo"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {(r.token_a, r.token_b): r.cnt for r in cp.bpe_pair_counts(docs).collect()}
    assert out[("a", "b")] == 3
    assert out[("b", "a")] == 1
    assert out[("b", "c")] == 1
    assert out[("b", "x")] == 1
    assert ("solo", "solo") not in out


def test_bpe_pair_counts_top_k_deterministic_ties(spark):
    docs = spark.createDataFrame(
        [(0, "z y"), (1, "a b"), (2, "m n")], "doc_id long, text string"
    )
    rows = cp.bpe_pair_counts(docs, top_k=2).collect()
    # all cnt=1 → lexicographic tie-break keeps (a,b) and (m,n)
    assert [(r.token_a, r.token_b) for r in rows] == [("a", "b"), ("m", "n")]


def test_unigram_logprob(spark):
    import math

    docs = spark.createDataFrame(
        [(0, "the the rare"), (1, "the the the"), (2, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cp.unigram_logprob(docs).collect()}
    # corpus: the×5, rare×1, total 6
    p_the, p_rare = 5 / 6, 1 / 6
    exp0 = (2 * -math.log(p_the) + 1 * -math.log(p_rare)) / 3
    assert rows[0].n_tokens == 3
    assert abs(rows[0].avg_neg_logprob - round(exp0, 6)) < 1e-9
    assert abs(rows[1].avg_neg_logprob - round(-math.log(p_the), 6)) < 1e-9
    assert 2 not in rows  # empty doc → no tokens → no row
    # the rare-word doc scores strictly higher (lower quality)
    assert rows[0].avg_neg_logprob > rows[1].avg_neg_logprob


def test_dataset_split_fractions_and_stability(spark):
    docs = spark.createDataFrame(
        [(i, "t", "en" if i % 2 == 0 else "fr", "s", 10 + i) for i in range(200)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = cp.dataset_split(docs).collect()
    by_stratum: dict = {}
    for r in rows:
        by_stratum.setdefault(r.stratum, []).append(r)
    for stratum, rs in by_stratum.items():
        assert abs(sum(r.frac_of_stratum for r in rs) - 1.0) < 1e-6
        assert sum(r.n_docs for r in rs) == 100
    # deterministic: same input → identical assignment
    again = {(r.split, r.stratum): r.n_docs for r in cp.dataset_split(docs).collect()}
    assert again == {(r.split, r.stratum): r.n_docs for r in rows}


def test_pca_power_step_recovers_dominant_axis(spark):
    # variance concentrated on axis 0 → component ≈ ±e0, unit norm
    rows = [(i, [float(10 * (1 if i % 2 else -1)), 0.1, 0.0]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.dim: r for r in sim.pca_power_step(emb, dim=3).collect()}
    assert len(out) == 3
    norm2 = sum(out[d].component ** 2 for d in out)
    assert abs(norm2 - 1.0) < 1e-3
    assert abs(abs(out[0].component) - 1.0) < 1e-2
    assert all(abs(out[1].score - out[d].score) < 1e-9 for d in out)


def test_quota_sample_deterministic_and_capped(spark):
    from covid_custom_sql_engine_spark.functions.corpus import quota_sample

    rows = [(i, f"lang{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = quota_sample(df, ["lang"], 5)
    got = a.collect()
    # cap respected per stratum
    from collections import Counter

    cnt = Counter(r.lang for r in got)
    assert all(v == 5 for v in cnt.values()) and len(cnt) == 3
    # deterministic: same rows on rerun and under different partitioning
    b = quota_sample(df.repartition(13), ["lang"], 5)
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in b.collect())
    # small stratum: returns all its rows
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, lang string")
    assert quota_sample(tiny, ["lang"], 5).count() == 2


def test_negative_samples_properties(spark):
    from covid_custom_sql_engine_spark.functions.corpus import negative_samples

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    out = negative_samples(df, "doc_id", k=4).collect()
    assert len(out) == 40 * 4
    # never self, always a real doc
    ids = set(range(40))
    for r in out:
        assert r.neg_id != r.doc_id and r.neg_id in ids
    # deterministic under different partitioning
    out2 = negative_samples(df.repartition(7), "doc_id", k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # degenerate: single doc -> empty (no partner exists)
    single = spark.createDataFrame([(1,)], "doc_id long")
    assert negative_samples(single, "doc_id", k=2).count() == 0


def test_mixture_resample_thins_to_target(spark):
    from covid_custom_sql_engine_spark.functions.corpus import mixture_resample

    # 300 'a', 100 'b', 100 'c' -> equal-thirds target thins only 'a'
    rows = [(i, "a" if i < 300 else ("b" if i < 400 else "c")) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_resample(df, "lang", {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    got = out.collect()
    from collections import Counter

    cnt = Counter(r.lang for r in got)
    # under-target groups keep everything (accept_prob clamps at 1)
    assert cnt["b"] == 100 and cnt["c"] == 100
    # over-represented group is thinned toward ~500/3 ≈ 167 (hash draw
    # is uniform; allow generous slack on 300 draws)
    assert 120 <= cnt["a"] <= 215
    probs = {r.lang: r.accept_prob for r in got}
    assert probs["b"] == 1.0 and probs["c"] == 1.0 and probs["a"] < 1.0
    # deterministic under repartitioning
    again = mixture_resample(
        df.repartition(11), "lang", {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # group absent from the target mixture is dropped entirely
    out2 = mixture_resample(df, "lang", {"b": 0.5, "c": 0.5}).collect()
    assert all(r.lang != "a" for r in out2)


def test_repeated_chunks_flags_cross_doc_substrings(spark):
    from covid_custom_sql_engine_spark.functions.corpus import chunk_tokens
    import pyspark.sql.functions as F

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"{shared} one two three four"),
            (2, f"zero {shared} five six seven"),
            (3, "totally different words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    ch = chunk_tokens(docs, window=8, stride=4)
    rep = (
        ch.groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .collect()
    )
    # the shared 8-token run starts at position 1 in doc 1 (chunk) and
    # position 2 in doc 2 — only aligned windows repeat; doc 3 never
    docs_hit = set()
    for r in rep:
        assert r.first_doc in (1, 2)
        docs_hit.add(r.first_doc)
    # doc1's window [1..8] == the shared text; doc2 has it at [2..9],
    # whose strided windows start at 1 and 5 — the [5..12] window of
    # doc2 equals [4..11] of nothing, so at least alignment at stride
    # boundaries is detected when offsets are multiples of the stride.
    d1 = spark.createDataFrame(
        [(1, f"{shared} x"), (2, f"{shared} y")], "doc_id long, text string"
    )
    rep2 = (
        chunk_tokens(d1, window=8, stride=4)
        .groupBy("chunk_fp")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .count()
    )
    assert rep2 >= 1  # identical leading window shared by both docs


def test_oov_rate_report(spark):
    from covid_custom_sql_engine_spark.functions.text import oov_rate_report

    docs = spark.createDataFrame(
        [
            (1, "cat cat cat dog"),
            (2, "cat dog dog rareword"),
            (3, "cat cat dog dog"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in oov_rate_report(docs, min_count=3).collect()}
    # vocab = {cat (6), dog (5)}; 'rareword' is OOV
    assert out[1].n_oov == 0 and out[1].oov_rate == 0.0
    assert out[2].n_oov == 1 and abs(out[2].oov_rate - 0.25) < 1e-9
    assert out[3].n_oov == 0
    assert all(r.n_tokens == 4 for r in out.values())


def test_repeated_span_removal_semantics(spark):
    """Hand-built corpus: two docs share a 12-token passage at
    different offsets; the shared 8-gram windows must merge into ONE
    span per doc covering exactly the passage (doc 1: tokens 4..15 ->
    span [4, 16); doc 2: tokens 1..12 -> span [1, 13)), and a doc with
    no cross-doc 8-gram yields no spans."""
    from covid_custom_sql_engine_spark.functions.corpus import repeated_token_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = [
        (1, "one two three " + shared + " tail1 tail2"),
        (2, shared + " other words here"),
        (3, "totally unrelated content with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in repeated_token_spans(df, k=8).collect()
    }
    assert spans[1] == (4, 16)
    assert spans[2] == (1, 13)
    assert 3 not in spans


def test_bpe_train_canonical_greedy(spark):
    """Hand-built corpus pinning the canonical BPE semantics: the
    argmax tie-break (count desc, pair asc), the greedy
    non-overlapping apply ([b b b] with merge (b,b) -> [b_b, b]), and
    that later rounds count MERGED tokens."""
    from covid_custom_sql_engine_spark.functions.corpus import bpe_train

    docs = [
        (1, "a b a b a b"),   # (a,b) x3
        (2, "b b b"),         # (b,b) x2 but greedy applies once
        (3, "a b c"),         # (a,b) x1, (b,c) x1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.round: r for r in bpe_train(df, rounds=2).collect()}
    # round 1: (a,b)=4 beats (b,a)=2, (b,b)=2, (b,c)=1
    assert (out[1].token_a, out[1].token_b, out[1].cnt) == ("a", "b", 4)
    # round 2 state: doc1 [a_b, a_b, a_b], doc2 [b, b, b], doc3 [a_b, c]
    # pairs: (a_b,a_b)=2, (b,b)=2, (a_b,c)=1 -> tie 2/2 broken to a_b < b
    assert (out[2].token_a, out[2].token_b, out[2].cnt) == ("a_b", "a_b", 2)


def test_bpe_apply_greedy_overlap(spark):
    """[b b b b] with (b,b): greedy left-to-right gives [b_b, b_b];
    [b b b] gives [b_b, b] — the merged token never re-matches."""
    from covid_custom_sql_engine_spark.functions.corpus import _apply_bpe_merge
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(["b", "b", "b", "b"],), (["b", "b", "b"],), (["x", "b", "b"],)],
        "t array<string>",
    )
    rows = df.select(
        _apply_bpe_merge(F.col("t"), F.lit("b"), F.lit("b")).alias("m")
    ).collect()
    assert rows[0].m == ["b_b", "b_b"]
    assert rows[1].m == ["b_b", "b"]
    assert rows[2].m == ["x", "b_b"]


def test_dsir_weights_monotone_and_numpy_twin(spark):
    """DSIR importance weights: numpy twin (hashed bigram buckets,
    0.5-smoothed log-ratios, per-doc means) reproduces every per-mix
    average to 1e-6; weights rise strictly with the planted good-token
    ratio wherever good tokens exist (mix >= 3), the target mix scores
    highest, and the quality classes separate cleanly."""
    import hashlib

    import numpy as np
    import pytest

    import __spark_entry__ as entrymod

    rows = {
        int(r.mix_ratio): (int(r.n_docs), float(r.avg_weight))
        for r in entrymod.queries()["dsir_importance_weights"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    N, T, B = 2000, 20, 16

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % B

    docs = []
    for i in range(N):
        r = i % 11
        toks = [
            ("g" if ((i * 7 + j * 13) % 10) < r else "z")
            + str((i * 3 + j * 5) % 7)
            for j in range(T)
        ]
        bs = [bucket(f"{a} {b}") for a, b in zip(toks, toks[1:])]
        docs.append((r, bs))
    tc = np.zeros(B)
    rc = np.zeros(B)
    for r, bs in docs:
        for b in bs:
            rc[b] += 1
            if r == 10:
                tc[b] += 1
    ts, rs = tc + 0.5, rc + 0.5
    lam = np.log(ts / ts.sum()) - np.log(rs / rs.sum())
    per_mix = {}
    for r, bs in docs:
        per_mix.setdefault(r, []).append(np.mean([lam[b] for b in bs]))
    assert set(rows) == set(range(11))
    for r in range(11):
        n, w = rows[r]
        assert n == len(per_mix[r])
        assert w == pytest.approx(np.mean(per_mix[r]), abs=1e-6), r
    ws = [rows[r][1] for r in range(11)]
    # strictly increasing wherever good tokens actually appear
    for r in range(3, 10):
        assert ws[r + 1] > ws[r], r
    assert max(ws) == ws[10]  # the target domain scores highest
    # the planted quality classes separate by a wide margin
    assert min(ws[6:]) > max(ws[:4]) + 1.0
