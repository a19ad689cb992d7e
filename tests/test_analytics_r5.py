"""Round-5 pipeline analytics: funnels, transitions, entropy, PSI,
diversity, Zipf, cluster representatives."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from covid_custom_sql_engine_spark import queries_registry as qr
from covid_custom_sql_engine_spark.functions import corpus as cp


def test_funnel_counts_strictly_ordered(spark, sf_dir):
    out = {r.stage: r for r in qr.QUERIES["funnel_conversion"](spark, sf_dir).collect()}
    assert set(out) == {"1_view", "2_click", "3_purchase"}
    # monotone funnel, later stages never exceed earlier ones
    assert out["1_view"].n_users >= out["2_click"].n_users >= out["3_purchase"].n_users
    assert out["1_view"].avg_delay_sec is None
    assert out["2_click"].avg_delay_sec > 0
    assert out["3_purchase"].avg_delay_sec > 0


def test_transition_matrix_rows_normalize(spark, sf_dir):
    rows = qr.QUERIES["event_transition_matrix"](spark, sf_dir).collect()
    by_src: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r.p <= 1.0
        by_src[r.src] = by_src.get(r.src, 0.0) + r.p
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-4, (src, total)


def test_entropy_profile_edges(spark, tmp_path):
    """Run the REGISTERED query on a synthetic orders table: constant
    column -> H = 0 (norm 0); uniform over 4 values -> H = ln 4,
    norm_entropy = 1. Exercising qr.QUERIES (not a re-implementation)
    so a regression in the production formula fails here."""
    df = spark.createDataFrame(
        [(i, "const", f"v{i % 4}") for i in range(400)],
        "o_orderkey long, o_orderstatus string, o_orderpriority string",
    )
    d = str(tmp_path / "ent")
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    got = {
        r.col_name: (r.entropy, r.norm_entropy)
        for r in qr.QUERIES["column_entropy_profile"](spark, d).collect()
    }
    assert got["o_orderstatus"] == (0.0, 0.0)
    assert abs(got["o_orderpriority"][0] - math.log(4)) < 1e-6
    assert got["o_orderpriority"][1] == 1.0


def test_psi_identical_splits_near_zero(spark, sf_dir):
    rows = qr.QUERIES["psi_drift"](spark, sf_dir).collect()
    psi = sum(r.psi_contrib for r in rows)
    # same generator for train and val -> tiny drift; sanity-bound it
    assert 0.0 <= psi < 0.5
    assert all(r.n_train + r.n_val > 0 for r in rows)


def test_ngram_diversity_repetitive_vs_unique(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),          # 7 bigrams, 2 distinct
            (2, "one two three four five"),  # all distinct
            (3, "single"),                   # <2 tokens: excluded
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cp.ngram_diversity(df).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_bigrams == 7 and out[1].n_distinct == 2
    assert out[2].n_bigrams == 4 and out[2].n_distinct == 4
    assert out[2].distinct_ratio == 1.0


def test_zipf_slope_power_law(spark):
    # construct term frequencies following freq = 64 / rank exactly:
    # slope must come out -1 (log-log line), intercept ln(64)
    rows = []
    doc = []
    for rank in range(1, 9):
        freq = 64 // rank
        doc.extend([f"tok{rank:02d}"] * freq)
    rows.append((1, " ".join(doc)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    (r,) = cp.zipf_slope(df).collect()
    assert r.n_terms == 8
    # 64//rank is not exactly 64/rank for rank 3,5,6,7 — loose bound
    assert -1.15 < r.slope < -0.85
    # deterministic under repartitioning
    (r2,) = cp.zipf_slope(df.repartition(7)).collect()
    assert (r.slope, r.intercept) == (r2.slope, r2.intercept)


def test_dedup_representative_picks_longest(spark, sf_dir):
    out = qr.QUERIES["dedup_representative"](spark, sf_dir)
    rows = out.collect()
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    chars = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for comp, members in by_comp.items():
        reps = [m for m in members if m.is_rep]
        assert len(reps) == 1
        assert all(m.rep_id == reps[0].doc_id for m in members)
        # policy: representative is the longest member (ties -> min id)
        best = max(members, key=lambda m: (chars[m.doc_id], -m.doc_id))
        assert reps[0].doc_id == best.doc_id
    # every doc appears exactly once
    assert len(rows) == len({r.doc_id for r in rows})


def test_vocab_stats_hapax_and_ttr(spark, tmp_path):
    """Hand-checked values through the REGISTERED query."""
    d = str(tmp_path / "vs")
    spark.createDataFrame(
        [(1, "a a a b b c"), (2, "c d")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    (r,) = qr.QUERIES["vocab_stats"](spark, d).collect()
    # tokens: a×3 b×2 c×2 d×1 → 8 tokens, 4 terms, hapax {d}
    assert r.n_tokens == 8 and r.n_terms == 4
    assert r.hapax_count == 1
    assert r.type_token_ratio == 0.5
    assert r.hapax_ratio == 0.25


def test_user_entropy_single_action_bot_in_bucket_zero(spark, sf_dir):
    rows = qr.QUERIES["user_entropy_histogram"](spark, sf_dir).collect()
    total = sum(r.n_users for r in rows)
    assert total > 0
    buckets = {r.bucket for r in rows}
    assert all(b >= 0 for b in buckets)
    for r in rows:
        assert r.min_entropy >= r.bucket * 0.25 - 1e-9
        assert r.max_entropy < (r.bucket + 1) * 0.25 + 1e-9


def test_event_burstiness_poissonish(spark, sf_dir):
    rows = qr.QUERIES["event_burstiness"](spark, sf_dir).collect()
    assert {r.event_type for r in rows} == {
        "view", "click", "purchase", "signup", "error"
    }
    for r in rows:
        assert r.n_hours > 1
        assert r.mean_per_hour > 0
        assert r.fano_factor is not None and r.fano_factor > 0


def test_funnel_strict_ordering_hand_built(spark, tmp_path):
    """Stage events must be STRICTLY after the prior stage's first
    event: a purchase that precedes the user's first click never
    counts, and a click at exactly the view timestamp doesn't either.
    Runs the REGISTERED query against a hand-built events table."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    sec = dt.timedelta(seconds=1)
    rows = [
        # user 1: clean view -> click -> purchase
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + sec, 1, "click", 1.0, "{}"),
        (3, t0 + 2 * sec, 1, "purchase", 1.0, "{}"),
        # user 2: purchase BEFORE first click -> stops at click
        (4, t0, 2, "view", 1.0, "{}"),
        (5, t0 + 2 * sec, 2, "click", 1.0, "{}"),
        (6, t0 + sec, 2, "purchase", 1.0, "{}"),
        # user 3: click at exactly the view ts -> not strictly after
        (7, t0, 3, "view", 1.0, "{}"),
        (8, t0, 3, "click", 1.0, "{}"),
        # user 4: click without any view -> never enters the funnel
        (9, t0, 4, "click", 1.0, "{}"),
    ]
    d = str(tmp_path / "funnel")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r.stage: r for r in qr.QUERIES["funnel_conversion"](spark, d).collect()}
    assert out["1_view"].n_users == 3       # users 1, 2, 3
    assert out["2_click"].n_users == 2      # users 1, 2 (user 3 ties)
    assert out["3_purchase"].n_users == 1   # user 1 only
    assert out["2_click"].avg_delay_sec == 1.5  # (1 s + 2 s) / 2
    assert out["3_purchase"].avg_delay_sec == 1.0


def test_psi_drift_detects_synthetic_shift(spark, tmp_path):
    """PSI must be near zero for identically-distributed splits and
    clearly positive when val's length distribution shifts. doc_ids are
    chosen by their md5 split hash so the deterministic splitter itself
    routes the shift."""
    from pyspark.sql import functions as F
    import hashlib

    def split_of(doc_id):
        h = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15], 16) % 100
        return "train" if h < 80 else ("val" if h < 90 else "test")

    train_ids = [i for i in range(4000) if split_of(i) == "train"][:400]
    val_ids = [i for i in range(4000) if split_of(i) == "val"][:50]

    def write(dirname, val_chars):
        rows = [(i, "x", "en", "s", 250) for i in train_ids] + [
            (i, "x", "en", "s", val_chars) for i in val_ids
        ]
        d = str(tmp_path / dirname)
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        return d

    same = sum(
        r.psi_contrib
        for r in qr.QUERIES["psi_drift"](spark, write("same", 250)).collect()
    )
    shifted = sum(
        r.psi_contrib
        for r in qr.QUERIES["psi_drift"](spark, write("shift", 1050)).collect()
    )
    assert same < 0.01          # identical bins -> only smoothing noise
    assert shifted > 1.0        # val entirely in a bin train never hits


def test_shapley_attribution_unanimity_decomposition(spark, tmp_path):
    """Shapley linearity over per-user unanimity games: u1 touches
    {click}, u2 touches {click, view} pre-purchase -> click = 1.5,
    view = 0.5, others 0; post-purchase touches never earn credit."""
    import datetime as dt

    from covid_custom_sql_engine_spark.registry import attribution_drift as an

    t0 = dt.datetime(2024, 1, 1)

    def _ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # u1: click -> purchase
        (1, _ts(0), 1, "click", 0.0, None),
        (2, _ts(5), 1, "purchase", 1.0, None),
        # u2: click, view -> purchase
        (3, _ts(0), 2, "click", 0.0, None),
        (4, _ts(1), 2, "view", 0.0, None),
        (5, _ts(9), 2, "purchase", 1.0, None),
        # u3: purchase first, click only AFTER -> no credit anywhere
        (6, _ts(0), 3, "purchase", 1.0, None),
        (7, _ts(1), 3, "click", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.channel: r.shapley
        for r in an.shapley_attribution(spark, str(tmp_path)).collect()
    }
    assert out == {"click": 1.5, "view": 0.5, "error": 0.0, "signup": 0.0}


def test_t_closeness_exact_tv_distance(spark, tmp_path):
    """Hand-computed total-variation: one balanced group (t=0) and one
    fully-skewed group against a known global band distribution."""
    rows = []
    # group (0, 'A'): 2 rows band 0, 2 rows band 1 -> local p = (.5, .5)
    rows += [(0, "A", 500.0), (0, "A", 900.0), (0, "A", 1500.0), (0, "A", 1900.0)]
    # group (1, 'B'): 4 rows band 0 -> local p = (1, 0)
    rows += [(1, "B", 100.0)] * 4
    # global: band0 6/8, band1 2/8
    # t(0,A) = .5*(|.5-.75| + |.5-.25|) = .25 ; t(1,B) = .5*(.25+.25) = .25
    df = spark.createDataFrame(
        [(i, n, m, b) for i, (n, m, b) in enumerate(rows)],
        "c_custkey bigint, c_nationkey int, c_mktsegment string, c_acctbal double",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    from covid_custom_sql_engine_spark.registry import attribution_drift as an

    out = an.t_closeness_audit(spark, str(tmp_path)).collect()[0]
    assert out.n_groups == 2
    assert out.max_t == 0.25
    assert out.n_violating_groups == 2  # both exceed t > 0.2


def test_wilson_and_ztest_hand_formula(spark, tmp_path):
    """Arms by user parity: arm0 = 3 users (2 convert), arm1 = 2 users
    (0 convert); bounds and z match the hand-evaluated formulas."""
    import datetime as dt
    import math

    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(uid, typ, val):
        nonlocal eid
        eid += 1
        rows.append((eid, t, uid, typ, val, None))

    # arm 0: users 2, 4 convert (purchase >= 100); user 6 does not
    ev(2, "purchase", 150.0)
    ev(4, "purchase", 200.0)
    ev(6, "purchase", 50.0)
    # arm 1: users 1, 3 never high-value
    ev(1, "view", 0.0)
    ev(3, "purchase", 99.0)
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from covid_custom_sql_engine_spark.registry import attribution_drift as an

    w = {r.arm: r for r in an.ab_wilson_bounds(spark, str(tmp_path)).collect()}
    assert (w[0].n_users, w[0].n_converted) == (3, 2)
    assert (w[1].n_users, w[1].n_converted) == (2, 0)

    def wilson(x, n, sign):
        z2, p = 1.96 * 1.96, x / n
        marg = 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        return round((p + z2 / (2 * n) + sign * marg) / (1 + z2 / n), 6)

    assert w[0].wilson_low == wilson(2, 3, -1)
    assert w[0].wilson_high == wilson(2, 3, 1)
    assert w[1].wilson_low == 0.0  # x = 0 -> exact lower bound 0

    z = an.ab_ztest_conversion(spark, str(tmp_path)).collect()[0]
    pp = 2 / 5
    expect = (2 / 3 - 0.0) / math.sqrt(pp * (1 - pp) * (1 / 3 + 1 / 2))
    assert z.z_stat == round(expect, 6)
    assert bool(z.significant) == (abs(expect) > 1.96)


def test_theil_sen_ignores_outlier_where_ols_moves(spark, tmp_path):
    """y = 2x on 30 days plus one wild outlier day: the pairwise-slope
    median stays ~2 while OLS is dragged away."""
    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    rows = []
    k = 0
    for i in range(31):
        y = 2.0 * i if i != 30 else 1e6  # endpoint = max leverage
        # one order per day carrying the day's revenue
        rows.append((k, d0 + dt.timedelta(days=i), y))
        k += 1
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderdate date, o_totalprice double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from covid_custom_sql_engine_spark.registry import attribution_drift as an

    out = an.theil_sen_trend(spark, str(tmp_path)).collect()[0]
    assert out.n_days == 31
    assert abs(out.slope_theil_sen - 2.0) < 1e-6
    assert abs(out.slope_ols - 2.0) > 100.0


def test_conformal_interval_coverage(spark, sf_dir):
    """Split-conformal self-check: calibration coverage of the 90%
    interval is ~0.9 by construction (exact percentile → at least 0.9
    up to the boundary row), and the pieces are internally consistent."""
    r = qr.QUERIES["conformal_interval"](spark, sf_dir).collect()[0]
    assert r.n_train > 0 and r.n_cal > 0
    assert r.q90_resid > 0
    assert 0.88 <= r.cal_coverage <= 0.92
    # the split is by orderkey parity: halves are comparable in size
    assert abs(r.n_train - r.n_cal) < 0.2 * (r.n_train + r.n_cal)


def test_info_gain_split_invariants(spark, sf_dir):
    """Every candidate threshold is emitted with an auditable gain:
    gains are non-negative (splitting never loses information), the
    rank-1 row attains the maximum, and the left counts are monotone
    in the threshold (cumulative by construction)."""
    rows = sorted(
        qr.QUERIES["info_gain_split"](spark, sf_dir).collect(),
        key=lambda r: r.split_at,
    )
    assert len(rows) >= 2
    assert all(r.info_gain >= 0 for r in rows)
    best = max(r.info_gain for r in rows)
    assert [r.info_gain for r in rows if r.rank == 1] == [best]
    lefts = [(r.pos_left + r.neg_left) for r in rows]
    assert lefts == sorted(lefts)
    # the full-range "split" (max threshold) carries zero gain
    assert rows[-1].info_gain == 0.0
