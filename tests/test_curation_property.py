"""Property-based differential test for the end-to-end curation
pipeline (functions/corpus.curation_pipeline — the composition behind
the ``corpus_curation_pipeline`` registered query).

Hypothesis generates small randomized corpora with all the hazard
shapes: quality scores straddling the threshold (punct-heavy junk vs
stopword-rich prose), exact-duplicate clusters (whitespace-variant
clones, exercising normalization), and near-duplicate chains (token
edits that keep most shingles). A pure-Python reference — quality
score, md5 fingerprint, Kirsch–Mitzenmacher MinHash, LSH banding,
union-find connected components — computes the expected
quality/exact_dup/near_dup/kept label per document, and the Spark
pipeline must match it exactly.

The reference re-implements the algorithm SPEC (same md5-derived hash
family, same band layout, same min-id keep rule) independently of the
Spark code, so a defect in either the per-stage expressions or the
stage wiring shows up as a label mismatch. All arithmetic on both
sides is the same IEEE-754 double chain, so threshold comparisons are
bit-deterministic, not flaky.
"""

from __future__ import annotations

import pytest

# Full-registry audit battery: excluded from the default (driver) test
# path by pytest.ini's `-m "not slow"` — run with `-m ""`. The same
# surface is gated standalone at round end (tools/check_oracle.py /
# check_plans.py / check_bare.py run the full 316-query versions).
pytestmark = pytest.mark.slow

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from covid_custom_sql_engine_spark.functions import corpus as cp

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# --- pure-Python reference -------------------------------------------------

_SW_EN = {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"}
_PUNCT = set(".,;:!?")
_M = 1_099_511_627_689  # dedup.KM_MODULUS
_NUM_HASHES, _BAND_ROWS = 12, 3
_THR = 0.45


def _quality(text: str) -> float:
    n = len(text)
    len_c = min(n / 500.0, 1.0)
    n_punct = sum(1 for ch in text if ch in _PUNCT)
    punct_c = 1.0 - (n_punct / n if n > 0 else 0.0)
    toks = [t for t in text.strip().lower().split() if t]
    hits = sum(1 for t in toks if t in _SW_EN)
    sw_c = min((hits / len(toks) if toks else 0.0) * 5.0, 1.0)
    return (len_c + punct_c + sw_c) / 3.0


def _normalized(text: str) -> str:
    return " ".join(text.strip().lower().split())


def _shingles(text: str) -> set[str]:
    toks = _normalized(text).split(" ")
    if len(toks) >= 3:
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    return {" ".join(toks)}


def _band_hashes(text: str) -> list[tuple[int, str]]:
    mh = [_M] * _NUM_HASHES
    for s in _shingles(text):
        hx = hashlib.md5(s.encode()).hexdigest()
        h1, h2 = int(hx[0:15], 16) % _M, int(hx[15:30], 16) % _M
        for i in range(_NUM_HASHES):
            mh[i] = min(mh[i], (h1 + i * h2) % _M)
    out = []
    for b in range(_NUM_HASHES // _BAND_ROWS):
        key = "_".join(str(mh[b * _BAND_ROWS + r]) for r in range(_BAND_ROWS))
        out.append((b, hashlib.md5(key.encode()).hexdigest()))
    return out


def _reference_stages(docs: list[tuple[int, str]]) -> dict[int, str]:
    stages: dict[int, str] = {}
    survivors: list[tuple[int, str]] = []
    # stage 1: quality gate
    for i, t in docs:
        if _quality(t) < _THR:
            stages[i] = "quality"
        else:
            survivors.append((i, t))
    # stage 2: exact dedup — min id per normalized-text fingerprint
    by_fp: dict[str, int] = {}
    for i, t in survivors:
        fp = hashlib.md5(_normalized(t).encode()).hexdigest()
        by_fp[fp] = min(by_fp.get(fp, i), i)
    s2 = []
    for i, t in survivors:
        fp = hashlib.md5(_normalized(t).encode()).hexdigest()
        if by_fp[fp] == i:
            s2.append((i, t))
        else:
            stages[i] = "exact_dup"
    # stage 3: LSH near-dup — bucket by (band, band_hash), pair, CC
    buckets: dict[tuple[int, str], list[int]] = {}
    for i, t in s2:
        for bh in _band_hashes(t):
            buckets.setdefault(bh, []).append(i)
    parent = {i: i for i, _ in s2}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ids in buckets.values():
        if len(ids) > 200:  # MAX_BAND_BUCKET: oversized buckets emit no pairs
            continue
        for other in ids[1:]:
            ra, rb = find(ids[0]), find(other)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for i, _ in s2:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    for i, _ in s2:
        stages[i] = "kept" if comp_min[find(i)] == i else "near_dup"
    return stages


# --- corpus strategy -------------------------------------------------------

_GOOD = ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"]
_NEUTRAL = ["data", "model", "spark", "query", "corpus", "token", "nation",
            "order", "batch", "shard", "join", "scan"]
_JUNK = ["!!!", "???", "...", ";;;", ":::", ",,,"]

_token = st.sampled_from(_GOOD + _NEUTRAL + _JUNK)
_base_doc = st.lists(_token, min_size=2, max_size=40).map(" ".join)


@st.composite
def _corpus(draw):
    bases = draw(st.lists(_base_doc, min_size=1, max_size=8))
    docs: list[str] = []
    for t in bases:
        docs.append(t)
        for _ in range(draw(st.integers(0, 2))):  # whitespace-variant clones
            docs.append("  " + t.replace(" ", "  ", 1) + " ")
        for _ in range(draw(st.integers(0, 2))):  # near clones (token edit)
            extra = draw(_token)
            docs.append(t + " " + extra)
    ids = draw(
        st.lists(
            st.integers(0, 10_000), min_size=len(docs), max_size=len(docs), unique=True
        )
    )
    return list(zip(ids, docs))


# --- the property ----------------------------------------------------------


@given(docs=_corpus())
@settings(**SETTINGS)
def test_curation_stage_labels_match_python_reference(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.stage
        for r in cp.curation_pipeline(df, q_threshold=_THR).collect()
    }
    want = _reference_stages(docs)
    assert got == want


def test_curation_stage_labels_fixed_hazards(spark):
    """Deterministic hazard corpus: a quality reject, an exact-dup
    cluster whose min id wins, and a near-dup chain A~B~C collapsing to
    one kept representative (plus an unpaired survivor)."""
    prose = " ".join(["the data and model of the spark query is that it"] * 3)
    docs = [
        (7, prose),                       # kept (min of exact cluster)
        (9, "  " + prose + "  "),         # exact_dup of 7 (normalization)
        (3, "!!! ??? ..."),               # quality reject
        (11, prose + " extra"),           # near_dup of 7 (one-token edit)
        (5, "order batch shard join scan token corpus model data "
            "the and of to in is that it for was"),  # kept, unpaired
    ]
    got = {
        r.doc_id: r.stage
        for r in cp.curation_pipeline(
            spark.createDataFrame(docs, "doc_id long, text string"), q_threshold=_THR
        ).collect()
    }
    assert got == _reference_stages(docs)
    assert got[3] == "quality" and got[9] == "exact_dup"
    assert got[7] == "kept" and got[11] == "near_dup" and got[5] == "kept"
