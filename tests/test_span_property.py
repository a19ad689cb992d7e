"""Property-based differential test for exact-substring span dedup:
corpus.repeated_token_spans (the edit plan) and corpus.remove_spans
(the plan executed) against an independent pure-Python reference.

Hypothesis plants shared passages into randomized corpora with every
interval-merge hazard shape: passages at length exactly k (one marked
window) and k-1 (must NOT be detected), overlapping and nested repeats
(a doc containing the passage twice), adjacent islands separated by
exactly k tokens (must merge — gap rule is `> k` breaks) and k+1
tokens (must split), and multiple distinct passages per document. The
reference recomputes marked positions and the gaps-and-islands merge
brute-force from the tokenizer spec (strip/lower/split on whitespace),
then executes the cuts positionally — any drift in the window
fingerprinting, the merge rule, or the HOF position filter shows up as
a mismatch. A hand-built closed-loop case asserts re-detection on the
cleaned corpus finds zero spans when surroundings are unique.
"""

from __future__ import annotations

import pytest

# Full-registry audit battery: excluded from the default (driver) test
# path by pytest.ini's `-m "not slow"` — run with `-m ""`. The same
# surface is gated standalone at round end (tools/check_oracle.py /
# check_plans.py / check_bare.py run the full 316-query versions).
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings, strategies as st

from covid_custom_sql_engine_spark.functions.corpus import (
    remove_spans,
    repeated_token_spans,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

K = 8


# --- pure-Python reference -------------------------------------------------


def _toks(text: str) -> list[str]:
    return [t for t in text.strip().lower().split() if t]


def _ref_spans(docs: dict[int, str], k: int = K) -> dict[int, list[tuple[int, int]]]:
    """Brute-force spec: every k-token window shared by >= 2 documents
    marks its 1-based start; per document, sorted marks split into
    islands wherever the gap exceeds k; island -> [min, max + k)."""
    toks = {d: _toks(t) for d, t in docs.items()}
    owners: dict[str, set[int]] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            owners.setdefault(" ".join(ts[i : i + k]), set()).add(d)
    spans: dict[int, list[tuple[int, int]]] = {}
    for d, ts in toks.items():
        marks = [
            i + 1
            for i in range(len(ts) - k + 1)
            if len(owners[" ".join(ts[i : i + k])]) >= 2
        ]
        if not marks:
            continue
        out = []
        start = prev = marks[0]
        for p in marks[1:]:
            if p - prev > k:
                out.append((start, prev + k))
                start = p
            prev = p
        out.append((start, prev + k))
        spans[d] = out
    return spans


def _ref_clean(docs: dict[int, str], k: int = K) -> dict[int, tuple[str, int, int, int]]:
    spans = _ref_spans(docs, k)
    out = {}
    for d, t in docs.items():
        ts = _toks(t)
        ss = spans.get(d, [])
        kept = [
            tok
            for i, tok in enumerate(ts, start=1)
            if not any(s <= i < e for s, e in ss)
        ]
        out[d] = (" ".join(kept), len(ts), len(kept), len(ts) - len(kept))
    return out


# --- strategies ------------------------------------------------------------

# a deliberately small filler vocabulary so accidental cross-document
# 8-grams occur organically in some examples (the reference handles
# them identically — extra coverage, not noise)
_FILLER = st.sampled_from([f"w{i}" for i in range(10)])
_PASSAGE_VOCAB = [f"p{i}" for i in range(40)]


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(2, 5))
    # shared passages at the k-boundaries: k-1 (undetectable), k, 2k+1
    passages = []
    for plen in draw(
        st.lists(st.sampled_from([K - 1, K, K + 1, 2 * K, 2 * K + 1]), min_size=1, max_size=3)
    ):
        s = draw(st.integers(0, len(_PASSAGE_VOCAB) - 1))
        passages.append([_PASSAGE_VOCAB[(s + j) % len(_PASSAGE_VOCAB)] for j in range(plen)])
    docs = {}
    for d in range(1, n_docs + 1):
        parts = draw(st.lists(_FILLER, min_size=0, max_size=6))
        # plant 0..2 passages, possibly the same one twice (nested/
        # overlapping repeats within one document)
        for _ in range(draw(st.integers(0, 2))):
            p = draw(st.sampled_from(passages))
            pos = draw(st.integers(0, len(parts)))
            # gap shapes around the insert: exactly-k and k+1 fillers
            gap = draw(st.sampled_from([0, K, K + 1]))
            parts = parts[:pos] + [f"g{d}x{j}" for j in range(gap)] + p + parts[pos:]
        docs[d] = " ".join(parts)
    return docs


# --- tests -----------------------------------------------------------------


@settings(**SETTINGS)
@given(corpora())
def test_spans_match_reference(spark, docs):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got: dict[int, list[tuple[int, int]]] = {}
    for r in repeated_token_spans(df, k=K).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        assert r.span_tokens == r.span_end - r.span_start
    got = {d: sorted(v) for d, v in got.items()}
    assert got == _ref_spans(docs)


@settings(**SETTINGS)
@given(corpora())
def test_remove_spans_matches_reference(spark, docs):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    spans = repeated_token_spans(df, k=K)
    got = {
        r.doc_id: (r.text_clean, r.n_tokens, r.n_kept, r.n_cut)
        for r in remove_spans(df, spans).collect()
    }
    assert got == _ref_clean(docs)
    # accounting invariant: every input document comes back
    assert set(got) == set(docs)


def test_remove_spans_closed_loop(spark):
    """With unique surroundings (no seam can recreate a shared 8-gram),
    cleaning removes ALL cross-document repeats: re-running detection on
    the cleaned corpus finds zero spans."""
    shared = " ".join(f"s{i}" for i in range(12))
    docs = [
        (1, "a1 a2 a3 " + shared + " a4 a5"),
        (2, "b1 b2 " + shared + " b3 b4 b5 b6"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cleaned = remove_spans(df, repeated_token_spans(df, k=K))
    rows = {r.doc_id: r for r in cleaned.collect()}
    assert rows[1].n_cut == 12 and rows[2].n_cut == 12 and rows[3].n_cut == 0
    assert rows[3].text_clean == docs[2][1]
    re_docs = cleaned.selectExpr("doc_id", "text_clean AS text")
    assert repeated_token_spans(re_docs, k=K).count() == 0
