"""Fast span kernel ≡ generic span algebra.

_span_fast_freqs (queries/kernel.py) vectorizes the two hot span shapes —
ordered all-term SpanNear and SpanFirst over a term — as packed-key
searchsorted chains over flat ragged position arrays. The generic per-doc
algebra (spans.py eval_spans + span_freq) stays the semantic source of
truth shared with the single-node oracle. This file pins the two equal on
randomized corpora, doc by doc and float by float, without needing a Spark
session: a SegmentPostings is built directly from codec.encode_postings
rows (reference semantics: spans/NearSpansOrdered.java greedy chain,
SpanFirstQuery.java end filter, SpanScorer.java sloppyFreq sum)."""

import math

import numpy as np
import pytest

from lucene_spark.codec import encode_postings, vbyte_encode
from lucene_spark.queries.ast import SpanFirst, SpanNear, SpanTerm
from lucene_spark.queries.kernel import (SegmentPostings, _span_candidates,
                                         _span_fast_freqs)
from lucene_spark.spans import eval_spans, span_freq, span_width_min

import pandas as pd


def build_sp(docs: dict[int, list[str]]) -> SegmentPostings:
    """docs: docid -> token list → one-segment SegmentPostings (salt 0)."""
    per_term: dict[str, dict[int, np.ndarray]] = {}
    for d, toks in docs.items():
        for t in set(toks):
            pos = np.flatnonzero(np.asarray(toks, dtype=object) == t).astype(np.int64)
            per_term.setdefault(t, {})[d] = pos
    rows = []
    for t, by_doc in per_term.items():
        ids = np.asarray(sorted(by_doc), dtype=np.int64)
        tfs = np.asarray([by_doc[int(d)].size for d in ids], dtype=np.int64)
        dls = np.asarray([len(docs[int(d)]) for d in ids], dtype=np.int64)
        row = encode_postings(ids, tfs, dls)
        deltas = np.concatenate([
            np.concatenate(([by_doc[int(d)][0]], np.diff(by_doc[int(d)])))
            for d in ids
        ])
        row["positions_blob"] = vbyte_encode(deltas)
        row["term"] = t
        row["salt"] = 0
        rows.append(row)
    return SegmentPostings(pd.DataFrame(rows))


def generic_freqs(sp: SegmentPostings, q) -> tuple[np.ndarray, np.ndarray]:
    """The generic _eval_span path up to (docs, freqs): eval_spans over
    positions restricted to the structural candidates."""
    root_cand = np.sort(_span_candidates(sp, q))
    cache: dict[str, dict[int, np.ndarray]] = {}

    def pos_of(term):
        if term not in cache:
            if not sp.has(term) or root_cand.size == 0:
                cache[term] = {}
            else:
                ids, pls = sp.positions_for(term, root_cand)
                cache[term] = {int(d): pl for d, pl in zip(ids, pls)}
        return cache[term]

    spans = eval_spans(q, pos_of)
    wmin = span_width_min(q)
    docs = np.asarray(sorted(spans), dtype=np.int64)
    frs = np.asarray([span_freq(spans[int(d)], wmin) for d in docs])
    sel = frs > 0
    return docs[sel], frs[sel]


def assert_same(fast, gen):
    docs_f, frs_f = fast
    docs_g, frs_g = gen
    assert docs_f.tolist() == docs_g.tolist()
    for d, a, b in zip(docs_f, frs_f, frs_g):
        assert math.isclose(float(a), float(b), rel_tol=1e-12), (d, a, b)


VOCAB = ["red", "blue", "green", "red", "dot", "line", "arc", "red", "hub"]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    docs = {}
    for d in range(150):
        n = int(rng.integers(1, 60))
        docs[d] = [VOCAB[i] for i in rng.integers(0, len(VOCAB), size=n)]
    return docs


@pytest.fixture(scope="module")
def sp(corpus):
    return build_sp(corpus)


NEAR_CASES = [
    SpanNear([SpanTerm("red"), SpanTerm("blue")], slop=0, in_order=True),
    SpanNear([SpanTerm("red"), SpanTerm("blue")], slop=2, in_order=True),
    SpanNear([SpanTerm("blue"), SpanTerm("red")], slop=5, in_order=True),
    SpanNear([SpanTerm("red"), SpanTerm("dot"), SpanTerm("line")],
             slop=1, in_order=True),
    SpanNear([SpanTerm("red"), SpanTerm("blue"), SpanTerm("green"),
              SpanTerm("arc")], slop=8, in_order=True),
    SpanNear([SpanTerm("red"), SpanTerm("red")], slop=0, in_order=True),
    SpanNear([SpanTerm("red"), SpanTerm("red"), SpanTerm("red")],
             slop=3, in_order=True),
    SpanNear([SpanTerm("hub"), SpanTerm("hub")], slop=9, in_order=True),
]


@pytest.mark.parametrize("q", NEAR_CASES, ids=lambda q: "|".join(
    c.term for c in q.clauses) + f"~{q.slop}")
def test_near_fast_equals_generic(sp, q):
    fast = _span_fast_freqs(sp, q)
    assert fast is not None
    assert_same(fast, generic_freqs(sp, q))


@pytest.mark.parametrize("end", [0, 1, 2, 5, 11, 60])
def test_first_fast_equals_generic(sp, end):
    q = SpanFirst(SpanTerm("green"), end=end)
    fast = _span_fast_freqs(sp, q)
    assert fast is not None
    assert_same(fast, generic_freqs(sp, q))


def test_missing_term_is_empty(sp):
    q = SpanNear([SpanTerm("red"), SpanTerm("nosuchterm")], slop=3,
                 in_order=True)
    fast = _span_fast_freqs(sp, q)
    assert fast is not None and fast[0].size == 0
    q2 = SpanFirst(SpanTerm("nosuchterm"), end=4)
    fast2 = _span_fast_freqs(sp, q2)
    assert fast2 is not None and fast2[0].size == 0


def test_unordered_and_or_shapes_fall_back(sp):
    from lucene_spark.queries.ast import SpanOr
    assert _span_fast_freqs(sp, SpanNear(
        [SpanTerm("red"), SpanTerm("blue")], slop=2, in_order=False)) is None
    assert _span_fast_freqs(sp, SpanNear(
        [SpanOr([SpanTerm("red"), SpanTerm("dot")]), SpanTerm("blue")],
        slop=2, in_order=True)) is None
    assert _span_fast_freqs(sp, SpanFirst(
        SpanNear([SpanTerm("red"), SpanTerm("blue")], 0, True), end=5)) is None


def test_random_near_trees_fast_equals_generic(corpus, sp):
    rng = np.random.default_rng(7)
    terms = ["red", "blue", "green", "dot", "line", "arc", "hub"]
    for _ in range(40):
        k = int(rng.integers(2, 5))
        clauses = [SpanTerm(terms[int(i)])
                   for i in rng.integers(0, len(terms), size=k)]
        q = SpanNear(clauses, slop=int(rng.integers(0, 7)), in_order=True)
        fast = _span_fast_freqs(sp, q)
        assert fast is not None
        assert_same(fast, generic_freqs(sp, q))
