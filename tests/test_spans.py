"""Span query family + MultiPhraseQuery — Spark engine vs single-node
oracle rank-identity (two-engines-one-truth), plus direct semantic unit
tests of the span algebra on hand-built documents.

Reference: spans/SpanTermQuery.java:28, SpanNearQuery.java:37,
SpanOrQuery.java:35, SpanNotQuery.java:31, SpanFirstQuery.java:32,
search/MultiPhraseQuery.java:39."""

import math

import numpy as np
import pytest

from lucene_spark.indexing import IndexReader
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries.ast import (
    Bool,
    MultiPhrase,
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    Term,
)
from lucene_spark.queries.planner import Searcher
from lucene_spark.spans import eval_spans, span_freq, span_width_min

K = 10


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return Searcher(IndexReader(spark, index_dir))


def assert_rank_identical(spark_hits, oracle_hits):
    assert [d for d, _ in spark_hits] == [d for d, _ in oracle_hits]
    for (d1, s1), (_d2, s2) in zip(spark_hits, oracle_hits):
        assert math.isclose(s1, s2, rel_tol=1e-9), (d1, s1, s2)


def topk(searcher, q):
    return [(int(r["docid"]), float(r["score"]))
            for r in searcher.search(q, k=K).collect()]


SPAN_QUERIES = [
    SpanNear([SpanTerm("one"), SpanTerm("hundred")], slop=0, in_order=True),
    SpanNear([SpanTerm("one"), SpanTerm("hundred")], slop=2, in_order=True),
    SpanNear([SpanTerm("hundred"), SpanTerm("one")], slop=3, in_order=False),
    SpanNear([SpanTerm("one"), SpanTerm("hundred"), SpanTerm("fifty")],
             slop=1, in_order=True),
    SpanNear([SpanOr([SpanTerm("seven"), SpanTerm("eight")]),
              SpanTerm("hundred")], slop=0, in_order=True),
    SpanOr([SpanTerm("sixty"), SpanTerm("seventy")]),
    SpanNot(SpanTerm("one"),
            SpanNear([SpanTerm("one"), SpanTerm("hundred")], 0, True)),
    SpanFirst(SpanTerm("one"), end=3),
    SpanFirst(SpanNear([SpanTerm("one"), SpanTerm("hundred")], 0, True), end=8),
]


@pytest.mark.parametrize("q", SPAN_QUERIES, ids=lambda q: type(q).__name__ + str(
    abs(hash(str(q))) % 10000))
def test_span_rank_identity(searcher, oracle_index, q):
    assert_rank_identical(topk(searcher, q), oracle_search(oracle_index, q, K))


def test_span_inside_bool(searcher, oracle_index):
    q = Bool(must=[Term("three"),
                   SpanNear([SpanTerm("one"), SpanTerm("hundred")], 1, True)])
    assert_rank_identical(topk(searcher, q), oracle_search(oracle_index, q, K))


MP_QUERIES = [
    MultiPhrase([["one", "two"], ["hundred"]]),
    MultiPhrase([["one"], ["hundred", "thousand"]], slop=0),
    MultiPhrase([["one", "three"], ["hundred"]], slop=2),
    MultiPhrase([["seven"], ["hundred"], ["forty", "fifty"]]),
]


@pytest.mark.parametrize("q", MP_QUERIES, ids=lambda q: "mp" + str(
    abs(hash(str(q))) % 10000))
def test_multiphrase_rank_identity(searcher, oracle_index, q):
    assert_rank_identical(topk(searcher, q), oracle_search(oracle_index, q, K))


def test_multiphrase_superset_of_phrase(searcher):
    """Single-alternative MultiPhrase ≡ the plain Phrase scorer."""
    from lucene_spark.queries.ast import Phrase

    mp = topk(searcher, MultiPhrase([["one"], ["hundred"]]))
    ph = topk(searcher, Phrase(["one", "hundred"]))
    assert mp == ph


def test_random_span_trees(searcher, oracle_index):
    """Randomized span trees (the TestBoolean2.java:214 randomized-tree
    pattern applied to the span algebra), batched through search_many so 25
    trees cost one Spark job; seed logged for reproducibility."""
    import random

    seed = 24242
    rng = random.Random(seed)
    vocab = ["one", "two", "seven", "forty", "hundred", "twenty",
             "seventeen", "ninety", "missingterm"]

    def rand_span(depth=0):
        r = rng.random()
        if depth >= 2 or r < 0.40:
            return SpanTerm(rng.choice(vocab))
        if r < 0.65:
            return SpanNear([rand_span(depth + 1)
                             for _ in range(rng.randint(2, 3))],
                            slop=rng.choice([0, 1, 3]),
                            in_order=rng.random() < 0.5)
        if r < 0.85:
            return SpanOr([rand_span(depth + 1)
                           for _ in range(rng.randint(2, 3))])
        if r < 0.95:
            return SpanNot(rand_span(depth + 1), rand_span(depth + 1))
        return SpanFirst(rand_span(depth + 1), end=rng.randint(2, 30))

    trees = {f"t{i:02d}": rand_span() for i in range(25)}
    batched = searcher.search_many(trees, k=K).collect()
    by_qid: dict[str, list] = {}
    for r in batched:
        by_qid.setdefault(r["qid"], []).append(
            (int(r["docid"]), float(r["score"])))
    for qid, q in trees.items():
        o_hits = oracle_search(oracle_index, q, K)
        try:
            assert_rank_identical(by_qid.get(qid, []), o_hits)
        except AssertionError as e:
            raise AssertionError(f"seed={seed} {qid} query={q}") from e


# ---------------------------------------------------------------------------
# direct span-algebra semantics on a tiny hand corpus
# ---------------------------------------------------------------------------

DOCS = [
    (0, "aa bb cc dd ee"),
    (1, "aa xx bb yy cc"),
    (2, "cc bb aa"),
    (3, "aa aa bb bb"),
    (4, "xx yy zz"),
]


@pytest.fixture(scope="module")
def tiny():
    idx = build_oracle_index(DOCS)

    def pos_of(term):
        return {d: np.asarray(pl, dtype=np.int64)
                for d, pl in idx.postings.get(term, {}).items()}

    return idx, pos_of


def spans_of(q, pos_of):
    return {d: [tuple(r) for r in arr.tolist()]
            for d, arr in eval_spans(q, pos_of).items()}


def test_ordered_exact(tiny):
    _, pos_of = tiny
    q = SpanNear([SpanTerm("aa"), SpanTerm("bb")], slop=0, in_order=True)
    got = spans_of(q, pos_of)
    # doc0: a@0 b@1 adjacent; doc1: a@0 b@2 gap 1 → no; doc2: a@2 after b → no
    # doc3: a@0→b@2 gap1 no, a@1→b@2 gap0 yes
    assert got == {0: [(0, 2)], 3: [(1, 3)]}


def test_ordered_slop_gaps(tiny):
    _, pos_of = tiny
    q = SpanNear([SpanTerm("aa"), SpanTerm("cc")], slop=1, in_order=True)
    got = spans_of(q, pos_of)
    # doc0 a@0 c@2 gap1 ok; doc1 a@0 c@4 gap3 no; doc2 a@2, no c after
    assert got == {0: [(0, 3)]}


def test_unordered_window(tiny):
    _, pos_of = tiny
    q = SpanNear([SpanTerm("aa"), SpanTerm("cc")], slop=0, in_order=False)
    got = spans_of(q, pos_of)
    # doc2: c@0 a@2 window 3 − 2 = 1 > 0 → no; with slop 1:
    assert 2 not in got
    q1 = SpanNear([SpanTerm("aa"), SpanTerm("cc")], slop=1, in_order=False)
    assert (0, 3) in spans_of(q1, pos_of)[2]


def test_span_not_overlap(tiny):
    _, pos_of = tiny
    # 'b' not inside an "a b" match: doc1's b@2 survives (a@0 b@2 not a span
    # at slop 0), doc0/doc3 matched pairs are excluded
    q = SpanNot(SpanTerm("bb"),
                SpanNear([SpanTerm("aa"), SpanTerm("bb")], 0, True))
    got = spans_of(q, pos_of)
    assert 0 not in got
    assert got[1] == [(2, 3)]
    assert got[2] == [(1, 2)]
    assert got[3] == [(3, 4)]  # b@2 covered by (1,3) match, b@3 free


def test_span_first(tiny):
    _, pos_of = tiny
    q = SpanFirst(SpanTerm("bb"), end=2)
    got = spans_of(q, pos_of)
    assert got == {0: [(1, 2)], 2: [(1, 2)]}  # b@1 (end 2 ≤ 2) only


def test_span_freq_decay():
    spans = np.asarray([[0, 2], [5, 8]], dtype=np.int64)
    # widths 2 and 3 with width_min 2 → 1.0 + 1/2
    assert math.isclose(span_freq(spans, 2), 1.5)


def test_width_min_composition():
    q = SpanNear([SpanOr([SpanTerm("aa"),
                          SpanNear([SpanTerm("bb"), SpanTerm("cc")], 0, True)]),
                  SpanTerm("dd")], slop=0, in_order=True)
    assert span_width_min(q) == 2  # min(1, 2) + 1


def test_span_multiterm_wrapper(searcher, oracle_index):
    """SpanMultiTermQueryWrapper: a Prefix inside a SpanNear expands to a
    SpanOr of dictionary terms on both engines."""
    from lucene_spark.queries.ast import Prefix, SpanMulti, Wildcard

    for q in [
        SpanNear([SpanMulti(Prefix("seve")), SpanTerm("hundred")], 1, True),
        SpanNear([SpanTerm("one"), SpanMulti(Wildcard("hundr?d"))], 0, True),
        SpanFirst(SpanMulti(Prefix("fif")), end=6),
    ]:
        assert_rank_identical(topk(searcher, q),
                              oracle_search(oracle_index, q, K))
