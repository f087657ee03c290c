"""explain_full — score decomposition for EVERY query shape (reference
search/Weight.java:59 Explanation tree): term, phrase (pf/sloppyFreq),
span, constant-score, and boolean trees. Verified component-by-component
against the single-node oracle's own arithmetic."""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.indexing import IndexReader  # noqa: E402
from lucene_spark.queries.ast import (  # noqa: E402
    Bool,
    ConstantScore,
    Phrase,
    SpanNear,
    SpanTerm,
    Term,
)
from lucene_spark.queries.planner import Searcher  # noqa: E402
from lucene_spark.scoring import bm25_idf, bm25_tf_weight, phrase_freq  # noqa: E402


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return Searcher(IndexReader(spark, index_dir))


def _rows(searcher, q):
    return [r.asDict() for r in searcher.explain_full(q).collect()]


def test_term_components_match_legacy_explain(searcher):
    """For a pure term query, explain_full carries the same numbers the
    contract explain (per-term decomposition) reports."""
    legacy = {(r["docid"], r["term"]): (r["tf"], r["idf"], r["score"])
              for r in searcher.explain("seven").collect()}
    full = _rows(searcher, "seven")
    assert full and all(r["kind"] == "term" for r in full)
    for r in full:
        tf, idf, score = legacy[(r["docid"], r["component"])]
        assert r["freq"] == pytest.approx(tf)
        assert r["idf"] == pytest.approx(idf)
        assert r["score"] == pytest.approx(score)


def test_phrase_components(searcher, oracle_index):
    """Phrase rows expose pf (sloppyFreq sum), the summed idf, and the
    tf-weight — each re-derivable from the oracle postings."""
    q = Phrase(["seven", "forty"])
    rows = _rows(searcher, q)
    assert rows, "expected phrase matches"
    idx = oracle_index
    exp_idf = float(sum(bm25_idf(idx.N, idx.df(t))
                        for t in ("seven", "forty")))
    for r in rows:
        assert r["kind"] == "phrase"
        d = r["docid"]
        pls = [np.asarray(idx.postings[t][d], dtype=np.int64)
               for t in ("seven", "forty")]
        pf = phrase_freq(pls, q.qpositions(), 0)
        assert r["freq"] == pytest.approx(pf)
        assert r["idf"] == pytest.approx(exp_idf)
        w = float(bm25_tf_weight(pf, idx.doclen[d], idx.avgdl))
        assert r["weight"] == pytest.approx(w)
        assert r["score"] == pytest.approx(exp_idf * w)
        assert r["dl"] == idx.doclen[d]


def test_span_components(searcher, oracle_index):
    """SpanNear rows expose the span freq and score — equal to the oracle's
    span evaluation."""
    from lucene_spark.oracle import _eval_span

    q = SpanNear([SpanTerm("seven"), SpanTerm("forty")], slop=3,
                 in_order=True)
    rows = _rows(searcher, q)
    assert rows, "expected span matches"
    want = _eval_span(oracle_index, q)
    got = {r["docid"]: r["score"] for r in rows}
    assert set(got) == set(want)
    for d, sc in want.items():
        assert got[d] == pytest.approx(sc)
    assert all(r["kind"] == "span" for r in rows)


def test_constant_score_components(searcher):
    q = ConstantScore(Bool(should=[Term("seven")]), boost=0.7)
    rows = _rows(searcher, q)
    assert rows
    for r in rows:
        assert r["kind"] == "const"
        assert r["score"] == pytest.approx(0.7)
        assert r["freq"] == 1.0 and math.isnan(r["idf"]) is False


def test_bool_tree_components_sum_to_search_score(searcher):
    """Components of a mixed boolean tree (term + phrase) sum per doc to
    the search() score — the Explanation-tree invariant."""
    q = Bool(must=[Term("seven")], should=[Phrase(["seven", "forty"])])
    rows = _rows(searcher, q)
    assert rows and {r["kind"] for r in rows} == {"term", "phrase"}
    by_doc: dict[int, float] = {}
    for r in rows:
        by_doc[r["docid"]] = by_doc.get(r["docid"], 0.0) + r["score"]
    hits = {r["docid"]: r["score"]
            for r in searcher.matching(q).collect()}
    for d, sc in hits.items():
        assert by_doc[d] == pytest.approx(sc, rel=1e-9), d
