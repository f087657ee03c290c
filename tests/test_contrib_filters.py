"""contrib query filters: TermsFilter, BooleanFilter, DuplicateFilter
(contrib/queries/src/java/org/apache/lucene/search/TermsFilter.java,
BooleanFilter.java, DuplicateFilter.java) — engine vs oracle."""

import math

import pyarrow.dataset as ds
import pytest

from lucene_spark.indexing import IndexReader
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries.ast import Bool, ConstantScore, Term
from lucene_spark.queries.planner import Searcher, boolean_filter, terms_filter

K = 400


@pytest.fixture(scope="module")
def ctx(spark, pages_dir, tmp_path_factory):
    from lucene_spark.indexing import build_index, merge_index

    out = str(tmp_path_factory.mktemp("filteridx"))
    build_index(spark, pages_dir, out, target_docs_per_seg=200,
                keyword_fields=("lang",))
    merge_index(spark, out)
    tab = ds.dataset(pages_dir).to_table(columns=["text", "lang"])
    texts = tab["text"].to_pylist()
    langs = tab["lang"].to_pylist()
    oracle = build_oracle_index(list(enumerate(texts)))
    # keyword field postings for the oracle: lang:<v> terms, tf 1
    for i, v in enumerate(langs):
        oracle.postings.setdefault(f"lang:{v}", {})[i] = [0]
    return Searcher(IndexReader(spark, out)), oracle, langs


def hits(searcher, q, k=K):
    return [(int(r["docid"]), float(r["score"]))
            for r in searcher.search(q, k=k).collect()]


def assert_match(got, exp):
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert math.isclose(a, b, rel_tol=1e-9)


def test_terms_filter(ctx):
    searcher, oracle, langs = ctx
    q = Bool(must=[Term("seven"), terms_filter("lang", ["de"])])
    got = hits(searcher, q)
    assert got, "filter should keep some hits"
    assert_match(got, oracle_search(oracle, q, K))
    assert {langs[d] for d, _ in got} <= {"de"}
    # scores unchanged vs the unfiltered query (filter is score-neutral)
    base = dict(hits(searcher, Term("seven")))
    for d, s in got:
        assert math.isclose(s, base[d], rel_tol=1e-12)


def test_boolean_filter(ctx):
    searcher, oracle, langs = ctx
    filt = boolean_filter(
        should=[ConstantScore(Term("lang:de")),
                ConstantScore(Term("lang:en"))],
        must_not=[Term("forty")])
    q = Bool(must=[Term("seven"), filt])
    got = hits(searcher, q)
    assert got
    assert_match(got, oracle_search(oracle, q, K))
    assert {langs[d] for d, _ in got} <= {"de", "en"}


def test_duplicate_filter(ctx):
    searcher, oracle, langs = ctx
    got = [(int(r["docid"]), float(r["score"]))
           for r in searcher.search_dedup("seven", key="lang", k=K).collect()]
    # oracle analog: all matches, keep lowest docid per lang, re-rank
    allhits = oracle_search(oracle, Term("seven"), 1 << 30)
    first_by_key: dict = {}
    for d, s in sorted(allhits):
        first_by_key.setdefault(langs[d], (d, s))
    exp = sorted(first_by_key.values(), key=lambda x: (-x[1], x[0]))
    assert_match(got, exp)
    assert len({langs[d] for d, _ in got}) == len(got)  # one per key
