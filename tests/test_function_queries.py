"""FilteredQuery (docmap-predicate ∧ query) and CustomScoreQuery
(score × value source) vs the single-node oracle.

Reference: search/FilteredQuery.java:40, search/NumericRangeQuery.java:155
(native BETWEEN here), search/function/CustomScoreQuery.java:47,
ValueSourceQuery.java:42."""

import math
import statistics

import pytest

from lucene_spark.indexing import IndexReader
from lucene_spark.oracle import oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.planner import Searcher

K = 10


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return Searcher(IndexReader(spark, index_dir))


def _collect(df):
    return [(int(r["docid"]), float(r["score"])) for r in df.collect()]


def _oracle_all(oracle_index, qs):
    return oracle_search(oracle_index, parse_query(qs), 1 << 32)


def test_filtered_range_rank_identity(searcher, oracle_index):
    dls = list(oracle_index.doclen.values())
    lo, hi = min(dls), int(statistics.median(dls))
    got = _collect(searcher.search_filtered(
        "one", f"doclen BETWEEN {lo} AND {hi}", k=K))
    want = [(d, s) for d, s in _oracle_all(oracle_index, "one")
            if lo <= oracle_index.doclen[d] <= hi][:K]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert math.isclose(s1, s2, rel_tol=1e-9)
    # filter genuinely excludes something
    assert len(_oracle_all(oracle_index, "one")) > len(want)


def test_filtered_keyword_predicate(searcher, oracle_index):
    """lang predicate — fixture: i % 10 == 7 → de."""
    got = _collect(searcher.search_filtered("one", "lang = 'de'", k=K))
    want = [(d, s) for d, s in _oracle_all(oracle_index, "one")
            if d % 10 == 7][:K]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_cached_filter_identity_and_reuse(searcher, oracle_index):
    """CachingWrapperFilter analog (search/CachingWrapperFilter.java):
    cache=True must return identical results, reuse the SAME pinned
    docid-set across calls and queries, and uncache cleanly."""
    pred = "lang = 'de'"
    plain = _collect(searcher.search_filtered("one", pred, k=K))
    cached = _collect(searcher.search_filtered("one", pred, k=K, cache=True))
    assert cached == plain
    # per-reader cache: same predicate → the same persisted DataFrame
    # (reference caches one DocIdSet per reader, not per query)
    df1 = searcher.cached_filter(pred)
    assert df1 is searcher.cached_filter(pred)
    assert df1.storageLevel.useMemory
    # a second QUERY over the cached filter also matches its plain run
    assert (_collect(searcher.search_filtered("seven", pred, k=K, cache=True))
            == _collect(searcher.search_filtered("seven", pred, k=K)))
    searcher.uncache_filters()
    assert not searcher._filter_cache


def test_custom_score_rank_identity(searcher, oracle_index):
    got = _collect(searcher.custom_score("one", "1.0 + 100.0 / doclen", k=K))
    scored = [(d, s * (1.0 + 100.0 / oracle_index.doclen[d]))
              for d, s in _oracle_all(oracle_index, "one")]
    want = sorted(scored, key=lambda kv: (-kv[1], kv[0]))[:K]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert math.isclose(s1, s2, rel_tol=1e-9)


def test_custom_score_reranks(searcher, oracle_index):
    """The value source must actually change the ordering vs plain BM25
    somewhere in the full ranking (sanity that the test isn't vacuous)."""
    plain = [d for d, _ in _oracle_all(oracle_index, "one")]
    rer = [(d, s * (1.0 + 100.0 / oracle_index.doclen[d]))
           for d, s in _oracle_all(oracle_index, "one")]
    rer = [d for d, _ in sorted(rer, key=lambda kv: (-kv[1], kv[0]))]
    assert plain != rer
