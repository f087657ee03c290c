"""Extended operator coverage: TermRange, keyword-field filters, facets,
field-sorted top-k — Spark engine vs the single-node oracle (same
two-engines-one-truth pattern as test_build_query)."""

import math

import pytest

from lucene_spark.indexing import IndexReader
from lucene_spark.oracle import oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.ast import Bool, ConstantScore, Term, TermRange
from lucene_spark.queries.planner import Searcher

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


@pytest.mark.parametrize("qs", [
    "[seven TO sixty]",
    "{seven TO sixty}",
    "[fifty TO *]",
    "[* TO eight]",
    "one AND [seventy TO seventyone]",
])
def test_term_range_rank_identity(searcher, oracle_index, qs):
    q = parse_query(qs)
    assert_rank_identical(topk(searcher, qs), oracle_search(oracle_index, q, K))


def test_regexp_rank_identity(searcher, oracle_index):
    """contrib/regex RegexQuery: anchored full-term regex → disjunction."""
    from lucene_spark.queries.ast import Regexp

    for pat in ["s.*n", "(seven|eight)ty", "fi[fv]ty?e?"]:
        q = Regexp(pat)
        assert_rank_identical(topk(searcher, q),
                              oracle_search(oracle_index, q, K))


def test_range_parse():
    q = parse_query("[alpha TO beta]^2")
    assert isinstance(q, TermRange)
    assert (q.lo, q.hi, q.include_lo, q.include_hi, q.boost) == (
        "alpha", "beta", True, True, 2.0)
    q = parse_query("{alpha TO *}")
    assert (q.lo, q.hi, q.include_lo) == ("alpha", None, False)


def test_field_query_parse():
    q = parse_query("seven AND lang:en")
    assert isinstance(q, Bool)
    cs = q.must[1]
    assert isinstance(cs, ConstantScore) and cs.boost == 0.0
    assert cs.query == Term("lang:en")


def test_keyword_field_filter(spark, pages_dir, tmp_path_factory):
    """lang:de filters to the de docs (fixture: i % 10 == 7 → de) without
    changing the text-term scores of survivors."""
    from lucene_spark.indexing import build_index, merge_index

    out = str(tmp_path_factory.mktemp("kwidx"))
    build_index(spark, pages_dir, out, target_docs_per_seg=100,
                keyword_fields=("lang",))
    merge_index(spark, out)
    s = Searcher(IndexReader(spark, out))
    all_hits = dict(topk(s, "one"))
    de_hits = [(int(r["docid"]), float(r["score"]))
               for r in s.search("one AND lang:de", k=400).collect()]
    assert de_hits, "expected some de docs matching 'one'"
    for docid, score in de_hits:
        assert docid % 10 == 7
        if docid in all_hits:  # same text score + 0.0 filter contribution
            assert math.isclose(score, all_hits[docid], rel_tol=1e-12)
    assert s.count("lang:de") == sum(1 for i in range(400) if i % 10 == 7)


def test_facets_corpus_and_query(searcher, oracle_index):
    # corpus facet = df ranking from the dictionary
    rows = searcher.facets(top_n=5).collect()
    odf = sorted(((len(p), t) for t, p in oracle_index.postings.items()),
                 key=lambda x: (-x[0], x[1]))[:5]
    assert [(r["term"], r["n_docs"]) for r in rows] == [(t, n) for n, t in odf]
    # query facet: counts over docs matching the query
    rows = searcher.facets("seven", top_n=5).collect()
    match = {d for d, _ in oracle_search(
        oracle_index, parse_query("seven"), 1 << 30)}
    counts: dict[str, int] = {}
    for t, plist in oracle_index.postings.items():
        c = sum(1 for d in plist if d in match)
        if c:
            counts[t] = c
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["term"], r["n_docs"]) for r in rows] == expect


def test_search_sorted(searcher, oracle_index):
    rows = searcher.search_sorted("seven", by="doclen", k=5,
                                  ascending=False).collect()
    match = {d for d, _ in oracle_search(
        oracle_index, parse_query("seven"), 1 << 30)}
    expect = sorted(((oracle_index.doclen[d], d) for d in match),
                    key=lambda x: (-x[0], x[1]))[:5]
    assert [(r["doclen"], r["docid"]) for r in rows] == expect


def test_pack_sequences_partitioning_invariant(spark):
    """text_pack_sequences' two-phase prefix sum must produce identical
    rows at ANY parallelism (the scalable replacement for a single-
    partition global window): same output under 2 and 37 shuffle
    partitions, and the offsets reconstruct the exact concatenated-corpus
    layout (consecutive starts differ by n_tok)."""
    import os

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    fn = E.extra_queries()["text_pack_sequences"]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = [tuple(r) for r in fn(spark, sf).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        b = [tuple(r) for r in fn(spark, sf).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b and len(a) > 0
    ctx = E._PACK_CTX
    start_prev, n_prev = None, None
    for _doc, n, pid, off, nsp in a:
        start = pid * ctx + off
        if start_prev is not None:
            assert start == start_prev + n_prev  # exact concat layout
        assert nsp == (start + max(n, 1) - 1) // ctx - start // ctx + 1
        start_prev, n_prev = start, n
