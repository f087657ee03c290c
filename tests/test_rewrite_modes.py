"""MultiTermQuery rewrite modes + classic fuzzy minimumSimilarity.

Reference tests mirrored: TestWildcard.java rewrite-mode assertions
(scoring vs constant-score agree on the doc set, constant modes score
uniformly) and TestFuzzyQuery.java edge cases (short terms, prefixLength>0,
length-scaled budgets). Engine vs the single-node oracle — the
"two engines, one truth" pattern (search/TestBoolean2.java)."""

import math

import pytest

from lucene_spark.indexing import IndexReader
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries import planner as planner_mod
from lucene_spark.queries.ast import (
    REWRITE_AUTO,
    REWRITE_CONST_BOOL,
    REWRITE_CONST_FILTER,
    Fuzzy,
    Prefix,
    TermRange,
    Wildcard,
)
from lucene_spark.queries.parser import parse_query
from lucene_spark.queries.planner import Searcher

K = 400  # no truncation on the 400-doc fixture


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return Searcher(IndexReader(spark, index_dir))


@pytest.fixture(scope="module")
def oracle(pages_dir):
    import pyarrow.dataset as ds

    texts = ds.dataset(pages_dir).to_table(columns=["text"])["text"].to_pylist()
    return build_oracle_index(list(enumerate(texts)))


def hits(searcher, q, k=K):
    return [(int(r["docid"]), float(r["score"]))
            for r in searcher.search(q, k=k).collect()]


@pytest.mark.parametrize("mk", [
    lambda m: Prefix("se", rewrite_method=m),
    lambda m: Wildcard("s?v*", rewrite_method=m),
    lambda m: TermRange("seven", "sixty", rewrite_method=m),
    lambda m: Fuzzy("sevem", max_edits=1, rewrite_method=m),
])
def test_modes_agree_on_doc_set(searcher, oracle, mk):
    scoring = hits(searcher, mk("scoring_boolean"))
    docs = {d for d, _ in scoring}
    assert docs, "fixture must match something"
    for mode in (REWRITE_CONST_BOOL, REWRITE_CONST_FILTER, REWRITE_AUTO):
        got = hits(searcher, mk(mode))
        assert {d for d, _ in got} == docs, mode
        assert all(s == 1.0 for _, s in got), mode
        # constant ties break docid-asc (HitQueue tie rule)
        assert [d for d, _ in got] == sorted(docs), mode
        exp = oracle_search(oracle, mk(mode), K)
        assert [d for d, _ in got] == [d for d, _ in exp], mode


def test_const_filter_boost_and_oracle(searcher, oracle):
    q = Prefix("se", boost=2.5, rewrite_method=REWRITE_CONST_FILTER)
    got = hits(searcher, q)
    assert got and all(s == 2.5 for _, s in got)
    exp = oracle_search(oracle, q, K)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert math.isclose(a, b, rel_tol=1e-12)


def test_auto_cutoff_resolution(searcher, monkeypatch):
    """AUTO picks filter past the term-count cutoff, boolean under it
    (MultiTermQuery.java:382-386) — resolved inside _rewrite_multiterm."""
    q = Prefix("se", rewrite_method=REWRITE_AUTO)
    monkeypatch.setattr(planner_mod, "AUTO_TERM_CUTOFF", 1)
    r_filter = searcher.rewrite(q)
    monkeypatch.setattr(planner_mod, "AUTO_TERM_CUTOFF", 1 << 20)
    monkeypatch.setattr(planner_mod, "AUTO_DOC_COUNT_PERCENT", 1e9)
    r_bool = searcher.rewrite(q)
    from lucene_spark.queries.ast import ConstantScore

    assert isinstance(r_filter, ConstantScore)
    assert isinstance(r_bool, ConstantScore)  # both constant-score family


# --- classic minimumSimilarity (FuzzyTermEnum.java:95,129-136,185-216) ----

FUZZY_DOCS = [
    (0, "megacorp announces results"),
    (1, "megacorps announce result"),
    (2, "mega corp announced"),
    (3, "cat sat here"),
    (4, "cart cat flat"),
    (5, "megacorporation restructuring"),
]
FIDX = build_oracle_index(FUZZY_DOCS)


def test_min_similarity_length_scaled_oracle():
    # long term: 0.5 similarity on 'megacorp' (8 chars) allows up to
    # floor-ish edits scaled by min length — 'megacorps' (1 edit over
    # min len 8 → sim 1-1/8=0.875) in; 'mega' (4 edits over min len 4 →
    # sim 0) out; 'megacorporation' sim 1-7/8 = 0.125 out
    got = set(d for d, _ in oracle_search(FIDX, Fuzzy("megacorp", min_similarity=0.5), 10))
    assert got == {0, 1}
    # short term: 'cat'~0.5 — 'cart' dist 1, min len 3 → sim 1-1/3=0.667 in;
    # 'sat'/'flat' dist 1 → in; 'here' dist 4 → out
    got = set(d for d, _ in oracle_search(FIDX, Fuzzy("cat", min_similarity=0.5), 10))
    assert got == {3, 4}


def test_min_similarity_prefix_length():
    # prefixLength=4 pins 'mega' — candidates must share it; similarity is
    # computed on the suffixes but scaled by prefixLen + min(suffix lens)
    q = Fuzzy("megacorp", min_similarity=0.5, prefix_length=4)
    got = set(d for d, _ in oracle_search(FIDX, q, 10))
    assert got == {0, 1}  # 'mega' itself: suffix '' vs 'corp' → sim 1-4/4=0


def test_parser_similarity_forms():
    q = parse_query("megacorp~0.5", analyzer="whitespace")
    assert isinstance(q, Fuzzy) and q.min_similarity == 0.5
    q = parse_query("megacorp~", analyzer="whitespace")
    assert q.min_similarity == 0.5  # FuzzyQuery.defaultMinSimilarity
    q = parse_query("megacorp~1", analyzer="whitespace")
    assert q.min_similarity is None and q.max_edits == 1


def test_min_similarity_engine_matches_oracle(spark, searcher, oracle):
    """Spark dictionary-scan predicate ≡ python formula on the shared
    fixture index (different implementations, same FuzzyTermEnum math)."""
    for q in (Fuzzy("sevem", min_similarity=0.5),
              Fuzzy("seventeen", min_similarity=0.6),
              Fuzzy("sevem", min_similarity=0.5, prefix_length=2),
              Fuzzy("one", min_similarity=0.5)):
        got = hits(searcher, q)
        exp = oracle_search(oracle, q, K)
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, rel_tol=1e-9), q
