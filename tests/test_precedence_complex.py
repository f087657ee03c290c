"""contrib PrecedenceQueryParser + ComplexPhraseQueryParser
(contrib/misc/.../precedence/PrecedenceQueryParser.jj,
contrib/misc/.../complexPhrase/ComplexPhraseQueryParser.java):
grammar shapes pinned, engine results rank-identical to the oracle."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.indexing import IndexReader  # noqa: E402
from lucene_spark.oracle import oracle_search  # noqa: E402
from lucene_spark.queries.ast import (  # noqa: E402
    Bool,
    Prefix,
    SpanMulti,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    Term,
)
from lucene_spark.queries.parser import (  # noqa: E402
    parse_complex_phrase,
    parse_precedence,
    parse_query,
)
from lucene_spark.queries.planner import Searcher  # noqa: E402


# --------------------------- precedence grammar ---------------------------


def test_and_binds_tighter_than_or():
    q = parse_precedence("seven AND forty OR ninety")
    assert isinstance(q, Bool) and not q.must
    assert len(q.should) == 2
    grp, lone = q.should
    assert isinstance(grp, Bool) and [c.term for c in grp.must] == [
        "seven", "forty"]
    assert isinstance(lone, Term) and lone.term == "ninety"
    # the CLASSIC parser flattens the same string to +seven +forty ninety
    c = parse_query("seven AND forty OR ninety")
    assert [t.term for t in c.must] == ["seven", "forty"]
    assert [t.term for t in c.should] == ["ninety"]


def test_modifier_applies_to_whole_and_group():
    q = parse_precedence("-seven AND forty ninety")
    # grammar: Modifier() andExpression — '-' negates (seven AND forty)
    assert len(q.must_not) == 1 and isinstance(q.must_not[0], Bool)
    assert [c.term for c in q.must_not[0].must] == ["seven", "forty"]
    assert [c.term for c in q.should] == ["ninety"]


def test_precedence_parens_and_plain_forms():
    q = parse_precedence("(seven OR forty) AND ninety")
    assert isinstance(q, Bool)
    assert len(q.must) == 2
    assert isinstance(q.must[0], Bool) and len(q.must[0].should) == 2
    assert q.must[1].term == "ninety"
    # single clause passes through unwrapped
    assert isinstance(parse_precedence("seven"), Term)


def test_precedence_results_match_oracle(spark, index_dir, oracle_index):
    s = Searcher(IndexReader(spark, index_dir))
    for text in ("seven AND forty OR ninety",
                 "(seven OR sixty) AND forty",
                 "seven AND forty AND NOT ninety OR sixty"):
        q = parse_precedence(text)
        got = [(r["docid"], round(r["score"], 9))
               for r in s.search(q, k=10).collect()]
        want = [(d, round(sc, 9)) for d, sc in oracle_search(oracle_index, q, 10)]
        assert got == want, text
    # semantic difference is real: a ninety-only doc matches precedence,
    # not classic
    prec = {d for d, _ in oracle_search(
        oracle_index, parse_precedence("seven AND forty OR ninety"), 1 << 30)}
    classic = {d for d, _ in oracle_search(
        oracle_index, parse_query("seven AND forty OR ninety"), 1 << 30)}
    assert classic < prec


# --------------------------- complex phrases ------------------------------


def test_complex_phrase_shapes():
    q = parse_complex_phrase('"(seven sixty) forty"')
    assert isinstance(q, SpanNear) and q.in_order and q.slop == 0
    alt, t = q.clauses
    assert isinstance(alt, SpanOr)
    assert {c.term for c in alt.clauses} == {"seven", "sixty"}
    assert isinstance(t, SpanTerm) and t.term == "forty"

    q = parse_complex_phrase('"sev* forty"~2')
    assert isinstance(q, SpanNear) and q.slop == 2
    assert isinstance(q.clauses[0], SpanMulti)
    assert isinstance(q.clauses[0].query, Prefix)

    # single plain term passes through as a TermQuery (reference rule)
    assert isinstance(parse_complex_phrase('"seven"'), Term)

    # negative element → SpanNot(include slop+negs, exclude all-clauses)
    q = parse_complex_phrase('"seven -sixty forty"')
    assert isinstance(q, SpanNot)
    assert isinstance(q.include, SpanNear) and q.include.slop == 1
    assert [c.term for c in q.include.clauses] == ["seven", "forty"]
    assert isinstance(q.exclude, SpanNear) and q.exclude.slop == 0
    assert len(q.exclude.clauses) == 3


@pytest.mark.parametrize("text", [
    '"(seven sixty) forty"~3',
    '"sev* forty"~5',
    '"seventeen forty"~9',
    '"seven -sixty forty"~2',
    'ninety OR "sev* forty"~4',
])
def test_complex_phrase_results_match_oracle(spark, index_dir, oracle_index,
                                             text):
    s = Searcher(IndexReader(spark, index_dir))
    q = parse_complex_phrase(text)
    got = [(r["docid"], round(r["score"], 9))
           for r in s.search(q, k=10).collect()]
    want = [(d, round(sc, 9)) for d, sc in oracle_search(oracle_index, q, 10)]
    assert got == want, text


def test_complex_phrase_wildcard_widens_matches(oracle_index):
    plain = oracle_search(oracle_index,
                          parse_complex_phrase('"seven forty"~5'), 1 << 30)
    wild = oracle_search(oracle_index,
                         parse_complex_phrase('"sev* forty"~5'), 1 << 30)
    assert {d for d, _ in plain} <= {d for d, _ in wild}
    assert wild, "wildcard phrase should match"
