"""Parser robustness: the reference QueryParser throws ParseException on
malformed syntax (QueryParser.java getWildcardQuery/getPrefixQuery guards,
JavaCC token errors); this parser is deliberately LENIENT — every string
parses to SOME Query (garbage degrades to analyzed terms or an empty Bool,
never a crash). This module pins that contract over an adversarial corpus,
and pins the one lenient mapping with an at-scale story: a bare `*` must
become MatchAll, never Prefix("") — an empty-prefix enumeration rewrites to
a scoring disjunction over the ENTIRE dictionary, which at a 10^8-term web
corpus is a full-postings traversal (the reference refuses the same input,
QueryParser.java:956 allowLeadingWildcard).
"""

import pytest

from lucene_spark.queries import parse_query
from lucene_spark.queries.ast import (Bool, Fuzzy, MatchAll, Phrase, Prefix,
                                      Query, Term, Wildcard)
from lucene_spark.queries.parser import parse_complex_phrase, parse_precedence

ADVERSARIAL = [
    "", "   ", '"', '"unclosed', "AND", "OR", "NOT", "AND AND", "a AND",
    "a OR", "(", ")", "(a", "a)", "((a OR b)", "a AND (b OR", "+", "-",
    "+-a", "field:", ":term", "a:b:c", "[a TO", "[a TO b", "{a TO b]",
    "[TO b]", "a~x", "a~-1", "a^", "a^x", "*", "*a", "?a", "a**b", '""',
    '"a b"~', '"a b"~x', "a\\", "\\", "a AND NOT", "NOT NOT a",
    "\U0001f600", "a \U0001f600 b", '"a\nb"', "a\tb",
    "((((((((((a))))))))))", "f:(a AND b", 'a:"b c', "-(-a)", "+()", "()",
    "a OR ()", "*^2", "~", "^", "~2", "TO", "[* TO *]", "a:*", "text:*",
]


def _no_empty_prefix(q: Query):
    """No parse may yield Prefix('') — the unbounded-dictionary shape."""
    if isinstance(q, Prefix):
        assert q.prefix != "", "empty-prefix enumeration leaked from parse"
    for attr in ("must", "should", "must_not", "clauses", "queries"):
        for c in getattr(q, attr, ()) or ():
            _no_empty_prefix(c)
    for attr in ("query", "inner", "positive", "negative", "include",
                 "exclude"):
        c = getattr(q, attr, None)
        if isinstance(c, Query):
            _no_empty_prefix(c)


@pytest.mark.parametrize("s", ADVERSARIAL, ids=lambda s: repr(s)[:24])
def test_lenient_never_raises(s):
    q = parse_query(s)
    assert isinstance(q, Query)
    _no_empty_prefix(q)


@pytest.mark.parametrize("s", ADVERSARIAL, ids=lambda s: repr(s)[:24])
def test_contrib_parsers_never_raise(s):
    # the precedence + complex-phrase front-ends share the leniency contract
    assert isinstance(parse_precedence(s), Query)
    assert isinstance(parse_complex_phrase(s), Query)


def test_bare_star_is_matchall():
    q = parse_query("*")
    assert isinstance(q, MatchAll)
    qb = parse_query("*^2")
    assert isinstance(qb, MatchAll) and qb.boost == 2.0
    assert isinstance(parse_query("*:*"), MatchAll)


def test_garbage_fuzzy_boost_degrade_to_text():
    # `roam~x` / `roam^x`: the suffix is not a valid param — lenient parse
    # keeps the USER'S TERM (analyzed as text), never drops it
    for s in ("roam~x", "roam^x"):
        q = parse_query(s)
        assert isinstance(q, Phrase) and q.phrase_terms[0] == "roam", s
    # well-formed forms still take the dedicated paths
    assert isinstance(parse_query("roam~"), Fuzzy)
    assert isinstance(parse_query("roam~1"), Fuzzy)
    assert parse_query("roam^2") == Term("roam", boost=2.0)


def test_field_exists_is_namespace_prefix():
    # f:* = "field exists": must stay a NAMESPACE-bounded prefix scan,
    # never an all-dictionary wildcard
    q = parse_query("title:*")
    inner = getattr(q, "query", q)  # keyword fields wrap in ConstantScore
    assert isinstance(inner, (Prefix, Wildcard))
    pat = getattr(inner, "prefix", None) or getattr(inner, "pattern", "")
    assert pat.startswith("title:")


def test_structural_garbage_degrades_to_empty_bool():
    for s in ("(", "AND", "+()", "a AND"):
        q = parse_query(s)
        assert isinstance(q, (Bool, MatchAll))


# --- the same contract one layer down: degenerate ASTs through the ------
# --- distributed planner (a structurally-distinct subset; the full ------
# --- 61-string corpus was driven once end-to-end without a crash) -------

SERVE = ["", "(", "AND", "a AND", "*", "?", '""', "field:", "a~x", "*^2",
         "[TO b]", "NOT NOT a", "a:*", "-(-a)", "seven"]


@pytest.fixture(scope="module")
def tiny_searcher(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_spark.fixtures import pages_pdf
    from lucene_spark.indexing import IndexReader, build_index, merge_index
    from lucene_spark.queries.planner import Searcher

    tmp = str(tmp_path_factory.mktemp("robust_idx"))
    src = f"{tmp}/pages"
    import os

    os.makedirs(src)
    pq.write_table(pa.Table.from_pandas(pages_pdf(40), preserve_index=False),
                   f"{src}/p.parquet", coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    build_index(spark, src, f"{tmp}/idx")
    merge_index(spark, f"{tmp}/idx")
    return Searcher(IndexReader(spark, f"{tmp}/idx"))


@pytest.mark.parametrize("s", SERVE, ids=lambda s: repr(s)[:16])
def test_degenerate_queries_serve(tiny_searcher, s):
    n = tiny_searcher.count(s)
    rows = tiny_searcher.search(s, k=3).collect()
    assert 0 <= n <= 40 and len(rows) <= 3
    if s in ("*", "*^2", ""):
        assert n == 40  # match-everything forms
