"""contrib query surface: FuzzyLikeThisQuery, surround DSL, XML parser —
AST-shape unit tests + Spark-engine vs single-node-oracle rank-identity.

Reference: contrib/queries/.../FuzzyLikeThisQuery.java,
contrib/surround/src/java/org/apache/lucene/queryParser/surround/
(QueryParser.jj, DistanceQuery.java:116), contrib/xml-query-parser/
(CoreParser.java + src/test/.../xmlparser/*.xml element shapes)."""

import math

import pytest

from lucene_spark.indexing import IndexReader
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries.ast import (
    Bool,
    Boosting,
    ConstantScore,
    DisjunctionMax,
    MatchAll,
    Prefix,
    SpanFirst,
    SpanMulti,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    Term,
    TermRange,
)
from lucene_spark.queries.flt import (
    FuzzyLikeThis,
    fuzzy_similarity,
    resolve_fuzzy_like_this,
)
from lucene_spark.queries.planner import Searcher
from lucene_spark.queries.surround import parse_surround
from lucene_spark.queries.xmlparser import XmlDedup, parse_xml

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


# --------------------------------------------------------------------- #
# surround parser → AST shapes
# --------------------------------------------------------------------- #

def test_surround_infix_w():
    q = parse_surround("seven 3w hundred")
    assert q == SpanNear([SpanTerm("seven"), SpanTerm("hundred")],
                         slop=2, in_order=True)


def test_surround_infix_n_default_distance():
    q = parse_surround("seven N hundred")
    assert q == SpanNear([SpanTerm("seven"), SpanTerm("hundred")],
                         slop=0, in_order=False)


def test_surround_prefix_op():
    q = parse_surround("4N(seven, hundred, fifty)")
    assert q == SpanNear(
        [SpanTerm("seven"), SpanTerm("hundred"), SpanTerm("fifty")],
        slop=3, in_order=False)


def test_surround_boolean_precedence():
    # AND binds looser than NOT: a AND b NOT c == a AND (b NOT c)
    q = parse_surround("seven AND hundred NOT fifty")
    assert q == Bool(must=[Term("seven"),
                           Bool(must=[Term("hundred")],
                                must_not=[Term("fifty")])])


def test_surround_or_inside_distance():
    q = parse_surround("3W(OR(seven, eight), hundred)")
    assert q == SpanNear(
        [SpanOr(clauses=[SpanTerm("seven"), SpanTerm("eight")]),
         SpanTerm("hundred")], slop=2, in_order=True)


def test_surround_truncation_inside_distance():
    q = parse_surround("2W(seve*, hundred)")
    assert q == SpanNear([SpanMulti(Prefix("seve")), SpanTerm("hundred")],
                         slop=1, in_order=True)


def test_surround_field_prefix_namespaces_terms():
    q = parse_surround("title:3W(seven, hundred)")
    assert q == SpanNear(
        [SpanTerm("title:seven"), SpanTerm("title:hundred")],
        slop=2, in_order=True)


def test_surround_weight():
    q = parse_surround("(seven AND hundred)^2.5")
    assert isinstance(q, Bool) and q.boost == 2.5


def test_surround_rejects_and_inside_distance():
    with pytest.raises(ValueError):
        parse_surround("3W(AND(seven, eight), hundred)")
    with pytest.raises(ValueError):
        parse_surround("seven W (eight AND nine)")


def test_surround_rejects_short_truncation():
    with pytest.raises(ValueError):
        parse_surround("se*")  # minimumPrefixLength 3 (QueryParser.jj)


def test_surround_engine_vs_oracle(searcher, oracle_index):
    for s in ["seven 3W hundred", "2N(seventy, one)",
              "seven AND hundred NOT fifty",
              "3W(OR(seven, eight), hundred)"]:
        q = parse_surround(s)
        assert_rank_identical(topk(searcher, q),
                              oracle_search(oracle_index, q, K))


# --------------------------------------------------------------------- #
# XML parser → AST shapes (element forms from the reference test XMLs)
# --------------------------------------------------------------------- #

def test_xml_term_and_boolean():
    q = parse_xml("""
      <BooleanQuery fieldName="text">
        <Clause occurs="should"><TermQuery>seven</TermQuery></Clause>
        <Clause occurs="mustnot"><TermQuery>fifty</TermQuery></Clause>
        <Clause occurs="must"><TermQuery>hundred</TermQuery></Clause>
      </BooleanQuery>""")
    assert q == Bool(must=[Term("hundred")], should=[Term("seven")],
                     must_not=[Term("fifty")])


def test_xml_fieldname_inherited_and_namespaced():
    q = parse_xml("""
      <BooleanQuery fieldName="title">
        <Clause occurs="must"><TermQuery>seven</TermQuery></Clause>
        <Clause occurs="must"><TermQuery fieldName="text">nine</TermQuery></Clause>
      </BooleanQuery>""")
    assert q == Bool(must=[Term("title:seven"), Term("nine")])


def test_xml_terms_query_analyzes():
    q = parse_xml('<TermsQuery fieldName="text">seven hundred</TermsQuery>')
    assert q == Bool(should=[Term("seven"), Term("hundred")])


def test_xml_user_query_delegates_to_parser():
    q = parse_xml("<UserQuery>seven AND hundred</UserQuery>")
    assert isinstance(q, Bool) and len(q.must) == 2


def test_xml_span_family():
    q = parse_xml("""
      <SpanOr fieldName="text">
        <SpanNear slop="8" inOrder="false">
          <SpanOr><SpanTerm>seven</SpanTerm><SpanTerm>eight</SpanTerm></SpanOr>
          <SpanOrTerms>hundred thousand</SpanOrTerms>
        </SpanNear>
        <SpanFirst end="10"><SpanTerm>ninety</SpanTerm></SpanFirst>
      </SpanOr>""")
    assert q == SpanOr(clauses=[
        SpanNear(clauses=[
            SpanOr(clauses=[SpanTerm("seven"), SpanTerm("eight")]),
            SpanOr(clauses=[SpanTerm("hundred"), SpanTerm("thousand")])],
            slop=8, in_order=False),
        SpanFirst(match=SpanTerm("ninety"), end=10)])


def test_xml_span_not():
    q = parse_xml("""
      <SpanNot fieldName="text">
        <Include><SpanTerm>one</SpanTerm></Include>
        <Exclude><SpanTerm>hundred</SpanTerm></Exclude>
      </SpanNot>""")
    assert q == SpanNot(include=SpanTerm("one"), exclude=SpanTerm("hundred"))


def test_xml_filtered_query_folds_filter():
    q = parse_xml("""
      <FilteredQuery>
        <Query><MatchAllDocsQuery/></Query>
        <Filter><RangeFilter fieldName="text" lowerTerm="seven"
                 upperTerm="seventy"/></Filter>
      </FilteredQuery>""")
    assert q == Bool(must=[
        MatchAll(),
        ConstantScore(TermRange(lo="seven", hi="seventy"), boost=0.0)])


def test_xml_constant_score_and_boosting():
    q = parse_xml("""
      <ConstantScoreQuery boost="1.5">
        <RangeFilter fieldName="text" lowerTerm="seven" upperTerm="seventy"
                     includeUpper="false"/>
      </ConstantScoreQuery>""")
    assert q == ConstantScore(
        TermRange(lo="seven", hi="seventy", include_hi=False), boost=1.5)
    q2 = parse_xml("""
      <BoostingQuery>
        <Query><TermQuery fieldName="text">seven</TermQuery></Query>
        <BoostQuery boost="0.2"><TermQuery fieldName="text">hundred</TermQuery></BoostQuery>
      </BoostingQuery>""")
    assert q2 == Boosting(match=Term("seven"), context=Term("hundred"),
                          demote=0.2)


def test_xml_disjunction_max():
    q = parse_xml("""
      <DisjunctionMaxQuery tieBreaker="0.3">
        <TermQuery fieldName="text">seven</TermQuery>
        <TermQuery fieldName="text">hundred</TermQuery>
      </DisjunctionMaxQuery>""")
    assert q == DisjunctionMax(queries=[Term("seven"), Term("hundred")],
                               tie_breaker=0.3)


def test_xml_fuzzy_like_this_element():
    q = parse_xml("""
      <FuzzyLikeThisQuery maxNumTerms="12" minSimilarity="0.6"
                          prefixLength="1">
        <Field fieldName="text">sevem hundrek</Field>
      </FuzzyLikeThisQuery>""")
    assert q == FuzzyLikeThis(fields=[("text", "sevem hundrek")],
                              max_num_terms=12, min_similarity=0.6,
                              prefix_length=1)


def test_xml_duplicate_filter_wrapper():
    w = parse_xml("""
      <FilteredQuery>
        <Query><TermQuery fieldName="text">seven</TermQuery></Query>
        <Filter><DuplicateFilter fieldName="lang" keepMode="last"/></Filter>
      </FilteredQuery>""")
    assert isinstance(w, XmlDedup)
    assert w.query == Term("seven") and w.key == "lang" and w.keep == "last"


def test_xml_unknown_element_raises():
    with pytest.raises(ValueError):
        parse_xml("<NoSuchQuery>x</NoSuchQuery>")


def test_xml_engine_vs_oracle(searcher, oracle_index):
    xmls = [
        """<BooleanQuery fieldName="text">
             <Clause occurs="must"><TermQuery>seven</TermQuery></Clause>
             <Clause occurs="should"><TermQuery>hundred</TermQuery></Clause>
           </BooleanQuery>""",
        """<DisjunctionMaxQuery tieBreaker="0.3">
             <TermQuery fieldName="text">seven</TermQuery>
             <TermQuery fieldName="text">hundred</TermQuery>
           </DisjunctionMaxQuery>""",
    ]
    for x in xmls:
        q = parse_xml(x)
        assert_rank_identical(topk(searcher, q),
                              oracle_search(oracle_index, q, K))


def test_xml_search_routes_dedup(searcher):
    hits = searcher.search_xml("""
      <FilteredQuery>
        <Query><TermQuery fieldName="text">seven</TermQuery></Query>
        <Filter><DuplicateFilter fieldName="lang" keepMode="first"/></Filter>
      </FilteredQuery>""", k=K).collect()
    # DuplicateFilter semantics: exactly one matching doc per key value
    langs = [r["lang"] for r in hits]
    assert len(langs) == len(set(langs)) and len(hits) >= 1


# --------------------------------------------------------------------- #
# FuzzyLikeThis — similarity maths, resolution shape, rank-identity
# --------------------------------------------------------------------- #

def test_fuzzy_similarity_formula():
    # no prefix: 1 - dist/min(len)
    assert fuzzy_similarity("seven", "sevem", 0) == pytest.approx(0.8)
    assert fuzzy_similarity("seven", "seven", 0) == pytest.approx(1.0)
    # prefix 2: distance on suffixes, scaled by prefix + min suffix len
    assert fuzzy_similarity("seven", "seved", 2) == pytest.approx(1 - 1 / 5)


def test_flt_resolution_shape():
    # tiny hand-rolled dictionary: source 'sevem' absent, variants present
    dict_terms = {"seven": 40, "sever": 5, "hundred": 80}

    def enum(fq):
        out = []
        for t, df in sorted(dict_terms.items()):
            s = fuzzy_similarity(fq.term, t, fq.prefix_length)
            if s > fq.min_similarity:
                out.append((t, df))
        return out

    q = FuzzyLikeThis(fields=[("", "sevem")], max_num_terms=8)
    resolved = resolve_fuzzy_like_this(
        q, enum, lambda t: dict_terms.get(t, 0), N=100,
        analyze_field=lambda f, s: s.split())
    # source absent → df = avg of variants; both variants kept, grouped
    assert isinstance(resolved, Bool) and len(resolved.should) == 1
    group = resolved.should[0]
    assert isinstance(group, Bool) and len(group.should) == 2
    assert all(isinstance(c, ConstantScore) for c in group.should)
    # equal edit similarity → equal boost (same source idf), term asc order
    b0, b1 = group.should[0], group.should[1]
    assert b0.query == Term("seven") and b1.query == Term("sever")
    assert b0.boost == pytest.approx(b1.boost)


def test_flt_max_num_terms_caps_variants():
    dict_terms = {f"ter{c}": 10 for c in "abcdefgh"}

    def enum(fq):
        return sorted(dict_terms.items())

    q = FuzzyLikeThis(fields=[("", "term")], max_num_terms=3)
    resolved = resolve_fuzzy_like_this(
        q, enum, lambda t: 0, N=100,
        analyze_field=lambda f, s: s.split())
    group = resolved.should[0]
    assert len(group.should) == 3


def test_flt_engine_vs_oracle(searcher, oracle_index):
    q = FuzzyLikeThis(fields=[("", "sevem hundrek")], max_num_terms=16,
                      min_similarity=0.5)
    assert_rank_identical(topk(searcher, q),
                          oracle_search(oracle_index, q, K))


def test_flt_engine_vs_oracle_prefix_length(searcher, oracle_index):
    q = FuzzyLikeThis(fields=[("", "ninety")], max_num_terms=8,
                      min_similarity=0.5, prefix_length=2)
    assert_rank_identical(topk(searcher, q),
                          oracle_search(oracle_index, q, K))


# --------------------------------------------------------------------- #
# randomized round-trips (the TestBoolean2.java:214 randomized-tree
# pattern applied to the parsers: generate AST → print → reparse → equal)
# --------------------------------------------------------------------- #

import random

_WORDS = ["seven", "seventy", "hundred", "fifty", "ninety", "eight",
          "thousand", "nineteen"]


def _rand_span(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.45:
        return SpanTerm(rng.choice(_WORDS))
    if r < 0.7:
        n = rng.randint(2, 3)
        return SpanOr(clauses=[_rand_span(rng, depth + 1) for _ in range(n)])
    d = rng.randint(1, 5)
    n = rng.randint(2, 3)
    return SpanNear(clauses=[_rand_span(rng, depth + 1) for _ in range(n)],
                    slop=d - 1, in_order=rng.random() < 0.5)


def _print_surround(q):
    if isinstance(q, SpanTerm):
        return q.term
    if isinstance(q, SpanOr):
        return "OR(" + ", ".join(_print_surround(c) for c in q.clauses) + ")"
    if isinstance(q, SpanNear):
        op = f"{q.slop + 1}{'W' if q.in_order else 'N'}"
        return op + "(" + ", ".join(_print_surround(c) for c in q.clauses) + ")"
    raise TypeError(type(q))


def test_surround_random_roundtrip():
    rng = random.Random(42)
    for _ in range(200):
        q = _rand_span(rng)
        if isinstance(q, SpanTerm):
            assert parse_surround(_print_surround(q)) == Term(q.term)
            continue
        if isinstance(q, SpanOr):
            # top-level OR(...) of plain terms parses as a Bool disjunction
            # (span nodes only materialize inside a distance operator)
            continue
        assert parse_surround(_print_surround(q)) == q


def _print_xml(q):
    if isinstance(q, SpanTerm):
        return f"<SpanTerm>{q.term}</SpanTerm>"
    if isinstance(q, SpanOr):
        return ("<SpanOr>" + "".join(_print_xml(c) for c in q.clauses)
                + "</SpanOr>")
    if isinstance(q, SpanNear):
        o = "true" if q.in_order else "false"
        return (f'<SpanNear slop="{q.slop}" inOrder="{o}">'
                + "".join(_print_xml(c) for c in q.clauses) + "</SpanNear>")
    raise TypeError(type(q))


def test_xml_random_roundtrip():
    rng = random.Random(7)
    for _ in range(200):
        q = _rand_span(rng)
        assert parse_xml(f'<SpanOr fieldName="text">{_print_xml(q)}</SpanOr>'
                         ) == SpanOr(clauses=[q])


def test_surround_xml_same_query_same_hits(searcher, oracle_index):
    """The same span query expressed in all three syntaxes must produce
    identical hits (two parsers + hand-built AST, one execution path)."""
    hand = SpanNear([SpanTerm("seven"), SpanTerm("hundred")],
                    slop=2, in_order=True)
    srd = parse_surround("3W(seven, hundred)")
    xml = parse_xml('<SpanNear fieldName="text" slop="2" inOrder="true">'
                    "<SpanTerm>seven</SpanTerm><SpanTerm>hundred</SpanTerm>"
                    "</SpanNear>")
    assert srd == hand and xml == hand
    hits = topk(searcher, hand)
    assert hits == oracle_search(oracle_index, hand, K)
