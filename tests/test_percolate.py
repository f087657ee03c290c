"""Percolation (reverse search, contrib/memory MemoryIndex analog):
the JVM-compiled match expressions must agree with the single-node
oracle's match membership (score > 0 under `_eval`) for every supported
query shape, on random corpora — two engines, one truth."""

import pandas as pd
import pytest

from lucene_spark.oracle import build_oracle_index, _eval
from lucene_spark.queries import parse_query
from lucene_spark.queries.ast import (
    Bool, Boosting, ConstantScore, DisjunctionMax, Fuzzy, MatchAll,
    MultiPhrase, Phrase, Prefix, Regexp, SpanNear, SpanTerm, Term,
    TermRange, Wildcard,
)
from lucene_spark.queries.percolate import percolate, percolate_indexed

from tests.test_random_corpora import _corpus


def _bank():
    return [
        ("q_term", Term("red")),
        ("q_and", Bool(must=[Term("red"), Term("blue")])),
        ("q_or", Bool(should=[Term("gold"), Term("gray")])),
        ("q_min2", Bool(should=[Term("red"), Term("gold"), Term("pink")],
                        min_should=2)),
        ("q_not", Bool(must=[Term("green")], must_not=[Term("pink")])),
        ("q_neg_only", Bool(must_not=[Term("red")])),  # matches nothing
        ("q_phrase", Phrase(["red", "blue"])),
        ("q_phrase_hole", Phrase(["red", "gold"], positions=[0, 2])),
        ("q_mphrase", MultiPhrase([["red", "green"], ["blue"]])),
        ("q_prefix", Prefix("gr")),
        ("q_wild", Wildcard("g*d")),
        ("q_regex", Regexp("(red|pink)")),
        ("q_fuzzy", Fuzzy("rad", max_edits=1)),
        ("q_fuzzy_sim", Fuzzy("green", prefix_length=2,
                              min_similarity=0.4)),
        ("q_range", TermRange("blue", "gray")),
        ("q_range_excl", TermRange("blue", "gray", include_lo=False,
                                   include_hi=False)),
        ("q_all", MatchAll()),
        ("q_const", ConstantScore(query=Prefix("p"))),
        ("q_dismax", DisjunctionMax(queries=[Term("red"),
                                             Phrase(["gold", "gray"])])),
        ("q_boosting", Boosting(match=Term("blue"), context=Term("red"))),
        ("q_parsed", parse_query("+red +(gold pink) -gray")),
    ]


@pytest.mark.parametrize("kind,seed,n", [("dense", 31, 150),
                                         ("zipf", 32, 250)])
def test_percolate_matches_oracle(spark, kind, seed, n):
    pdf = _corpus(seed, kind, n)
    idx = build_oracle_index(
        [(int(r.doc_id), r.text) for r in pdf.itertuples()],
        analyzer="whitespace")
    bank = _bank()
    expected = {(d, qid) for qid, q in bank
                for d in _eval(idx, q)}

    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(docs, bank).collect()}
    assert got == expected


def test_percolate_multifield(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["red blue", "gold pink", "red red gray", "blue"],
        "title": ["alpha beta", "alpha", "beta gamma", "delta"],
    })
    bank = [
        ("f_term", Term("title:alpha")),
        ("f_unknown", Term("nosuch:alpha")),       # no postings → nothing
        ("f_mix", Bool(must=[Term("red"), Term("title:beta")])),
        ("f_prefix", Prefix("title:ga")),
        ("f_fuzzy", Fuzzy("title:beta", max_edits=1)),
        ("f_range", TermRange("title:alpha", "title:beta")),
    ]
    idx = build_oracle_index(
        [(int(r.doc_id), r.text) for r in pdf.itertuples()],
        extra_fields={"title": {int(r.doc_id): r.title
                                for r in pdf.itertuples()}},
        analyzer="whitespace")
    expected = {(d, qid) for qid, q in bank for d in _eval(idx, q)}

    docs = spark.createDataFrame(pdf)
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(docs, bank,
                              field_cols={"title": "title"}).collect()}
    assert got == expected


def test_percolate_pretokenized_and_refusals(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "toks": [["a", "b"], ["b"]]}))
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(docs, [("t", Term("a"))],
                              text_col="toks").collect()}
    assert got == {(0, "t")}

    with pytest.raises(NotImplementedError, match="slop"):
        percolate(docs, [("s", Phrase(["a", "b"], slop=1))],
                  text_col="toks").collect()
    with pytest.raises(NotImplementedError, match="span"):
        percolate(docs, [("sp", SpanNear(clauses=[SpanTerm("a"),
                                                  SpanTerm("b")]))],
                  text_col="toks").collect()


def test_percolate_plan_is_narrow(spark):
    """The whole bank evaluates in one narrow projection — no Exchange,
    no Python evaluator in the plan (the PLANS.md §2 shape)."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["red blue"]}))
    plan = percolate(docs, _bank())._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_guard_terms_soundness_rules():
    from lucene_spark.queries.percolate import guard_terms
    assert guard_terms(Term("red")) == ["red"]
    assert guard_terms(Term("title:red")) is None
    assert guard_terms(Phrase(["red", "blue"])) == ["red"]
    assert guard_terms(MultiPhrase([["a", "b"], ["c"]])) == ["a", "b"]
    assert guard_terms(Bool(must=[MatchAll(), Term("x")])) == ["x"]
    assert guard_terms(Bool(should=[Term("a"), Prefix("b")])) is None
    assert guard_terms(Bool(should=[Term("a"), Term("b")])) == ["a", "b"]
    assert guard_terms(Bool(must_not=[Term("a")])) == []  # matches nothing
    assert guard_terms(DisjunctionMax(queries=[Term("a"), Term("b")])) \
        == ["a", "b"]
    assert guard_terms(DisjunctionMax(queries=[Term("a"), MatchAll()])) \
        is None
    assert guard_terms(Prefix("re")) is None
    assert guard_terms(MatchAll()) is None


@pytest.mark.parametrize("kind,seed,n", [("dense", 41, 150),
                                         ("zipf", 42, 220)])
def test_percolate_indexed_equals_plain(spark, kind, seed, n):
    """The inverted-bank scale path returns exactly the plain per-doc
    evaluation — guarded, unguarded, and matches-nothing queries alike."""
    from lucene_spark.queries.percolate import percolate_indexed
    pdf = _corpus(seed, kind, n)
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    bank = [(qid, q) for qid, q in _bank()]
    plain = {(r["doc_id"], r["query_id"])
             for r in percolate(docs, bank).collect()}
    indexed = {(r["doc_id"], r["query_id"])
               for r in percolate_indexed(docs, bank).collect()}
    assert indexed == plain


def test_indexed_large_bank_expression_depth(spark):
    """The flat-CaseWhen regression: percolate_indexed exists for 10^4+
    banks, so a couple thousand guarded queries must compile (a nested
    when/otherwise chain overflowed Catalyst's recursive analyzer here)
    and return the exact per-doc match set."""
    from lucene_spark.queries.ast import Term

    docs = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(40)], "doc_id int, text string")
    bank = [(f"q{i}", Term(f"w{i % 80}")) for i in range(2000)]
    res = percolate_indexed(docs, bank)
    # doc i matches every q with i % 80 == its token index: 2000/80 per doc
    assert res.count() == 40 * 25
    one = {r["query_id"] for r in
           res.where("doc_id = 3").collect()}
    assert one == {f"q{j}" for j in range(3, 2000, 80)}
