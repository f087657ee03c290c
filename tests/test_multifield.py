"""Multi-field analyzed indexing: a second ANALYZED field (`title`) gets
its own term namespace, position stream, and per-field length stats
(the reference multi-field document model, document/Field.java:60 +
per-field norms index/NormsWriter.java:61) — Spark engine vs oracle."""

import math

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries.ast import Bool, Phrase, SpanFirst, SpanNear, SpanTerm, Term
from lucene_spark.queries.planner import Searcher

K = 10
N = 240


def _rows():
    """Deterministic corpus: body from number words, short titles reusing a
    few body words so title/text postings overlap but lengths differ."""
    from lucene_spark.fixtures import long_to_english

    rows = []
    for i in range(N):
        body = " ".join(long_to_english(j % 100) for j in range(i, i + 12))
        title = f"{long_to_english(i % 20)} report" if i % 3 else "summary"
        rows.append((str(i), body, title, "en"))
    return rows


@pytest.fixture(scope="module")
def mf(spark, tmp_path_factory):
    rows = _rows()
    src = tmp_path_factory.mktemp("mfsrc")
    for k, (lo, hi) in enumerate(((0, 120), (120, 240))):
        pdf = pd.DataFrame(rows[lo:hi], columns=["url", "text", "title", "lang"])
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       str(src / f"part-{k:04d}.parquet"))
    out = str(tmp_path_factory.mktemp("mfidx"))
    build_index(spark, str(src), out, target_docs_per_seg=120,
                analyzed_fields=("title",), keyword_fields=("lang",))
    merge_index(spark, out)
    oracle = build_oracle_index(
        [(i, r[1]) for i, r in enumerate(rows)],
        extra_fields={"title": {i: r[2] for i, r in enumerate(rows)}})
    return Searcher(IndexReader(spark, out)), oracle


def topk(searcher, q):
    return [(int(r["docid"]), float(r["score"]))
            for r in searcher.search(q, k=K).collect()]


def assert_rank_identical(spark_hits, oracle_hits):
    assert [d for d, _ in spark_hits] == [d for d, _ in oracle_hits]
    for (d1, s1), (_d2, s2) in zip(spark_hits, oracle_hits):
        assert math.isclose(s1, s2, rel_tol=1e-9), (d1, s1, s2)


def test_stats_have_field_avgdl(mf):
    searcher, oracle = mf
    r = searcher.reader
    assert r.analyzed_fields == ("title",)
    assert math.isclose(r.avgdl_fields["title"], oracle.avgdl_fields["title"],
                        rel_tol=1e-9)
    assert r.avgdl_fields["title"] < r.avgdl  # titles much shorter than body


@pytest.mark.parametrize("q", [
    Term("title:report"),
    Term("title:summary"),
    Term("title:seven"),
    Phrase(["title:seven", "title:report"]),
    Bool(must=[Term("seven"), Term("title:report")]),
    Bool(should=[Term("title:summary"), Term("nine")]),
    SpanNear([SpanTerm("title:seven"), SpanTerm("title:report")], 0, True),
], ids=lambda q: type(q).__name__ + str(abs(hash(str(q))) % 10000))
def test_field_query_rank_identity(mf, q):
    searcher, oracle = mf
    assert_rank_identical(topk(searcher, q), oracle_search(oracle, q, K))


def test_parser_field_syntax(mf):
    searcher, oracle = mf
    q = searcher.parse("title:report AND seven")
    got = topk(searcher, q)
    want = oracle_search(
        oracle, Bool(must=[Term("title:report"), Term("seven")]), K)
    assert_rank_identical(got, want)
    # multi-token field value analyzes to a field-scoped phrase
    q2 = searcher.parse("title:seven")
    assert q2 == Term("title:seven")


def test_field_length_norm_differs_from_text(mf):
    """'seven' appears in both fields: the title posting must normalize by
    the TITLE length/avgdl, not the body's — scores must differ."""
    searcher, oracle = mf
    t_hits = dict(topk(searcher, Term("title:seven")))
    b_hits = dict(topk(searcher, Term("seven")))
    common = set(t_hits) & set(b_hits)
    assert common
    assert all(not math.isclose(t_hits[d], b_hits[d], rel_tol=1e-6)
               for d in common)


def test_keyword_field_still_works(mf):
    searcher, _ = mf
    assert searcher.count("lang:en") == N


def test_cross_field_span_near(mf):
    """FieldMaskingSpanQuery equivalence (spans/FieldMaskingSpanQuery.java):
    our span algebra compares positions as plain ints, so a SpanNear over a
    title term and a body term matches when their per-field positions line
    up — exactly what the reference needs the masking wrapper for."""
    searcher, oracle = mf
    q = SpanNear([SpanTerm("title:seven"), SpanTerm("seven")], slop=30,
                 in_order=False)
    got = topk(searcher, q)
    assert got, "expected cross-field span matches"
    assert_rank_identical(got, oracle_search(oracle, q, K))


def test_multi_field_parser(mf):
    """MultiFieldQueryParser: unscoped leaves expand across fields as
    SHOULD disjunctions (queryParser/MultiFieldQueryParser.java)."""
    from lucene_spark.queries import parse_multi_field

    searcher, oracle = mf
    q = parse_multi_field("seven AND report", ("text", "title"),
                          analyzer="standard")
    want = Bool(must=[
        Bool(should=[Term("seven"), Term("title:seven")]),
        Bool(should=[Term("report"), Term("title:report")]),
    ])
    assert q == want
    assert_rank_identical(topk(searcher, q), oracle_search(oracle, q, K))
    # a doc whose 'report' only appears in the title still matches the AND
    got_docs = {d for d, _ in topk(searcher, q)}
    assert got_docs


def test_multi_field_parser_multiterm_leaves(mf):
    """Prefix/wildcard/fuzzy leaves also expand across fields."""
    from lucene_spark.queries import parse_multi_field
    from lucene_spark.queries.ast import Prefix

    searcher, oracle = mf
    q = parse_multi_field("repor*", ("text", "title"), analyzer="standard")
    assert q == Bool(should=[Prefix("repor"), Prefix("title:repor")])
    got = topk(searcher, q)
    assert got, "prefix should match title docs"
    assert_rank_identical(got, oracle_search(oracle, q, K))


def test_field_masking_span_query(mf):
    """TestFieldMaskingSpanQuery shapes: the masked clause's spans are the
    inner query's, composition with other fields' clauses is legal, and the
    mask is transparent to enumeration (masked ≡ unmasked doc sets here
    since our algebra already compares positions cross-field)."""
    from lucene_spark.queries.ast import SpanMask, SpanOr

    searcher, oracle = mf
    masked = SpanNear([SpanMask(SpanTerm("title:seven"), field="text"),
                       SpanTerm("seven")], slop=30, in_order=False)
    got = topk(searcher, masked)
    assert got, "expected masked cross-field span matches"
    assert_rank_identical(got, oracle_search(oracle, masked, K))

    # mask(q) enumerates exactly q's spans (getSpans delegates)
    plain = SpanNear([SpanTerm("title:seven"), SpanTerm("seven")], slop=30,
                     in_order=False)
    assert [d for d, _ in got] == [d for d, _ in topk(searcher, plain)]

    # mask inside SpanOr (the reference test's composed shapes)
    q = SpanOr([SpanMask(SpanTerm("title:summary"), field="text"),
                SpanTerm("seven")])
    assert_rank_identical(topk(searcher, q), oracle_search(oracle, q, K))

    # mask under SpanFirst: restriction applies to the masked spans
    q = SpanFirst(SpanMask(SpanTerm("title:seven"), field="text"), end=1)
    assert_rank_identical(topk(searcher, q), oracle_search(oracle, q, K))


@pytest.fixture(scope="module")
def pf(spark, tmp_path_factory):
    """PerFieldAnalyzerWrapper fixture: whitespace body + standard-analyzed
    title (case-folding, punctuation splits, stopword holes differ)."""
    rows = []
    for i in range(120):
        body = " ".join(long_to_english_local(j % 50) for j in range(i, i + 10))
        title = f"The Quick-Brown Report {long_to_english_local(i % 7)}" \
            if i % 2 else f"Summary: {long_to_english_local(i % 5)}!"
        rows.append((str(i), body, title, "en"))
    src = tmp_path_factory.mktemp("pfsrc")
    pdf = pd.DataFrame(rows, columns=["url", "text", "title", "lang"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(src / "part-0000.parquet"))
    out = str(tmp_path_factory.mktemp("pfidx"))
    build_index(spark, str(src), out, target_docs_per_seg=60,
                analyzer="whitespace", analyzed_fields=("title",),
                keyword_fields=("lang",),
                field_analyzers={"title": "standard"})
    merge_index(spark, out)
    oracle = build_oracle_index(
        [(i, r[1]) for i, r in enumerate(rows)],
        extra_fields={"title": {i: r[2] for i, r in enumerate(rows)}},
        analyzer="whitespace", field_analyzers={"title": "standard"})
    return Searcher(IndexReader(spark, out)), oracle


def long_to_english_local(n):
    from lucene_spark.fixtures import long_to_english

    return long_to_english(n)


def test_per_field_analyzer_stats(pf):
    searcher, _ = pf
    r = searcher.reader
    assert r.analyzer == "whitespace"
    assert r.field_analyzers == {"title": "standard"}
    # standard analyzer folded case + split the hyphen: quick/brown exist
    terms = {t for t in r.doc_freqs(
        ["title:quick", "title:brown", "title:the", "title:report"])}
    assert "title:quick" in terms and "title:brown" in terms
    # 'the' is a stopword under standard — never indexed for title
    assert "title:the" not in terms


@pytest.mark.parametrize("qs", [
    "title:Quick-Brown",        # standard chain: lowercased, hyphen-split phrase
    "title:report",
    'title:"Quick-Brown Report"',
    "title:quick AND seven",    # cross-field: standard title + whitespace body
])
def test_per_field_analyzer_rank_identity(pf, qs):
    searcher, oracle = pf
    got = topk(searcher, qs)
    assert got, qs
    q = searcher.parse(qs)
    assert_rank_identical(got, oracle_search(oracle, q, K))
