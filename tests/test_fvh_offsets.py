"""Stored term-vector offsets (build_index(store_offsets=True)) feed the
FastVectorHighlighter from the index instead of display-time re-analysis —
the reference's actual data path (index/TermVectorsTermsWriter.java:30
stores positions AND offsets; FieldTermStack reads them back). Gate:
fragments byte-identical via both paths on the fixture corpus; the
forward-index channel survives merge and expunge."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_spark.fixtures import pages_pdf
from lucene_spark.fvh import (FieldQuery, fvh_highlight,
                              fvh_highlight_indexed,
                              term_stack_from_vectors, tokenize_with_offsets)
from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.queries.ast import Bool, Phrase, Term
from lucene_spark.queries.planner import Searcher


@pytest.fixture(scope="module")
def offset_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fvhoff")
    pages = str(root / "pages")
    os.makedirs(pages)
    pdf = pages_pdf(120)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(pages, "part-0000.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    idx = str(root / "idx")
    build_index(spark, pages, idx, analyzer="whitespace",
                target_docs_per_seg=40, store_offsets=True)
    merge_index(spark, idx)
    docs = spark.read.parquet(pages).select("url", "text")
    return idx, docs


QUERIES = [Term("seven"), Phrase(["one", "hundred"]),
           Bool(should=[Term("three"), Term("hundred")])]


def test_flag_recorded_and_exposed(spark, offset_idx):
    idx, _ = offset_idx
    reader = IndexReader(spark, idx)
    assert reader.store_offsets is True
    assert "offsets" in reader.tokens().columns


def test_stack_from_vectors_equals_reanalysis(spark, offset_idx):
    """Per-doc FieldTermStack from stored vectors ≡ re-analysis."""
    idx, docs = offset_idx
    reader = IndexReader(spark, idx)
    fq = FieldQuery(Bool(should=[Term("seven"), Term("hundred")]))
    tok = {r["url"]: r for r in
           reader.tokens().select("url", "terms", "positions",
                                  "offsets").collect()}
    for r in docs.collect():
        want = [t for t in tokenize_with_offsets(r["text"], "whitespace")
                if t[0] in fq.term_set]
        row = tok[r["url"]]
        got = term_stack_from_vectors(row["terms"], row["positions"],
                                      row["offsets"], fq.term_set)
        assert got == want, r["url"]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_fragments_byte_identical(spark, offset_idx, qi):
    idx, docs = offset_idx
    reader = IndexReader(spark, idx)
    q = QUERIES[qi]
    hits = Searcher(reader).search(q, k=8, hydrate=True).select("url")
    via_reanalysis = {r["url"]: list(r["fragments"]) for r in
                      fvh_highlight(hits, docs, q).collect()}
    via_index = {r["url"]: list(r["fragments"]) for r in
                 fvh_highlight_indexed(reader, hits, docs, q).collect()}
    assert via_index == via_reanalysis


def test_plain_index_refuses_indexed_path(spark, offset_idx, tmp_path):
    idx, docs = offset_idx
    reader = IndexReader(spark, idx)
    reader.store_offsets = False  # simulate a plain index
    with pytest.raises(ValueError, match="store_offsets"):
        fvh_highlight_indexed(reader, docs.limit(1), docs, Term("a"))


def test_standard_analyzer_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="split-style"):
        build_index(spark, "/nonexistent", str(tmp_path / "x"),
                    analyzer="standard", store_offsets=True)


def test_simple_offsets_match_unicode_tokenizer(spark, tmp_path):
    """Round-5 review regression: the 'simple' offset tokenizer must be
    simple_tokenize's Unicode letter-run pattern, not ASCII — accented
    terms index whole with correct offsets."""
    import datetime as dt

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    rows = [("u0", dt.datetime(2020, 1, 1), None,
             "das Café an der Straße", "de")]
    pages = str(tmp_path / "pages")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(pages)
    idx = str(tmp_path / "idx")
    build_index(spark, pages, idx, analyzer="simple",
                target_docs_per_seg=5, store_offsets=True)
    merge_index(spark, idx)
    reader = IndexReader(spark, idx)
    row = reader.tokens().collect()[0]
    by_term = dict(zip(row["terms"], row["offsets"]))
    assert "café" in by_term  # not 'caf'
    s, e = by_term["café"][0], by_term["café"][1]
    assert rows[0][3][s:e] == "Café"
    assert "straße" in by_term
