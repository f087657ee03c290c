"""A non-default codec block_size must be honored END TO END — build,
query, deletes, norms, addIndexes into an empty destination.

Round-5 regression (ADVICE r4): addIndexes let an empty destination adopt
the first source's block_size and re-encoded postings to it, but the query
path always decoded with the module default — silently scrambling every
docid. Fix: stats.json records block_size (merge_index), IndexReader
exposes it, and every kernel UDF / tombstone / norms encode-decode resolves
the index's recorded size (build.index_block_size).

Reference analog: the codec is a per-index invariant the reader must honor
(index/SegmentInfos.java format versions gate exactly this class of
mismatch)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_spark import BLOCK_SIZE
from lucene_spark.fixtures import pages_pdf
from lucene_spark.indexing import (IndexReader, build_index, merge_index,
                                   merge_indexes_tool, validate_index)
from lucene_spark.indexing.deletes import delete_by_docids
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries.ast import Bool, Phrase, Term
from lucene_spark.queries.planner import Searcher

ODD_BS = 16  # small enough that 200 docs span many blocks
assert ODD_BS != BLOCK_SIZE

QUERIES = [Term("seven"), Bool(must=[Term("seven"), Term("forty")]),
           Bool(should=[Term("three"), Term("hundred")]),
           Phrase(["one", "hundred"])]


def _write_pages(root, name, n, start=0):
    pages = str(root / name)
    os.makedirs(pages)
    pdf = pages_pdf(n, start=start)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(pages, "part-0000.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    return pages, [(i, t) for i, t in enumerate(pdf["text"].tolist())]


@pytest.fixture(scope="module")
def odd_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("oddbs")
    pages, docs = _write_pages(root, "pages", 200)
    idx = str(root / "idx")
    build_index(spark, pages, idx, target_docs_per_seg=60,
                block_size=ODD_BS)
    merge_index(spark, idx)
    return idx, docs


def _assert_rank_identity(spark, idx, docs, k=10):
    oracle = build_oracle_index(docs)
    searcher = Searcher(IndexReader(spark, idx))
    for q in QUERIES:
        got = [(int(r["docid"]), float(r["score"]))
               for r in searcher.search(q, k=k).collect()]
        want = oracle_search(oracle, q, k=k)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9)


def test_stats_record_and_reader_expose_block_size(spark, odd_index):
    idx, _docs = odd_index
    reader = IndexReader(spark, idx)
    assert reader.block_size == ODD_BS
    assert validate_index(spark, idx)["ok"]


def test_query_rank_identity_with_odd_block_size(spark, odd_index):
    idx, docs = odd_index
    _assert_rank_identity(spark, idx, docs)


def test_deletes_round_trip_with_odd_block_size(spark, odd_index, tmp_path):
    """Tombstones encode/decode with the index's size: delete a doc that
    matches, re-search, the doc is gone and the rest rank like the oracle
    over the surviving corpus."""
    import shutil

    idx, docs = odd_index
    idx2 = str(tmp_path / "idx_del")
    shutil.copytree(idx, idx2)
    searcher = Searcher(IndexReader(spark, idx2))
    victim = int(searcher.search(Term("seven"), k=1).collect()[0]["docid"])
    dm = (spark.read.parquet(os.path.join(idx2, "docmap"))
          .where(f"docid = {victim}").select("seg", "docid"))
    delete_by_docids(spark, idx2, dm)
    left = [int(r["docid"])
            for r in Searcher(IndexReader(spark, idx2))
            .search(Term("seven"), k=200).collect()]
    assert victim not in left and left


def test_addindexes_empty_dest_adopts_and_queries(spark, odd_index,
                                                  tmp_path_factory):
    """merge_indexes_tool: empty dest adopts the source's ODD block_size;
    queries over the merged index must still match the oracle (this is the
    exact ADVICE-r4 scramble scenario)."""
    root = tmp_path_factory.mktemp("oddbs_merge")
    idx, docs = odd_index
    pages_b, docs_b = _write_pages(root, "pages_b", 80, start=300)
    idx_b = str(root / "idx_b")
    build_index(spark, pages_b, idx_b, target_docs_per_seg=60,
                block_size=ODD_BS)
    merge_index(spark, idx_b)
    merged = str(root / "merged")
    merge_indexes_tool(spark, merged, [idx, idx_b])
    assert IndexReader(spark, merged).block_size == ODD_BS
    # re-key source B by its offset (dest was empty → A at 0, B at len(A))
    all_docs = docs + [(len(docs) + i, t)
                       for i, (_, t) in enumerate(docs_b)]
    _assert_rank_identity(spark, merged, all_docs)


def test_norms_encode_with_build_block_size(spark, tmp_path):
    """Round-5 review regression: on a FRESH build the chunk writes norms
    BEFORE its manifests exist, so write_norms must take the build's
    block_size explicitly — the manifest-config fallback would encode
    boosts with the module default and scramble their docids."""
    import pandas as pd

    pages = str(tmp_path / "pages")
    os.makedirs(pages)
    pdf = pages_pdf(120)
    pdf["b"] = [2.0 if i % 7 == 0 else 1.0 for i in range(len(pdf))]
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(pages, "part-0000.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    idx = str(tmp_path / "idx")
    build_index(spark, pages, idx, target_docs_per_seg=50,
                block_size=ODD_BS, boost_col="b")
    merge_index(spark, idx)
    searcher = Searcher(IndexReader(spark, idx))
    # boosted docs (doc_id % 7 == 0) must outrank unboosted ties — with a
    # scrambled norms side-car the 2x boosts land on the wrong docs
    got = searcher.search(Term("seven"), k=200).collect()
    scores = {int(r["docid"]): float(r["score"]) for r in got}
    boosted = [d for d in scores if d % 7 == 0]
    assert boosted, "fixture must contain boosted matches"
    from lucene_spark.oracle import build_oracle_index, oracle_search

    oracle = build_oracle_index(
        [(i, t) for i, t in enumerate(pdf["text"].tolist())],
        boosts={i: 2.0 for i in range(len(pdf)) if i % 7 == 0})
    want = dict(oracle_search(oracle, Term("seven"), k=200))
    for d, s in scores.items():
        assert s == pytest.approx(want[d], rel=1e-9), d
