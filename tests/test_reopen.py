"""Incremental reopen (index/IndexReader.java reopen): new commit point
visible to the reopened reader, old reader untouched, and the driver-side
RAM dictionary SHARED (not re-read) when the term_dict generation is
unchanged."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.indexing import IndexReader, build_index, merge_index  # noqa: E402
from lucene_spark.queries.planner import Searcher  # noqa: E402

from conftest import write_pages_files  # noqa: E402


@pytest.fixture()
def growing_index(spark, tmp_path):
    pages = str(tmp_path / "pages")
    write_pages_files(pages, 200, 2)
    out = str(tmp_path / "index")
    build_index(spark, pages, out, target_docs_per_seg=100)
    merge_index(spark, out)
    return pages, out


def test_reopen_shares_ram_dict_when_unchanged(spark, growing_index):
    _pages, out = growing_index
    r1 = IndexReader(spark, out)
    assert r1.ram_dict() is not None
    r2 = r1.reopen()
    # nothing changed between open and reopen → the RAM snapshot is the
    # SAME OBJECT, not a re-read
    assert r2.ram_dict() is r1.ram_dict()


def test_reopen_sees_append_old_reader_pinned(spark, growing_index):
    from lucene_spark.streaming.ingest import append_to_index

    pages, out = growing_index
    r_old = IndexReader(spark, out)
    _ = r_old.ram_dict()
    n_before = Searcher(r_old).count("seven OR forty OR one")
    old_committed = set(r_old._committed or [])

    more = str(os.path.join(pages, "..", "more_pages"))
    write_pages_files(more, 100, 1)
    new_segs = append_to_index(spark, more, out, target_docs_per_seg=100)
    assert new_segs

    # old reader: same snapshot, same results (point-in-time)
    assert set(r_old._committed or []) == old_committed
    assert Searcher(r_old).count("seven OR forty OR one") == n_before

    # reopened reader: sees the appended segment and more matching docs
    r_new = r_old.reopen()
    assert set(r_new._committed or []) > old_committed
    n_after = Searcher(r_new).count("seven OR forty OR one")
    assert n_after > n_before

    # append_to_index refreshed term_dict (merge_index), so the dictionary
    # generation CHANGED → the reopened reader must NOT share the stale
    # RAM snapshot (stale global dfs would skew idf)
    assert r_new.ram_dict() is not r_old.ram_dict()
    assert r_new.N > r_old.N

    # a further reopen with no changes shares the new snapshot
    r3 = r_new.reopen()
    assert r3.ram_dict() is r_new.ram_dict()


def test_warm_serving_identical_results(spark, growing_index):
    """warm() (RAMDirectory/page-cache serving analog) must not change any
    result: rank + score identical to the cold reader, and close()
    releases the pinned cache and keeps the reader usable."""
    _pages, out = growing_index
    cold = Searcher(IndexReader(spark, out)).search(
        "seven OR forty", k=10).collect()
    r = IndexReader(spark, out).warm()
    assert r.postings().storageLevel.useMemory
    hot = Searcher(r).search("seven OR forty", k=10).collect()
    assert [(x.docid, round(x.score, 6)) for x in hot] == \
        [(x.docid, round(x.score, 6)) for x in cold]
    r.close()
    assert not r.postings().storageLevel.useMemory
    again = Searcher(r).search("seven OR forty", k=10).collect()
    assert [x.docid for x in again] == [x.docid for x in cold]
