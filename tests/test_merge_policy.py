"""LogMergePolicy-style merge selection (find_merges/maybe_merge) and the
NRT point-in-time reader contract (uncommitted segments invisible)."""

import math
import os
import shutil

import pytest

from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.indexing.merge import compact_segments, find_merges, maybe_merge
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.planner import Searcher


@pytest.fixture(scope="module")
def many_segs(spark, tmp_path_factory):
    """12 segments × ~33 docs (uniform level under mergeFactor 4)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import write_pages_files

    src = str(tmp_path_factory.mktemp("msrc"))
    write_pages_files(src, 396, 12)
    out = str(tmp_path_factory.mktemp("midx"))
    build_index(spark, src, out, target_docs_per_seg=33)
    merge_index(spark, out)
    return out, src


def test_find_merges_levels(many_segs):
    out, _src = many_segs
    # 12 equal-size segments, mf=4 → exactly three groups of four, in order
    groups = find_merges(out, merge_factor=4)
    assert groups == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    # a factor larger than the run → no candidates
    assert find_merges(out, merge_factor=13) == []


def test_maybe_merge_cascade_preserves_results(spark, many_segs, tmp_path):
    out, src = many_segs
    import pyarrow.dataset as ds

    texts = ds.dataset(src).to_table(columns=["text"])["text"].to_pylist()
    oracle = build_oracle_index(list(enumerate(texts)))
    expect = {q: oracle_search(oracle, parse_query(q), 10)
              for q in ("one", "seven AND forty", '"twenty one"')}

    merged = maybe_merge(spark, out, merge_factor=4)
    assert merged == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    merge_index(spark, out)  # refresh dict/stats

    r = IndexReader(spark, out)
    # three destinations remain, a level up (4×33 docs each)
    assert r._committed == [0, 4, 8]
    # second application: 3 segments < mf → fixpoint reached
    assert find_merges(out, merge_factor=4) == []

    s = Searcher(r)
    for q, exp in expect.items():
        got = [(int(x["docid"]), float(x["score"]))
               for x in s.search(q, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, rel_tol=1e-9), q


def test_reader_ignores_uncommitted_segment(spark, many_segs):
    """NRT snapshot: a segment directory present WITHOUT a committed
    manifest (a concurrent append before its rename-commit) must be
    invisible to a newly opened reader."""
    out, _src = many_segs
    r0 = Searcher(IndexReader(spark, out))
    n0 = r0.count("*:*")
    hits0 = [int(x["docid"]) for x in r0.search("one", k=10).collect()]

    # simulate a mid-append: copy an existing committed seg dir to seg=99
    # in every table, with NO manifest
    for name in ("postings", "docmap", "tokens"):
        src_dir = next(os.path.join(out, name, d)
                       for d in os.listdir(os.path.join(out, name))
                       if d.startswith("seg="))
        shutil.copytree(src_dir, os.path.join(out, name, "seg=99"))
    try:
        r1 = Searcher(IndexReader(spark, out))
        assert 99 not in r1.reader._committed
        assert r1.count("*:*") == n0
        assert [int(x["docid"])
                for x in r1.search("one", k=10).collect()] == hits0
    finally:
        for name in ("postings", "docmap", "tokens"):
            shutil.rmtree(os.path.join(out, name, "seg=99"),
                          ignore_errors=True)
