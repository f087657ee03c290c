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
    # three destinations remain, a level up (4×33 docs each), each under a
    # fresh reserved merge id (crash-safe install: sources are never
    # overwritten in place)
    from lucene_spark.indexing.merge import MERGE_SEG_BASE
    assert len(r._committed) == 3
    assert all(s >= MERGE_SEG_BASE for s in r._committed)
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


def test_compact_group_of_expunged_empty_segments(spark, tmp_path):
    """Regression (fuzz seed 212): delete every doc of two segments, expunge,
    then merge that all-empty group. compact_segments used to crash on the
    missing staged partition dir (partitionBy writes nothing for an empty
    frame → FileNotFoundError at the swap, after the sources were already
    removed). The pinned contract: an emptied output segment keeps a
    schema-bearing zero-row partition (write_empty_partition), so the table
    root stays readable even when its LAST populated segment empties out."""
    import sys

    from pyspark.sql import functions as F

    from lucene_spark.indexing import validate_index
    from lucene_spark.indexing.deletes import delete_by_docids, expunge_deletes

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import write_pages_files

    src = str(tmp_path / "src")
    out = str(tmp_path / "idx")
    write_pages_files(src, 30, 3)  # 3 files -> segments 0/1/2, 10 docs each
    build_index(spark, src, out, target_docs_per_seg=10)
    merge_index(spark, out)

    docs = (IndexReader(spark, out).docmap()
            .where(F.col("seg").isin([0, 1])).select("seg", "docid"))
    assert docs.count() == 20
    delete_by_docids(spark, out, docs)
    res = expunge_deletes(spark, out)
    assert res["expunged"] == 20 and res["segments"] == [0, 1]
    for name in ("postings", "docmap", "tokens"):
        for s in (0, 1):
            p = os.path.join(out, name, f"seg={s}")
            assert os.path.isdir(p)  # zero-row marker, not a missing dir
            assert spark.read.parquet(p).count() == 0

    dest = compact_segments(spark, out, [0, 1])  # crashed before the fix
    from lucene_spark.indexing.merge import MERGE_SEG_BASE
    assert dest >= MERGE_SEG_BASE
    merge_index(spark, out)
    assert validate_index(spark, out)["ok"]

    # the surviving segment still serves, rank-identical to the oracle
    # over the remaining docs
    import pyarrow.dataset as ds

    texts = ds.dataset(src).to_table(columns=["text"])["text"].to_pylist()
    oracle = build_oracle_index([(i, t) for i, t in enumerate(texts)
                                 if i >= 20])
    s = Searcher(IndexReader(spark, out))
    assert s.count("*:*") == 10
    for q in ("one", "seven OR forty"):
        got = [(int(r["docid"]), round(float(r["score"]), 6))
               for r in s.search(q, k=10).collect()]
        want = [(d, round(sc, 6)) for d, sc in
                oracle_search(oracle, parse_query(q), 10)]
        assert got == want


def test_fully_emptied_index_stays_readable_and_writable(spark, tmp_path):
    """Sibling regression: expunge after deleting EVERY doc of EVERY segment
    used to crash expunge_deletes' own stats refresh (and every later read)
    with UNABLE_TO_INFER_SCHEMA — all partitions removed leaves the table
    roots with zero parquet files. With the zero-row markers the emptied
    index keeps serving (count 0, empty top-k, validate clean), an all-empty
    compact works on top, and a later append refills it."""
    import sys

    from pyspark.sql import functions as F  # noqa: F401

    from lucene_spark.indexing import validate_index
    from lucene_spark.indexing.deletes import delete_by_docids, expunge_deletes
    from lucene_spark.indexing.writer import IndexWriter

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import write_pages_files

    src = str(tmp_path / "src")
    out = str(tmp_path / "idx")
    write_pages_files(src, 20, 2)
    build_index(spark, src, out, target_docs_per_seg=10)
    merge_index(spark, out)

    docs = IndexReader(spark, out).docmap().select("seg", "docid")
    delete_by_docids(spark, out, docs)
    res = expunge_deletes(spark, out)  # crashed before the markers
    assert res["expunged"] == 20

    s = Searcher(IndexReader(spark, out))
    assert s.count("*:*") == 0
    assert s.search("seven", k=5).collect() == []
    assert validate_index(spark, out)["ok"]

    compact_segments(spark, out, [0, 1])  # all-empty group on empty index
    merge_index(spark, out)
    assert Searcher(IndexReader(spark, out)).count("*:*") == 0

    # the emptied index is still a live WRITE target
    src2 = str(tmp_path / "src2")
    write_pages_files(src2, 10, 1)
    IndexWriter(spark, out).add_documents(src2)
    merge_index(spark, out)
    s3 = Searcher(IndexReader(spark, out))
    assert s3.count("*:*") == 10
    assert len(s3.search("seven", k=5).collect()) > 0


def _fake_manifests(root, sizes):
    """Write committed-manifest stubs (seg -> docs) for find_merges."""
    mdir = os.path.join(root, "manifests")
    os.makedirs(mdir, exist_ok=True)
    import json

    for seg, docs in sizes:
        with open(os.path.join(mdir, f"seg_{seg:06d}.json"), "w") as f:
            json.dump({"seg": seg, "status": "committed", "docs": docs}, f)


def test_find_merges_level_up_guarantee(tmp_path):
    """LogMergePolicy churn regression: a big earlier destination must NOT
    be re-merged with every fresh batch of small segments (the merged size
    would stay at the big segment's level — O(N²) rewrite). A chunk
    qualifies only when the merge lands a level ABOVE its largest member;
    the smalls behind the big segment still merge among themselves."""
    out = str(tmp_path / "idx")
    big = [(0, 500_000)]
    smalls = [(i, 50_000) for i in range(1, 11)]
    _fake_manifests(out, big + smalls)
    groups = find_merges(out, merge_factor=10)
    # the ONLY group is the ten smalls; the 500k destination is untouched
    assert groups == [[i for i in range(1, 11)]]

    # ten 500k-level segments DO level up together
    out2 = str(tmp_path / "idx2")
    _fake_manifests(out2, [(i, 500_000) for i in range(10)])
    assert find_merges(out2, merge_factor=10) == [list(range(10))]

    # mixed run: nine smalls + one straggler a level below still merge
    # (the result levels up past every member)
    out3 = str(tmp_path / "idx3")
    _fake_manifests(out3, [(i, 50_000) for i in range(9)] + [(9, 4_000)])
    assert find_merges(out3, merge_factor=10) == [list(range(10))]
