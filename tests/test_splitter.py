"""Index splitting (contrib/misc IndexSplitter.java:48-160 +
MultiPassIndexSplitter.java:42-99): segment-level split/remove, docid
round-robin and sequential-range splits, each gated by searching the part
against an oracle built over exactly the part's documents."""

import math
import os
import shutil

import pyarrow.dataset as ds
import pytest

from lucene_spark.indexing import (
    IndexReader, list_segments, remove_segments, split_by_docs,
    split_segments,
)
from lucene_spark.indexing.splitter import _manifests
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.planner import Searcher

K = 10


def _texts(pages_dir):
    return ds.dataset(pages_dir).to_table(columns=["text"])["text"].to_pylist()


def _docids(spark, d):
    rdr = IndexReader(spark, d)
    return {(int(r["seg"]), int(r["docid"]))
            for r in rdr.docmap().select("seg", "docid").collect()}


def _assert_part_search_matches_oracle(spark, part_dir, pages_dir, qs):
    texts = _texts(pages_dir)
    part_ids = sorted(d for _, d in _docids(spark, part_dir))
    oidx = build_oracle_index([(d, texts[d]) for d in part_ids])
    got = [(int(r["docid"]), float(r["score"])) for r in
           Searcher(IndexReader(spark, part_dir)).search(qs, k=K).collect()]
    want = oracle_search(oidx, parse_query(qs), K)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert math.isclose(s1, s2, rel_tol=1e-9)


def test_list_segments(index_dir):
    segs = list_segments(index_dir)
    assert [s["seg"] for s in segs] == sorted(s["seg"] for s in segs)
    assert len(segs) >= 2
    assert all(s["status"] == "committed" for s in segs)


def test_split_segments(spark, index_dir, pages_dir, tmp_path):
    src_ids = _docids(spark, index_dir)
    segs = [s["seg"] for s in list_segments(index_dir)][:2]
    dest = str(tmp_path / "part_seg")
    res = split_segments(spark, index_dir, dest, segs)
    assert res["segments"] == sorted(segs)
    part = _docids(spark, dest)
    assert part == {(s, d) for s, d in src_ids if s in segs}
    assert 0 < len(part) < len(src_ids)
    # source untouched
    assert _docids(spark, index_dir) == src_ids
    _assert_part_search_matches_oracle(spark, dest, pages_dir,
                                       "seven AND forty")


def test_split_segments_rejects_unknown(spark, index_dir, tmp_path):
    with pytest.raises(ValueError, match="not live"):
        split_segments(spark, index_dir, str(tmp_path / "x"), [9999])
    with pytest.raises(ValueError, match="no segments"):
        split_segments(spark, index_dir, str(tmp_path / "y"), [])


@pytest.mark.parametrize("seq", [False, True])
def test_split_by_docs(spark, index_dir, pages_dir, tmp_path, seq):
    dests = [str(tmp_path / f"p{i}") for i in range(2)]
    parts = split_by_docs(spark, index_dir, dests, seq=seq)
    src_docids = {d for _, d in _docids(spark, index_dir)}
    max_doc = max(src_docids) + 1
    got_parts = [sorted(d for _, d in _docids(spark, dest))
                 for dest in dests]
    # disjoint cover of the source
    assert set(got_parts[0]) | set(got_parts[1]) == src_docids
    assert not set(got_parts[0]) & set(got_parts[1])
    if seq:
        # contiguous ranges of the slot space (MultiPass :76-84)
        assert all(d < max_doc // 2 for d in got_parts[0])
        assert all(d >= max_doc // 2 for d in got_parts[1])
    else:
        # round-robin docid % 2 == part (MultiPass :85-92)
        assert all(d % 2 == 0 for d in got_parts[0])
        assert all(d % 2 == 1 for d in got_parts[1])
    assert [p["n_docs"] for p in parts] == [len(g) for g in got_parts]
    # each part is a fully working standalone index, rank-identical to an
    # oracle over exactly its documents
    for dest in dests:
        _assert_part_search_matches_oracle(spark, dest, pages_dir, "seven")


def test_split_by_docs_validations(spark, index_dir, tmp_path):
    with pytest.raises(ValueError, match="Invalid number"):
        split_by_docs(spark, index_dir, [str(tmp_path / "only")])


def test_remove_segments(spark, index_dir, pages_dir, tmp_path):
    src = str(tmp_path / "removable")
    shutil.copytree(index_dir, src)
    segs = [s["seg"] for s in list_segments(src)]
    victim = segs[0]
    before = _docids(spark, src)
    res = remove_segments(spark, src, [victim])
    assert res["removed"] == [victim]
    after = _docids(spark, src)
    assert after == {(s, d) for s, d in before if s != victim}
    assert not os.path.isdir(os.path.join(src, "postings", f"seg={victim}"))
    assert _manifests(src)[victim]["status"] == "removed"
    # N refreshed; the shrunken index still searches correctly
    assert IndexReader(spark, src).N == len(after)
    _assert_part_search_matches_oracle(spark, src, pages_dir, "seven forty")


def test_remove_refuses_pinned_segments(spark, index_dir, tmp_path):
    from lucene_spark.indexing.commits import commit_point

    src = str(tmp_path / "pinned")
    shutil.copytree(index_dir, src)
    commit_point(src)
    victim = list_segments(src)[0]["seg"]
    with pytest.raises(ValueError, match="retained commit"):
        remove_segments(spark, src, [victim])
