"""Commit points (segments_N generations), IndexDeletionPolicy retention,
and point-in-time pinned readers across compaction.

Reference semantics under test (cites /root/reference):
- index/SegmentInfos.java:39,668 — each commit is a new generation naming
  the live segment set; a reader opened on an older generation serves that
  point in time.
- index/IndexDeletionPolicy.java:31 + KeepOnlyLastCommitDeletionPolicy.java:26
  — the policy prunes commit points.
- index/IndexFileDeleter.java:54 — segments absorbed by a merge stay on
  disk while any retained commit lists them; physical deletion happens at
  refcount zero.
"""

import math
import os

import pytest

from lucene_spark.indexing import (IndexReader, KeepAllCommits,
                                   KeepLastNCommits, KeepOnlyLastCommit,
                                   apply_policy, build_index, commit_point,
                                   list_commits, merge_index,
                                   purge_unreferenced, read_commit,
                                   referenced_segments, validate_index)
from lucene_spark.indexing.merge import MERGE_SEG_BASE, compact_segments
from lucene_spark.queries.planner import Searcher

QUERIES = ("one", "seven AND forty", '"twenty one"', "se*")


def _results(spark, out, commit=None):
    s = Searcher(IndexReader(spark, out, commit=commit))
    return {q: [(int(r["docid"]), round(float(r["score"]), 9))
                for r in s.search(q, k=10).collect()]
            for q in QUERIES}


@pytest.fixture(scope="module")
def commit_idx(spark, tmp_path_factory):
    """8 segments x 25 docs, own copy (tests mutate it in one lifecycle)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import write_pages_files

    src = str(tmp_path_factory.mktemp("csrc"))
    write_pages_files(src, 200, 8)
    out = str(tmp_path_factory.mktemp("cidx"))
    build_index(spark, src, out, target_docs_per_seg=25)
    merge_index(spark, out)
    return out


def test_commit_lifecycle(spark, commit_idx):
    out = commit_idx

    # --- generations (SegmentInfos.commit analog) ---------------------
    c1 = commit_point(out, source="test", user_data={"note": "pre-merge"})
    assert c1["generation"] == 1
    assert c1["segments"] == list(range(8))
    assert c1["stats"]["N"] == 200  # BM25 inputs pinned with the commit
    c2 = commit_point(out)
    assert c2["generation"] == 2
    assert [c["generation"] for c in list_commits(out)] == [1, 2]
    assert read_commit(out)["generation"] == 2  # None -> latest
    assert read_commit(out, 1)["user_data"]["note"] == "pre-merge"
    with pytest.raises(FileNotFoundError):
        read_commit(out, 99)

    # policies see the commit list, newest-last (IndexDeletionPolicy)
    cs = list_commits(out)
    assert KeepAllCommits().keep(cs) == cs
    assert [c["generation"] for c in KeepOnlyLastCommit().keep(cs)] == [2]
    assert [c["generation"] for c in KeepLastNCommits(2).keep(cs)] == [1, 2]
    dropped = apply_policy(out, KeepLastNCommits(1))
    assert dropped == [1]
    assert [c["generation"] for c in list_commits(out)] == [2]

    # --- retention across compaction (IndexFileDeleter refcount) ------
    before = _results(spark, out)
    g = commit_point(out, source="pre-compaction")["generation"]
    assert referenced_segments(out) >= set(range(8))

    dest = compact_segments(spark, out, [0, 1, 2, 3])
    # protected sources -> merged output under a fresh reserved id,
    # sources left on disk for the pinned reader
    assert dest >= MERGE_SEG_BASE
    for s in (0, 1, 2, 3):
        assert os.path.isdir(os.path.join(out, "postings", f"seg={s}"))
    merge_index(spark, out)

    # live reader: merged segment set, identical results (same docs)
    live = IndexReader(spark, out)
    assert live._committed == [4, 5, 6, 7, dest]
    assert _results(spark, out) == before
    rep = validate_index(spark, out)
    assert rep["ok"], rep["violations"]

    # pinned reader: the pre-compaction segment set, identical results
    pinned = IndexReader(spark, out, commit=g)
    assert pinned._committed == list(range(8))
    assert pinned.N == 200 and math.isclose(pinned.avgdl, live.avgdl)
    assert _results(spark, out, commit=g) == before

    # a post-compaction commit records the NEW live set; the purge test
    # below drops the older generations and reclaims segments 0-3
    commit_point(out, source="post-compaction")


def test_purge_after_policy(spark, commit_idx):
    out = commit_idx
    # state from test_commit_lifecycle: commits [2, g=3, 4]; segs 0-3
    # compacted-but-retained. Drop everything but the latest generation.
    apply_policy(out, KeepOnlyLastCommit())
    gens = [c["generation"] for c in list_commits(out)]
    assert len(gens) == 1
    assert not (referenced_segments(out) & {0, 1, 2, 3})

    removed = purge_unreferenced(out)
    assert sorted(removed) == [0, 1, 2, 3]
    for s in (0, 1, 2, 3):
        assert not os.path.isdir(os.path.join(out, "postings", f"seg={s}"))
        assert not os.path.isdir(os.path.join(out, "docmap", f"seg={s}"))

    # the dropped generation can no longer be opened; the live view and a
    # pinned open of the RETAINED generation still work
    with pytest.raises(FileNotFoundError):
        IndexReader(spark, out, commit=3)
    last = list_commits(out)[-1]["generation"]
    live = _results(spark, out)
    assert _results(spark, out, commit=last) == live
    rep = validate_index(spark, out)
    assert rep["ok"], rep["violations"]


def test_ingest_commit_points(spark, tmp_path):
    """append_to_index(commit_points=True) records one generation per
    increment (segments_N per NRT refresh); a reader pinned to the first
    generation keeps serving the pre-append corpus, including its N."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import write_pages_files

    from lucene_spark.streaming.ingest import append_to_index

    out = str(tmp_path / "idx")
    src1 = str(tmp_path / "inc1")
    write_pages_files(src1, 40, 2)
    append_to_index(spark, src1, out, target_docs_per_seg=20,
                    commit_points=True)
    g1 = read_commit(out)["generation"]
    src2 = str(tmp_path / "inc2")
    write_pages_files(src2, 40, 2)
    append_to_index(spark, src2, out, target_docs_per_seg=20,
                    commit_points=True)
    c2 = read_commit(out)
    assert c2["generation"] == g1 + 1
    assert c2["source"] == "ingest"

    pinned = IndexReader(spark, out, commit=g1)
    cur = IndexReader(spark, out)
    assert (pinned.N, cur.N) == (40, 80)
    assert len(pinned._committed) < len(cur._committed)
    assert Searcher(pinned).count("*:*") == 40
    assert Searcher(cur).count("*:*") == 80


def test_compaction_without_commits_keeps_eager_delete(spark,
                                                       tmp_path_factory):
    """No commits/ dir -> the pre-existing KeepOnlyLastCommit-style
    behavior: dest = min(group), sources physically removed."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import write_pages_files

    src = str(tmp_path_factory.mktemp("esrc"))
    write_pages_files(src, 80, 4)
    out = str(tmp_path_factory.mktemp("eidx"))
    build_index(spark, src, out, target_docs_per_seg=20)
    merge_index(spark, out)

    dest = compact_segments(spark, out, [0, 1])
    assert dest == 0
    assert not os.path.isdir(os.path.join(out, "postings", "seg=1"))
    merge_index(spark, out)
    assert IndexReader(spark, out)._committed == [0, 2, 3]
