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
    """No commits/ dir -> eager CLEANUP is kept (unreferenced sources are
    physically removed by the end of the call), but through the crash-safe
    order: the destination is a fresh reserved id installed BEFORE the
    manifest flip, and source dirs go away only after it — a committed
    source is never mutated in place."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import write_pages_files
    from lucene_spark.indexing.merge import MERGE_SEG_BASE

    src = str(tmp_path_factory.mktemp("esrc"))
    write_pages_files(src, 80, 4)
    out = str(tmp_path_factory.mktemp("eidx"))
    build_index(spark, src, out, target_docs_per_seg=20)
    merge_index(spark, out)

    dest = compact_segments(spark, out, [0, 1])
    assert dest >= MERGE_SEG_BASE
    for s in (0, 1):  # both sources gone — eager cleanup preserved
        assert not os.path.isdir(os.path.join(out, "postings", f"seg={s}"))
    merge_index(spark, out)
    assert IndexReader(spark, out)._committed == [2, 3, dest]


def test_expunge_respects_retained_commits(spark, tmp_path):
    """A retained commit point can list segments that are still LIVE;
    expunge_deletes must not rewrite those in place (ADVICE r3, high).
    The expunged copy lands under a fresh reserved id, the source flips to
    "compacted" but stays on disk, and a pinned reader keeps its exact
    point-in-time results — including per-term df, which an in-place
    rewrite would silently shrink."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import write_pages_files

    from lucene_spark.indexing.deletes import expunge_deletes
    from lucene_spark.indexing.writer import IndexWriter

    src = str(tmp_path / "src")
    write_pages_files(src, 40, 2)
    out = str(tmp_path / "idx")
    build_index(spark, src, out, target_docs_per_seg=20)
    merge_index(spark, out)

    g = commit_point(out, source="pre-delete")["generation"]
    w = IndexWriter(spark, out)
    assert w.delete_documents("seven") > 0

    pinned_before = _results(spark, out, commit=g)
    df_before = IndexReader(spark, out, commit=g).doc_freqs(["seven"])

    rep = expunge_deletes(spark, out)
    assert rep["expunged"] > 0
    # both live segments were listed by commit g -> both took the
    # retention path: fresh reserved ids, sources still on disk
    assert rep["segments"] == [0, 1]
    assert all(d >= MERGE_SEG_BASE for d in rep["out_segments"])
    for s in (0, 1):
        assert os.path.isdir(os.path.join(out, "postings", f"seg={s}"))
        assert os.path.isdir(os.path.join(out, "deleted", f"seg={s}"))

    # pinned reader: identical results AND identical term stats (df comes
    # from the pinned segments' postings, untouched by the expunge)
    assert _results(spark, out, commit=g) == pinned_before
    pinned = IndexReader(spark, out, commit=g)
    assert pinned.N == 40
    assert pinned.doc_freqs(["seven"]) == df_before

    # live reader: physically expunged
    live = IndexReader(spark, out)
    assert live._committed == rep["out_segments"]
    assert live.N == 40 - rep["expunged"]
    assert Searcher(live).count("seven") == 0
    assert validate_index(spark, out)["ok"]

    # once the policy drops the generation, the sources reclaim normally
    commit_point(out, source="post-expunge")
    apply_policy(out, KeepOnlyLastCommit())
    assert sorted(purge_unreferenced(out)) == [0, 1]
    assert not os.path.isdir(os.path.join(out, "postings", "seg=0"))
    assert _results(spark, out)  # live view still serves
    assert validate_index(spark, out)["ok"]


def test_pinned_reader_term_stats(spark, tmp_path):
    """Pinned df/idf must come from the pinned segment set, not the current
    merged dictionary (ADVICE r3, low): append after the commit, and the
    pinned reader's doc_freqs / rankings stay point-in-time."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import write_pages_files

    from lucene_spark.streaming.ingest import append_to_index

    src = str(tmp_path / "src")
    write_pages_files(src, 40, 2)
    out = str(tmp_path / "idx")
    build_index(spark, src, out, target_docs_per_seg=20)
    merge_index(spark, out)
    g = commit_point(out, source="pin")["generation"]

    before = _results(spark, out, commit=g)
    df_before = IndexReader(spark, out, commit=g).doc_freqs(["one", "seven"])

    src2 = str(tmp_path / "inc")
    write_pages_files(src2, 40, 2)
    append_to_index(spark, src2, out, target_docs_per_seg=20)

    pinned = IndexReader(spark, out, commit=g)
    cur = IndexReader(spark, out)
    assert pinned.doc_freqs(["one", "seven"]) == df_before
    cur_df = cur.doc_freqs(["one", "seven"])
    assert cur_df["one"] > df_before["one"]  # the live dictionary moved on
    assert _results(spark, out, commit=g) == before
    # multi-term expansion over the pinned dictionary stays point-in-time
    pinned_terms = dict(pinned.expand_terms_with_df("prefix", "seve", 1024))
    assert pinned_terms.get("seven") == df_before["seven"]
