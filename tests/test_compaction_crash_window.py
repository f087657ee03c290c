"""compact_segments' two-phase flip crash window (ADVICE r4, merge.py).

The destination manifest (carrying ``merged_from``) rename-commits BEFORE
the source manifests flip to "compacted". These tests pin the recovery
semantics for a crash between the two writes: read-time resolution in
build.load_manifests (committed members of a committed destination's
merged_from are viewed as compacted — every doc visible exactly once) and
the durable repair in commits.purge_unreferenced. Reference analog:
IndexFileDeleter's startup pass reconciling files against segments_N
(index/IndexFileDeleter.java:54)."""

import json
import os

from lucene_spark.indexing.build import (committed_segments,
                                         completed_segments, load_manifests)
from lucene_spark.indexing.commits import purge_unreferenced


def _write_manifest(mdir, seg, status, **extra):
    m = {"seg": seg, "status": status, "docs": 10, "postings": 50, **extra}
    with open(os.path.join(mdir, f"seg_{seg:06d}.json"), "w") as f:
        json.dump(m, f)


def _crashed_index(tmp_path):
    """Simulate: segments 0,1 merged into dest 1000000; dest manifest
    committed, source flips never happened (crash), segment 2 untouched."""
    idx = tmp_path / "idx"
    mdir = idx / "manifests"
    os.makedirs(mdir)
    _write_manifest(str(mdir), 0, "committed")
    _write_manifest(str(mdir), 1, "committed")
    _write_manifest(str(mdir), 2, "committed")
    _write_manifest(str(mdir), 1000000, "committed",
                    merged_from=[0, 1], docs=20, postings=100)
    return str(idx), str(mdir)


def test_read_time_masking_no_double_visibility(tmp_path):
    idx, _ = _crashed_index(tmp_path)
    # readers see dest + the untouched segment — never the absorbed sources
    assert committed_segments(idx) == {2, 1000000}
    # the resume gate still counts the sources as done (their input files
    # must not be rebuilt)
    assert completed_segments(idx) == {0, 1, 2, 1000000}
    # the masked view reports them compacted
    ms = load_manifests(idx)
    assert ms[0]["status"] == "compacted"
    assert ms[1]["status"] == "compacted"
    assert ms[2]["status"] == "committed"
    assert ms[1000000]["status"] == "committed"


def test_masking_is_view_only(tmp_path):
    idx, mdir = _crashed_index(tmp_path)
    load_manifests(idx)
    with open(os.path.join(mdir, "seg_000000.json")) as f:
        assert json.load(f)["status"] == "committed"  # disk untouched


def test_purge_completes_the_flip_durably(tmp_path):
    idx, mdir = _crashed_index(tmp_path)
    purge_unreferenced(idx)
    for s in (0, 1):
        with open(os.path.join(mdir, f"seg_{s:06d}.json")) as f:
            m = json.load(f)
        assert m["status"] == "compacted"
        assert m["into"] == 1000000
    with open(os.path.join(mdir, "seg_000002.json")) as f:
        assert json.load(f)["status"] == "committed"
    assert committed_segments(idx) == {2, 1000000}


def test_completed_flip_is_a_noop(tmp_path):
    """After a clean compaction (sources already compacted) nothing is
    masked or rewritten."""
    idx = tmp_path / "idx"
    mdir = idx / "manifests"
    os.makedirs(mdir)
    _write_manifest(str(mdir), 0, "compacted", into=1000000)
    _write_manifest(str(mdir), 1000000, "committed", merged_from=[0])
    assert committed_segments(str(idx)) == {1000000}
    purge_unreferenced(str(idx))
    assert committed_segments(str(idx)) == {1000000}
