"""Commit points + deletion policy — the ``segments_N`` generation surface.

Reference semantics reproduced (cites /root/reference):
- Every Lucene commit writes a new ``segments_N`` file naming the live
  segment set; N is a monotonically increasing generation
  (index/SegmentInfos.java:39,668 — ``getCurrentSegmentGeneration`` /
  ``commit``). A reader opened on an older ``segments_N`` serves that
  point in time forever.
- ``IndexDeletionPolicy`` (index/IndexDeletionPolicy.java:31) decides
  which commit points survive: ``onInit/onCommit`` receive the commit
  list and call ``IndexCommit.delete()`` on the expendable ones. The
  stock policy is ``KeepOnlyLastCommitDeletionPolicy``
  (index/KeepOnlyLastCommitDeletionPolicy.java:26); snapshot/backup
  workflows plug in keep-last-N or keep-all policies.
- ``IndexFileDeleter`` (index/IndexFileDeleter.java:54) refcounts index
  files across ALL retained commit points and physically deletes a file
  only when no live commit references it — segments absorbed by a merge
  stay on disk while an older ``segments_N`` still lists them.

Spark-first restatement: a commit point is one JSON file
``commits/commit_<gen>.json`` (rename-committed like the segment
manifests) pinning (a) the committed segment-id set and (b) the corpus
stats (stats.json) at commit time, so a pinned ``IndexReader`` scores
BM25 with point-in-time N/avgdl. Retention is driven by the same
refcount idea at segment granularity: ``compact_segments`` consults
``referenced_segments`` and leaves source partitions on disk (writing
the merged output under a FRESH segment id) whenever a retained commit
still lists them; ``purge_unreferenced`` is the deleter that reclaims
them once ``apply_policy`` has dropped the old generations. With no
``commits/`` directory the whole surface is inert and compaction keeps
its delete-eagerly behavior (exactly KeepOnlyLastCommit).

Deviation, stated honestly: delete tombstones are monotone side-car
appends here (deletes.py), so a pinned reader applies the tombstones
present when IT opened, not the commit-time tombstone set — the same
open-time contract the NRT snapshot reader already has. The pinned
SEGMENT SET is exact, and so are the pinned TERM STATISTICS: a pinned
reader derives its dictionary (df/cf) from the pinned segments'
postings metadata (reader.term_dict), not from the drifting global
term_dict, and physical maintenance never rewrites a referenced
segment in place (compact_segments and expunge_deletes both route
referenced sources to fresh destination ids and leave the source
partitions for pinned readers).
"""

from __future__ import annotations

import json
import os
import re
import shutil

COMMITS_DIR = "commits"
# 6+ digits: %06d zero-pads small generations but grows past a million —
# the pattern must keep matching (a {6}-only match would silently drop
# every generation >= 10^6 from list/read/refcount)
_COMMIT_RE = re.compile(r"^commit_(\d{6,})\.json$")

# every per-segment data family a purge must reclaim (postings + the
# side-cars that ride the same seg=k partition layout)
_SEG_TABLES = ("postings", "docmap", "tokens", "norms", "deleted")


def commits_dir(out_dir: str) -> str:
    return os.path.join(out_dir, COMMITS_DIR)


def _commit_path(out_dir: str, gen: int) -> str:
    return os.path.join(commits_dir(out_dir), f"commit_{gen:06d}.json")


def _generations(out_dir: str) -> list[int]:
    d = commits_dir(out_dir)
    if not os.path.isdir(d):
        return []
    gens = []
    for n in os.listdir(d):
        m = _COMMIT_RE.match(n)
        if m:
            gens.append(int(m.group(1)))
    return sorted(gens)


def commit_point(out_dir: str, *, source: str = "manual",
                 user_data: dict | None = None) -> dict:
    """Record the CURRENT committed segment set as a new generation — the
    ``SegmentInfos.commit`` analog (index/SegmentInfos.java:668). Pins the
    corpus stats alongside so a pinned reader scores with point-in-time
    N/avgdl, and is written via the same tmp+rename commit the segment
    manifests use (the file appears atomically or not at all)."""
    from .build import committed_segments

    gens = _generations(out_dir)
    gen = (gens[-1] + 1) if gens else 1
    stats = None
    sp = os.path.join(out_dir, "stats.json")
    if os.path.exists(sp):
        with open(sp) as f:
            stats = json.load(f)
    commit = {
        "generation": gen,
        "segments": sorted(committed_segments(out_dir)),
        "source": source,
        "user_data": user_data or {},
        "stats": stats,
    }
    os.makedirs(commits_dir(out_dir), exist_ok=True)
    path = _commit_path(out_dir, gen)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(commit, f, indent=1)
    os.replace(tmp, path)
    return commit


def list_commits(out_dir: str) -> list[dict]:
    """All retained commit points, oldest first (the list handed to an
    IndexDeletionPolicy in the reference)."""
    out = []
    for g in _generations(out_dir):
        try:
            with open(_commit_path(out_dir, g)) as f:
                out.append(json.load(f))
        except (json.JSONDecodeError, OSError):
            continue
    return out


def read_commit(out_dir: str, generation: int | None = None) -> dict:
    """One commit point; None → the latest generation."""
    gens = _generations(out_dir)
    if not gens:
        raise FileNotFoundError(f"no commit points under {out_dir}")
    g = gens[-1] if generation is None else int(generation)
    if g not in gens:
        raise FileNotFoundError(
            f"commit generation {g} not found (have {gens})")
    with open(_commit_path(out_dir, g)) as f:
        return json.load(f)


class KeepAllCommits:
    """Retain every generation (snapshot/backup mode)."""

    def keep(self, commits: list[dict]) -> list[dict]:
        return commits


class KeepOnlyLastCommit:
    """The reference's stock policy
    (index/KeepOnlyLastCommitDeletionPolicy.java:26)."""

    def keep(self, commits: list[dict]) -> list[dict]:
        return commits[-1:]


class KeepLastNCommits:
    """Retain the N most recent generations."""

    def __init__(self, n: int):
        if n < 1:
            raise ValueError("n must be >= 1")
        self.n = n

    def keep(self, commits: list[dict]) -> list[dict]:
        return commits[-self.n:]


def apply_policy(out_dir: str, policy) -> list[int]:
    """Run the deletion policy over the retained commit list and delete the
    expendable generation FILES (IndexCommit.delete() analog). Returns the
    deleted generations. Segment data is NOT touched here — that is
    ``purge_unreferenced``'s job, refcount-style."""
    commits = list_commits(out_dir)
    keep = {c["generation"] for c in policy.keep(commits)}
    dropped = []
    for c in commits:
        g = c["generation"]
        if g in keep:
            continue
        try:
            os.remove(_commit_path(out_dir, g))
            dropped.append(g)
        except OSError:
            continue
    return dropped


def referenced_segments(out_dir: str) -> set[int]:
    """Union of segment ids across every retained commit point — the
    IndexFileDeleter refcount set (index/IndexFileDeleter.java:54): a
    segment in here must stay physically on disk even after compaction
    absorbs it, because some retained ``segments_N`` still lists it."""
    refs: set[int] = set()
    for c in list_commits(out_dir):
        refs.update(int(s) for s in c.get("segments", []))
    return refs


def _repair_interrupted_compaction(mdir: str) -> None:
    """Durably complete compact_segments' two-phase flip after a crash.

    The destination manifest (carrying ``merged_from``) rename-commits
    before each source flips to "compacted"; a crash in between leaves
    sources committed on disk while readers already resolve them as
    compacted (build.load_manifests masks any committed member of a
    committed destination's merged_from). This writes that resolution
    back to disk so the window closes permanently. Reference analog:
    IndexFileDeleter's startup pass deleting files no segments_N
    references (index/IndexFileDeleter.java:54)."""
    raw: dict[int, dict] = {}
    names: dict[int, str] = {}
    for n in sorted(os.listdir(mdir)):
        if not (n.startswith("seg_") and n.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, n)) as f:
                m = json.load(f)
            raw[int(m["seg"])] = m
            names[int(m["seg"])] = n
        except (ValueError, KeyError, json.JSONDecodeError, OSError):
            continue
    for seg, m in raw.items():
        if m.get("status") != "committed":
            continue
        for s in m.get("merged_from") or []:
            s = int(s)
            src = raw.get(s)
            if s == seg or src is None or src.get("status") != "committed":
                continue
            src["status"] = "compacted"
            src["into"] = seg
            p = os.path.join(mdir, names[s])
            tmp = p + ".tmp"
            with open(tmp, "w") as f:
                json.dump(src, f, indent=1)
            os.replace(tmp, p)


def purge_unreferenced(out_dir: str) -> list[int]:
    """Physically reclaim compacted segments no retained commit references
    (the IndexFileDeleter decref-to-zero path). Only manifests with status
    ``compacted`` are candidates — their docs live on inside the merge
    destination, so the live reader never needs them; ``committed``
    segments are always live regardless of commit files. Returns the
    segment ids whose data directories were removed."""
    refs = referenced_segments(out_dir)
    mdir = os.path.join(out_dir, "manifests")
    if not os.path.isdir(mdir):
        return []
    _repair_interrupted_compaction(mdir)
    removed = []
    for n in sorted(os.listdir(mdir)):
        if not (n.startswith("seg_") and n.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, n)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if m.get("status") != "compacted":
            continue
        s = int(m["seg"])
        if s in refs:
            continue
        existed = False
        for table in _SEG_TABLES:
            d = os.path.join(out_dir, table, f"seg={s}")
            if os.path.isdir(d):
                existed = True
                shutil.rmtree(d, ignore_errors=True)
        if existed:
            removed.append(s)
    return removed
