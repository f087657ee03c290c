"""Stage 0 — the build plan: deterministic docID assignment + segment layout.

DocIDs follow the reference's arrival-order semantics (IndexWriter assigns
dense per-segment ints in addDocument order — index/DocumentsWriter.java:229):
input parquet files are taken in path-sorted order; ``docid = file_base +
row_index_within_file``. This is computed from parquet footer metadata alone
(no Spark job, no shuffle) and is **independent of cluster size** — the
stability the north rule's rank-identity across N and 4N executors needs.

Files are greedily packed into segments of ~target_docs_per_seg docs. A
segment is the atomic unit of checkpointing and the memory bound of the
posting encoder (the analog of the reference's 16 MB RAM-buffer flush,
index/IndexWriterConfig.java:72): at 10^12 docs you raise n_segments, not
executor memory.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq


@dataclass
class FileEntry:
    path: str
    rows: int
    seg: int
    docid_base: int


@dataclass
class BuildPlan:
    input_path: str
    n_docs: int
    n_segments: int
    files: list[FileEntry] = field(default_factory=list)
    # Iceberg sources only: the snapshot id the file listing was taken at.
    # Persisting it makes resume point-in-time exact — the plan replays the
    # same data files even after the table takes new commits.
    source_snapshot: int | None = None

    def seg_files(self, seg: int) -> list[FileEntry]:
        return [f for f in self.files if f.seg == seg]

    def seg_ids(self) -> list[int]:
        return sorted({f.seg for f in self.files})

    def base_by_path(self) -> dict[str, tuple[int, int]]:
        """normalized file path → (docid_base, seg). Keys are absolute paths
        without URI scheme, matching Spark's _metadata.file_path modulo
        scheme."""
        return {_norm(f.path): (f.docid_base, f.seg) for f in self.files}


def _norm(p: str) -> str:
    import re
    from urllib.parse import unquote

    for scheme in ("file://", "file:"):
        if p.startswith(scheme):
            p = p[len(scheme):]
            break
    else:
        # non-file URI (s3a://, hdfs://, …): keep the scheme verbatim —
        # normpath would collapse "//" — and only percent-decode
        if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", p):
            return unquote(p)
    # Spark's _metadata.file_path is URL-encoded; plan paths are raw
    # filesystem paths — decode so files with spaces/special chars match
    return os.path.normpath(unquote(p))


def _pack_listing(listing: list[tuple[str, int]],
                  target_docs_per_seg: int) -> list[FileEntry]:
    """Greedy whole-file segment packing over (path, row_count) pairs taken
    IN THE GIVEN ORDER. Shared by the parquet-footer and Iceberg planners so
    both assign identical docIDs for the same file list."""
    files: list[FileEntry] = []
    base = 0
    seg = 0
    seg_rows = 0
    for p, rows in listing:
        if seg_rows and seg_rows + rows > target_docs_per_seg:
            seg += 1
            seg_rows = 0
        files.append(FileEntry(path=p, rows=rows, seg=seg, docid_base=base))
        base += rows
        seg_rows += rows
    return files


def make_build_plan_from_listing(listing: list[tuple[str, int]], source: str,
                                 target_docs_per_seg: int = 50_000,
                                 source_snapshot: int | None = None) -> BuildPlan:
    """BuildPlan from an explicit (path, rows) listing — sorted here so
    docIDs depend only on the file SET, never on listing order."""
    listing = sorted(listing)
    files = _pack_listing(listing, target_docs_per_seg)
    return BuildPlan(input_path=source, n_docs=sum(r for _, r in listing),
                     n_segments=(files[-1].seg + 1) if files else 0,
                     files=files, source_snapshot=source_snapshot)


def make_build_plan(input_path: str, target_docs_per_seg: int = 50_000) -> BuildPlan:
    """Scan parquet footers under input_path → BuildPlan (driver-side only)."""
    paths: list[str] = []
    if os.path.isdir(input_path):
        for root, _dirs, names in os.walk(input_path):
            for n in sorted(names):
                if n.endswith(".parquet"):
                    paths.append(os.path.join(root, n))
    else:
        paths.append(input_path)
    listing = [(os.path.abspath(p), pq.ParquetFile(p).metadata.num_rows)
               for p in sorted(paths)]
    return make_build_plan_from_listing(
        listing, os.path.abspath(input_path), target_docs_per_seg)


def make_build_plan_iceberg(spark, spec, target_docs_per_seg: int = 50_000) -> BuildPlan:
    """BuildPlan over an Iceberg table: one scan of the ``<table>.files``
    metadata table (file_path + record_count straight from Iceberg
    manifests) replaces opening every parquet footer — at 10^12 docs that is
    one small metadata job instead of ~10^6 driver-side footer reads. The
    heavy build then scans the listed data files directly (no catalog on the
    hot path), pinned to the resolved snapshot so the build is point-in-time
    consistent while ingest keeps committing.

    Append-only (copy-on-write) tables only: the reference corpus is a crawl
    ingest, and merge-on-read delete files would make raw data files
    overstate the live rows — refused loudly rather than mis-indexed.
    """
    from ..sources.pages import (iceberg_current_snapshot_id,
                                 iceberg_data_files)

    if spec.snapshot_id is None and spec.as_of is None:
        snap = iceberg_current_snapshot_id(spark, spec)
        if snap is not None:
            from dataclasses import replace
            spec = replace(spec, snapshot_id=snap)
    rows = iceberg_data_files(spark, spec).collect()
    return plan_from_iceberg_listing(
        [r.asDict() for r in rows], f"iceberg:{spec.location}",
        target_docs_per_seg, source_snapshot=spec.snapshot_id)


def plan_from_iceberg_listing(rows: list[dict], source: str,
                              target_docs_per_seg: int = 50_000,
                              source_snapshot: int | None = None) -> BuildPlan:
    """Pure planning step over ``.files`` metadata rows
    (content/file_path/record_count/file_format dicts) — split from
    make_build_plan_iceberg so it is testable without an Iceberg runtime."""
    deletes = [r for r in rows if r["content"] != 0]
    if deletes:
        raise ValueError(
            f"Iceberg table {source} carries {len(deletes)} delete file(s) "
            "(merge-on-read); the index build requires an append-only/COW "
            "table — compact with rewrite_data_files first")
    bad = [r for r in rows if r["file_format"].upper() != "PARQUET"]
    if bad:
        raise ValueError(
            f"non-parquet data files in {source}: "
            f"{sorted({r['file_format'] for r in bad})}")
    return make_build_plan_from_listing(
        [(_norm(r["file_path"]), int(r["record_count"])) for r in rows],
        source, target_docs_per_seg, source_snapshot=source_snapshot)


def _extend_from_listing(plan: BuildPlan,
                         listing: list[tuple[str, int]],
                         target_docs_per_seg: int) -> list[int]:
    """Append (path, rows) entries not already in the plan as NEW segments
    (docid bases continue after plan.n_docs; existing entries never change —
    the incremental-ingest / NRT-append path). Returns the new segment ids;
    known files are skipped, so re-runs are idempotent."""
    known = {f.path for f in plan.files}
    listing = sorted((p, r) for p, r in listing if p not in known)
    if not listing:
        return []
    base = plan.n_docs
    seg = max((f.seg for f in plan.files), default=-1) + 1
    seg_rows = 0
    new_segs = [seg]
    for p, rows in listing:
        if seg_rows and seg_rows + rows > target_docs_per_seg:
            seg += 1
            new_segs.append(seg)
            seg_rows = 0
        plan.files.append(FileEntry(path=p, rows=rows, seg=seg, docid_base=base))
        base += rows
        seg_rows += rows
    plan.n_docs = base
    plan.n_segments = len({f.seg for f in plan.files})
    return new_segs


def extend_build_plan(plan: BuildPlan, input_path: str,
                      target_docs_per_seg: int = 50_000) -> list[int]:
    """Append new parquet files under input_path to an existing plan."""
    paths: list[str] = []
    if os.path.isdir(input_path):
        for root, _dirs, names in os.walk(input_path):
            for n in sorted(names):
                if n.endswith(".parquet"):
                    paths.append(os.path.abspath(os.path.join(root, n)))
    else:
        paths.append(os.path.abspath(input_path))
    return _extend_from_listing(
        plan, [(p, pq.ParquetFile(p).metadata.num_rows) for p in paths],
        target_docs_per_seg)


def extend_plan_from_iceberg_listing(plan: BuildPlan, rows: list[dict],
                                     target_docs_per_seg: int = 50_000,
                                     new_snapshot: int | None = None) -> list[int]:
    """Incremental indexing of a growing Iceberg table: diff the CURRENT
    snapshot's ``.files`` listing against the persisted plan and append only
    the data files new commits added — Iceberg appends never rewrite
    existing data files in an append-only/COW table, so the diff is exactly
    the new documents and every existing docID stays fixed. Advances
    plan.source_snapshot so the plan records what it has seen."""
    deletes = [r for r in rows if r["content"] != 0]
    if deletes:
        raise ValueError(
            f"Iceberg table {plan.input_path} grew {len(deletes)} delete "
            "file(s); incremental indexing requires append-only commits — "
            "route row-level deletes through the tombstone API instead "
            "(indexing/deletes.py)")
    new_segs = _extend_from_listing(
        plan, [(_norm(r["file_path"]), int(r["record_count"])) for r in rows],
        target_docs_per_seg)
    if new_snapshot is not None:
        plan.source_snapshot = new_snapshot
    return new_segs


def write_build_plan(plan: BuildPlan, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "build_plan.json"), "w") as f:
        json.dump(
            {
                "input_path": plan.input_path,
                "n_docs": plan.n_docs,
                "n_segments": plan.n_segments,
                "source_snapshot": plan.source_snapshot,
                "files": [vars(fe) for fe in plan.files],
            },
            f,
            indent=1,
        )


def read_build_plan(out_dir: str) -> BuildPlan:
    with open(os.path.join(out_dir, "build_plan.json")) as f:
        d = json.load(f)
    return BuildPlan(
        input_path=d["input_path"],
        n_docs=d["n_docs"],
        n_segments=d["n_segments"],
        files=[FileEntry(**fe) for fe in d["files"]],
        source_snapshot=d.get("source_snapshot"),
    )
