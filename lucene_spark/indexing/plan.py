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
    from urllib.parse import unquote

    for scheme in ("file://", "file:"):
        if p.startswith(scheme):
            p = p[len(scheme):]
            break
    # Spark's _metadata.file_path is URL-encoded; plan paths are raw
    # filesystem paths — decode so files with spaces/special chars match
    return os.path.normpath(unquote(p))


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
    paths.sort()
    files: list[FileEntry] = []
    base = 0
    seg = 0
    seg_rows = 0
    for p in paths:
        rows = pq.ParquetFile(p).metadata.num_rows
        if seg_rows and seg_rows + rows > target_docs_per_seg:
            seg += 1
            seg_rows = 0
        files.append(FileEntry(path=os.path.abspath(p), rows=rows, seg=seg, docid_base=base))
        base += rows
        seg_rows += rows
    return BuildPlan(input_path=os.path.abspath(input_path), n_docs=base,
                     n_segments=(seg + 1) if files else 0, files=files)


def extend_build_plan(plan: BuildPlan, input_path: str,
                      target_docs_per_seg: int = 50_000) -> list[int]:
    """Append new parquet files to an existing plan as NEW segments (docid
    bases continue after plan.n_docs; existing entries never change — the
    incremental-ingest / NRT-append path). Returns the new segment ids;
    files already in the plan are skipped (idempotent re-run)."""
    paths: list[str] = []
    if os.path.isdir(input_path):
        for root, _dirs, names in os.walk(input_path):
            for n in sorted(names):
                if n.endswith(".parquet"):
                    paths.append(os.path.abspath(os.path.join(root, n)))
    else:
        paths.append(os.path.abspath(input_path))
    known = {f.path for f in plan.files}
    paths = sorted(p for p in paths if p not in known)
    if not paths:
        return []
    base = plan.n_docs
    seg = max((f.seg for f in plan.files), default=-1) + 1
    seg_rows = 0
    new_segs = [seg]
    for p in paths:
        rows = pq.ParquetFile(p).metadata.num_rows
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


def write_build_plan(plan: BuildPlan, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "build_plan.json"), "w") as f:
        json.dump(
            {
                "input_path": plan.input_path,
                "n_docs": plan.n_docs,
                "n_segments": plan.n_segments,
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
    )
