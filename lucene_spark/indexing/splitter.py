"""Index splitting — the contrib/misc splitter tools restated over the
segment/manifest layout.

Reference semantics (all under /root/reference/contrib/misc/src/java/org/
apache/lucene/index/):

- **IndexSplitter.java:48-160** — segment-level surgery: `listSegments`
  prints the live segment set, `split(destDir, segs)` materializes a new
  standalone index holding ONLY the named segments (file copy + a fresh
  manifest), `remove(segs)` drops segments from the source. It "is unable
  to split apart a single segment" (:37) — same here.
- **MultiPassIndexSplitter.java:42-99** — docid-level split into N parts,
  reading the source once PER PART (hence the name): part `i` keeps the
  i-th contiguous docid range of size maxDoc/numParts (`seq=True`, last
  part takes the remainder, :70-84) or the round-robin class
  `docid % numParts == i` (:85-92); out-of-part docs are masked with
  artificial deletes, then physically dropped by the addIndexes copy.

Spark restatement: a segment here is a set of `seg=k` Parquet partitions
plus its manifest, so `split_segments` is a partition-directory copy +
manifest subset + a dictionary/stats rebuild (merge_index) — no postings
are decoded. `split_by_docs` masks out-of-part docs with the engine's
tombstone side-car (BufferedDeletes analog — exactly the reference's
FakeDeleteIndexReader trick) and then `expunge_deletes` physically drops
them, mirroring the addIndexes rewrite.

Stated deviation: the reference renumbers docids in each output part
(addIndexes assigns fresh ids); here docids KEEP their source values
(holes allowed) — the engine's global rank-identity contract depends on
stable docids, and the docmap makes sparse ids free in Parquet.

At scale: the copy stage is per-partition file IO (no shuffle, no
decode); tombstone writes are one narrow docmap projection per part; the
expunge rewrite touches only segments that actually contain masked docs.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession, functions as F

_SEG_DIRS = ("postings", "docmap", "tokens", "deleted", "norms")


def _manifests(index_dir: str) -> dict[int, dict]:
    from .build import load_manifests

    return load_manifests(index_dir)


def list_segments(index_dir: str) -> list[dict]:
    """Live (committed) segments with their doc counts — the
    IndexSplitter.listSegments (:98) report, as data not stdout."""
    return [{"seg": s, "n_docs": m.get("docs"),
             "status": m.get("status")}
            for s, m in sorted(_manifests(index_dir).items())
            if m.get("status") == "committed"]


def split_segments(spark: SparkSession, index_dir: str, dest_dir: str,
                   segs: list[int]) -> dict:
    """IndexSplitter.split (:131): a standalone dest index containing only
    `segs`. Partition-directory copy (postings/docmap/tokens and the
    deleted/norms side-cars) + the matching manifests, then a dictionary +
    stats rebuild over the subset. The source is untouched."""
    live = {s for s, m in _manifests(index_dir).items()
            if m.get("status") == "committed"}
    segs = sorted(set(int(s) for s in segs))
    missing = [s for s in segs if s not in live]
    if missing:
        raise ValueError(f"not live segments of {index_dir}: {missing}")
    if not segs:
        raise ValueError("no segments selected")
    os.makedirs(dest_dir, exist_ok=True)
    for sub in _SEG_DIRS:
        for s in segs:
            src = os.path.join(index_dir, sub, f"seg={s}")
            if os.path.isdir(src):
                dst = os.path.join(dest_dir, sub, f"seg={s}")
                shutil.copytree(src, dst, dirs_exist_ok=True)
    mdest = os.path.join(dest_dir, "manifests")
    os.makedirs(mdest, exist_ok=True)
    for s in segs:
        shutil.copy2(
            os.path.join(index_dir, "manifests", f"seg_{s:06d}.json"),
            os.path.join(mdest, f"seg_{s:06d}.json"))
    from .merge import merge_index

    stats = merge_index(spark, dest_dir)
    return {"dest": dest_dir, "segments": segs, **stats}


def remove_segments(spark: SparkSession, index_dir: str,
                    segs: list[int]) -> dict:
    """IndexSplitter.remove (:123): drop live segments from the source.
    Segments referenced by a retained commit point are refused (the
    IndexFileDeleter refcount rule — a pinned point-in-time reader must
    keep its files); release the commit first."""
    from .commits import referenced_segments

    segs = sorted(set(int(s) for s in segs))
    pinned = sorted(referenced_segments(index_dir) & set(segs))
    if pinned:
        raise ValueError(
            f"segments {pinned} are referenced by retained commit points; "
            "release those commits before removing")
    manifests = _manifests(index_dir)
    live = {s for s, m in manifests.items()
            if m.get("status") == "committed"}
    missing = [s for s in segs if s not in live]
    if missing:
        raise ValueError(f"not live segments of {index_dir}: {missing}")
    for s in segs:
        mp = os.path.join(index_dir, "manifests", f"seg_{s:06d}.json")
        m = manifests[s]
        m["status"] = "removed"
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, mp)
        for sub in _SEG_DIRS:
            shutil.rmtree(os.path.join(index_dir, sub, f"seg={s}"),
                          ignore_errors=True)
    from .merge import merge_index

    stats = merge_index(spark, index_dir)
    return {"removed": segs, **stats}


def split_by_docs(spark: SparkSession, index_dir: str,
                  dest_dirs: list[str], seq: bool = False) -> list[dict]:
    """MultiPassIndexSplitter.split (:54-99): split the index into
    len(dest_dirs) parts by docid — contiguous ranges when `seq`
    (last part absorbs the rounding remainder, :76-84), else round-robin
    `docid % numParts == i` (:85-92). Each pass copies the live segments,
    masks out-of-part docs with tombstones, and physically expunges them.
    Docids keep their source values (stated deviation above)."""
    n_parts = len(dest_dirs)
    if n_parts < 2:
        raise ValueError("Invalid number of outputs.")  # reference :56
    from .reader import IndexReader

    reader = IndexReader(spark, index_dir)
    if reader.N < 2:
        raise ValueError("Not enough documents for splitting")  # :59
    live = [s["seg"] for s in list_segments(index_dir)]
    docmap = reader.docmap().select("seg", "docid")
    # the reference partitions the raw 0..maxDoc id SLOT space (deleted
    # slots included, MultiPassIndexSplitter.java:66-84); same here —
    # maxDoc = max(docid)+1, masks are narrow docid predicates (no window,
    # no shuffle), so parts with pre-existing holes may be unequal exactly
    # as the reference's are
    max_doc = int(docmap.agg(F.max("docid")).first()[0]) + 1
    part_len = max_doc // n_parts
    from .deletes import delete_by_docids, expunge_deletes

    out = []
    for i, dest in enumerate(dest_dirs):
        res = split_segments(spark, index_dir, dest, live)
        if seq:
            lo = part_len * i
            hi = max_doc if i == n_parts - 1 else lo + part_len
            mask = (F.col("docid") < lo) | (F.col("docid") >= hi)
        else:
            mask = (F.col("docid") % n_parts) != i
        victims = docmap.where(mask).select("seg", "docid")
        delete_by_docids(spark, dest, victims)
        expunge_deletes(spark, dest)
        part_reader = IndexReader(spark, dest)
        out.append({"dest": dest, "part": i, "n_docs": part_reader.N,
                    "segments": res["segments"]})
    return out
