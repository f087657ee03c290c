"""IndexWriter.addIndexes — merge whole foreign indexes into one.

Reference semantics:
- ``index/IndexWriter.java:3172 addIndexesNoOptimize(Directory[])`` copies
  the source indexes' segments into the destination, renumbering docids by
  a running docBase (each source's docids shift up by the docs before it);
  deletes travel with their segments.
- ``contrib/misc/.../IndexMergeTool.java:1-45`` is the CLI wrapper:
  ``IndexMergeTool <mergedIndex> <index1> <index2> ...``.

Spark restatement: a source segment is a set of Parquet partitions + a
manifest, so the copy is a per-segment REBASE-and-write — no global
shuffle, no corpus re-tokenization:

- postings (and the tombstone side-car, same codec): decode each term row's
  docid blob, add the source's offset, re-encode. Positions/payload blobs
  are docid-independent and pass through untouched. One ``mapInPandas``
  per segment, embarrassingly parallel over term rows.
- tokens/docmap: ``docid + offset`` column projection.
- norms: derived state — regenerated from the rebased docmap.
- manifest: copied with the new segment id (reserved merge namespace, so
  future plan appends can never collide) and the shifted docid_range.
- term dictionary + corpus stats: one ``merge_index`` rebuild at the end.

Stated deviation (same as splitter.py): the reference renumbers docids
contiguously; here each source's docids keep their RELATIVE values shifted
by one offset per source (holes allowed) — the engine's rank-identity
tie-break contract wants order-preserving ids, and sparse ids are free in
Parquet.

At scale: per-segment IO only; the single blob patch per posting row is
CPU-bound numpy inside Arrow batches. The one global stage is the final
dictionary rebuild, which every index mutation already pays.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from .. import BLOCK_SIZE
from ..codec import decode_postings, encode_postings
from .merge import _next_merge_seg


def _manifests(index_dir: str) -> dict[int, dict]:
    from .build import load_manifests

    return load_manifests(index_dir, ("committed",))


def _max_docid(manifests: dict[int, dict]) -> int:
    return max((m["docid_range"][1] for m in manifests.values()
                if m.get("docid_range")), default=-1)


def _rebase_postings(offset: int, in_block_size: int = BLOCK_SIZE,
                     out_block_size: int = BLOCK_SIZE):
    """mapInPandas fn: shift every docid in POSTINGS_SCHEMA rows by
    ``offset``. Blobs are delta/VByte coded, so the shift re-encodes the
    docid stream (block restarts are absolute); tf/dl streams and the
    positions/payload blobs are docid-independent and pass through
    (encode_positions is plain concat-VByte — no block structure).

    Decode uses the SOURCE index's block_size and re-encode the
    DESTINATION's: the delta-with-block-restarts cumsum depends on block
    size, so decoding a foreign segment with the wrong block_size silently
    scrambles every docid (same hazard compact_segments documents)."""

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                yield pdf
                continue
            recs = pdf.to_dict("records")
            for rec in recs:
                d, t, dl = decode_postings(rec, in_block_size)
                enc = encode_postings(d + np.int64(offset), t, dl,
                                      out_block_size)
                rec.update(enc)
            yield pd.DataFrame(recs, columns=pdf.columns)

    return fn


def add_indexes(spark: SparkSession, dest_dir: str,
                source_dirs: list[str]) -> dict:
    """addIndexes(Directory[]) / IndexMergeTool: rebase-copy every live
    segment of every source index into ``dest_dir``. Sources are untouched;
    their tombstones travel with the segments. Query-time analysis stays
    the destination's (the reference never reconciles analyzers either —
    mixing chains is the caller's contract). Returns per-source offsets
    and the new segment ids."""
    from .build import read_manifest_config

    dest_m = _manifests(dest_dir)
    base = _max_docid(dest_m) + 1
    next_seg = _next_merge_seg(dest_dir)
    report: list[dict] = []
    new_segs: list[int] = []
    # every copied segment re-encodes to the DESTINATION's codec config; an
    # empty destination (merge_indexes_tool) adopts the first source's, so
    # the merged index always ends up with ONE consistent block_size
    dest_bs = read_manifest_config(dest_dir).get("block_size")

    for src in source_dirs:
        src = os.path.abspath(src)
        if src == os.path.abspath(dest_dir):
            raise ValueError("addIndexes: source == destination")
        src_m = _manifests(src)
        if not src_m:
            raise ValueError(f"addIndexes: no committed segments in {src}")
        src_bs = int(read_manifest_config(src).get("block_size", BLOCK_SIZE))
        if dest_bs is None:
            dest_bs = src_bs
        offset = base
        for s, m in sorted(src_m.items()):
            k = next_seg
            next_seg += 1
            new_segs.append(k)
            # postings + tombstones: blob rebase
            for sub in ("postings", "deleted"):
                sdir = os.path.join(src, sub, f"seg={s}")
                if not os.path.isdir(sdir):
                    continue
                (spark.read.parquet(sdir)
                 .mapInPandas(_rebase_postings(offset, src_bs,
                                               int(dest_bs)),
                              schema=spark.read.parquet(sdir).schema)
                 .write.mode("overwrite")
                 .parquet(os.path.join(dest_dir, sub, f"seg={k}")))
            # tokens + docmap: docid column shift
            for sub in ("tokens", "docmap"):
                sdir = os.path.join(src, sub, f"seg={s}")
                if not os.path.isdir(sdir):
                    continue
                (spark.read.parquet(sdir)
                 .withColumn("docid", F.col("docid") + F.lit(offset))
                 .write.mode("overwrite")
                 .parquet(os.path.join(dest_dir, sub, f"seg={k}")))
            man = dict(m)
            man.update({
                "seg": k,
                "docid_range": [m["docid_range"][0] + offset,
                                m["docid_range"][1] + offset],
                "added_from": [src, s],
                "docid_offset": offset,
                # postings were just re-encoded to the destination codec
                "block_size": int(dest_bs),
            })
            mdir = os.path.join(dest_dir, "manifests")
            os.makedirs(mdir, exist_ok=True)
            tmp = os.path.join(mdir, f".seg_{k:06d}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(man, f)
            os.replace(tmp, os.path.join(mdir, f"seg_{k:06d}.json"))
        report.append({"source": src, "offset": offset,
                       "segments": sorted(src_m)})
        base = offset + _max_docid(src_m) + 1

    # norms are derived from the (rebased) docmap boost column
    from .norms import rebuild_norms_for_segs
    rebuild_norms_for_segs(spark, dest_dir, new_segs)

    from .merge import merge_index
    stats = merge_index(spark, dest_dir)
    return {"dest": dest_dir, "sources": report,
            "new_segments": new_segs, **stats}


def merge_indexes_tool(spark: SparkSession, merged_dir: str,
                       source_dirs: list[str]) -> dict:
    """IndexMergeTool.main (contrib/misc/.../IndexMergeTool.java): create
    ``merged_dir`` fresh from N source indexes (destination starts empty,
    every source is added)."""
    if os.path.isdir(merged_dir) and _manifests(merged_dir):
        raise ValueError(f"merge target {merged_dir} already has segments")
    shutil.rmtree(merged_dir, ignore_errors=True)
    os.makedirs(merged_dir, exist_ok=True)
    return add_indexes(spark, merged_dir, source_dirs)
