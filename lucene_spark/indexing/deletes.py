"""Deletes — tombstone side-car + physical expunge.

Reference semantics reproduced (all cites /root/reference):
- Buffered deletes by term or query resolve to per-segment deleted-doc sets
  (index/BufferedDeletes.java:36, applied in
  index/DocumentsWriter.java:268-272,884).
- The deleted set is a SIDE-CAR per segment (the ``.del`` BitVector,
  util/BitVector.java:35): queries exclude tombstoned docs, but docIDs keep
  their slots and corpus/df statistics stay unchanged until a merge rewrites
  the segment — exactly Lucene's numDocs-vs-maxDoc behaviour.
- ``expunge_deletes`` is the physical rewrite (IndexWriter.expungeDeletes,
  index/IndexWriter.java — merge path drops deleted docs). Unlike Lucene we
  keep docID holes instead of remapping, so docIDs stay stable for
  rank-identity across rewrites; stats.json is refreshed afterwards.

Representation: ``deleted/seg=k/`` holds POSTINGS_SCHEMA rows under the
reserved term ``\\x00deleted`` — the docid blob reuses the VByte block codec,
so the tombstone set rides the same IO path as postings and the per-segment
kernel can subtract it without any driver-side collection.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import BLOCK_SIZE
from ..codec import decode_postings
from .build import POSTINGS_SCHEMA, _encode_stream, postings_schema

DELETED_TERM = "\x00deleted"


def deleted_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deleted")


def _index_block_size(index_dir: str) -> int:
    from .build import index_block_size

    return index_block_size(index_dir)


def deleted_rows(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Tombstone rows (POSTINGS_SCHEMA) or None if no deletes exist. An
    empty side-car dir (every seg= partition reclaimed, e.g. by
    purge_unreferenced) counts as no deletes — spark.read.parquet cannot
    infer a schema from it."""
    p = deleted_path(index_dir)
    if not os.path.isdir(p):
        return None
    if not any(n.startswith("seg=") for n in os.listdir(p)):
        return None
    return spark.read.parquet(p)


def deleted_docids(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Decoded view → DataFrame(seg int, docid long), for docmap anti-joins."""
    rows = deleted_rows(spark, index_dir)
    if rows is None:
        return None
    bs = _index_block_size(index_dir)

    def decode(batches):
        for pdf in batches:
            segs, ids = [], []
            for rec in pdf.to_dict("records"):
                d, _t, _dl = decode_postings(rec, bs)
                segs.append(np.full(d.size, rec["seg"], dtype=np.int64))
                ids.append(d)
            if ids:
                yield pd.DataFrame({
                    "seg": np.concatenate(segs),
                    "docid": np.concatenate(ids),
                })

    return rows.mapInPandas(decode, schema="seg long, docid long").distinct()


def delete_by_docids(spark: SparkSession, index_dir: str,
                     docs: DataFrame) -> None:
    """Append tombstones for DataFrame(seg, docid). Encoded per segment via
    the streaming posting encoder (docids sorted, block metadata intact)."""
    crafted = (
        docs.select(
            F.col("seg").cast("int").alias("seg"),
            F.lit(DELETED_TERM).alias("term"),
            F.col("docid").cast("long").alias("docid"),
            F.lit(1).alias("tf"),
            F.lit(0).alias("doclen"),
            F.array().cast("array<int>").alias("positions"),
        )
        .distinct()
        .repartition("seg")
        .sortWithinPartitions("seg", "term", "docid")
    )
    (crafted.mapInPandas(_encode_stream(1 << 62, _index_block_size(index_dir),
                                        False),
                         schema=POSTINGS_SCHEMA)
        .write.mode("append").partitionBy("seg")
        .parquet(deleted_path(index_dir)))


def delete_by_query(spark: SparkSession, index_dir: str, query) -> int:
    """Delete all docs matching a query (term string, query string, or AST)
    — the reference deleteDocuments(Term|Query), index/IndexWriter.java:2118.
    Returns the number of newly tombstoned docs."""
    from ..queries.planner import Searcher
    from .reader import IndexReader

    reader = IndexReader(spark, index_dir)
    searcher = Searcher(reader)
    m = searcher.matching(query).select("docid")
    docs = reader.docmap().join(m, "docid").select("seg", "docid")
    n = docs.count()
    if n:
        delete_by_docids(spark, index_dir, docs)
    return n


def expunge_deletes(spark: SparkSession, index_dir: str,
                    block_size: int = BLOCK_SIZE,
                    max_postings_per_row: int = 250_000) -> dict:
    """Physically drop tombstoned docs from the affected segments by
    rebuilding their tables from the forward index (tokens), then refresh
    global stats. DocIDs keep their slots (holes allowed). Segments listed
    by a retained commit point are never rewritten in place — their
    expunged copy lands under a fresh reserved segment id and the source
    stays on disk for pinned readers (see the retention comments below)."""
    import shutil

    from .merge import merge_index

    dels = deleted_docids(spark, index_dir)
    if dels is None:
        return {"expunged": 0, "segments": []}
    segs = [int(r["seg"]) for r in dels.select("seg").distinct().collect()]
    # only LIVE segments are expunge targets: a retained commit point
    # (commits.py) keeps compacted source partitions — and their tombstone
    # copies — on disk for pinned readers; rewriting those would corrupt
    # the pinned point in time
    from .build import committed_segments

    live = committed_segments(index_dir)
    if live:
        segs = [s for s in segs if s in live]
    if not segs:
        return {"expunged": 0, "segments": []}
    # a LIVE segment can ALSO be listed by a retained commit point (commit,
    # then delete, then expunge): rewriting it in place would physically
    # remove docs from the pinned generation while its pinned stats still
    # count them. Those segments take compact_segments' retention path
    # instead (IndexFileDeleter refcounting, index/IndexFileDeleter.java:54):
    # the expunged copy lands under a FRESH id from the reserved merge
    # namespace, the source manifest flips to "compacted", and the source
    # partitions (and their tombstones) stay on disk for pinned readers
    # until purge_unreferenced reclaims them.
    from .commits import referenced_segments
    from .merge import _next_merge_seg

    protected = sorted(referenced_segments(index_dir) & set(segs))
    out_seg = {s: s for s in segs}
    if protected:
        base = _next_merge_seg(index_dir)
        for i, s in enumerate(protected):
            out_seg[s] = base + i
    dels = dels.where(F.col("seg").isin(segs))
    n_del = dels.count()
    del_ids = dels.select("docid")

    tokens_p = os.path.join(index_dir, "tokens")
    tok = (spark.read.parquet(tokens_p).where(F.col("seg").isin(segs))
           .join(del_ids, "docid", "left_anti"))
    if protected:
        # rekey protected segments to their fresh destination ids up front —
        # every downstream stage (docmap/postings/tokens) then writes the
        # destination partitions directly; docids are untouched (holes stay)
        remap = F.create_map(*[F.lit(x) for s in segs
                               for x in (s, out_seg[s])])
        tok = tok.withColumn("seg", remap[F.col("seg")].cast("int"))

    # rewrite tokens → docmap → postings for the affected segments, staged
    # then swapped (rename-commit, same as the build's manifest protocol)
    # positions column always exists in TOKENS_SCHEMA — whether it holds
    # data is recorded in the build manifests (store_positions=False builds
    # write empty arrays whose exploded entries are NULL and must not reach
    # the encoder's positions path). read_manifest_config also validates
    # the config is CONSISTENT across segments and supplies the build's
    # block_size (a mismatched codec would scramble re-encoded docids).
    from .build import read_manifest_config

    cfg = read_manifest_config(index_dir)
    store_positions = bool(cfg.get("store_positions", True))
    store_payloads = (bool(cfg.get("payload_analyzer"))
                      and "payloads" in tok.columns)
    block_size = int(cfg.get("block_size", block_size))
    # per-term field lengths (multi-field indexes); pre-multifield token
    # layouts fall back to the doc-level doclen
    has_dls = "dls" in tok.columns
    dm_cols = ["seg", "docid", "url", "lang", "doclen"] + (
        ["fdl"] if "fdl" in tok.columns else []) + (
        ["boost"] if "boost" in tok.columns else [])
    zip_cols = [F.col("terms").alias("term"), F.col("tfs").alias("tf"),
                F.col("positions").alias("positions")] + (
        [F.col("dls").alias("dl")] if has_dls else []) + (
        [F.col("payloads").alias("payloads")] if store_payloads else [])
    dl_col = F.col("z.dl") if has_dls else F.col("doclen")
    pay_cols = ([F.col("z.payloads").alias("payloads")]
                if store_payloads else [])
    # tokens is rewritten LAST: docmap/postings lineage reads the old tokens
    # files, which must still exist when those stages execute
    stages = {
        "docmap": tok.select(*dm_cols),
        "postings": (
            tok.select(
                "seg", "docid", "doclen",
                F.explode(F.arrays_zip(*zip_cols)).alias("z"))
            .select("seg", F.col("z.term").alias("term"), "docid",
                    F.col("z.tf").alias("tf"), dl_col.alias("doclen"),
                    F.col("z.positions").alias("positions"), *pay_cols)
            .repartition(len(segs), "seg")
            .sortWithinPartitions("seg", "term", "docid")
            .mapInPandas(_encode_stream(max_postings_per_row, block_size,
                                        store_positions,
                                        store_payloads=store_payloads),
                         schema=postings_schema(store_payloads))),
        "tokens": tok,
    }
    # stage ALL tables first, swap after: a crash during the (long) Spark
    # writes leaves only _expunge_tmp_* litter and a fully consistent
    # index; the mixed-state window (docmap swapped, postings not yet) is
    # the few milliseconds of directory renames, not minutes of jobs.
    # Every stage reads the OLD tokens files, so staging order is free.
    for name, df in stages.items():
        tmp = os.path.join(index_dir, f"_expunge_tmp_{name}")
        df.write.mode("overwrite").partitionBy("seg").parquet(tmp)
    for name in stages:
        src = os.path.join(index_dir, name)
        tmp = os.path.join(index_dir, f"_expunge_tmp_{name}")
        for s in segs:
            d = out_seg[s]
            if d == s:
                shutil.rmtree(os.path.join(src, f"seg={s}"),
                              ignore_errors=True)
            # protected source partitions stay on disk for pinned readers
            staged = os.path.join(tmp, f"seg={d}")
            dest_dir = os.path.join(src, f"seg={d}")
            if os.path.isdir(staged):
                os.replace(staged, dest_dir)
            elif not os.path.isdir(dest_dir):
                # the expunge emptied this segment entirely (every doc
                # tombstoned): leave a schema-bearing empty partition, or a
                # table whose LAST populated segment empties out becomes
                # unreadable (UNABLE_TO_INFER_SCHEMA on the root read —
                # including this function's own stats refresh below)
                from .merge import write_empty_partition

                write_empty_partition(spark, dest_dir, stages[name].schema)
        shutil.rmtree(tmp, ignore_errors=True)

    # consume the expunged tombstones on in-place segments; protected
    # sources keep theirs (a pinned reader still subtracts them at decode
    # time, so it sees the same live docs before and after the expunge).
    # The whole-dir delete only happens once nothing else is left.
    for s in segs:
        if out_seg[s] == s:
            shutil.rmtree(os.path.join(deleted_path(index_dir), f"seg={s}"),
                          ignore_errors=True)
    dp = deleted_path(index_dir)
    if os.path.isdir(dp) and not any(
            n.startswith("seg=") for n in os.listdir(dp)):
        shutil.rmtree(dp, ignore_errors=True)

    # norms side-car: regenerate the OUTPUT segments from the rewritten
    # docmap (expunged docs lose their boost rows with their postings);
    # protected sources keep their norms partitions for pinned readers
    from .norms import rebuild_norms_for_segs

    out_segs = sorted({out_seg[s] for s in segs})
    rebuild_norms_for_segs(spark, index_dir, out_segs)

    # refresh the affected manifests: merge_index folds corpus stats (N,
    # avgdl) from manifest docs/sum_doclen, so the physical removal must
    # land there or the fold would resurrect expunged docs. One small agg
    # over the rewritten docmap partitions; rename-commit per manifest.
    import json

    dm = spark.read.parquet(os.path.join(index_dir, "docmap")) \
        .where(F.col("seg").isin(out_segs))
    aggs = [F.count("*").alias("docs"), F.sum("doclen").alias("sum_doclen")]
    per_seg = {int(r["seg"]): r for r in dm.groupBy("seg").agg(*aggs).collect()}
    fdl_sums: dict = {}
    if "fdl" in dm.columns and cfg.get("analyzed_fields"):
        for r in (dm.select("seg", F.explode("fdl").alias("field", "dl"))
                  .groupBy("seg", "field")
                  .agg(F.sum("dl").alias("s"), F.count("dl").alias("c"))
                  .collect()):
            d = fdl_sums.setdefault(int(r["seg"]), {"sum_fdl": {}, "docs_fdl": {}})
            d["sum_fdl"][r["field"]] = int(r["s"])
            d["docs_fdl"][r["field"]] = int(r["c"])

    def _refresh(m: dict, d: int) -> dict:
        r = per_seg.get(d)
        m["docs"] = int(r["docs"]) if r is not None else 0
        m["sum_doclen"] = int(r["sum_doclen"] or 0) if r is not None else 0
        if d in fdl_sums:
            m.update(fdl_sums[d])
        elif cfg.get("analyzed_fields"):
            m["sum_fdl"], m["docs_fdl"] = {}, {}
        return m

    def _write_manifest(mp: str, m: dict) -> None:
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, mp)

    mdir = os.path.join(index_dir, "manifests")
    for s in segs:
        mp = os.path.join(mdir, f"seg_{s:06d}.json")
        if not os.path.exists(mp):
            continue
        with open(mp) as f:
            m = json.load(f)
        d = out_seg[s]
        if d == s:
            _write_manifest(mp, _refresh(m, s))
        else:
            # retention path: the expunged copy gets a fresh committed
            # manifest (config keys ride along — read_manifest_config skips
            # compacted entries); the source flips to "compacted" so live
            # readers and merges stop seeing it while pinned commits keep
            # its data on disk
            dest_m = _refresh(dict(m), d)
            dest_m["seg"] = d
            dest_m["status"] = "committed"
            dest_m["expunged_from"] = s
            _write_manifest(os.path.join(mdir, f"seg_{d:06d}.json"), dest_m)
            m["status"] = "compacted"
            m["into"] = d
            _write_manifest(mp, m)

    stats = merge_index(spark, index_dir)
    return {"expunged": int(n_del), "segments": sorted(segs),
            "out_segments": out_segs, "stats": stats}
