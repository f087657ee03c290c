"""LSM merge stage: global term dictionary + corpus stats; optional segment
compaction.

The reference's SegmentMerger (index/SegmentMerger.java:153-158,557-628) does
a k-way heap merge of term streams and concatenates postings with docID
rebasing. Spark-first restatement: postings already live in Parquet keyed by
(seg, term), so the *global dictionary* is a metadata-level aggregation —
``groupBy(term).agg(sum(df), sum(cf))`` — written range-partitioned and
sorted by term (Parquet min/max stats then give the two-level term-index
seek behaviour of .tii/.tis, index/TermInfosWriter.java:59). Posting blobs
are NOT rewritten at merge time: per-segment postings ARE the index (the
reference searches per-segment too — search/IndexSearcher.java:202-217).

``compact_segments`` is the physical LSM step (mergeFactor-style fan-in,
index/LogMergePolicy.java:41): segments hold DISJOINT docID ranges by
construction, so the merge is decode → order chunks by first docid →
stable argsort repair when retention-mode destinations interleaved the
ranges (a fresh-id dest can carry a non-contiguous range) → re-encode;
the result is byte-identical to a cold build of the union.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from .. import BLOCK_SIZE
from ..codec import decode_positions, decode_postings, encode_postings, vbyte_encode


def merge_index(spark: SparkSession, out_dir: str, dict_partitions: int = 8) -> dict:
    """Build term_dict/ (globally sorted by term) + stats.json.

    The dictionary is the only corpus-sized job here: groupBy(term) over the
    per-seg postings metadata columns, persisted before the range
    repartition so the RangePartitioner's sampling pass reads the cached
    aggregate instead of re-running the postings scan. Corpus stats (N,
    avgdl, total_tokens, per-field avgdl) fold from the per-segment
    manifests on the driver — zero Spark jobs — whenever every committed
    manifest carries `sum_doclen` (written by _build_chunk); the docmap
    aggregation remains as the fallback for indexes built before that
    field existed. validate_index independently recomputes N/avgdl from
    the docmap and asserts equality to 1e-9, so the fold is not trusted
    blindly. The dictionary write runs on a helper thread concurrent with
    the (rare) stats fallback job."""
    import threading

    from pyspark import StorageLevel

    from .build import committed_segments

    # scope every scan to the COMMITTED segment set: retained commit
    # points keep compacted source partitions on disk (commits.py) and a
    # concurrent append may have staged an uncommitted seg dir — either
    # would double-count df/cf into the dictionary. Pure partition
    # pruning on the seg column, so the filter costs nothing.
    live = sorted(committed_segments(out_dir))
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    if live:
        postings = postings.where(F.col("seg").isin(live))
    agg = (postings.groupBy("term")
           .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    _err: list[BaseException] = []

    def _write_dict():
        try:
            (agg.repartitionByRange(dict_partitions, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "term_dict")))
        except BaseException as e:
            _err.append(e)

    th = threading.Thread(target=_write_dict)
    th.start()

    analyzer = None
    payload_analyzer = None
    field_analyzers: dict = {}
    analyzed_fields: list = []
    keyword_fields: list = ["lang", "url"]
    # THE shared manifest scanner + the cross-segment-validated config
    # reader (build.py) — not a private os.listdir loop that could drift
    from .build import load_manifests, read_manifest_config

    committed = [m for m in load_manifests(out_dir).values()
                 if m.get("status") == "committed"]
    cfg = read_manifest_config(out_dir)
    if cfg:
        analyzer = cfg.get("analyzer")
        payload_analyzer = cfg.get("payload_analyzer")
        field_analyzers = cfg.get("field_analyzers", {})
        analyzed_fields = cfg.get("analyzed_fields", [])
        keyword_fields = cfg.get("keyword_fields", keyword_fields)

    foldable = (bool(committed)
                and all("sum_doclen" in m for m in committed)
                and (not analyzed_fields
                     or all("sum_fdl" in m for m in committed)))
    if foldable:
        n_docs = sum(int(m.get("docs", 0)) for m in committed)
        total_tokens = sum(int(m["sum_doclen"]) for m in committed)
        n_segments = len(committed)
        avgdl = (float(total_tokens) / n_docs) if n_docs else 0.0
        avgdl_fields = {}
        if analyzed_fields:
            sums: dict = {}
            cnts: dict = {}
            for m in committed:
                for fld, s in (m.get("sum_fdl") or {}).items():
                    sums[fld] = sums.get(fld, 0) + int(s)
                for fld, c in (m.get("docs_fdl") or {}).items():
                    cnts[fld] = cnts.get(fld, 0) + int(c)
            avgdl_fields = {fld: float(sums[fld]) / cnts[fld]
                            for fld in sums if cnts.get(fld)}
    else:
        docmap = spark.read.parquet(os.path.join(out_dir, "docmap"))
        if live:
            docmap = docmap.where(F.col("seg").isin(live))
        row = docmap.agg(
            F.count("*").alias("N"), F.avg("doclen").alias("avgdl"),
            F.sum("doclen").alias("total_tokens"),
            F.countDistinct("seg").alias("n_segments")).collect()[0]
        n_docs = int(row["N"])
        avgdl = float(row["avgdl"] or 0.0)
        total_tokens = int(row["total_tokens"] or 0)
        n_segments = int(row["n_segments"])
        # per-field average length (per-field norms stats — the avgdl of
        # each extra ANALYZED field, reference index/NormsWriter.java:61)
        avgdl_fields = {}
        if analyzed_fields and "fdl" in docmap.columns:
            rows_f = (docmap.select(F.explode("fdl").alias("field", "dl"))
                      .groupBy("field").agg(F.avg("dl").alias("avgdl")).collect())
            avgdl_fields = {r["field"]: float(r["avgdl"]) for r in rows_f}

    th.join()
    agg.unpersist()
    if _err:
        raise _err[0]
    # n_terms from parquet footers (driver-side metadata, no Spark job)
    td_dir = os.path.join(out_dir, "term_dict")
    import pyarrow.parquet as pq
    n_terms = sum(
        pq.ParquetFile(os.path.join(r, n)).metadata.num_rows
        for r, _d, names in os.walk(td_dir) for n in names
        if n.endswith(".parquet"))
    stats = {
        "analyzer": analyzer or "standard",
        "payload_analyzer": payload_analyzer,
        "field_analyzers": field_analyzers,
        "N": int(n_docs),
        "avgdl": float(avgdl),
        "avgdl_fields": avgdl_fields,
        "analyzed_fields": analyzed_fields,
        "keyword_fields": keyword_fields,
        "total_tokens": int(total_tokens),
        "n_terms": int(n_terms),
        "n_segments": int(n_segments),
        # the codec's block size rides into stats so the QUERY path decodes
        # with the size the postings were written with (manifest-recorded;
        # e.g. addIndexes into an empty dest adopts the source's) — without
        # this, a non-default block_size index would silently scramble
        # docids at query time while every build-side tool decoded fine
        "block_size": int(cfg.get("block_size", BLOCK_SIZE)),
        "store_offsets": bool(cfg.get("store_offsets", False)),
    }
    tmp = os.path.join(out_dir, "stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "stats.json"))
    return stats


def _compact_group(block_size: int, max_postings_per_row: int, dest: int):
    """applyInPandas closure: all of one term's rows across source segments →
    re-encoded rows for the destination segment. Source docID ranges are
    disjoint, but SEG-ID order is NOT docID order once retention-mode
    destinations exist (a fresh id ≥ MERGE_SEG_BASE carries the docids of
    the old segments it absorbed — and such a destination's range need not
    even be CONTIGUOUS: merging group [0, 2] leaves seg 1's docids inside
    the hole). Chunks are ordered by first docid, then a stable argsort by
    docid repairs any remaining interleave — the SegmentMerger heap-merge
    (index/SegmentMerger.java:557-628) restated columnar; the sorted-input
    fast path skips the sort, and the block encoder still refuses
    duplicates loudly."""

    def fn(key, pdf: pd.DataFrame):
        term = key[0]
        has_pay = "payloads_blob" in pdf.columns
        chunks = []  # (first_docid, ids, tfs, dls, positions|None, payloads)
        has_pos = True
        for _, r in pdf.iterrows():
            ids, tfs, dls = decode_postings(r, block_size=block_size)
            if not ids.size:
                continue
            if r["positions_blob"] is not None and len(r["positions_blob"]):
                pos = decode_positions(r["positions_blob"], tfs)
            else:
                pos = None
                has_pos = False
            pay = None
            if has_pay and r["payloads_blob"] is not None:
                from ..payloads import decode_payloads_at

                pay = decode_payloads_at(
                    r["payloads_blob"], tfs, np.arange(ids.size))
            chunks.append((int(ids[0]), ids, tfs, dls, pos, pay))
        chunks.sort(key=lambda c: c[0])
        ids_l = [c[1] for c in chunks]
        tfs_l = [c[2] for c in chunks]
        dls_l = [c[3] for c in chunks]
        pos_l = []
        if has_pos:
            for c in chunks:
                pos_l.extend(c[4])
        pay_l = []
        if has_pay:
            for c in chunks:
                # a chunk with no payload data still occupies its posting
                # slots (None → NaN padding at encode) so later chunks'
                # payloads stay attached to THEIR docs
                pay_l.extend(c[5] if c[5] is not None
                             else [None] * c[1].size)
        ids = np.concatenate(ids_l) if ids_l else np.empty(0, dtype=np.int64)
        tfs = np.concatenate(tfs_l) if tfs_l else np.empty(0, dtype=np.int64)
        dls = np.concatenate(dls_l) if dls_l else np.empty(0, dtype=np.int64)
        if ids.size > 1 and not np.all(np.diff(ids) > 0):
            order = np.argsort(ids, kind="stable")
            ids, tfs, dls = ids[order], tfs[order], dls[order]
            if has_pos:
                pos_l = [pos_l[i] for i in order]
            if has_pay:
                pay_l = [pay_l[i] for i in order]
        rows = []
        n = ids.size
        nsplits = (n + max_postings_per_row - 1) // max_postings_per_row
        for salt in range(nsplits):
            lo, hi = salt * max_postings_per_row, min((salt + 1) * max_postings_per_row, n)
            enc = encode_postings(ids[lo:hi], tfs[lo:hi], dls[lo:hi], block_size=block_size)
            if has_pos and pos_l:
                deltas_parts = []
                for p in pos_l[lo:hi]:
                    d = np.diff(p, prepend=np.int64(0))
                    if p.size:
                        d[0] = p[0]
                    deltas_parts.append(d)
                pos_blob = vbyte_encode(
                    np.concatenate(deltas_parts).astype(np.uint64) if deltas_parts
                    else np.empty(0, dtype=np.uint64))
            else:
                pos_blob = b""
            extra = {}
            if has_pay:
                from ..payloads import encode_payloads_blob

                extra["payloads_blob"] = encode_payloads_blob(
                    pay_l[lo:hi], tfs[lo:hi])
            rows.append({
                **extra,
                "seg": dest, "term": term, "salt": salt,
                "df": enc["df"], "cf": enc["cf"],
                "ids_blob": enc["ids_blob"], "tfs_blob": enc["tfs_blob"],
                "dls_blob": enc["dls_blob"], "positions_blob": pos_blob,
                "block_last_ids": enc["block_last_ids"],
                "block_offsets_ids": enc["block_offsets_ids"],
                "block_offsets_tfs": enc["block_offsets_tfs"],
                "block_offsets_dls": enc["block_offsets_dls"],
                "block_max_tf": enc["block_max_tf"],
                "block_min_dl": enc["block_min_dl"],
            })
        return pd.DataFrame(rows)

    return fn


def find_merges(out_dir: str, merge_factor: int = 10) -> list[list[int]]:
    """LogDocMergePolicy.findMerges analog (index/LogMergePolicy.java:41,
    mergeFactor default 10 :57): committed segments, in arrival (seg id)
    order, are assigned geometric levels floor(log_mf(docs)); every
    contiguous run of ≥ mergeFactor segments whose level does not exceed
    the run-opening segment's level yields mergeFactor-sized merge groups.
    Merged destinations land at a higher level, so repeated application
    cascades exactly like the reference's levelled LSM."""
    import math

    # only status=committed: "compacted" markers are tombstoned sources
    # whose docs already live in a destination — never merge candidates
    from .build import load_manifests

    sizes: list[tuple[int, int]] = sorted(
        (int(m["seg"]), max(int(m.get("docs", 1)), 1))
        for m in load_manifests(out_dir, ("committed",)).values())
    if not sizes:
        return []
    lmf = math.log(merge_factor)
    levels = [int(math.log(d) / lmf) for _s, d in sizes]
    groups: list[list[int]] = []
    i = 0
    while i < len(sizes):
        lvl = levels[i]
        j = i
        while j < len(sizes) and levels[j] <= lvl:
            j += 1
        run = sizes[i:j]
        # LEVEL-UP GUARANTEE (the point of LogMergePolicy's geometric
        # bands, index/LogMergePolicy.java:41): a chunk merges only if the
        # merged size lands a level ABOVE its largest member — otherwise a
        # big earlier destination would open every run and be re-encoded
        # with each fresh batch of small segments (O(N²) rewrite churn;
        # each doc must be rewritten at most log_mf(N) times). Chunks that
        # don't level up are skipped by one and re-tried, so small
        # stragglers behind a big segment still merge among themselves.
        k = 0
        while k + merge_factor <= len(run):
            chunk = run[k:k + merge_factor]
            total = sum(d for _s, d in chunk)
            if int(math.log(total) / lmf) > max(
                    int(math.log(d) / lmf) for _s, d in chunk):
                groups.append([s for s, _d in chunk])
                k += merge_factor
            else:
                k += 1
        i = j
    return groups


def maybe_merge(spark: SparkSession, out_dir: str,
                merge_factor: int = 10) -> list[list[int]]:
    """Run the merge policy to a fixpoint (the reference's
    ConcurrentMergeScheduler loop collapsed into sequential Spark jobs):
    find level-runs, compact each, re-evaluate until no candidate remains.
    Returns every group merged. Call merge_index() afterwards to refresh
    the global dictionary/stats."""
    merged: list[list[int]] = []
    while True:
        groups = find_merges(out_dir, merge_factor)
        if not groups:
            return merged
        for g in groups:
            compact_segments(spark, out_dir, g)
            merged.append(g)


# Reserved destination-id namespace for retention-mode merges: build-plan
# segment ids are dense small ints (plan.py _extend_from_listing allocates
# max(plan)+1), so fresh merge destinations start far above anything a
# 10^12-doc plan reaches (2*10^7 segments at 50k docs/seg) and a later
# append can never collide with a retained merge output.
MERGE_SEG_BASE = 1 << 30


def write_empty_partition(spark: SparkSession, dest_dir: str, schema) -> None:
    """Materialize an EMPTY parquet partition carrying the table's row
    schema (minus the `seg` partition column). A committed segment whose
    rewrite produced zero rows (every doc deleted then expunged, or a merge
    of such segments) must still leave a schema-bearing file: if every
    segment of a table empties out, the root read would otherwise fail with
    UNABLE_TO_INFER_SCHEMA and the whole index — including expunge's own
    stats refresh — becomes unreadable. Zero-row local relation, no source
    files touched (the sources may already be deleted at call time)."""
    from pyspark.sql.types import StructType

    rows = StructType([f for f in schema.fields if f.name != "seg"])
    spark.createDataFrame([], rows).write.mode("overwrite").parquet(dest_dir)


def _next_merge_seg(out_dir: str) -> int:
    """Next free destination id in the reserved merge namespace (scans the
    manifests dir — every segment that ever existed has one)."""
    mdir = os.path.join(out_dir, "manifests")
    top = MERGE_SEG_BASE
    if os.path.isdir(mdir):
        for n in os.listdir(mdir):
            if n.startswith("seg_") and n.endswith(".json"):
                try:
                    s = int(n[4:-5])
                except ValueError:
                    continue
                if s >= top:
                    top = s + 1
    return top


def compact_segments(
    spark: SparkSession,
    out_dir: str,
    seg_group: list[int],
    *,
    block_size: int = BLOCK_SIZE,
    max_postings_per_row: int = 250_000,
) -> int:
    """Merge several segments into one fresh destination.

    Rewrites postings + docmap + tokens partitions for the group; the
    destination segment is byte-identical to a cold single-segment build of
    the same docs (tested property: merge(build(A), build(B)) ≡ build(A∪B)).

    CRASH SAFETY (the reference's two-phase commit via segments_N,
    index/SegmentInfos.java:668 prepareCommit/finishCommit): the merged
    output ALWAYS lands under a fresh destination id from the reserved
    merge namespace (>= MERGE_SEG_BASE — disjoint from build-plan ids, so
    a later plan append can never collide), and the sequence is
    stage → install dest data+norms → commit dest manifest → flip source
    manifests → delete sources. The dest-manifest rename is the SINGLE
    commit point. A crash at any point leaves a READABLE index with every
    doc visible exactly once: before the dest manifest lands the sources
    are still committed and untouched (the installed dest partition is
    invisible — no manifest); after it, any source whose flip didn't
    happen yet is resolved as compacted at read time — load_manifests
    masks committed members of a committed destination's ``merged_from``
    (segment ids are never reused, so the mask can't hide a later
    segment), and purge_unreferenced writes the flip back durably. The
    earlier eager mode (dest = min id, sources deleted before install)
    had a window where a crash lost the whole group's data while
    manifests still said committed; the pre-round-5 order (sources
    flipped before dest committed) had one where the whole group
    vanished from view.

    Commit-point retention (index/IndexFileDeleter.java:54 refcounting):
    when a retained commit point (commits.py) still references a source
    segment, its partitions are LEFT ON DISK for pinned readers;
    ``purge_unreferenced`` reclaims them once the deletion policy drops
    the old generations. Unreferenced sources are removed at the end of
    this call (same eager cleanup, crash-safe order).
    """
    import shutil

    from .build import read_manifest_config
    from .commits import referenced_segments
    from .deletes import deleted_docids, deleted_path

    # decode with the codec the segments were BUILT with (manifest-recorded;
    # a mismatched block_size would silently scramble docids)
    cfg = read_manifest_config(out_dir)
    block_size = int(cfg.get("block_size", block_size))
    from .build import postings_schema
    out_schema = postings_schema(bool(cfg.get("payload_analyzer")))

    protected = referenced_segments(out_dir) & set(seg_group)
    dest = _next_merge_seg(out_dir)

    # tombstones on absorbed segments must follow their docs into dest:
    # the kernel groups by seg, so a side-car row keyed to a removed seg id
    # would never meet the merged postings again (deletes are small — a
    # driver round-trip re-keys them)
    dd = deleted_docids(spark, out_dir)
    moved_tombstones = None
    if dd is not None:
        src_segs = [s for s in seg_group if s != dest]
        moved_tombstones = (dd.where(F.col("seg").isin(src_segs))
                            .select(F.lit(dest).cast("long").alias("seg"),
                                    "docid").toPandas())
    # Spark cannot read and overwrite the same path in one job: stage the
    # merged output in a sibling tmp dir, then swap partition dirs (the
    # rename-commit pattern, same as the manifest writes).
    for name, df_fn in (
        ("postings", lambda df: df.groupBy("term").applyInPandas(
            _compact_group(block_size, max_postings_per_row, dest),
            schema=out_schema)),
        ("docmap", lambda df: df.withColumn("seg", F.lit(dest))),
        ("tokens", lambda df: df.withColumn("seg", F.lit(dest))),
    ):
        src = os.path.join(out_dir, name)
        tmp = os.path.join(out_dir, f"_compact_tmp_{name}")
        out_df = df_fn(spark.read.parquet(src)
                       .where(F.col("seg").isin(seg_group)))
        out_df.write.mode("overwrite").partitionBy("seg").parquet(tmp)
        # install the destination FIRST — its id is fresh, so no source is
        # disturbed and a crash here leaves an invisible extra partition
        # (no manifest), never a missing one.
        # A merge group of fully-deleted-then-expunged segments stages ZERO
        # rows, so the staged partition dir may not exist (partitionBy
        # writes nothing for an empty frame); the destination still gets a
        # schema-bearing empty partition so the table root stays readable
        # even if this was its last populated segment
        merged = os.path.join(tmp, f"seg={dest}")
        if os.path.isdir(merged):
            os.replace(merged, os.path.join(src, f"seg={dest}"))
        else:
            write_empty_partition(spark, os.path.join(src, f"seg={dest}"),
                                  out_df.schema)
        shutil.rmtree(tmp, ignore_errors=True)
    if moved_tombstones is not None and len(moved_tombstones):
        from .deletes import delete_by_docids

        delete_by_docids(spark, out_dir,
                         spark.createDataFrame(moved_tombstones))
    group_docs = 0
    group_postings = 0
    group_doclen = 0
    doclen_known = True  # pre-sum_doclen manifests can't fold lengths
    group_fdl: dict = {}
    group_docs_fdl: dict = {}
    ranges: list[list[int]] = []
    for s in seg_group:
        mp = os.path.join(out_dir, "manifests", f"seg_{s:06d}.json")
        if os.path.exists(mp):
            with open(mp) as f:
                m = json.load(f)
            group_docs += int(m.get("docs", 0))
            group_postings += int(m.get("postings", 0))
            if "sum_doclen" in m:
                group_doclen += int(m["sum_doclen"])
            else:
                doclen_known = False
            for fld, v in (m.get("sum_fdl") or {}).items():
                group_fdl[fld] = group_fdl.get(fld, 0) + int(v)
            for fld, v in (m.get("docs_fdl") or {}).items():
                group_docs_fdl[fld] = group_docs_fdl.get(fld, 0) + int(v)
            if m.get("docid_range"):
                ranges.append(m["docid_range"])
    # dest's norms side-car regenerates from the just-installed docmap
    # BEFORE any manifest changes: once dest is visible its boosts must
    # score — a crash that left dest live without norms would silently
    # score index-time boosts as 1.0 with no recovery path (the absorbed
    # sources' norms dirs drop in the post-flip cleanup below)
    from .norms import rebuild_norms_for_segs

    rebuild_norms_for_segs(spark, out_dir, [dest])
    # the destination manifest must reflect the MERGED size: find_merges
    # levels segments by manifest docs (LogMergePolicy.java:41), so a stale
    # per-source count would keep a big merged segment at a small-segment
    # level and re-merge it with every fresh batch — the quadratic rewrite
    # churn the geometric levels exist to prevent
    mp = os.path.join(out_dir, "manifests", f"seg_{dest:06d}.json")
    if os.path.exists(mp) or dest not in seg_group:
        if os.path.exists(mp):
            with open(mp) as f:
                m = json.load(f)
        else:
            # fresh retention-mode destination: synthesize its manifest.
            # The codec/analysis config keys MUST ride along — every
            # source manifest flips to "compacted" below, and
            # read_manifest_config skips compacted entries
            m = {"seg": dest, "status": "committed", **cfg}
        m["docs"] = group_docs
        m["postings"] = group_postings
        if doclen_known:
            m["sum_doclen"] = group_doclen
        else:
            # a source without length sums poisons the fold — drop the key
            # so merge_index falls back to the docmap aggregation
            m.pop("sum_doclen", None)
        if group_fdl and doclen_known:
            m["sum_fdl"] = group_fdl
            m["docs_fdl"] = group_docs_fdl
        elif not doclen_known:
            m.pop("sum_fdl", None)
            m.pop("docs_fdl", None)
        m["merged_from"] = sorted(seg_group)
        if ranges:
            m["docid_range"] = [min(r[0] for r in ranges),
                                max(r[1] for r in ranges)]
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, mp)
    # source manifests flip AFTER the dest manifest rename-commits: the
    # dest write is the single commit point. A crash before it leaves the
    # sources committed and the installed dest partition invisible (no
    # manifest); a crash after it but before a source flip leaves both
    # nominally committed — readers resolve that window through
    # merged_from (build.load_manifests masks committed members of a
    # committed dest's merged_from; purge_unreferenced completes the flip
    # durably), so no ordering of these per-source renames can lose or
    # double-count docs
    for s in seg_group:
        if s == dest:
            continue
        mp = os.path.join(out_dir, "manifests", f"seg_{s:06d}.json")
        if os.path.exists(mp):
            # keep the manifest as a "compacted" marker: resume must still
            # treat the segment's input files as done (its docs now live in
            # dest) — deleting it would make a resumed build re-create the
            # segment and duplicate every doc
            with open(mp) as f:
                m = json.load(f)
            m["status"] = "compacted"
            m["into"] = dest
            tmp = mp + ".tmp"
            with open(tmp, "w") as f:
                json.dump(m, f, indent=1)
            os.replace(tmp, mp)
    # physical cleanup LAST, after the manifest flip: from here readers
    # already resolve the group through dest, so a crash mid-delete only
    # leaves inert compacted leftovers on disk (never missing data)
    from .norms import norms_path

    for s in seg_group:
        if s in protected:
            continue  # a retained commit still lists this segment —
            # purge_unreferenced reclaims it when the policy drops the gen
        for name in ("postings", "docmap", "tokens"):
            shutil.rmtree(os.path.join(out_dir, name, f"seg={s}"),
                          ignore_errors=True)
        # protected sources keep their tombstones too — a pinned reader
        # still subtracts them; dest got a rekeyed COPY above
        shutil.rmtree(os.path.join(deleted_path(out_dir), f"seg={s}"),
                      ignore_errors=True)
        # stale norms follow their segment out (dest's were regenerated
        # pre-flip); protected sources keep theirs for pinned readers
        shutil.rmtree(os.path.join(norms_path(out_dir), f"seg={s}"),
                      ignore_errors=True)
    return dest
