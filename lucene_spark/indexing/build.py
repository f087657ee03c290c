"""Stage A — distributed segment build: tokenize → forward index (term
vectors) → per-segment postings, checkpointed and resumable.

Spark restatement of the reference indexing chain (SURVEY.md §3.1):
``IndexWriter.addDocument → DocInverter → TermsHash → FreqProxTermsWriter →
FormatPostings*Writer`` becomes

    read parquet (+ _metadata.row_index for arrival-order docIDs)
    → mapInPandas [extract_text + tokenize + per-doc invert]   (DocInverter)
    → write tokens/seg=k   (forward index ≙ stored fields + term vectors)
    → groupBy(seg, term) applyInPandas [delta+VByte block encode]
                                                    (FormatPostingsDocsWriter)
    → write postings/seg=k + manifest JSON          (segment flush + commit)

Scale properties:
- The only corpus-sized shuffle is groupBy(seg, term). Group size is bounded
  by the segment's doc count regardless of term skew — the segment is the
  salt. Zipf-head terms additionally split into multiple rows within a
  segment (``salt`` column) when df exceeds max_postings_per_row, so no
  single Arrow row exceeds ~a few MB.
- Postings land partitioned by seg; dynamic partition overwrite makes
  re-running a failed segment idempotent (reference two-phase commit
  semantics, index/IndexWriter.java:3439 — the manifest written last is the
  commit point).
- Resume: segments with a valid manifest are skipped entirely
  (north rule: resumable per-partition checkpoints with lineage + metrics).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from .. import BLOCK_SIZE
from ..analysis import ANALYZERS, analyze, extract_text
from ..codec import encode_postings, vbyte_encode
from .plan import BuildPlan, make_build_plan, read_build_plan, write_build_plan

TOKENS_SCHEMA = (
    "seg int, docid long, url string, lang string, doclen int, "
    "is_first boolean, term string, tf int, positions array<int>"
)

POSTINGS_SCHEMA = (
    "seg int, term string, salt int, df long, cf long, "
    "ids_blob binary, tfs_blob binary, dls_blob binary, positions_blob binary, "
    "block_last_ids array<long>, block_offsets_ids array<int>, "
    "block_offsets_tfs array<int>, block_offsets_dls array<int>, "
    "block_max_tf array<int>, block_min_dl array<int>"
)


def _tokenize_iter(base_by_path: dict, analyzer: str, store_positions: bool):
    """mapInPandas closure: pages batches → per-(doc, term) rows."""
    from .plan import _norm

    analyze_fn = analyze if analyzer == "standard" else None
    simple_fn = ANALYZERS.get(analyzer)

    def fn(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "seg", "docid", "url", "lang", "doclen", "is_first", "term", "tf", "positions")}
            fps = pdf["fp"].map(lambda p: base_by_path[_norm(p)])
            texts = pdf["text"] if "text" in pdf else None
            htmls = pdf["html"] if "html" in pdf else None
            for i in range(len(pdf)):
                base, seg = fps.iloc[i]
                docid = int(base) + int(pdf["ri"].iloc[i])
                text = texts.iloc[i] if texts is not None else None
                if text is None and htmls is not None:
                    text = extract_text(htmls.iloc[i])
                if analyze_fn is not None:
                    pairs = analyze_fn(text or "")
                else:
                    toks = simple_fn(text or "")
                    pairs = list(zip(toks, range(len(toks))))
                agg: dict[str, list[int]] = {}
                for term, pos in pairs:
                    agg.setdefault(term, []).append(pos)
                dl = len(pairs)
                url = pdf["url"].iloc[i]
                lang = pdf["lang"].iloc[i] if "lang" in pdf else None
                if not agg:  # empty doc still needs a docmap row
                    out["seg"].append(seg); out["docid"].append(docid)
                    out["url"].append(url); out["lang"].append(lang)
                    out["doclen"].append(0); out["is_first"].append(True)
                    out["term"].append(None); out["tf"].append(0)
                    out["positions"].append([])
                    continue
                first = True
                for term, poss in agg.items():
                    out["seg"].append(seg); out["docid"].append(docid)
                    out["url"].append(url if first else None)
                    out["lang"].append(lang if first else None)
                    out["doclen"].append(dl); out["is_first"].append(first)
                    out["term"].append(term); out["tf"].append(len(poss))
                    out["positions"].append(poss if store_positions else [])
                    first = False
            yield pd.DataFrame(out)

    return fn


def _encode_positions_blob(lists: list[np.ndarray], tfs: np.ndarray) -> bytes:
    """Per-doc position lists → delta+VByte blob (first position absolute
    per doc, then in-doc deltas), vectorized across the whole slice."""
    flat = np.concatenate(lists) if lists else np.empty(0, dtype=np.int64)
    if not flat.size:
        return b""
    deltas = np.diff(flat, prepend=np.int64(0))
    starts = np.zeros(len(lists), dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    firsts = np.array([p[0] for p in lists], dtype=np.int64)
    deltas[starts] = firsts
    return bytes(vbyte_encode(deltas.astype(np.uint64)))


def _encode_rows(seg: int, term: str, docids, tfs, dls, pos_lists,
                 max_postings_per_row: int, block_size: int) -> list[dict]:
    """One term's sorted postings → one or more encoded rows (salt-split so
    no single Arrow row exceeds ~a few MB for Zipf-head terms)."""
    rows = []
    n = docids.size
    nsplits = (n + max_postings_per_row - 1) // max_postings_per_row
    for salt in range(nsplits):
        lo, hi = salt * max_postings_per_row, min((salt + 1) * max_postings_per_row, n)
        enc = encode_postings(docids[lo:hi], tfs[lo:hi], dls[lo:hi], block_size=block_size)
        pos_blob = (_encode_positions_blob(pos_lists[lo:hi], tfs[lo:hi])
                    if pos_lists is not None else b"")
        rows.append({
            "seg": seg, "term": term, "salt": salt,
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
    return rows


def _encode_batches(max_postings_per_row: int, block_size: int, store_positions: bool):
    """mapInPandas closure over JVM-pre-aggregated term rows.

    Input rows (one per (seg, term), built by collect_list + sort_array +
    transform — all JVM-side): ``seg, term, docids, tfs, dls[, poss]`` with
    the arrays already sorted by docid. Encoding many terms per Arrow batch
    amortizes Python overhead — this replaced a per-(seg,term)
    applyInPandas that spent ~2 ms/group on 50k+ singleton tail terms
    (the Zipf tail makes per-group UDF dispatch the bottleneck, not math).
    """

    def fn(batches):
        for pdf in batches:
            out: list[dict] = []
            segs = pdf["seg"].to_numpy()
            terms = pdf["term"].to_numpy()
            col_ids = pdf["docids"].to_numpy()
            col_tfs = pdf["tfs"].to_numpy()
            col_dls = pdf["dls"].to_numpy()
            col_pos = pdf["poss"].to_numpy() if store_positions else None
            for i in range(len(pdf)):
                docids = np.asarray(col_ids[i], dtype=np.int64)
                tfs = np.asarray(col_tfs[i], dtype=np.int64)
                dls = np.asarray(col_dls[i], dtype=np.int64)
                pos_lists = (
                    [np.asarray(p, dtype=np.int64) for p in col_pos[i]]
                    if col_pos is not None else None
                )
                out.extend(_encode_rows(int(segs[i]), terms[i], docids, tfs, dls,
                                        pos_lists, max_postings_per_row, block_size))
            yield pd.DataFrame(out)

    return fn


def _manifest_path(out_dir: str, seg: int) -> str:
    return os.path.join(out_dir, "manifests", f"seg_{seg:06d}.json")


def completed_segments(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "manifests")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for n in os.listdir(mdir):
        if n.startswith("seg_") and n.endswith(".json"):
            try:
                with open(os.path.join(mdir, n)) as f:
                    m = json.load(f)
                if m.get("status") == "committed":
                    done.add(int(m["seg"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue
    return done


def build_index(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    *,
    target_docs_per_seg: int = 50_000,
    analyzer: str = "standard",
    store_positions: bool = True,
    max_postings_per_row: int = 250_000,
    block_size: int = BLOCK_SIZE,
    resume: bool = True,
    segs_per_job: int | None = None,
) -> dict:
    """Build (or resume) the index for parquet pages at input_path.

    Returns summary metrics. Layout under out_dir:
      build_plan.json, tokens/seg=k/, postings/seg=k/, docmap/seg=k/,
      manifests/seg_k.json, term_dict/ + stats.json (after merge_index).
    """
    os.makedirs(out_dir, exist_ok=True)
    plan_path = os.path.join(out_dir, "build_plan.json")
    if resume and os.path.exists(plan_path):
        plan = read_build_plan(out_dir)
    else:
        plan = make_build_plan(input_path, target_docs_per_seg)
        write_build_plan(plan, out_dir)

    done = completed_segments(out_dir) if resume else set()
    pending = [s for s in plan.seg_ids() if s not in done]
    t0 = time.time()
    summary = {"n_docs": plan.n_docs, "n_segments": plan.n_segments,
               "built": 0, "skipped": len(done), "wall_s": 0.0}
    if not pending:
        summary["wall_s"] = time.time() - t0
        return summary

    chunk = segs_per_job or len(pending)
    for ci in range(0, len(pending), chunk):
        segs = pending[ci : ci + chunk]
        _build_chunk(spark, plan, segs, out_dir, analyzer, store_positions,
                     max_postings_per_row, block_size)
        summary["built"] += len(segs)
    summary["wall_s"] = time.time() - t0
    return summary


def _build_chunk(spark, plan: BuildPlan, segs: list[int], out_dir: str,
                 analyzer: str, store_positions: bool,
                 max_postings_per_row: int, block_size: int) -> None:
    t0 = time.time()
    paths = [f.path for f in plan.files if f.seg in set(segs)]
    cols = ["url", "lang",
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.row_index").alias("ri")]
    src_schema = spark.read.parquet(paths[0]).schema.fieldNames()
    if "text" in src_schema:
        cols.insert(1, F.col("text"))
    if "html" in src_schema:
        cols.insert(1, F.col("html"))
    pages = spark.read.parquet(*paths).select(*cols)

    tokens = pages.mapInPandas(
        _tokenize_iter(plan.base_by_path(), analyzer, store_positions),
        schema=TOKENS_SCHEMA,
    )
    # forward index (≙ stored fields + term vectors): written once, consumed
    # twice (docmap + postings) without re-tokenizing
    tokens.write.mode("overwrite").partitionBy("seg").parquet(os.path.join(out_dir, "tokens"))

    tok = spark.read.parquet(os.path.join(out_dir, "tokens")).where(F.col("seg").isin(segs))

    # docmap: the is_first flag marks exactly one row per doc → no shuffle
    (tok.where(F.col("is_first"))
        .select("seg", "docid", "url", "lang", "doclen")
        .write.mode("overwrite").partitionBy("seg")
        .parquet(os.path.join(out_dir, "docmap")))

    # postings: one corpus shuffle on (seg, term); group size ≤ seg docs.
    # The partial (map-side) hash aggregation happens JVM-side via
    # collect_list, the docid sort via sort_array on the struct (docid is
    # the first field), and field extraction via transform — only the final
    # blob encode crosses into Python, batched thousands-of-terms per
    # Arrow batch (the Zipf tail of singleton terms makes per-group UDF
    # dispatch far more expensive than the encode math itself).
    plist = F.sort_array(F.collect_list(F.struct("docid", "tf", "doclen", "positions")))
    agg = (tok.where(F.col("term").isNotNull())
           .select("seg", "term", "docid", "tf", "doclen", "positions")
           .groupBy("seg", "term")
           .agg(plist.alias("pl"))
           .select(
               "seg", "term",
               F.expr("transform(pl, s -> s.docid)").alias("docids"),
               F.expr("transform(pl, s -> s.tf)").alias("tfs"),
               F.expr("transform(pl, s -> s.doclen)").alias("dls"),
               F.expr("transform(pl, s -> s.positions)").alias("poss"),
           ))
    (agg.mapInPandas(_encode_batches(max_postings_per_row, block_size, store_positions),
                     schema=POSTINGS_SCHEMA)
        .write.mode("overwrite").partitionBy("seg")
        .parquet(os.path.join(out_dir, "postings")))

    # commit point: per-seg manifest with lineage + metrics (written last)
    stats = {r["seg"]: r for r in (
        spark.read.parquet(os.path.join(out_dir, "postings"))
        .where(F.col("seg").isin(segs))
        .groupBy("seg")
        .agg(F.count("*").alias("posting_rows"),
             F.countDistinct("term").alias("terms"),
             F.sum("df").alias("postings"),
             F.sum(F.length("ids_blob") + F.length("tfs_blob")
                   + F.length("dls_blob") + F.length("positions_blob")).alias("postings_bytes"))
        .collect())}
    docs = {r["seg"]: r["docs"] for r in (
        spark.read.parquet(os.path.join(out_dir, "docmap"))
        .where(F.col("seg").isin(segs))
        .groupBy("seg").agg(F.count("*").alias("docs")).collect())}
    os.makedirs(os.path.join(out_dir, "manifests"), exist_ok=True)
    wall = time.time() - t0
    for seg in segs:
        s = stats.get(seg)
        m = {
            "seg": seg,
            "status": "committed",
            "input_files": [f.path for f in plan.seg_files(seg)],
            "docid_range": [min(f.docid_base for f in plan.seg_files(seg)),
                            max(f.docid_base + f.rows for f in plan.seg_files(seg)) - 1],
            "docs": int(docs.get(seg, 0)),
            "terms": int(s["terms"]) if s else 0,
            "posting_rows": int(s["posting_rows"]) if s else 0,
            "postings": int(s["postings"]) if s else 0,
            "postings_bytes": int(s["postings_bytes"]) if s else 0,
            "wall_ms": int(wall * 1000),
            "attempt": 1,
            "analyzer": analyzer,
            "block_size": block_size,
        }
        mp = _manifest_path(out_dir, seg)
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, mp)  # rename-commit
