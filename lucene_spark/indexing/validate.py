"""CheckIndex analog (reference index/CheckIndex.java:295,589-712): full
distributed integrity scan of an index directory.

Checks, all computed as one Spark pass each (no driver-side loops):
- every posting row decodes; docids strictly increasing; df == len(ids);
  cf == sum(tfs); block metadata consistent (last ids, max tf, min dl)
- per-term global df/cf in term_dict equals the sum over posting rows
- docmap count matches stats.N; avgdl matches
- posting dls agree with docmap doclen (sampled join)
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from .. import BLOCK_SIZE
from ..codec import decode_postings


def _check_rows(block_size: int, keyword_fields: tuple = ("lang", "url")):
    kw_prefixes = tuple(f"{f}:" for f in keyword_fields)

    def fn(batches):
        from ..codec import vbyte_decode

        for pdf in batches:
            bad = []
            for rec in pdf.to_dict("records"):
                errs = []
                try:
                    ids, tfs, dls = decode_postings(rec, block_size)
                    if ids.size != rec["df"]:
                        errs.append("df!=len(ids)")
                    # df-understatement guard: decode_postings trusts df as
                    # the count, so ALSO decode the blob to exhaustion and
                    # require it holds exactly df values
                    all_ids, _ = vbyte_decode(rec["ids_blob"], 0, None)
                    if all_ids.size != rec["df"]:
                        errs.append("blob value count != df")
                    if int(tfs.sum()) != rec["cf"]:
                        errs.append("cf!=sum(tfs)")
                    if ids.size > 1 and not (np.diff(ids) > 0).all():
                        errs.append("ids not strictly increasing")
                    if (tfs <= 0).any():
                        errs.append("tf<=0")
                    if (dls < 0).any():
                        errs.append("dl<0")
                    elif (dls == 0).any() and not (
                            rec["term"] or "").startswith(kw_prefixes):
                        # dl==0 is legal only for keyword-field terms of
                        # empty-text docs; analyzed terms (default field OR
                        # extra analyzed fields) always have dl >= 1
                        errs.append("dl==0 for analyzed term")
                    nb = (ids.size + block_size - 1) // block_size
                    if len(rec["block_last_ids"]) != nb:
                        errs.append("bad block count")
                    elif rec["block_last_ids"][-1] != int(ids[-1]):
                        errs.append("bad block_last_ids")
                    # block-max metadata feeds WAND pruning bounds — an
                    # understated max_tf / overstated min_dl silently drops
                    # valid top-k hits at query time
                    if ids.size and len(rec["block_max_tf"]) == nb:
                        bounds = list(range(0, int(ids.size), block_size))
                        real_max = np.maximum.reduceat(tfs, bounds)
                        real_min = np.minimum.reduceat(dls, bounds)
                        if not (np.asarray(rec["block_max_tf"]) == real_max).all():
                            errs.append("bad block_max_tf")
                        if not (np.asarray(rec["block_min_dl"]) == real_min).all():
                            errs.append("bad block_min_dl")
                    elif len(rec["block_max_tf"]) != nb:
                        errs.append("bad block_max_tf count")
                except Exception as e:  # decode failure is a finding, not a crash
                    errs.append(f"decode error: {e}")
                if errs:
                    bad.append({"seg": rec["seg"], "term": rec["term"],
                                "salt": rec["salt"], "errors": "; ".join(errs)})
            yield pd.DataFrame(bad, columns=["seg", "term", "salt", "errors"])

    return fn


def validate_index(spark: SparkSession, index_dir: str,
                   block_size: int | None = None) -> dict:
    """→ report dict; report['ok'] is the gate. Decodes with the block
    size the index was BUILT with (manifest config) unless overridden."""
    if block_size is None:
        from .build import index_block_size

        block_size = index_block_size(index_dir)
    report: dict = {"ok": True, "violations": []}

    kw: tuple = ("lang", "url")
    stats_path = os.path.join(index_dir, "stats.json")
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            kw = tuple(json.load(f).get("keyword_fields", kw))
    # committed-segment scope: retained compacted partitions (commits.py)
    # and uncommitted concurrent appends must not enter the recount
    from .build import committed_segments

    live = sorted(committed_segments(index_dir))

    def _scoped(df):
        return df.where(F.col("seg").isin(live)) if live else df

    postings = _scoped(
        spark.read.parquet(os.path.join(index_dir, "postings")))
    bad = (postings.mapInPandas(_check_rows(block_size, kw),
                                schema="seg int, term string, salt int, errors string")
           .limit(20).collect())
    if bad:
        report["ok"] = False
        report["violations"].extend(
            {"kind": "postings", **r.asDict()} for r in bad)

    # term_dict totals vs posting rows
    agg = (postings.groupBy("term")
           .agg(F.sum("df").alias("df2"), F.sum("cf").alias("cf2")))
    td = spark.read.parquet(os.path.join(index_dir, "term_dict"))
    mismatch = (td.join(agg, "term", "full_outer")
                .where((F.col("df") != F.col("df2")) | (F.col("cf") != F.col("cf2"))
                       | F.col("df").isNull() | F.col("df2").isNull())
                .limit(20).collect())
    if mismatch:
        report["ok"] = False
        report["violations"].extend(
            {"kind": "term_dict", "term": r["term"]} for r in mismatch)

    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    docmap = _scoped(spark.read.parquet(os.path.join(index_dir, "docmap")))
    row = docmap.agg(F.count("*").alias("N"), F.avg("doclen").alias("avgdl")).collect()[0]
    if int(row["N"]) != stats["N"]:
        report["ok"] = False
        report["violations"].append({"kind": "stats", "field": "N",
                                     "expected": stats["N"], "actual": int(row["N"])})
    if abs(float(row["avgdl"] or 0) - stats["avgdl"]) > 1e-9:
        report["ok"] = False
        report["violations"].append({"kind": "stats", "field": "avgdl"})

    dup = docmap.groupBy("docid").count().where(F.col("count") > 1).limit(5).collect()
    if dup:
        report["ok"] = False
        report["violations"].append({"kind": "docmap", "field": "duplicate docids",
                                     "examples": [int(r["docid"]) for r in dup]})
    return report
