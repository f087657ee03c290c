"""IndexReader — handle to an on-disk index (reference IndexReader /
IndexSearcher split: stats + dictionary live on the driver side as cheap
lookups; postings stay distributed)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.N: int = self.stats["N"]
        self.avgdl: float = self.stats["avgdl"]
        # the analyzer the index was built with — query text must run
        # through the SAME chain (reference QueryParser.java:513)
        self.analyzer: str = self.stats.get("analyzer", "standard")
        # extra ANALYZED fields (multi-field model): per-field avgdl for
        # BM25 length normalization (per-field norms)
        self.analyzed_fields: tuple = tuple(self.stats.get("analyzed_fields", []))
        self.avgdl_fields: dict = self.stats.get("avgdl_fields", {})
        self.keyword_fields: tuple = tuple(
            self.stats.get("keyword_fields", ["lang", "url"]))
        # PerFieldAnalyzerWrapper analog: per-field analyzer names for the
        # extra ANALYZED fields (analysis/PerFieldAnalyzerWrapper.java:47);
        # fields absent here use the index default
        self.field_analyzers: dict = self.stats.get("field_analyzers", {})
        # point-in-time segment set (NRT reopen contract — see _snapshot);
        # None (no manifests dir: pre-manifest layouts) → read everything
        from .build import committed_segments

        committed = committed_segments(index_dir)
        self._committed: list[int] | None = (
            sorted(committed)
            if os.path.isdir(os.path.join(index_dir, "manifests"))
            else None)

    # --- distributed tables (DataFrame handles cached so repeated queries
    # reuse the same logical plan + file listing; the data itself stays on
    # disk — Parquet column pruning / predicate pushdown do the seeking) ----
    def _snapshot(self, df: DataFrame) -> DataFrame:
        """Pin the reader to the segments COMMITTED at open time — the
        reference's point-in-time reader semantics (segments_N snapshot,
        index/IndexWriter.java:386 getReader / IndexReader reopen): a
        segment directory written by a concurrent append is invisible until
        its manifest rename-commits, and segments committed AFTER this
        reader opened stay invisible until a reopen (a new IndexReader).
        seg is the partition column, so the filter is pure partition
        pruning."""
        if self._committed is None:
            return df
        return df.where(F.col("seg").isin(self._committed))

    def postings(self) -> DataFrame:
        if not hasattr(self, "_postings"):
            self._postings = self._snapshot(self.spark.read.parquet(
                os.path.join(self.index_dir, "postings")))
        return self._postings

    def docmap(self) -> DataFrame:
        if not hasattr(self, "_docmap"):
            self._docmap = self._snapshot(self.spark.read.parquet(
                os.path.join(self.index_dir, "docmap")))
        return self._docmap

    def term_dict(self) -> DataFrame:
        if not hasattr(self, "_term_dict"):
            self._term_dict = self.spark.read.parquet(
                os.path.join(self.index_dir, "term_dict"))
        return self._term_dict

    def tokens(self) -> DataFrame:
        """Forward index (term vectors analog)."""
        return self._snapshot(self.spark.read.parquet(
            os.path.join(self.index_dir, "tokens")))

    # --- driver-side lookups (query planning) --------------------------------
    def doc_freqs(self, terms: list[str]) -> dict[str, int]:
        """Global df per query term — the two-phase Weight stats binding
        (reference search/Weight.java:49-103: idf uses GLOBAL stats so every
        shard scores identically; ours: one pushed-down dictionary probe)."""
        if not terms:
            return {}
        from ..queries.planner import _terms_pred

        rows = (self.term_dict()
                .where(_terms_pred(sorted(set(terms))))
                .select("term", "df").collect())
        return {r["term"]: int(r["df"]) for r in rows}

    def expand_terms(self, kind: str, arg, limit: int = 1024) -> list[str]:
        return [t for t, _df in self.expand_terms_with_df(kind, arg, limit)]

    def expand_terms_with_df(self, kind: str, arg,
                             limit: int = 1024) -> list[tuple[str, int]]:
        """MultiTermQuery enumeration against the dictionary
        (reference search/MultiTermQuery.java:98-146; FilteredTermEnum).
        kind: 'prefix' | 'wildcard_regex' | 'range'. Pushed down to the
        parquet dictionary scan where the predicate allows. Returns
        (term, df) pairs — the SAME scan that enumerates also binds each
        term's global df, so the planner never re-probes the dictionary
        with a 1024-literal IN list (that second probe and its giant In
        expression used to cost more than the kernel stage itself)."""
        td = self.term_dict()
        if kind == "prefix":
            df = td.where(F.col("term").startswith(arg))
            unfielded = ":" not in arg
        elif kind == "wildcard_regex":
            df = td.where(F.col("term").rlike(arg))
            unfielded = ":" not in arg
        elif kind == "range":
            lo, hi, inc_lo, inc_hi = arg
            df = td
            if lo is not None:
                df = df.where(F.col("term") >= lo if inc_lo else F.col("term") > lo)
            if hi is not None:
                df = df.where(F.col("term") <= hi if inc_hi else F.col("term") < hi)
            unfielded = not any(b and ":" in b for b in (lo, hi))
        else:
            raise ValueError(kind)
        if unfielded:
            # default-field enumeration must not sweep up other fields'
            # namespaced "field:term" entries (e.g. prefix 'u*' matching
            # every df=1 'url:...' keyword term and dominating the top-k)
            df = df.where(~F.col("term").contains(":"))
        # reference caps BooleanQuery at 1024 clauses (search/BooleanQuery.java:34)
        return [(r["term"], int(r["df"])) for r in
                df.select("term", "df").orderBy("term").limit(limit).collect()]

    def all_terms(self) -> list[str]:
        return [r["term"] for r in self.term_dict().select("term").orderBy("term").collect()]
