"""Query planner: AST → DataFrame plan over the index tables.

The distributed plan is the reference's sharded search made explicit
(search/MultiSearcher.java:305-330 — the only place the reference crosses a
node boundary):

  stage 1  bind global stats: dictionary probe for query-term df
           (pushed-down parquet filter; tiny collect → closure capture)
  stage 2  rewrite MultiTermQueries against the dictionary
           (search/MultiTermQuery.java:98-146 → scoring boolean disjunction)
  stage 3  postings.filter(term ∈ qterms)  — predicate + partition pruning
           → groupBy(seg).applyInPandas(segment_topk kernel)
  stage 4  global orderBy(score desc, docid asc).limit(k)
           — Spark's TakeOrderedAndProject IS the distributed bounded heap
             (reference HitQueue merge, MultiSearcher.java:204-249)

No collect() of posting data ever reaches the driver; only the final k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..indexing.reader import IndexReader
from ..scoring import wildcard_to_regex
from .ast import (
    Bool,
    ConstantScore,
    DisjunctionMax,
    Fuzzy,
    MatchAll,
    Phrase,
    Prefix,
    Query,
    Term,
    Wildcard,
)
from .kernel import Ctx, segment_topk
from .parser import parse_query

MAX_CLAUSES = 1024  # reference BooleanQuery.maxClauseCount (search/BooleanQuery.java:34)


class Searcher:
    def __init__(self, reader: IndexReader):
        self.reader = reader

    # ------------------------------------------------------------------ #
    def rewrite(self, q: Query) -> Query:
        """Expand MultiTermQueries against the term dictionary (pinned
        rewrite mode: scoring boolean disjunction)."""
        if isinstance(q, Prefix):
            terms = self.reader.expand_terms("prefix", q.prefix, MAX_CLAUSES)
            return Bool(should=[Term(t) for t in terms], boost=q.boost)
        if isinstance(q, Wildcard):
            rx = wildcard_to_regex(q.pattern)
            terms = self.reader.expand_terms("wildcard_regex", rx, MAX_CLAUSES)
            return Bool(should=[Term(t) for t in terms], boost=q.boost)
        if isinstance(q, Fuzzy):
            terms = self._expand_fuzzy(q)
            return Bool(should=[Term(t) for t in terms], boost=q.boost)
        if isinstance(q, Bool):
            return Bool(
                must=[self.rewrite(c) for c in q.must],
                should=[self.rewrite(c) for c in q.should],
                must_not=[self.rewrite(c) for c in q.must_not],
                min_should=q.min_should,
                boost=q.boost,
            )
        if isinstance(q, DisjunctionMax):
            return DisjunctionMax([self.rewrite(c) for c in q.queries],
                                  q.tie_breaker, q.boost)
        if isinstance(q, ConstantScore):
            return ConstantScore(self.rewrite(q.query), q.boost)
        return q

    def _expand_fuzzy(self, q: Fuzzy) -> list[str]:
        """FuzzyTermEnum (search/FuzzyTermEnum.java:95): dictionary scan with
        length + prefix pre-filters pushed to parquet, exact Levenshtein on
        the survivors via the JVM-side levenshtein() function."""
        td = self.reader.term_dict()
        cond = (F.length("term") >= len(q.term) - q.max_edits) & (
            F.length("term") <= len(q.term) + q.max_edits
        )
        if q.prefix_length:
            cond = cond & F.col("term").startswith(q.term[: q.prefix_length])
        rows = (
            td.where(cond)
            .where(F.levenshtein(F.col("term"), F.lit(q.term)) <= q.max_edits)
            .select("term").orderBy("term").limit(MAX_CLAUSES).collect()
        )
        return [r["term"] for r in rows]

    # ------------------------------------------------------------------ #
    def search(self, query: Query | str, k: int = 10, hydrate: bool = False) -> DataFrame:
        """→ DataFrame(docid long, score double[, url, lang]) — global top-k,
        tie-break docid asc."""
        q = parse_query(query) if isinstance(query, str) else query
        q = self.rewrite(q)

        if isinstance(q, MatchAll):
            out = (self.reader.docmap()
                   .select("docid", F.lit(float(q.boost)).alias("score"))
                   .orderBy(F.asc("docid")).limit(k))
            return self._hydrate(out) if hydrate else out

        terms = sorted(set(q.terms()))
        if not terms:
            return self._empty()
        dfs = self.reader.doc_freqs(terms)
        if not dfs:
            return self._empty()
        ctx = Ctx(self.reader.N, self.reader.avgdl, dfs, k)

        qterms = [t for t in terms if t in dfs]
        rows = self.reader.postings().where(F.col("term").isin(qterms))

        def run(pdf):
            return segment_topk(pdf, q, ctx)

        per_seg = rows.groupBy("seg").applyInPandas(run, schema="docid long, score double")
        out = per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        return self._hydrate(out) if hydrate else out

    def count(self, query: Query | str) -> int:
        """Total hits (reference TopDocs.totalHits)."""
        q = parse_query(query) if isinstance(query, str) else query
        q = self.rewrite(q)
        if isinstance(q, MatchAll):
            return self.reader.N
        terms = sorted(set(q.terms()))
        dfs = self.reader.doc_freqs(terms)
        ctx = Ctx(self.reader.N, self.reader.avgdl, dfs, k=1 << 62)
        rows = self.reader.postings().where(F.col("term").isin(list(dfs)))

        def run(pdf):
            return segment_topk(pdf, q, ctx)

        return rows.groupBy("seg").applyInPandas(run, schema="docid long, score double").count()

    # ------------------------------------------------------------------ #
    def _hydrate(self, topk: DataFrame) -> DataFrame:
        """Join url/lang back — broadcast the k-row side into the docmap scan
        (the reference's stored-field fetch after scoring)."""
        dm = self.reader.docmap().select("docid", "url", "lang")
        return (dm.join(F.broadcast(topk), "docid", "inner")
                .select("docid", "score", "url", "lang")
                .orderBy(F.desc("score"), F.asc("docid")))

    def _empty(self) -> DataFrame:
        return self.reader.spark.createDataFrame([], schema="docid long, score double")
