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
    Boosting,
    ConstantScore,
    DisjunctionMax,
    Fuzzy,
    MatchAll,
    PayloadNear,
    PayloadTerm,
    Phrase,
    Prefix,
    Query,
    Regexp,
    SpanFirst,
    SpanMask,
    SpanMulti,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    Term,
    TermRange,
    Wildcard,
)
from .kernel import Ctx
from .parser import parse_query

MAX_CLAUSES = 1024  # reference BooleanQuery.maxClauseCount (search/BooleanQuery.java:34)


def _needs_payloads(q) -> bool:
    """True iff the query tree (or any tree in a list/dict of them) holds a
    payload-scoring node — the only consumers of the payloads_blob column.
    Generic dataclass walk so new composite nodes are covered by default."""
    from dataclasses import fields as _dfields

    if q is None:
        return False
    if isinstance(q, (list, tuple, dict)):
        vals = q.values() if isinstance(q, dict) else q
        return any(_needs_payloads(c) for c in vals)
    if isinstance(q, (PayloadTerm, PayloadNear)):
        return True
    if not isinstance(q, Query):
        return False
    return any(_needs_payloads(getattr(q, f.name)) for f in _dfields(q))


# ConstantScoreAutoRewrite cutoffs (search/MultiTermQuery.java:382-386):
# ≥350 enumerated terms, or visited df ≥ 0.1 % of maxDoc → filter rewrite
AUTO_TERM_CUTOFF = 350
AUTO_DOC_COUNT_PERCENT = 0.1

_MULTITERM = (Prefix, Wildcard, Fuzzy, Regexp, TermRange)


def _terms_pred(terms: list[str]):
    """`term IN (...)` as ONE JVM-parsed expression. Column.isin(1024 terms)
    makes a py4j round trip per literal (~0.7 s of driver time for a full
    MultiTermQuery expansion); a single SQL string costs one."""
    quoted = ",".join(
        "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"
        for t in terms)
    return F.expr(f"term IN ({quoted})")


def terms_filter(field: str, values: list[str]) -> Query:
    """contrib TermsFilter (contrib/queries/.../TermsFilter.java): docs
    containing ANY of the given NOT_ANALYZED field values, as a
    score-neutral filter clause (constant score 0 — FilteredQuery's filter
    side contributes nothing). Compose into Bool.must alongside the scored
    query."""
    return ConstantScore(
        Bool(should=[Term(f"{field}:{v}") for v in values]), boost=0.0)


def boolean_filter(must: list[Query] | None = None,
                   should: list[Query] | None = None,
                   must_not: list[Query] | None = None) -> Query:
    """contrib BooleanFilter (contrib/queries/.../BooleanFilter.java):
    boolean algebra over filters, itself score-neutral."""
    return ConstantScore(Bool(must=list(must or []), should=list(should or []),
                              must_not=list(must_not or [])), boost=0.0)


def chained_filter(filters: list[Query],
                   logic: str | list[str] = "or") -> Query:
    """contrib ChainedFilter (contrib/misc/.../ChainedFilter.java:99-199):
    left-fold the filter chain with a logical op — one op for the whole
    chain or one per filter. Ops: or / and / andnot / xor. Reference seed
    rules (ChainedFilter.java:127-150 initialResult): the first AND seeds
    with the first filter's set, the first ANDNOT with its complement;
    OR/XOR start from the empty set (∅∪f=f, ∅⊕f=f). XOR is the iterative
    symmetric difference — over n filters that is PARITY membership, which
    the fold reproduces via nested score-neutral Bools. Result composes
    into Bool.must like every other filter (constant score 0)."""
    ops = ([logic] * len(filters) if isinstance(logic, str) else list(logic))
    if len(ops) != len(filters):
        raise ValueError("Invalid number of elements in logic array")
    bad = {o for o in ops if o not in ("or", "and", "andnot", "xor")}
    if bad or not filters:
        raise ValueError(f"chained_filter: bad ops {sorted(bad)}"
                         if bad else "chained_filter: empty chain")

    def f_and(acc, f):
        return Bool(must=[acc, f])

    def f_or(acc, f):
        return Bool(should=[acc, f])

    def f_andnot(acc, f):
        return Bool(must=[acc], must_not=[f])

    def f_xor(acc, f):
        return Bool(should=[Bool(must=[acc], must_not=[f]),
                            Bool(must=[f], must_not=[acc])])

    step = {"or": f_or, "and": f_and, "andnot": f_andnot, "xor": f_xor}
    # the fold tracks complements symbolically (De Morgan push-down) so the
    # final query is pure-positive whenever possible; a residual complement
    # is materialized as exactly Bool(must=[MatchAll], must_not=[pos]) at
    # the TOP of the filter, which Searcher.rewrite folds into the
    # enclosing conjunction's must_not (the kernel never sees MatchAll)
    if ops[0] == "and":
        acc, neg, start = filters[0], False, 1
    elif ops[0] == "andnot":
        acc, neg, start = filters[0], True, 1   # acc ≡ ¬f0
    else:
        acc, neg, start = None, False, 0
    for i in range(start, len(filters)):
        f = filters[i]
        if acc is None:
            acc = f                             # ∅∪f = ∅⊕f = f
        elif not neg:
            acc = step[ops[i]](acc, f)
        else:                                   # acc holds a, value is ¬a
            if ops[i] == "or":                  # ¬a ∪ f = ¬(a ∖ f)
                acc = Bool(must=[acc], must_not=[f])
            elif ops[i] == "and":               # ¬a ∩ f = f ∖ a
                acc, neg = Bool(must=[f], must_not=[acc]), False
            elif ops[i] == "andnot":            # ¬a ∖ f = ¬(a ∪ f)
                acc = Bool(should=[acc, f])
            else:                               # ¬a ⊕ f = ¬(a ⊕ f)
                acc = f_xor(acc, f)
    if neg:
        acc = Bool(must=[MatchAll()], must_not=[acc])
    return ConstantScore(acc, boost=0.0)


def _residual_complement(q: Query):
    """(excluded_clauses, uniform_score) when ``q`` is the residual
    complement shape ``Bool(must=[MatchAll], must_not=Xs)`` — bare or
    ConstantScore-wrapped — else None. This is "everything except Xs":
    chained_filter's irreducible form, and what ``* AND NOT x`` parses to.
    The kernel never evaluates MatchAll (it has no postings row to ride),
    so every consumer must plan this shape set-algebraically."""
    boost = None
    if isinstance(q, ConstantScore):
        boost, q = q.boost, q.query
    if (isinstance(q, Bool) and not q.should and len(q.must) == 1
            and isinstance(q.must[0], MatchAll) and q.must_not):
        score = boost if boost is not None else q.must[0].boost * q.boost
        return list(q.must_not), float(score)
    return None


class Searcher:
    def __init__(self, reader: IndexReader, similarity=None):
        """`similarity`: a scoring.Similarity instance or registered name
        ('bm25' default, 'classic', 'sweetspot') — the pluggable seam of
        search/Similarity.java:527. The strategy rides the Ctx into the
        kernel workers, so EVERY scorer shape (term/bool/phrase/span) and
        the MaxScore bounds use it; the contract surface stays BM25."""
        from ..scoring import similarity_by_name

        self.reader = reader
        self.similarity = similarity_by_name(similarity)
        # per-searcher df cache: the index snapshot is immutable, so a term's
        # global df never changes under this reader. MultiTermQuery
        # enumeration fills it as a side effect (expand_terms_with_df), so
        # e.g. a 1024-term prefix expansion never re-probes the dictionary.
        self._df_cache: dict[str, int] = {}
        # cached per-searcher plan constants: each conf.get is a py4j
        # round-trip, and the per-query latency budget is ~0.35 s total
        self._shuffle_parts = int(self.reader.spark.conf.get(
            "spark.sql.shuffle.partitions", "200"))

    # --- constant kernel UDFs (created once, reused every query) ----------
    # groupBy(...).applyInPandas(closure) re-registers a fresh pandas UDF
    # per call — cloudpickle + ~15 py4j round-trips ≈ 0.17 s of pure driver
    # latency per query. Instead the three kernels are CONSTANT GROUPED_MAP
    # UDFs (registered once per searcher, judf cached by pyspark) and the
    # per-query payload (query AST + Ctx) rides a tiny pickled binary
    # literal column `_job` — the same channel a real serving tier would
    # use (query plans are data, not code). Posting rows per query are few
    # (terms × segs × salts), so the repeated literal is KBs, not MBs.
    @staticmethod
    def _apply_grouped(rows: DataFrame, udf) -> DataFrame:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # GroupedData.apply deprecation
            return rows.groupBy("seg").apply(udf)

    @property
    def _topk_udf(self):
        if not hasattr(self, "_topk_udf_c"):
            import pickle

            from pyspark.sql.functions import PandasUDFType, pandas_udf

            from .kernel import segment_topk as _topk

            import zlib

            bs = int(self.reader.block_size)

            @pandas_udf("docid long, score double", PandasUDFType.GROUPED_MAP)
            def run(pdf):
                q, ctx = pickle.loads(zlib.decompress(bytes(pdf["_job"].iloc[0])))
                return _topk(pdf, q, ctx, bs)

            self._topk_udf_c = run
        return self._topk_udf_c

    @property
    def _many_udf(self):
        if not hasattr(self, "_many_udf_c"):
            import pickle

            from pyspark.sql.functions import PandasUDFType, pandas_udf

            from .kernel import segment_topk_many as _many

            import zlib

            bs = int(self.reader.block_size)

            @pandas_udf("qid string, docid long, score double",
                        PandasUDFType.GROUPED_MAP)
            def run(pdf):
                qs, ctx_by = pickle.loads(
                    zlib.decompress(bytes(pdf["_job"].iloc[0])))
                return _many(pdf, qs, ctx_by, bs)

            self._many_udf_c = run
        return self._many_udf_c

    @property
    def _filter_udf(self):
        if not hasattr(self, "_filter_udf_c"):
            import pickle

            from pyspark.sql.functions import PandasUDFType, pandas_udf

            from .kernel import segment_filter_ids as _fids

            import zlib

            bs = int(self.reader.block_size)

            @pandas_udf("docid long, score double", PandasUDFType.GROUPED_MAP)
            def run(pdf):
                k, boost = pickle.loads(
                    zlib.decompress(bytes(pdf["_job"].iloc[0])))
                return _fids(pdf, k, boost, bs)

            self._filter_udf_c = run
        return self._filter_udf_c

    @property
    def _explain_udf(self):
        if not hasattr(self, "_explain_udf_c"):
            import pickle

            from pyspark.sql.functions import PandasUDFType, pandas_udf

            from .kernel import EXPLAIN_SCHEMA, segment_explain as _sx

            import zlib

            bs = int(self.reader.block_size)

            @pandas_udf(EXPLAIN_SCHEMA, PandasUDFType.GROUPED_MAP)
            def run(pdf):
                q, ctx = pickle.loads(
                    zlib.decompress(bytes(pdf["_job"].iloc[0])))
                return _sx(pdf, q, ctx, bs)

            self._explain_udf_c = run
        return self._explain_udf_c

    @property
    def _payx_udf(self):
        if not hasattr(self, "_payx_udf_c"):
            import pickle

            from pyspark.sql.functions import PandasUDFType, pandas_udf

            from .kernel import segment_payload_values as _payx

            import zlib

            bs = int(self.reader.block_size)

            @pandas_udf("docid long, payload double",
                        PandasUDFType.GROUPED_MAP)
            def run(pdf):
                units = pickle.loads(zlib.decompress(bytes(pdf["_job"].iloc[0])))
                return _payx(pdf, units, bs)

            self._payx_udf_c = run
        return self._payx_udf_c

    @staticmethod
    def _with_job(rows: DataFrame, payload) -> DataFrame:
        """Attach the pickled (query, ctx) payload as a literal column.
        zlib keeps the per-row copy small — the column rides the kernel
        exchange, whose row count is bounded by query terms × segments ×
        salt splits (a few KB × that; for a 10k-segment corpus a term
        query shuffles ~10-50k rows, so the compressed payload adds ~10 MB
        worst-case to an exchange that is already that order — acceptable,
        and single-digit KB at test scale)."""
        import pickle
        import zlib

        return rows.withColumn(
            "_job",
            F.lit(bytearray(zlib.compress(pickle.dumps(payload), 1))))

    def _doc_freqs(self, terms: list[str]) -> dict[str, int]:
        """Global df per term, served from the searcher cache where bound."""
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            self._df_cache.update(self.reader.doc_freqs(missing))
        return {t: self._df_cache[t] for t in terms if t in self._df_cache}

    # target matched-postings rows per kernel task: each task's Arrow
    # round-trip + Python-worker dispatch costs ~10-20 ms, so a single-term
    # query over a many-segment index must NOT pay one task per segment
    # (26 tasks of 1 row each measured ~2x the latency of 4 tasks of 7)
    _ROWS_PER_KERNEL_TASK = 8

    def _kernel_rows(self, rows: DataFrame, n_terms: int | None = None
                     ) -> DataFrame:
        """Partition the kernel input by seg with an EXPLICIT partition
        count. AQE's coalescing (1 MB floor) would merge this small shuffle
        (a few hundred KB of posting blobs at test scale) into one
        partition and serialize every per-segment Python kernel onto a
        single worker; a user-specified repartition count is exempt from
        coalescing, and HashPartitioning(seg) already satisfies the
        downstream groupBy("seg") so no second exchange appears.

        `n_terms` (the planner's matched-dictionary term count) sizes the
        shuffle to the WORK: the kernel input has at most n_terms rows per
        segment (plus salt splits + side-cars), so a 1-term query over a
        26-segment index gets ~4 partitions, not 26 near-empty tasks,
        while a 1024-term expansion keeps full parallelism. At cluster
        scale the same estimate scales the task count with query breadth
        instead of pinning it to the (much larger) segment count."""
        n_segs = int(self.reader.stats.get("n_segments", 0) or 0)
        sp = self._shuffle_parts
        parts = max(1, min(n_segs or sp, sp))
        if n_terms is not None:
            est_rows = max(1, n_terms) * max(1, n_segs)
            parts = min(parts, max(1, -(-est_rows // self._ROWS_PER_KERNEL_TASK)))
        return rows.repartition(parts, "seg")

    # ------------------------------------------------------------------ #
    def _postings_for(self, pred, q=None) -> DataFrame:
        """Pushed-down postings scan for the query's terms, with the
        payload column PRUNED whenever the query tree holds no
        payload-scoring node: parquet is columnar, so a plain query over a
        payload-bearing index reads zero payload bytes (ReadSchema excludes
        payloads_blob — the reference equivalent is that .prx payload bytes
        are only read through getPayload, never on the docs/freqs path)."""
        rows = self.reader.postings().where(pred)
        if "payloads_blob" in rows.columns and not _needs_payloads(q):
            rows = rows.drop("payloads_blob")
        return rows

    def _with_deleted(self, rows: DataFrame) -> DataFrame:
        """Union the side-car rows into the kernel input: tombstones so
        each segment kernel can subtract its deleted set (the per-segment
        .del bitmap, util/BitVector.java:35; indexing/deletes.py), and the
        norms rows carrying index-time document boosts (the .nrm analog,
        index/NormsWriter.java:61; indexing/norms.py). Both ride the
        postings IO path and shuffle on seg with the query rows."""
        from ..indexing.deletes import deleted_rows
        from ..indexing.norms import norms_rows

        for side in (deleted_rows(self.reader.spark, self.reader.index_dir),
                     norms_rows(self.reader.spark, self.reader.index_dir)):
            if side is not None:
                # payload indexes carry payloads_blob on postings rows;
                # side-cars stay on the base schema (their slot fills NULL)
                rows = rows.unionByName(side, allowMissingColumns=True)
        return rows

    def _live_docmap(self) -> DataFrame:
        from ..indexing.deletes import deleted_docids

        dd = deleted_docids(self.reader.spark, self.reader.index_dir)
        dm = self.reader.docmap()
        return dm if dd is None else dm.join(dd.select("docid"), "docid", "left_anti")

    def parse(self, query: str, lang: str | None = None) -> Query:
        """Parse query text with the index's own analyzer
        (reference QueryParser.java:513); field-scoped syntax resolves
        against the index's extra ANALYZED fields. For a ``by_lang``
        (per-document routed) index the query string carries no lang
        column, so ``lang=`` picks the query-time chain — ISO code or
        chain name, default standard — the same resolution rule
        analyze_by_lang applies per document."""
        analyzer = self.reader.analyzer
        if analyzer == "by_lang" or lang is not None:
            from ..lang import LANG_CHAINS, LANG_CODES
            name = LANG_CODES.get((lang or "").lower(), (lang or "").lower())
            analyzer = name if name in LANG_CHAINS else "standard"
        af = self.reader.analyzed_fields
        if self.reader.field_analyzers:
            # dict form: field → its own analyzer chain (PerFieldAnalyzer)
            af = {f: self.reader.field_analyzers.get(f, analyzer)
                  for f in af}
        return parse_query(query, analyzer=analyzer,
                           analyzed_fields=af,
                           keyword_fields=self.reader.keyword_fields)

    def _flt_analyze(self, fld: str, text: str) -> list[str]:
        """FuzzyLikeThis source-term analysis: the index's own chain for
        the default field, the per-field chain (PerFieldAnalyzerWrapper)
        for extra fields, terms namespaced field:term."""
        from .parser import _analyze_pairs
        if fld in ("", "text"):
            return [t for t, _p in _analyze_pairs(text, self.reader.analyzer)]
        an = (self.reader.field_analyzers or {}).get(fld, self.reader.analyzer)
        return [f"{fld}:{t}" for t, _p in _analyze_pairs(text, an)]

    def search_surround(self, query: str, k: int = 10) -> DataFrame:
        """Surround proximity-DSL search (contrib/surround — W/N distance
        operators over the span algebra; queries/surround.py)."""
        from .surround import parse_surround
        return self.search(parse_surround(query), k=k)

    def search_precedence(self, query: str, k: int = 10) -> DataFrame:
        """Precedence-grammar search (contrib/misc PrecedenceQueryParser:
        AND binds tighter than OR; queries/parser.py parse_precedence)."""
        from .parser import parse_precedence

        af = self.reader.analyzed_fields
        if self.reader.field_analyzers:
            af = {f: self.reader.field_analyzers.get(f, self.reader.analyzer)
                  for f in af}
        return self.search(parse_precedence(
            query, analyzer=self.reader.analyzer, analyzed_fields=af,
            keyword_fields=self.reader.keyword_fields), k=k)

    def search_complex_phrase(self, query: str, k: int = 10) -> DataFrame:
        """Complex-phrase search (contrib/misc ComplexPhraseQueryParser:
        phrases may embed wildcards/fuzzies/(a b) groups/-negatives and
        rewrite to span queries; queries/parser.py parse_complex_phrase)."""
        from .parser import parse_complex_phrase

        af = self.reader.analyzed_fields
        if self.reader.field_analyzers:
            af = {f: self.reader.field_analyzers.get(f, self.reader.analyzer)
                  for f in af}
        return self.search(parse_complex_phrase(
            query, analyzer=self.reader.analyzer, analyzed_fields=af,
            keyword_fields=self.reader.keyword_fields), k=k)

    def search_xml(self, xml: str, k: int = 10) -> DataFrame:
        """XML-dialect search (contrib/xml-query-parser CoreParser analog;
        queries/xmlparser.py). A top-level FilteredQuery with a
        DuplicateFilter routes to search_dedup (one doc per key value)."""
        from .xmlparser import XmlDedup, parse_xml
        q = parse_xml(xml, analyzer=self.reader.analyzer)
        if isinstance(q, XmlDedup):
            return self.search_dedup(q.query, key=q.key, k=k, keep=q.keep)
        return self.search(q, k=k)

    # ------------------------------------------------------------------ #
    def rewrite(self, q: Query) -> Query:
        """Expand MultiTermQueries against the term dictionary, honouring
        each node's rewrite_method (search/MultiTermQuery.java:63-146;
        default pinned to the scoring boolean disjunction)."""
        if isinstance(q, _MULTITERM):
            return self._rewrite_multiterm(q)
        from .flt import FuzzyLikeThis, resolve_fuzzy_like_this
        if isinstance(q, FuzzyLikeThis):
            # contrib FuzzyLikeThisQuery rewrite (contrib/queries/.../
            # FuzzyLikeThisQuery.java:254-316): shared resolver, fed the
            # pushed-down dictionary enumeration; df probes fill the
            # searcher cache so the later stats bind re-uses them
            def enum(fq):
                pairs = self._expand_fuzzy_with_df(fq)
                self._df_cache.update(pairs)
                return pairs

            return resolve_fuzzy_like_this(
                q, enum, lambda t: self._doc_freqs([t]).get(t, 0),
                self.reader.N, self._flt_analyze)
        if isinstance(q, Bool):
            # complement-filter elimination: a score-neutral must clause of
            # exactly the shape ConstantScore(Bool(must=[MatchAll],
            # must_not=Xs), 0) — chained_filter's residual-complement form —
            # is the set "everything except Xs"; inside a conjunction that
            # is just the enclosing Bool's must_not (score unchanged: the
            # clause contributed a constant 0). Keeps MatchAll out of the
            # kernel, which plans it as a docmap scan only at top level.
            must, must_not = [], []
            for c in q.must:
                rc = _residual_complement(c)
                if rc is not None and rc[1] == 0.0:
                    must_not.extend(rc[0])
                elif rc is not None:
                    raise ValueError(
                        "a scoring complement filter (uniform score "
                        f"{rc[1]}) cannot be a MUST clause beside other "
                        "clauses; wrap it score-neutral "
                        "(ConstantScore(..., 0)) or query it top-level")
                else:
                    must.append(c)
            for c in q.must_not:
                rc = _residual_complement(c)
                if rc is not None:
                    # NOT(everything except Xs) ≡ doc ∈ OR(Xs): a
                    # score-neutral requirement (must_not never scores)
                    must.append(ConstantScore(Bool(should=rc[0]), 0.0))
                else:
                    must_not.append(c)
            for c in q.should:
                if _residual_complement(c) is not None:
                    # fail on the DRIVER with a actionable message instead
                    # of a MatchAll ValueError inside a Python worker
                    raise ValueError(
                        "complement filters (Bool(must=[MatchAll], "
                        "must_not=...)) are not supported as SHOULD "
                        "clauses; use them as filters (must/must_not) or "
                        "at the top level")
            return Bool(
                must=[self.rewrite(c) for c in must],
                should=[self.rewrite(c) for c in q.should],
                must_not=[self.rewrite(c) for c in must_not],
                min_should=q.min_should,
                boost=q.boost,
            )
        if isinstance(q, DisjunctionMax):
            return DisjunctionMax([self.rewrite(c) for c in q.queries],
                                  q.tie_breaker, q.boost)
        if isinstance(q, ConstantScore):
            return ConstantScore(self.rewrite(q.query), q.boost)
        if isinstance(q, Boosting):
            return Boosting(self.rewrite(q.match), self.rewrite(q.context),
                            q.demote, q.boost)
        if isinstance(q, SpanMulti):
            # SpanMultiTermQueryWrapper: expand the wrapped MultiTermQuery,
            # lift the resulting term set into a SpanOr of SpanTerms
            inner = self.rewrite(q.query)
            terms = ([c.term for c in inner.should if isinstance(c, Term)]
                     if isinstance(inner, Bool) else inner.terms())
            return SpanOr([SpanTerm(t) for t in terms], boost=q.boost)
        if isinstance(q, SpanNear):
            return SpanNear([self.rewrite(c) for c in q.clauses],
                            q.slop, q.in_order, q.boost)
        if isinstance(q, SpanOr):
            return SpanOr([self.rewrite(c) for c in q.clauses], q.boost)
        if isinstance(q, SpanNot):
            return SpanNot(self.rewrite(q.include), self.rewrite(q.exclude),
                           q.boost)
        if isinstance(q, SpanFirst):
            return SpanFirst(self.rewrite(q.match), q.end, q.boost)
        if isinstance(q, SpanMask):
            return SpanMask(self.rewrite(q.inner), q.field, q.boost)
        return q

    def _rewrite_multiterm(self, q: Query) -> Query:
        """One MultiTermQuery node → its rewrite-mode expansion:
        scoring_boolean → scored SHOULD disjunction (pinned default);
        constant-score family → ConstantScore wrapper (uniform score =
        boost); constant_score_auto resolves by the reference cutoffs.
        Top-level constant_score_filter nodes never reach here — search()
        plans them as a pushed-down postings predicate with no enumeration
        and no clause cap (_multiterm_filter_topk)."""
        from .ast import REWRITE_AUTO, REWRITE_SCORING

        mode = getattr(q, "rewrite_method", REWRITE_SCORING)
        terms = self._enumerate_multiterm(q)
        if mode == REWRITE_AUTO:
            dfs = self._doc_freqs(terms)
            mode = ("constant_score_filter"
                    if len(terms) >= AUTO_TERM_CUTOFF
                    or sum(dfs.values()) >= (AUTO_DOC_COUNT_PERCENT / 100.0
                                             * self.reader.N)
                    else "constant_score_boolean")
        if mode == REWRITE_SCORING:
            return Bool(should=[Term(t) for t in terms], boost=q.boost)
        return ConstantScore(Bool(should=[Term(t) for t in terms]),
                             boost=q.boost)

    def _enumerate_multiterm(self, q: Query) -> list[str]:
        """FilteredTermEnum analog: matching dictionary terms, ≤MAX_CLAUSES."""
        if isinstance(q, Prefix):
            pairs = self.reader.expand_terms_with_df(
                "prefix", q.prefix, MAX_CLAUSES)
        elif isinstance(q, Wildcard):
            # raw pattern: the reader's RAM path applies the constant-prefix
            # cut + the (Python==Java) wildcard regex subset itself
            pairs = self.reader.expand_terms_with_df(
                "wildcard", q.pattern, MAX_CLAUSES)
        elif isinstance(q, Fuzzy):
            pairs = self._expand_fuzzy_with_df(q)
        elif isinstance(q, Regexp):
            # contrib/regex RegexQuery: anchored full-term regex enumeration
            pairs = self.reader.expand_terms_with_df(
                "wildcard_regex", f"^(?:{q.pattern})$", MAX_CLAUSES)
        elif isinstance(q, TermRange):
            pairs = self.reader.expand_terms_with_df(
                "range", (q.lo, q.hi, q.include_lo, q.include_hi), MAX_CLAUSES)
        else:
            raise TypeError(type(q))
        self._df_cache.update(pairs)
        return [t for t, _df in pairs]

    def _fuzzy_cond(self, q: Fuzzy):
        """Column predicate implementing FuzzyTermEnum termCompare
        (search/FuzzyTermEnum.java:95,129-136,185-216). Two modes:
        max_edits (modern edit-budget) or min_similarity (classic
        length-scaled: 1 − dist/(prefixLen + min(suffix lens)) must EXCEED
        the threshold; distance computed on the post-prefix suffixes)."""
        pre_len = min(q.prefix_length, len(q.term))
        if ":" not in q.term:  # default field: skip namespaced entries
            cond = ~F.col("term").contains(":")
        else:  # fielded fuzzy: stay inside the field's namespace slice
            cond = F.col("term").startswith(q.term.split(":", 1)[0] + ":")
        if pre_len:
            cond = cond & F.col("term").startswith(q.term[:pre_len])
        if q.min_similarity is None:
            cond = cond & (F.length("term") >= len(q.term) - q.max_edits) & (
                F.length("term") <= len(q.term) + q.max_edits)
            return cond & (F.levenshtein(F.col("term"), F.lit(q.term))
                           <= q.max_edits)
        tsuf = q.term[pre_len:]
        n = len(tsuf)
        suf = F.expr(f"substring(term, {pre_len + 1})")
        m = F.length(suf).cast("double")
        if n == 0:
            sim = ((F.lit(1.0) - m / float(pre_len)) if pre_len
                   else F.lit(0.0))
        else:
            dist = F.levenshtein(suf, F.lit(tsuf)).cast("double")
            full = F.lit(1.0) - dist / (float(pre_len) + F.least(m, F.lit(float(n))))
            empty_suf = ((F.lit(1.0) - float(n) / pre_len) if pre_len
                         else F.lit(0.0))
            sim = F.when(m == 0, empty_suf).otherwise(full)
        return cond & (sim > float(q.min_similarity))

    def _expand_fuzzy(self, q: Fuzzy) -> list[str]:
        return [t for t, _df in self._expand_fuzzy_with_df(q)]

    def _expand_fuzzy_with_df(self, q: Fuzzy) -> list[tuple[str, int]]:
        """FuzzyTermEnum: served from the RAM dictionary where loaded
        (prefix cut + the same termCompare arithmetic in Python,
        RamDict.expand_fuzzy — zero Spark jobs); else a dictionary scan
        with prefix/length pre-filters pushed to parquet and exact
        Levenshtein on the survivors JVM-side. Both paths bind df in the
        same pass (no second dictionary probe); tests pin RAM == Spark."""
        ram = self.reader.ram_dict()
        if ram is not None:
            return ram.expand_fuzzy(q.term, q.prefix_length, q.max_edits,
                                    q.min_similarity, MAX_CLAUSES)
        rows = (
            self.reader.term_dict().where(self._fuzzy_cond(q))
            .select("term", "df").orderBy("term").limit(MAX_CLAUSES).collect()
        )
        return [(r["term"], int(r["df"])) for r in rows]

    def _multiterm_pred(self, q: Query):
        """Pushed-down postings predicate for one MultiTermQuery node —
        the plan-level CONSTANT_SCORE_FILTER rewrite: instead of a driver
        enumeration capped at 1024 clauses, the term condition rides the
        distributed postings scan (parquet row groups are term-sorted, so
        prefix/range conditions prune via min/max stats)."""
        if isinstance(q, Prefix):
            pred, pat = F.col("term").startswith(q.prefix), q.prefix
        elif isinstance(q, Wildcard):
            pred, pat = (F.col("term").rlike(wildcard_to_regex(q.pattern)),
                         q.pattern)
        elif isinstance(q, Regexp):
            pred, pat = F.col("term").rlike(f"^(?:{q.pattern})$"), q.pattern
        elif isinstance(q, TermRange):
            pred = F.lit(True)
            if q.lo is not None:
                pred = pred & (F.col("term") >= q.lo if q.include_lo
                               else F.col("term") > q.lo)
            if q.hi is not None:
                pred = pred & (F.col("term") <= q.hi if q.include_hi
                               else F.col("term") < q.hi)
            pat = next((b for b in (q.lo, q.hi) if b), "")
        elif isinstance(q, Fuzzy):
            pred, pat = self._fuzzy_cond(q), q.term
        else:
            return None
        if ":" not in pat and not isinstance(q, Fuzzy):
            # default-field match must not sweep other fields' namespaces
            pred = pred & ~F.col("term").contains(":")
        return pred

    def _multiterm_filter_ids(self, q: Query,
                              k: int = 1 << 62) -> DataFrame | None:
        """Top-level constant-score filter plan: postings.where(term pred)
        → per-segment live-docid union (docid, score=boost). Returns None
        if q isn't shaped for it. Used for MultiTerm nodes with
        rewrite_method constant_score_filter and for
        ConstantScore(MultiTermQuery) — the reference's
        ConstantScoreQuery(MultiTermQueryWrapperFilter). UNCAPPED by
        design: the filter rewrite never enumerates terms, so the
        1024-clause boolean cap does not apply (MultiTermQuery.java:72) —
        search/matching/count/search_many and the oracle all pin this
        same rule for top-level filter shapes; NESTED filter nodes rewrite
        through the capped boolean path."""
        from .ast import REWRITE_CONST_FILTER

        boost, node = 1.0, q
        if isinstance(q, ConstantScore) and isinstance(q.query, _MULTITERM):
            boost, node = q.boost, q.query
        elif not (isinstance(q, _MULTITERM)
                  and getattr(q, "rewrite_method", None) == REWRITE_CONST_FILTER):
            return None
        else:
            boost = node.boost
        pred = self._multiterm_pred(node)
        if pred is None:
            return None
        rows = self._with_job(
            self._with_deleted(self._postings_for(pred)),
            (k, boost))
        return self._apply_grouped(self._kernel_rows(rows), self._filter_udf)

    def _multiterm_filter_topk(self, q: Query, k: int) -> DataFrame | None:
        """Global docid-asc top-k over _multiterm_filter_ids (constant
        scores tie, docid asc breaks)."""
        per_seg = self._multiterm_filter_ids(q, k)
        if per_seg is None:
            return None
        return per_seg.orderBy(F.asc("docid")).limit(k)

    # ------------------------------------------------------------------ #
    def search(self, query: Query | str, k: int = 10, hydrate: bool = False,
               lang: str | None = None) -> DataFrame:
        """→ DataFrame(docid long, score double[, url, lang]) — global top-k,
        tie-break docid asc. ``lang=`` picks the query-time analyzer chain
        for string queries on a by_lang (multilingual) index."""
        q = self.parse(query, lang=lang) if isinstance(query, str) else query
        fast = self._multiterm_filter_topk(q, k)
        if fast is not None:
            return self._hydrate(fast) if hydrate else fast
        q = self.rewrite(q)

        if isinstance(q, MatchAll):
            out = (self._live_docmap()
                   .select("docid", F.lit(float(q.boost)).alias("score"))
                   .orderBy(F.asc("docid")).limit(k))
            return self._hydrate(out) if hydrate else out
        rc = _residual_complement(q)
        if rc is not None:
            # "everything except Xs" (chained_filter's irreducible form /
            # `* AND NOT x`): live docmap anti-join the excluded set —
            # MatchAll semantics with prohibited clauses, uniform score
            excl = self.matching(Bool(should=rc[0])).select("docid")
            out = (self._live_docmap().join(excl, "docid", "left_anti")
                   .select("docid", F.lit(rc[1]).alias("score"))
                   .orderBy(F.asc("docid")).limit(k))
            return self._hydrate(out) if hydrate else out

        terms = sorted(set(q.terms()))
        if not terms:
            return self._empty()
        dfs = self._doc_freqs(terms)
        if not dfs:
            return self._empty()
        ctx = Ctx(self.reader.N, self.reader.avgdl, dfs, k,
                  avgdl_fields=self.reader.avgdl_fields,
                  sim=self.similarity)

        qterms = [t for t in terms if t in dfs]
        rows = self._with_job(
            self._with_deleted(self._postings_for(_terms_pred(qterms), q)),
            (q, ctx))
        per_seg = self._apply_grouped(
            self._kernel_rows(rows, n_terms=len(qterms)), self._topk_udf)
        out = per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        return self._hydrate(out) if hydrate else out

    def search_many(self, queries: dict[str, Query | str], k: int = 10) -> DataFrame:
        """Batched search: the whole query set in ONE Spark job →
        DataFrame(qid, docid, score), per-qid top-k, tie-break docid asc.

        Plan: one dictionary probe for the union of all query terms, one
        postings scan filtered to that union (pushed-down parquet predicate),
        one applyInPandas per segment running every query against shared
        decoded postings, then a per-qid window top-k. Amortizes the
        scheduler + scan floor across the batch — the serving-throughput
        path; single-query latency path is `search`."""
        from pyspark.sql import Window

        qs: dict[str, Query] = {}
        filter_parts = []
        for qid, q in queries.items():
            q = self.parse(q) if isinstance(q, str) else q
            # top-level constant-score-filter shapes take the same uncapped
            # pushdown plan as search() — batched and single-query serving
            # must return identical hits (see _multiterm_filter_ids)
            fast = self._multiterm_filter_topk(q, k)
            if fast is not None:
                filter_parts.append(
                    fast.select(F.lit(qid).alias("qid"), "docid", "score"))
                continue
            qs[qid] = self.rewrite(q)

        match_all = {qid for qid, q in qs.items() if isinstance(q, MatchAll)}
        all_terms = sorted({t for qid, q in qs.items()
                            if qid not in match_all for t in q.terms()})
        dfs = self._doc_freqs(all_terms)
        ctx_by = {qid: Ctx(self.reader.N, self.reader.avgdl, dfs, k,
                           avgdl_fields=self.reader.avgdl_fields,
                  sim=self.similarity)
                  for qid in qs}
        kernel_qs = {qid: q for qid, q in qs.items() if qid not in match_all}

        parts = list(filter_parts)
        if kernel_qs and dfs:
            qterms = [t for t in all_terms if t in dfs]
            rows = self._with_job(
                self._with_deleted(
                    self._postings_for(_terms_pred(qterms), kernel_qs)),
                (kernel_qs, ctx_by))
            per_seg = self._apply_grouped(
                self._kernel_rows(rows, n_terms=len(qterms)), self._many_udf)
            w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
            parts.append(per_seg.withColumn("rn", F.row_number().over(w))
                         .where(F.col("rn") <= k).drop("rn"))
        for qid in match_all:
            parts.append(
                self._live_docmap()
                .select(F.lit(qid).alias("qid"), "docid",
                        F.lit(float(qs[qid].boost)).alias("score"))
                .orderBy(F.asc("docid")).limit(k))
        if not parts:
            return self.reader.spark.createDataFrame(
                [], "qid string, docid long, score double")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.orderBy("qid", F.desc("score"), F.asc("docid"))

    def matching(self, query: Query | str) -> DataFrame:
        """ALL matching docids (no top-k truncation) → DataFrame(docid, score).
        The per-segment kernel still runs distributed; only the heap bound is
        lifted (reference Collector-without-limit / totalHits path)."""
        q = self.parse(query) if isinstance(query, str) else query
        fast = self._multiterm_filter_ids(q)
        if fast is not None:
            return fast
        q = self.rewrite(q)
        if isinstance(q, MatchAll):
            return self._live_docmap().select(
                "docid", F.lit(float(q.boost)).alias("score"))
        rc = _residual_complement(q)
        if rc is not None:
            excl = self.matching(Bool(should=rc[0])).select("docid")
            return (self._live_docmap().join(excl, "docid", "left_anti")
                    .select("docid", F.lit(rc[1]).alias("score")))
        terms = sorted(set(q.terms()))
        dfs = self._doc_freqs(terms)
        if not dfs:
            return self._empty()
        ctx = Ctx(self.reader.N, self.reader.avgdl, dfs, k=1 << 62,
                  avgdl_fields=self.reader.avgdl_fields,
                  sim=self.similarity)
        rows = self._with_job(
            self._with_deleted(
                self._postings_for(_terms_pred(list(dfs)), q)),
            (q, ctx))
        return self._apply_grouped(
            self._kernel_rows(rows, n_terms=len(dfs)), self._topk_udf)

    def facets(self, query: Query | str | None = None, top_n: int = 10) -> DataFrame:
        """Facet counts → DataFrame(term, n_docs), count desc / term asc.

        The reference fork's whole contribution (LUCENE-2335 "Exposed":
        index/ExposedSegmentReader.java:18 builds collator-sorted term ords
        so facet counting walks packed ordinals). Spark-first the same
        answer is a groupBy over the forward index: for the corpus facet it
        is the term dictionary itself; for a query facet, semi-join the
        matching docids into the term-vector table and count — dictionary
        encoding + shuffle sort subsume the ordinal machinery."""
        if query is None:
            return (self.reader.term_dict()
                    .select("term", F.col("df").cast("long").alias("n_docs"))
                    .orderBy(F.desc("n_docs"), F.asc("term")).limit(top_n))
        m = self.matching(query).select("docid")
        tok = self.reader.tokens().select("docid", "terms")
        # semi-join the matching docids BEFORE exploding: the generate runs
        # over matched docs only, not the whole forward index (at 100× scale
        # an unpruned corpus-wide explode would dominate the query)
        return (tok.join(m, "docid")
                .select(F.explode("terms").alias("term"))
                .groupBy("term").agg(F.count("*").cast("long").alias("n_docs"))
                .orderBy(F.desc("n_docs"), F.asc("term")).limit(top_n))

    def search_sorted(self, query: Query | str, by: str, k: int = 10,
                      ascending: bool = True,
                      collation: str | None = None) -> DataFrame:
        """Top-k by a stored field (reference TopFieldCollector /
        Sort(SortField), search/TopFieldCollector.java:904; the Exposed
        comparator source search/ExposedFieldComparatorSource.java:23).
        FieldCache un-inversion is a no-op here — the docmap column IS the
        per-doc value array; `orderBy(col).limit(k)` is the distributed
        bounded field-heap.

        `collation`: a Spark collation name (e.g. "UNICODE_CI") for
        locale/case-aware string sort — the fork's entire contribution
        (LUCENE-2335 collator-sorted term ordinals,
        index/ExposedSegmentReader.java:66) collapses to a collated sort
        key the shuffle sorts on; no ordinal materialization needed."""
        m = self.matching(query).select("docid")
        dm = self.reader.docmap().join(m, "docid")
        key = F.collate(F.col(by), collation) if collation else F.col(by)
        order = F.asc(key) if ascending else F.desc(key)
        return (dm.select("docid", "url", "lang", "doclen")
                .orderBy(order, F.asc("docid")).limit(k))

    def search_dedup(self, query: Query | str, key: str, k: int = 10,
                     keep: str = "first") -> DataFrame:
        """contrib DuplicateFilter (contrib/queries/.../DuplicateFilter.java,
        KM_USE_FIRST/LAST_OCCURRENCE): among the matching docs, keep one doc
        per `key` column value — the in-engine dedup a training-data
        pipeline reaches for. Distributed as a per-key window (one shuffle
        on the key), then the usual score/docid top-k."""
        m = self.matching(query)
        dm = self.reader.docmap().select("docid", key)
        joined = m.join(dm, "docid")
        from pyspark.sql import Window

        order = F.asc("docid") if keep == "first" else F.desc("docid")
        w = Window.partitionBy(key).orderBy(order)
        return (joined.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).drop("_rn")
                .orderBy(F.desc("score"), F.asc("docid")).limit(k))

    def search_filtered(self, query: Query | str, predicate: str, k: int = 10,
                        cache: bool = False) -> DataFrame:
        """FilteredQuery (search/FilteredQuery.java:40): query ∧ filter, the
        filter being a Spark SQL predicate over docmap columns (url, lang,
        doclen). NumericRangeQuery collapses to a native `between` here —
        the reference's trie terms (search/NumericRangeQuery.java:155) exist
        only because Lucene must express ranges as term matches; a columnar
        store gets min/max pruning from parquet stats for free. Scores are
        the unfiltered query scores (reference leapfrog keeps the scorer's
        score, IndexSearcher.java:221-260). ``cache=True`` routes the
        filter through the per-reader docid-set cache (cached_filter)."""
        m = self.matching(query)
        dm = (self.cached_filter(predicate) if cache
              else self.reader.docmap().where(predicate).select("docid"))
        return (m.join(dm, "docid")
                .orderBy(F.desc("score"), F.asc("docid")).limit(k))

    def cached_filter(self, predicate: str) -> DataFrame:
        """CachingWrapperFilter (search/CachingWrapperFilter.java): the
        per-reader DocIdSet cache. The predicate's docid set is computed
        once, pinned in Spark's in-memory columnar cache, and reused by
        every later ``search_filtered(..., cache=True)`` with the same
        predicate string — the per-reader OpenBitSet analog. Scoped to
        THIS Searcher (reference caches per IndexReader): a new reader
        over a new commit point starts with an empty cache, so staleness
        is impossible. Trade-off stated plainly: the cached set is
        corpus-sized in the worst case — Spark spills it to disk rather
        than OOM (MEMORY_AND_DISK), and `uncache_filters` drops it."""
        if not hasattr(self, "_filter_cache"):
            self._filter_cache: dict[str, DataFrame] = {}
        df = self._filter_cache.get(predicate)
        if df is None:
            from pyspark import StorageLevel

            df = (self.reader.docmap().where(predicate).select("docid")
                  .persist(StorageLevel.MEMORY_AND_DISK))
            self._filter_cache[predicate] = df
        return df

    def uncache_filters(self) -> None:
        """Release every cached filter docid set (reader close analog)."""
        for df in getattr(self, "_filter_cache", {}).values():
            df.unpersist()
        self._filter_cache = {}

    def custom_score(self, query: Query | str, expr: str, k: int = 10) -> DataFrame:
        """CustomScoreQuery / ValueSourceQuery (search/function/
        CustomScoreQuery.java:47, ValueSourceQuery.java:42): final score =
        subquery score × a column expression over the docmap. The reference
        needs FieldCache un-inversion (search/FieldCacheImpl.java:280-335)
        to read a per-doc value; here the value source IS the column, and
        the arithmetic stays in whole-stage codegen."""
        m = self.matching(query)
        dm = self.reader.docmap().select("docid", "url", "lang", "doclen")
        return (m.join(dm, "docid")
                .select("docid",
                        (F.col("score") * F.expr(expr)).alias("score"))
                .orderBy(F.desc("score"), F.asc("docid")).limit(k))

    def count(self, query: Query | str) -> int:
        """Total hits (reference TopDocs.totalHits)."""
        return self.matching(query).count()

    def search_timed(self, query: Query | str, k: int = 10,
                     timeout_ms: int | None = None,
                     hydrate: bool = False) -> list:
        """search() with a wall-clock budget on the COLLECT phase — the
        TimeLimitingCollector analog (search/TimeLimitingCollector.java:
        collect() raises TimeExceededException past t0 + timeAllowed).

        Spark-first shape: the budget guards the ACTION, not per-hit
        collection — a watchdog cancels this search's job group at the
        deadline (tasks get a JVM interrupt) and the call raises
        TimeExceededException. STATED DEVIATION from the reference's
        greedy mode: no partial top-k is returned on timeout — Spark
        cancels whole jobs, and a partial distributed top-k would not be
        the true top-k of any document subset a user could reason about
        (the reference's partial result is at least a prefix of the
        docid order; a cancelled TakeOrderedAndProject has no such
        contract). The searcher stays healthy after a timeout (the group
        id is per-call)."""
        df = self.search(query, k=k, hydrate=hydrate)
        if timeout_ms is None:
            return df.collect()
        return collect_with_deadline(self.reader.spark, df, timeout_ms)

    def payloads_for_query(self, query: Query | str) -> DataFrame:
        """PayloadSpanUtil.getPayloadsForQuery
        (search/payloads/PayloadSpanUtil.java:66-178) →
        DataFrame(docid long, payload double): every payload at every
        matched position of the query's extraction units (term / phrase /
        multiphrase / boolean / dismax / span near-or-term shapes —
        payloads.payload_units documents the exact conversion and its
        silent-skip rule). Runs distributed on the SAME plan family as
        search(): pushed-down postings scan for the units' terms,
        per-segment extraction kernel, no driver-side postings. Rows are a
        multiset (one row per matched payload occurrence)."""
        from ..payloads import payload_units, unit_terms

        q = self.parse(query) if isinstance(query, str) else query
        q = self.rewrite(q)
        units = payload_units(q)
        terms = unit_terms(units)
        empty = self.reader.spark.createDataFrame(
            [], "docid long, payload double")
        if not terms:
            return empty
        # payloads_blob stays in the scan by construction: the pred-only
        # postings read here never passes through _postings_for's pruning
        rows = self._with_job(
            self._with_deleted(
                self.reader.postings().where(_terms_pred(terms))),
            units)
        return (self._apply_grouped(
                    self._kernel_rows(rows, n_terms=len(terms)),
                    self._payx_udf)
                .orderBy("docid", "payload"))

    def explain(self, query: Query | str) -> DataFrame:
        """Per-(doc, term) score decomposition for the query's terms —
        DataFrame(docid, term, tf, dl, df, idf, tf_weight, score). The
        reference Weight.explain / Explanation tree (search/Weight.java:59,
        search/Explanation.java) as a flat DataFrame; the arithmetic runs
        JVM-side from decoded postings."""
        import pandas as pd

        q = self.parse(query) if isinstance(query, str) else query
        q = self.rewrite(q)
        terms = sorted(t for t in set(q.terms()) if ":" not in t)
        dfs = self._doc_freqs(terms)
        if not dfs:
            return self.reader.spark.createDataFrame(
                [], "docid long, term string, tf long, dl long, df long, "
                    "idf double, tf_weight double, score double")
        rows = self._postings_for(_terms_pred(list(dfs)))
        bs = int(self.reader.block_size)

        def decode(batches):
            import numpy as np

            from ..codec import decode_postings
            for pdf in batches:
                out = []
                for rec in pdf.to_dict("records"):
                    ids, tfs, dls = decode_postings(rec, bs)
                    out.append(pd.DataFrame({
                        "docid": ids, "term": rec["term"],
                        "tf": tfs, "dl": dls}))
                if out:
                    yield pd.concat(out)

        flat = rows.mapInPandas(
            decode, schema="docid long, term string, tf long, dl long")
        td = self.reader.term_dict().where(_terms_pred(list(dfs))) \
            .select("term", F.col("df").cast("long").alias("df"))
        N, avgdl = float(self.reader.N), float(self.reader.avgdl)
        idf = F.log(F.lit(1.0) + (F.lit(N) - F.col("df") + 0.5) / (F.col("df") + 0.5))
        w = ((F.lit(1.2 + 1.0) * F.col("tf"))
             / (F.col("tf") + 1.2 * ((1.0 - 0.75) + (0.75 * F.col("dl")) / F.lit(avgdl))))
        return (flat.join(F.broadcast(td), "term")
                .select("docid", "term", "tf", "dl", "df",
                        idf.alias("idf"), w.alias("tf_weight"),
                        (idf * w).alias("score"))
                .orderBy("docid", "term"))

    def explain_full(self, query: Query | str) -> DataFrame:
        """Score decomposition for EVERY query shape —
        DataFrame(docid, component, kind, freq, dl, idf, weight, score):
        term rows carry tf, phrase/span rows carry the sloppyFreq sum (pf)
        with the summed-idf and tf-weight factors, constant-score rows the
        uniform boost. Ancestor Bool boosts fold into each row's score, so
        for pure-sum trees per-doc component scores sum to the search()
        score (the reference Explanation-tree invariant, search/Weight
        .java:59); dismax/boosting components are emitted with leaf scores
        and their combination rule left to the consumer, like the nested
        Explanation nodes. The legacy term-only ``explain`` (the driver
        contract's ft_explain) is unchanged."""
        q = self.parse(query) if isinstance(query, str) else query
        q = self.rewrite(q)
        terms = sorted(set(q.terms()))
        dfs = self._doc_freqs(terms)
        empty = self.reader.spark.createDataFrame(
            [], "docid long, component string, kind string, freq double, "
                "dl long, idf double, weight double, score double")
        if not dfs:
            return empty
        ctx = Ctx(self.reader.N, self.reader.avgdl, dfs, k=1 << 62,
                  avgdl_fields=self.reader.avgdl_fields,
                  sim=self.similarity)
        rows = self._with_job(
            self._with_deleted(
                self._postings_for(_terms_pred(list(dfs)), q)),
            (q, ctx))
        return (self._apply_grouped(
                    self._kernel_rows(rows, n_terms=len(dfs)),
                    self._explain_udf)
                .orderBy("docid", "component"))

    def more_like_this(self, docid: int, *, max_terms: int = 8, k: int = 10,
                       min_tf: int = 1, min_df: int = 2) -> DataFrame:
        """Similar docs (reference contrib MoreLikeThis,
        contrib/queries/.../similar/MoreLikeThis.java): take the source
        doc's term vector (one pushed-down forward-index row), keep its
        top ``max_terms`` terms by tf·idf (ties → term asc), run them as a
        scoring disjunction, and drop the source doc from the results."""
        row = (self.reader.tokens().where(F.col("docid") == docid)
               .select("terms", "tfs").collect())
        if not row:
            return self._empty()
        pairs = [(t, tf) for t, tf in zip(row[0]["terms"], row[0]["tfs"])
                 if ":" not in t and tf >= min_tf]
        dfs = self._doc_freqs([t for t, _ in pairs])
        import math as _math

        N = self.reader.N
        scored = [
            (tf * _math.log(1.0 + (N - dfs[t] + 0.5) / (dfs[t] + 0.5)), t)
            for t, tf in pairs if dfs.get(t, 0) >= min_df
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        terms = [t for _, t in scored[:max_terms]]
        if not terms:
            return self._empty()
        q = Bool(should=[Term(t) for t in terms])
        out = self.search(q, k=k + 1)
        return (out.where(F.col("docid") != docid)
                .orderBy(F.desc("score"), F.asc("docid")).limit(k))

    def form_similar_query(self, body: str, stop=None) -> Bool:
        """SimilarityQueries.formSimilarQuery
        (contrib/queries/.../similar/SimilarityQueries.java:82): analyze
        ``body`` with the index's analyzer, keep each unique term once in
        first-occurrence order (optional stop set skipped), OR them as
        SHOULD clauses; at the clause cap, keep what fits (the
        reference's TooManyClauses fail-safe, :106-110)."""
        from .parser import _analyze_pairs

        seen: set[str] = set()
        clauses: list[Term] = []
        for t, _p in _analyze_pairs(body or "", self.reader.analyzer):
            if stop is not None and t in stop:
                continue
            if t in seen:
                continue
            seen.add(t)
            if len(clauses) >= MAX_CLAUSES:
                break  # fail-safe: return what we have
            clauses.append(Term(t))
        return Bool(should=clauses)

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


class TimeExceededException(Exception):
    """The search's wall-clock budget elapsed before the collect finished
    (search/TimeLimitingCollector.java TimeExceededException analog; no
    partial results — see Searcher.search_timed)."""

    def __init__(self, timeout_ms: float, elapsed_ms: float):
        self.timeout_ms = timeout_ms
        self.elapsed_ms = elapsed_ms
        super().__init__(
            f"search exceeded {timeout_ms:.0f} ms budget "
            f"(elapsed {elapsed_ms:.0f} ms; job group cancelled)")


def collect_with_deadline(spark, df: DataFrame, timeout_ms: float) -> list:
    """df.collect() bounded by a wall-clock budget: the action runs under
    a per-call job group; a daemon watchdog cancels the group at the
    deadline (interruptOnCancel → JVM task interrupt), and the cancelled
    action surfaces as TimeExceededException. Used by search_timed; a
    module-level function so any engine DataFrame action can be
    deadline-bounded the same way."""
    import threading
    import time as _time
    import uuid

    sc = spark.sparkContext
    gid = f"deadline-{uuid.uuid4().hex[:12]}"
    done = threading.Event()
    fired = threading.Event()  # set IFF our watchdog issued the cancel

    def _watchdog() -> None:
        if not done.wait(timeout_ms / 1000.0):
            fired.set()
            try:
                sc.cancelJobGroup(gid)
            except Exception:
                pass  # context already stopped

    t0 = _time.time()
    sc.setJobGroup(gid, f"deadline {timeout_ms:.0f}ms",
                   interruptOnCancel=True)
    watchdog = threading.Thread(target=_watchdog, daemon=True)
    watchdog.start()
    try:
        rows = df.collect()
        return rows
    except Exception as ex:
        elapsed = (_time.time() - t0) * 1000.0
        # classify as a timeout ONLY when OUR watchdog actually cancelled:
        # substring/elapsed heuristics reclassified unrelated failures
        # ('...cancelled because SparkContext was shut down', or any real
        # error surfacing after the deadline) as TimeExceededException,
        # hiding the root cause
        if fired.is_set():
            raise TimeExceededException(timeout_ms, elapsed) from ex
        raise
    finally:
        done.set()
        try:  # detach the group so later actions on this thread run free
            sc._jsc.clearJobGroup()
        except Exception:
            sc.setLocalProperty("spark.jobGroup.id", None)
