"""Percolation — reverse search: match documents against a registered
bank of queries (contrib/memory/.../MemoryIndex.java:177 — the reference
builds a per-document in-RAM index and asks ``index.search(query) > 0``
for each stored query; the documented use case is "google alerts"-style
subscription matching and corpus filtering by a query bank).

Spark-first design — NOT a per-doc index object: each bank query's MATCH
predicate (score > 0, the reference's match criterion) is compiled once,
driver-side, into a JVM Column expression over the document's token
array.  ``percolate`` then evaluates the whole bank in ONE narrow
projection per document — whole-stage codegen, zero shuffle, zero Python
on the executor path, the same shape as the simhash/text-quality ops
(PLANS.md §2/§8).  At 10^12 docs the plan is a map-only scan whose cost
is O(docs × bank); for 10^5+ query banks the right extension is a
term-extraction prefilter join (the standard inverted percolator), noted
in the module docstring rather than pretended.

Matching semantics mirror the single-node oracle's ``_eval`` membership
(two engines, one truth — pinned by tests/test_percolate.py):

- ``Term``: doc contains the term (tf > 0).  Field-namespaced terms
  (``title:x``) route to the field's token array when one is registered,
  else match nothing (an unknown field has no postings).
- ``Bool``: reference BooleanQuery semantics — empty / pure-negative
  matches nothing (search/BooleanQuery.java:32); MUST clauses all match;
  SHOULD matches ≥ effective minNrShouldMatch; MUST_NOT excludes.
- ``Phrase`` / ``MultiPhrase`` (slop=0): exact adjacency at the analyzed
  positions (stopword holes honoured).  Sloppy matching needs the
  position-algebra kernel and is refused loudly.
- ``Prefix`` / ``Wildcard`` / ``Regexp`` / ``Fuzzy`` / ``TermRange``:
  UNCAPPED filter-rewrite semantics (CONSTANT_SCORE_FILTER — matching is
  rewrite-mode-independent; search/MultiTermQuery.java:63-146): doc
  matches iff any of its own terms satisfies the predicate.  Fuzzy
  replicates FuzzyTermEnum exactly — prefix pin, ±max_edits length
  window + levenshtein, or the classic length-scaled minimumSimilarity
  (search/FuzzyTermEnum.java:95).
- ``MatchAll`` / ``ConstantScore`` / ``Boosting`` / ``DisjunctionMax``:
  containment of the underlying match set.
- Span queries are refused (matching spans needs position algebra).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ast import (
    Bool,
    Boosting,
    ConstantScore,
    DisjunctionMax,
    Fuzzy,
    MatchAll,
    MultiPhrase,
    Phrase,
    Prefix,
    Query,
    Regexp,
    SpanQuery,
    Term,
    TermRange,
    Wildcard,
)
from ..scoring import wildcard_to_regex


def _term_pred(term: str, toks: Column,
               fields: dict[str, Column] | None) -> Column:
    """Containment for one literal term, with field-namespace routing."""
    if ":" in term:
        fld, bare = term.split(":", 1)
        if fields and fld in fields:
            return F.array_contains(fields[fld], bare)
        return F.lit(False)  # unknown field: no postings, no match
    return F.array_contains(toks, term)


def _exists(toks: Column, pred) -> Column:
    """Any-doc-term-satisfies (the uncapped multiterm filter rewrite)."""
    return F.exists(toks, pred)


def _route_multiterm(pattern_field: str, toks: Column,
                     fields: dict[str, Column] | None):
    """Multiterm queries stay inside their field's namespace
    (oracle.expand_multiterm): unfielded patterns see the default-field
    tokens; ``field:pat`` sees that field's array (or nothing)."""
    if ":" in pattern_field:
        fld, bare = pattern_field.split(":", 1)
        if fields and fld in fields:
            return fields[fld], bare
        return None, bare
    return toks, pattern_field


def _fuzzy_pred(q: Fuzzy, toks: Column,
                fields: dict[str, Column] | None) -> Column:
    # Fielded fuzzy measures distance over the FULL namespaced string
    # (oracle.expand_multiterm: prefix pin and suffix slicing count the
    # "field:" characters) — so build the namespaced token array and keep
    # q.term whole, rather than comparing stripped strings.
    if ":" in q.term:
        fld = q.term.split(":", 1)[0]
        if not fields or fld not in fields:
            return F.lit(False)
        arr = F.transform(fields[fld],
                          lambda t: F.concat(F.lit(fld + ":"), t))
        bare = q.term
    else:
        arr = toks
        bare = q.term
    pre_len = min(q.prefix_length, len(bare))
    pre = bare[:pre_len]
    if q.min_similarity is not None:
        # classic FuzzyTermEnum (search/FuzzyTermEnum.java:129-216):
        # distance on post-prefix suffixes, similarity
        # 1 − dist/(prefixLen + min(suffix lens)), strict >
        tsuf = bare[pre_len:]
        n = len(tsuf)

        def sim(t: Column) -> Column:
            suf = F.substring(t, pre_len + 1, 1 << 20)
            m = F.length(suf)
            if n == 0:
                return (F.lit(1.0) - m / F.lit(pre_len)) if pre_len \
                    else F.lit(0.0)
            zero_m = (F.lit(1.0) - F.lit(n) / F.lit(pre_len)) if pre_len \
                else F.lit(0.0)
            gen = F.lit(1.0) - F.levenshtein(suf, F.lit(tsuf)) / (
                F.lit(pre_len) + F.least(m, F.lit(n)))
            return F.when(m == 0, zero_m).otherwise(gen)

        return _exists(arr, lambda t: t.startswith(pre)
                       & (sim(t) > F.lit(q.min_similarity)))
    return _exists(
        arr,
        lambda t: t.startswith(pre)
        & (F.abs(F.length(t) - F.lit(len(bare))) <= q.max_edits)
        & (F.levenshtein(t, F.lit(bare)) <= q.max_edits))


def match_expr(q: Query, toks: Column,
               fields: dict[str, Column] | None = None) -> Column:
    """Boolean Column: does a doc with token array `toks` match `q`?

    `fields` maps extra analyzed-field names to their own token-array
    Columns (the PerFieldAnalyzerWrapper analog at percolation time)."""
    if isinstance(q, Term):
        return _term_pred(q.term, toks, fields)
    if isinstance(q, (Phrase, MultiPhrase)):
        if q.slop != 0:
            raise NotImplementedError(
                "percolate matches exact (slop=0) phrases; sloppy phrase "
                "matching needs the position kernel — run search instead")
        qpos = q.qpositions()
        slots = [[t] for t in q.phrase_terms] if isinstance(q, Phrase) \
            else [list(s) for s in q.slots]
        maxpos = max(qpos)

        def at(i: Column, k: int) -> Column:
            elem = F.element_at(toks, i + qpos[k] + 1)
            opts = slots[k]
            if len(opts) == 1:
                return elem == opts[0]
            return elem.isin(*opts)

        def window_ok(i: Column) -> Column:
            cond = at(i, 0)
            for k in range(1, len(slots)):
                cond = cond & at(i, k)
            return cond

        starts = F.sequence(F.lit(0), F.size(toks) - F.lit(maxpos + 1))
        return F.when(F.size(toks) > maxpos,
                      F.exists(starts, window_ok)).otherwise(F.lit(False))
    if isinstance(q, Bool):
        if not q.must and not q.should:
            # empty / pure-negative boolean matches nothing
            return F.lit(False)
        cond = F.lit(True)
        for c in q.must:
            cond = cond & match_expr(c, toks, fields)
        min_should = q.effective_min_should()
        if q.should and min_should > 0:
            cnt = sum(match_expr(c, toks, fields).cast("int")
                      for c in q.should)
            cond = cond & (cnt >= min_should)
        for c in q.must_not:
            cond = cond & ~match_expr(c, toks, fields)
        return cond
    if isinstance(q, Prefix):
        arr, bare = _route_multiterm(q.prefix, toks, fields)
        if arr is None:
            return F.lit(False)
        return _exists(arr, lambda t: t.startswith(bare))
    if isinstance(q, Wildcard):
        arr, bare = _route_multiterm(q.pattern, toks, fields)
        if arr is None:
            return F.lit(False)
        rx = wildcard_to_regex(bare)
        return _exists(arr, lambda t: t.rlike(rx))
    if isinstance(q, Regexp):
        arr, bare = _route_multiterm(q.pattern, toks, fields)
        if arr is None:
            return F.lit(False)
        return _exists(arr, lambda t: t.rlike(f"^(?:{bare})$"))
    if isinstance(q, Fuzzy):
        return _fuzzy_pred(q, toks, fields)
    if isinstance(q, TermRange):
        if any(b and ":" in b for b in (q.lo, q.hi)):
            # a fielded bound ranges over the WHOLE dictionary in term
            # order — default-field terms plus every field's namespaced
            # terms (oracle.expand_multiterm keeps them all)
            def ns(col: Column, fld: str) -> Column:
                return F.transform(
                    col, lambda t: F.concat(F.lit(fld + ":"), t))

            arrs = [toks] + [ns(col, fld)
                             for fld, col in (fields or {}).items()]
            arr = arrs[0] if len(arrs) == 1 else F.concat(*arrs)
        else:
            arr = toks

        def in_range(t: Column) -> Column:
            cond = F.lit(True)
            if q.lo is not None:
                cond = cond & ((t > q.lo) if not q.include_lo
                               else (t >= q.lo))
            if q.hi is not None:
                cond = cond & ((t < q.hi) if not q.include_hi
                               else (t <= q.hi))
            return cond

        return _exists(arr, in_range)
    if isinstance(q, MatchAll):
        return F.lit(True)
    if isinstance(q, ConstantScore):
        return match_expr(q.query, toks, fields)
    if isinstance(q, Boosting):
        # context only modulates score; the match set is `match`'s
        return match_expr(q.match, toks, fields)
    if isinstance(q, DisjunctionMax):
        cond = F.lit(False)
        for c in q.queries:
            cond = cond | match_expr(c, toks, fields)
        return cond
    if isinstance(q, SpanQuery):
        raise NotImplementedError(
            "span matching needs position algebra — percolate supports "
            "term/bool/phrase/multiterm shapes; run search for spans")
    raise TypeError(type(q))


def percolate(docs: DataFrame, bank: list[tuple[str, Query]],
              text_col: str = "text", id_col: str = "doc_id",
              field_cols: dict[str, str] | None = None,
              passthrough: list[str] | None = None) -> DataFrame:
    """(doc_id, query_id) for every (document, bank query) match.

    `docs` rows are whitespace-analyzed from `text_col` (the contract
    analyzer; pre-tokenize upstream for a custom chain and pass an
    array column name as `text_col` — arrays are used as-is).
    `field_cols` maps extra field names to their text/array columns.
    `passthrough` columns are carried onto each match row unchanged
    (e.g. the event timestamp for an alerting sink).

    The whole bank evaluates in one narrow projection per document:
    filter(bank_structs, s -> s.m) → explode. No shuffle below the
    caller's ordering; bank literals ship inside the serialized plan
    (driver-side compile, the small side by construction). Being a
    stateless narrow projection, it applies to a STREAMING DataFrame
    as-is (lucene_spark.streaming.percolate wraps it)."""
    def tok_expr(col: str) -> Column:
        dt = dict(docs.dtypes).get(col, "string")
        return F.col(col) if dt.startswith("array") \
            else F.split(F.col(col), " ")

    # project every token array ONCE before building the bank predicates:
    # every predicate references the array, and an inline split() would be
    # re-evaluated per bank query (CollapseProject keeps a separately
    # projected non-cheap alias that is referenced many times — same HOF
    # rule as PLANS.md's shingle-build fix; measured 4.5x on an 8-query
    # bank at 50k docs: 2.05 s -> 0.46 s warm)
    extra = list(passthrough or [])
    proj = [F.col(id_col)] + [F.col(c) for c in extra]
    proj.append(tok_expr(text_col).alias("__toks"))
    fcols: dict[str, str] = {}
    for f, c in (field_cols or {}).items():
        fcols[f] = f"__ftoks_{f}"
        proj.append(tok_expr(c).alias(fcols[f]))
    base = docs.select(*proj)
    toks = F.col("__toks")
    fields = {f: F.col(a) for f, a in fcols.items()}
    entries = F.array(*[
        F.struct(F.lit(qid).alias("query_id"),
                 match_expr(q, toks, fields).alias("m"))
        for qid, q in bank])
    hits = F.filter(entries, lambda s: s.m)
    return (base
            .select(F.col(id_col), *[F.col(c) for c in extra],
                    F.explode(hits).alias("hit"))
            .select(id_col, *extra, F.col("hit.query_id").alias("query_id")))


def guard_terms(q: Query) -> list[str] | None:
    """SOUND literal prefilter: a doc matching `q` must contain at least
    one returned term; None = no such guarantee (the query stays in the
    always-evaluate set).  This is the inverted-percolator query-term
    extraction (what large-scale percolators index their query bank by):

    - Term / Phrase: any required term suffices (first picked).
    - MultiPhrase: slot 0's alternatives (one of them is required).
    - Bool with MUST: the first guardable MUST clause's terms (all MUST
      clauses match, so any one clause's guard is sound).  Without MUST,
      effective minNrShouldMatch ≥ 1 ⇒ the union of ALL should guards —
      sound only if every should clause is guardable.
    - DisjunctionMax: union over clauses, all-or-nothing.
    - Multiterm / MatchAll / field-namespaced guards: None.
    """
    if isinstance(q, Term):
        return None if ":" in q.term else [q.term]
    if isinstance(q, Phrase):
        t = q.phrase_terms[0]
        return None if ":" in t else [t]
    if isinstance(q, MultiPhrase):
        alts = q.slots[0]
        return None if any(":" in t for t in alts) else list(alts)
    if isinstance(q, Bool):
        if not q.must and not q.should:
            return []  # matches nothing: zero candidates is sound
        if q.must:
            for c in q.must:
                g = guard_terms(c)
                if g is not None:
                    return g
            return None
        out: list[str] = []
        for c in q.should:
            g = guard_terms(c)
            if g is None:
                return None
            out.extend(g)
        return out
    if isinstance(q, ConstantScore):
        return guard_terms(q.query)
    if isinstance(q, Boosting):
        return guard_terms(q.match)
    if isinstance(q, DisjunctionMax):
        out = []
        for c in q.queries:
            g = guard_terms(c)
            if g is None:
                return None
            out.extend(g)
        return out
    return None  # multiterm, MatchAll, spans: no literal guarantee


def percolate_indexed(docs: DataFrame, bank: list[tuple[str, Query]],
                      text_col: str = "text", id_col: str = "doc_id",
                      field_cols: dict[str, str] | None = None
                      ) -> DataFrame:
    """`percolate` for LARGE banks (10^4–10^6 registered queries): instead
    of evaluating every bank predicate on every document, the bank is
    INVERTED into a (guard term → query_id) table — the standard
    percolator index.  Per document, only queries whose guard term occurs
    in it are evaluated exactly; unguardable queries (multiterm, MatchAll)
    fall back to always-evaluate, stated plainly.

    Plan: docs → explode distinct tokens → broadcast-join the guard table
    (the bank is the genuinely small side) → collect candidate query_ids
    per doc (one shuffle, volume = matched (doc, guard) pairs, not
    docs × bank) → re-join to the doc row co-keyed on `id_col` → exact
    match predicate per candidate via one codegen'd CASE over query_id.
    Result-identical to `percolate` (pinned by tests/test_percolate.py)."""
    spark = docs.sparkSession
    guards: list[tuple[str, str]] = []
    always: list[tuple[str, Query]] = []
    by_id = dict(bank)
    for qid, q in bank:
        g = guard_terms(q)
        if g is None:
            always.append((qid, q))
        else:
            guards.extend((t, qid) for t in g)

    def tok_expr(col: str) -> Column:
        dt = dict(docs.dtypes).get(col, "string")
        return F.col(col) if dt.startswith("array") \
            else F.split(F.col(col), " ")

    toks = tok_expr(text_col)
    fields = {f: tok_expr(c) for f, c in (field_cols or {}).items()}

    out = []
    if guards:
        gdf = spark.createDataFrame(guards, "gterm string, query_id string")
        cand = (docs
                .select(F.col(id_col),
                        F.explode(F.array_distinct(toks)).alias("gterm"))
                .join(F.broadcast(gdf), "gterm")
                .groupBy(id_col)
                .agg(F.collect_set("query_id").alias("cand_qids")))
        guarded_ids = sorted({qid for _t, qid in guards})

        def case_match(qid_col: Column) -> Column:
            # ONE flat CaseWhen node (chained .when builds branches on the
            # same node) — a nested when(...).otherwise(prev) chain grows
            # expression-tree DEPTH linearly with the bank and overflows
            # Catalyst's recursive analyzer at the 10^4-10^6 banks this
            # path exists for; a flat branch list only grows width, which
            # codegen splits automatically
            expr = None
            for k in guarded_ids:
                m = match_expr(by_id[k], toks, fields)
                expr = F.when(qid_col == F.lit(k), m) if expr is None \
                    else expr.when(qid_col == F.lit(k), m)
            return expr.otherwise(F.lit(False))

        out.append(
            docs.join(cand, id_col)
            .select(F.col(id_col),
                    F.explode(F.filter("cand_qids", case_match))
                    .alias("query_id")))
    if always:
        out.append(percolate(docs, always, text_col=text_col,
                             id_col=id_col, field_cols=field_cols))
    if not out:
        return docs.select(F.col(id_col),
                           F.lit("").alias("query_id")).limit(0)
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res
