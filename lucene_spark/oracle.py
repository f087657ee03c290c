"""Single-node pure-Python reference engine — the rank-identity oracle.

The "two engines, one truth" pattern of the reference test suite
(search/TestBoolean2.java:115-240 runs identical queries through independent
scorer implementations and asserts identical hit lists). This oracle shares
the analyzer (analysis.py) and the scoring math (scoring.py) with the Spark
engine but nothing else: postings are plain dicts, evaluation is naive and
obviously-correct. pytest asserts Spark top-k ≡ oracle top-k.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from .analysis import analyze
from .queries.ast import (
    Bool,
    Boosting,
    ConstantScore,
    DisjunctionMax,
    Fuzzy,
    MatchAll,
    MultiPhrase,
    PayloadNear,
    PayloadTerm,
    Phrase,
    Prefix,
    Query,
    Regexp,
    SpanQuery,
    Term,
    TermRange,
    Wildcard,
)
from .queries.flt import FuzzyLikeThis, resolve_fuzzy_like_this
from .scoring import levenshtein, phrase_freq, wildcard_to_regex


def _default_sim():
    from .scoring import DEFAULT_SIMILARITY

    return DEFAULT_SIMILARITY


@dataclass
class OracleIndex:
    N: int = 0
    avgdl: float = 0.0
    doclen: dict[int, int] = field(default_factory=dict)
    # term → {docid → positions list}
    postings: dict[str, dict[int, list[int]]] = field(default_factory=dict)
    # multi-field: per-field avgdl and per-(field, doc) length
    avgdl_fields: dict[str, float] = field(default_factory=dict)
    field_doclen: dict[str, dict[int, int]] = field(default_factory=dict)
    # analyzer chains the index was built with (query-side analysis must
    # match — reference QueryParser.java:513 / PerFieldAnalyzerWrapper)
    analyzer: str = "standard"
    field_analyzers: dict[str, str] = field(default_factory=dict)
    # index-time document boost, byte315-quantized at build like the
    # reference norm byte (document/Document.java:88 setBoost folded by
    # index/NormsWriter.java:61) — absent docid ⇒ 1.0
    boosts: dict[int, float] = field(default_factory=dict)
    # per-position payloads, aligned with postings' position lists
    # (None = no payload at that position); empty for plain indexes
    # (lucene_spark/payloads.py storage note)
    payloads: dict[str, dict[int, list]] = field(default_factory=dict)
    # pluggable Similarity (search/Similarity.java:527) — same strategy
    # object the engine's Ctx carries, so both engines swap together
    sim: object = field(default_factory=lambda: _default_sim())

    @property
    def terms_sorted(self) -> list[str]:
        return sorted(self.postings.keys())  # UTF-8/code-point order on ASCII

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def avgdl_of(self, term: str) -> float:
        if self.avgdl_fields and ":" in term:
            return self.avgdl_fields.get(term.split(":", 1)[0], self.avgdl)
        return self.avgdl

    def dl_of(self, term: str, docid: int) -> int:
        """Per-field doc length (per-field norms, index/NormsWriter.java:61)."""
        if self.field_doclen and ":" in term:
            f = term.split(":", 1)[0]
            if f in self.field_doclen:
                return self.field_doclen[f].get(docid, 0)
        return self.doclen[docid]

    def dl_of_any(self, terms: list[str], docid: int) -> int:
        """dl of the FIRST term (in order) whose postings contain the doc —
        the pinned mixed-field rule shared with the kernel's _dl_map."""
        for t in terms:
            if docid in self.postings.get(t, {}):
                return self.dl_of(t, docid)
        return self.dl_of(terms[0], docid)

    def boost_of(self, docid: int) -> float:
        return self.boosts.get(docid, 1.0)

    def payload_arr(self, term: str, docid: int) -> np.ndarray:
        """float32 payloads at the term's positions in the doc (NaN =
        absent) — quantized through the SAME float32 storage type the
        engine's payloads_blob uses, so both engines score from identical
        post-quantization values."""
        plist = self.postings.get(term, {}).get(docid, [])
        lst = self.payloads.get(term, {}).get(docid)
        if lst is None:
            return np.full(len(plist), np.nan, dtype=np.float32)
        return np.asarray([np.nan if v is None else v for v in lst],
                          dtype=np.float32)


def _pairs_fn(name: str):
    """Analyzer name → positional (term, pos) pairs function — delegates to
    THE shared definition (analysis.positional_pairs_fn) so the oracle and
    the build side can never assign positions differently."""
    from .analysis import positional_pairs_fn

    return positional_pairs_fn(name)


def build_oracle_index(docs: list[tuple[int, str]],
                       extra_fields: dict[str, dict[int, str]] | None = None,
                       analyzer: str = "standard",
                       field_analyzers: dict[str, str] | None = None,
                       boosts: dict[int, float] | None = None,
                       payload_fn=None,
                       similarity=None,
                       doc_langs: dict[int, str] | None = None,
                       ) -> OracleIndex:
    """`extra_fields`: {field: {docid: value}} — extra ANALYZED fields,
    terms namespaced field:term with their own length stats (the reference
    multi-field document model). `field_analyzers` maps an extra field to
    its own chain (PerFieldAnalyzerWrapper.java:47). `boosts`:
    {docid: boost} index-time document boosts — quantized through the SAME
    byte315 codec the engine's norms side-car stores, so both engines score
    with the identical post-quantization multiplier. `analyzer="by_lang"`
    routes each doc through `doc_langs[docid]`'s chain (the engine's
    multilingual-crawl analyzer) — the oracle twin of
    build_index(analyzer="by_lang")."""
    from .scoring import byte315_to_float, float_to_byte315, similarity_by_name

    idx = OracleIndex()
    idx.sim = similarity_by_name(similarity)
    idx.analyzer = analyzer
    idx.field_analyzers = dict(field_analyzers or {})
    idx.boosts = {d: float(byte315_to_float(float_to_byte315([b]))[0])
                  for d, b in (boosts or {}).items() if b != 1.0}
    if analyzer == "by_lang":
        from .lang import analyze_by_lang
        langs = doc_langs or {}

        def pairs_of(docid, text):
            return analyze_by_lang(text or "", langs.get(docid))
    else:
        analyze_main = _pairs_fn(analyzer)

        def pairs_of(docid, text):
            return analyze_main(text or "")
    total = 0
    for docid, text in docs:
        if payload_fn is not None:
            # payload-producing chain (lucene_spark/payloads.py): the
            # (term, pos) stream defines postings exactly as the base
            # chain would; payloads ride alongside, aligned per position
            triples = payload_fn(text or "")
            pairs = [(t, p) for t, p, _pay in triples]
            for term, pos, pay in triples:
                idx.payloads.setdefault(term, {}).setdefault(
                    docid, []).append(pay)
        else:
            pairs = pairs_of(docid, text)
        idx.doclen[docid] = len(pairs)
        total += len(pairs)
        for term, pos in pairs:
            idx.postings.setdefault(term, {}).setdefault(docid, []).append(pos)
    idx.N = len(docs)
    idx.avgdl = total / idx.N if idx.N else 0.0
    for f, by_doc in (extra_fields or {}).items():
        f_analyze = _pairs_fn((field_analyzers or {}).get(f, analyzer))
        ftotal = 0
        idx.field_doclen[f] = {}
        for docid, _ in docs:
            pairs = f_analyze(by_doc.get(docid) or "")
            idx.field_doclen[f][docid] = len(pairs)
            ftotal += len(pairs)
            for term, pos in pairs:
                idx.postings.setdefault(f"{f}:{term}", {}).setdefault(
                    docid, []).append(pos)
        idx.avgdl_fields[f] = ftotal / idx.N if idx.N else 0.0
    return idx


# ---------------------------------------------------------------------------
# Evaluation: query → {docid: score}
# ---------------------------------------------------------------------------

def _eval_term(idx: OracleIndex, q: Term) -> dict[int, float]:
    plist = idx.postings.get(q.term)
    if not plist:
        return {}
    df = len(plist)
    idf = float(idx.sim.term_weight(idx.N, df))
    out = {}
    for docid, positions in plist.items():
        w = float(idx.sim.tf_weight(len(positions), idx.dl_of(q.term, docid),
                                 idx.avgdl_of(q.term)))
        # index-time doc boost multiplies LAST — same association order as
        # the kernel's apply_boost over (q.boost * idf * tfw)
        out[docid] = q.boost * idf * w * idx.boost_of(docid)
    return out


def _eval_phrase(idx: OracleIndex, q: Phrase) -> dict[int, float]:
    plists = [idx.postings.get(t) for t in q.phrase_terms]
    if any(p is None for p in plists):
        return {}
    qpos = q.qpositions()
    # candidate docs: intersection
    docsets = [set(p.keys()) for p in plists]  # type: ignore[union-attr]
    cand = set.intersection(*docsets)
    if not cand:
        return {}
    freqs: dict[int, float] = {}
    for docid in cand:
        pos_lists = [np.asarray(plists[i][docid], dtype=np.int64) for i in range(len(plists))]  # type: ignore[index]
        f = phrase_freq(pos_lists, qpos, q.slop)
        if f > 0:
            freqs[docid] = f
    if not freqs:
        return {}
    # phrase idf = Σ idf(term) over unique phrase terms — the reference
    # PhraseWeight semantics (Similarity.idfExplain sums term idfs), which
    # needs only global term stats (segment-local kernels can't know global
    # phrase df)
    idf = float(sum(idx.sim.term_weight(idx.N, idx.df(t)) for t in dict.fromkeys(q.phrase_terms)))
    t0 = q.phrase_terms[0]
    return {
        d: q.boost * idf * float(
            idx.sim.tf_weight(f, idx.dl_of(t0, d), idx.avgdl_of(t0)))
        * idx.boost_of(d)
        for d, f in freqs.items()
    }


def _eval_multiphrase(idx: OracleIndex, q: MultiPhrase) -> dict[int, float]:
    """MultiPhraseQuery: per-slot union of alternative-term positions, then
    the shared phrase_freq; idf sums over all unique terms."""
    slot_pos: list[dict[int, np.ndarray]] = []
    for slot in q.slots:
        per_doc: dict[int, list[list[int]]] = {}
        for t in slot:
            for d, pl in idx.postings.get(t, {}).items():
                per_doc.setdefault(d, []).append(pl)
        if not per_doc:
            return {}
        slot_pos.append({
            d: np.unique(np.concatenate([np.asarray(p, dtype=np.int64)
                                         for p in parts]))
            for d, parts in per_doc.items()
        })
    cand = set(slot_pos[0])
    for sp in slot_pos[1:]:
        cand &= sp.keys()
    qpos = q.qpositions()
    uniq = list(dict.fromkeys(q.terms()))
    # absent terms (df=0) contribute no idf — matches the kernel's Ctx.idf
    idf = float(sum(idx.sim.term_weight(idx.N, idx.df(t)) for t in uniq if idx.df(t)))
    out: dict[int, float] = {}
    for d in cand:
        f = phrase_freq([sp[d] for sp in slot_pos], qpos, q.slop)
        if f > 0:
            out[d] = q.boost * idf * float(
                idx.sim.tf_weight(f, idx.dl_of_any(uniq, d),
                               idx.avgdl_of(uniq[0]))) * idx.boost_of(d)
    return out


def _rewrite_span_multis(idx: OracleIndex, q: Query) -> Query:
    """Expand SpanMulti wrappers against the oracle dictionary
    (SpanMultiTermQueryWrapper rewrite)."""
    from .queries.ast import (
        SpanFirst,
        SpanMask,
        SpanMulti,
        SpanNear,
        SpanNot,
        SpanOr,
        SpanTerm,
    )

    if isinstance(q, SpanMask):
        return SpanMask(_rewrite_span_multis(idx, q.inner), q.field, q.boost)
    if isinstance(q, SpanMulti):
        terms = expand_multiterm(idx.terms_sorted, q.query)
        return SpanOr([SpanTerm(t) for t in terms], boost=q.boost)
    if isinstance(q, SpanNear):
        return SpanNear([_rewrite_span_multis(idx, c) for c in q.clauses],
                        q.slop, q.in_order, q.boost)
    if isinstance(q, SpanOr):
        return SpanOr([_rewrite_span_multis(idx, c) for c in q.clauses],
                      q.boost)
    if isinstance(q, SpanNot):
        return SpanNot(_rewrite_span_multis(idx, q.include),
                       _rewrite_span_multis(idx, q.exclude), q.boost)
    if isinstance(q, SpanFirst):
        return SpanFirst(_rewrite_span_multis(idx, q.match), q.end, q.boost)
    return q


def _eval_span(idx: OracleIndex, q: SpanQuery) -> dict[int, float]:
    """Span family via the shared span algebra (lucene_spark/spans.py)."""
    from .spans import eval_spans, span_freq, span_width_min

    q = _rewrite_span_multis(idx, q)  # type: ignore[assignment]

    def pos_of(term: str) -> dict[int, np.ndarray]:
        return {d: np.asarray(pl, dtype=np.int64)
                for d, pl in idx.postings.get(term, {}).items()}

    spans = eval_spans(q, pos_of)
    if not spans:
        return {}
    wmin = span_width_min(q)
    uniq = list(dict.fromkeys(q.terms()))
    idf = float(sum(idx.sim.term_weight(idx.N, idx.df(t)) for t in uniq if idx.df(t)))
    out: dict[int, float] = {}
    for d, sp_arr in spans.items():
        f = span_freq(sp_arr, wmin)
        if f > 0:
            out[d] = q.boost * idf * float(
                idx.sim.tf_weight(f, idx.dl_of_any(uniq, d),
                               idx.avgdl_of(uniq[0]))) * idx.boost_of(d)
    return out


def _eval_payload_term(idx: OracleIndex, q) -> dict[int, float]:
    """PayloadTermQuery (search/payloads/PayloadTermQuery.java:48-142) —
    the shared PayloadFunction (payloads.payload_doc_score) over ALL of
    the doc's payloads for the term; span-score leg is _eval_term's BM25."""
    from .payloads import payload_doc_score

    plist = idx.postings.get(q.term)
    if not plist:
        return {}
    idf = float(idx.sim.term_weight(idx.N, len(plist)))
    out = {}
    for docid, positions in plist.items():
        dsc = payload_doc_score(idx.payload_arr(q.term, docid), q.func)
        if not q.include_span_score:
            out[docid] = dsc
            continue
        w = float(idx.sim.tf_weight(len(positions), idx.dl_of(q.term, docid),
                                 idx.avgdl_of(q.term)))
        # association order pinned to the kernel: (boost·idf·w)·nrm, ×dsc
        out[docid] = q.boost * idf * w * idx.boost_of(docid) * dsc
    return out


def _eval_payload_near(idx: OracleIndex, q) -> dict[int, float]:
    """PayloadNearQuery (search/payloads/PayloadNearQuery.java:54-200) —
    matches and per-clause matched positions from the SHARED
    payloads.payload_near_matches (identical to the kernel), payloads
    read at exactly those positions."""
    from .payloads import payload_doc_score, payload_near_matches

    terms = list(q.phrase_terms)
    if not terms or any(not idx.postings.get(t) for t in terms):
        return {}
    cand = set(idx.postings[terms[0]].keys())
    for t in terms[1:]:
        cand &= idx.postings[t].keys()
    wmin = len(terms)
    uniq = list(dict.fromkeys(terms))
    idf = float(sum(idx.sim.term_weight(idx.N, idx.df(t)) for t in uniq if idx.df(t)))
    out: dict[int, float] = {}
    for d in cand:
        plists = [np.asarray(idx.postings[t][d], dtype=np.int64)
                  for t in terms]
        matches = payload_near_matches(plists, q.slop, q.in_order)
        if not matches:
            continue
        fr = 0.0
        vals: list[float] = []
        for (s, e, clause_pos) in matches:
            fr += 1.0 / (1.0 + max((e - s) - wmin, 0))
            for i, p in enumerate(clause_pos):
                j = int(np.searchsorted(plists[i], p))
                vals.append(idx.payload_arr(terms[i], d)[j])
        dsc = payload_doc_score(np.asarray(vals, dtype=np.float32), q.func)
        if not q.include_span_score:
            out[d] = dsc
            continue
        w = float(idx.sim.tf_weight(fr, idx.dl_of_any(uniq, d),
                                 idx.avgdl_of(uniq[0])))
        out[d] = q.boost * idf * w * idx.boost_of(d) * dsc
    return out


def oracle_payloads_for_query(idx: OracleIndex, q: Query
                              ) -> list[tuple[int, float]]:
    """Single-node PayloadSpanUtil.getPayloadsForQuery — the SAME
    payload_units conversion and extract_unit_payloads walker the Spark
    kernel uses, fed the oracle's postings/payloads. Sorted
    (docid, payload) multiset."""
    from .payloads import extract_unit_payloads, payload_units

    pos_cache: dict[str, dict] = {}
    pay_cache: dict[str, dict] = {}

    def pos_of(t: str) -> dict:
        if t not in pos_cache:
            pos_cache[t] = {d: np.asarray(pl, dtype=np.int64)
                            for d, pl in idx.postings.get(t, {}).items()}
            pay_cache[t] = {d: idx.payload_arr(t, d)
                            for d in idx.postings.get(t, {})}
        return pos_cache[t]

    def pay_of(t: str) -> dict:
        pos_of(t)
        return pay_cache[t]

    out: list[tuple[int, float]] = []
    for u in payload_units(q):
        out.extend(extract_unit_payloads(u, pos_of, pay_of))
    return sorted(out)


def expand_multiterm(idx_terms: list[str], q: Query,
                     max_clauses: int | None = 1024) -> list[str]:
    """MultiTermQuery term enumeration against the term dictionary
    (reference search/MultiTermQuery.java:98-146 rewrite; pinned rewrite mode:
    scoring boolean disjunction). Unfielded patterns skip namespaced
    'field:term' entries — the default field must not sweep other fields,
    fielded ones stay inside their field's namespace, and the expansion is
    capped at `max_clauses` terms in term order (mirrors
    IndexReader.expand_terms + planner MAX_CLAUSES; pass None for the
    uncapped top-level constant-score-filter rewrite, which never
    enumerates in the engine and so has no clause limit)."""
    MAX_CLAUSES = len(idx_terms) + 1 if max_clauses is None else max_clauses
    if isinstance(q, Prefix):
        if ":" not in q.prefix:
            idx_terms = [t for t in idx_terms if ":" not in t]
        return [t for t in idx_terms if t.startswith(q.prefix)][:MAX_CLAUSES]
    if isinstance(q, Wildcard):
        if ":" not in q.pattern:
            idx_terms = [t for t in idx_terms if ":" not in t]
        rx = re.compile(wildcard_to_regex(q.pattern))
        return [t for t in idx_terms if rx.match(t)][:MAX_CLAUSES]
    if isinstance(q, Regexp):
        if ":" not in q.pattern:
            idx_terms = [t for t in idx_terms if ":" not in t]
        rx = re.compile(q.pattern)
        return [t for t in idx_terms if rx.fullmatch(t)][:MAX_CLAUSES]
    if isinstance(q, Fuzzy):
        if ":" not in q.term:
            idx_terms = [t for t in idx_terms if ":" not in t]
        else:
            # fielded fuzzy stays strictly within ITS field: edit distance
            # must not span the namespace prefix into a similar field name
            fprefix = q.term.split(":", 1)[0] + ":"
            idx_terms = [t for t in idx_terms if t.startswith(fprefix)]
        pre_len = min(q.prefix_length, len(q.term))
        pre = q.term[:pre_len]
        if q.min_similarity is not None:
            # classic FuzzyTermEnum semantics (search/FuzzyTermEnum.java:
            # 129-136,185-216): distance on post-prefix suffixes, similarity
            # 1 − dist/(prefixLen + min(suffix lens)), strict > threshold
            tsuf = q.term[pre_len:]
            n = len(tsuf)

            def sim_of(t: str) -> float:
                suf = t[pre_len:]
                m = len(suf)
                if n == 0:
                    return 1.0 - m / pre_len if pre_len else 0.0
                if m == 0:
                    return 1.0 - n / pre_len if pre_len else 0.0
                return 1.0 - levenshtein(suf, tsuf) / (pre_len + min(m, n))

            return [t for t in idx_terms
                    if t.startswith(pre)
                    and sim_of(t) > q.min_similarity][:MAX_CLAUSES]
        return [
            t
            for t in idx_terms
            if t.startswith(pre)
            and abs(len(t) - len(q.term)) <= q.max_edits
            and levenshtein(t, q.term) <= q.max_edits
        ][:MAX_CLAUSES]
    if isinstance(q, TermRange):
        if not any(b and ":" in b for b in (q.lo, q.hi)):
            idx_terms = [t for t in idx_terms if ":" not in t]

        def ok(t: str) -> bool:
            if q.lo is not None and (t < q.lo or (t == q.lo and not q.include_lo)):
                return False
            if q.hi is not None and (t > q.hi or (t == q.hi and not q.include_hi)):
                return False
            return True
        return [t for t in idx_terms if ok(t)][:MAX_CLAUSES]
    raise TypeError(type(q))


def _eval(idx: OracleIndex, q: Query) -> dict[int, float]:
    if isinstance(q, Term):
        return _eval_term(idx, q)
    if isinstance(q, Phrase):
        return _eval_phrase(idx, q)
    if isinstance(q, MultiPhrase):
        return _eval_multiphrase(idx, q)
    if isinstance(q, SpanQuery):
        return _eval_span(idx, q)
    if isinstance(q, PayloadTerm):
        return _eval_payload_term(idx, q)
    if isinstance(q, PayloadNear):
        return _eval_payload_near(idx, q)
    if isinstance(q, FuzzyLikeThis):
        # contrib FuzzyLikeThisQuery rewrite (FuzzyLikeThisQuery.java:254):
        # same shared resolver as the planner, fed the oracle dictionary
        def _flt_analyze(fld: str, text: str) -> list[str]:
            if fld in ("", "text"):
                return [t for t, _p in _pairs_fn(idx.analyzer)(text)]
            an = idx.field_analyzers.get(fld, idx.analyzer)
            return [f"{fld}:{t}" for t, _p in _pairs_fn(an)(text)]

        resolved = resolve_fuzzy_like_this(
            q,
            lambda fq: [(t, idx.df(t))
                        for t in expand_multiterm(idx.terms_sorted, fq)],
            idx.df, idx.N, _flt_analyze)
        return _eval(idx, resolved)
    if isinstance(q, (Prefix, Wildcard, Fuzzy, TermRange, Regexp)):
        terms = expand_multiterm(idx.terms_sorted, q)
        mode = getattr(q, "rewrite_method", "scoring_boolean")
        if mode != "scoring_boolean":
            # constant-score rewrites (search/MultiTermQuery.java:63-146):
            # uniform score = boost; filter/boolean/auto agree on results
            b = Bool(should=[Term(t) for t in terms])
            return {d: q.boost * 1.0 for d in _eval(idx, b)}
        b = Bool(should=[Term(t) for t in terms], boost=q.boost)
        return _eval(idx, b)
    if isinstance(q, MatchAll):
        return {d: q.boost * 1.0 for d in idx.doclen}
    if isinstance(q, ConstantScore):
        inner = _eval(idx, q.query)
        return {d: q.boost * 1.0 for d in inner}
    if isinstance(q, Boosting):
        match = _eval(idx, q.match)
        ctx_docs = set(_eval(idx, q.context))
        return {d: q.boost * (s * q.demote if d in ctx_docs else s)
                for d, s in match.items()}
    if isinstance(q, DisjunctionMax):
        subs = [_eval(idx, s) for s in q.queries]
        out: dict[int, float] = {}
        all_docs = set().union(*[s.keys() for s in subs]) if subs else set()
        for d in all_docs:
            scores = [s[d] for s in subs if d in s]
            out[d] = q.boost * (max(scores) + q.tie_breaker * (sum(scores) - max(scores)))
        return out
    if isinstance(q, Bool):
        if not q.must and not q.should:
            return {}  # empty / pure-negative boolean matches nothing (reference BooleanQuery semantics)
        must = [_eval(idx, c) for c in q.must]
        should = [_eval(idx, c) for c in q.should]
        must_not = [_eval(idx, c) for c in q.must_not]
        min_should = q.effective_min_should()
        if must:
            cand = set(must[0].keys())
            for m in must[1:]:
                cand &= m.keys()
        elif should:
            cand = set().union(*[s.keys() for s in should])
        else:
            cand = set(idx.doclen.keys())
        for mn in must_not:
            cand -= mn.keys()
        out = {}
        for d in cand:
            s_hits = [s[d] for s in should if d in s]
            if len(s_hits) < min_should:
                continue
            out[d] = q.boost * (sum(m[d] for m in must) + sum(s_hits))
        return out
    raise TypeError(type(q))


def oracle_search(idx: OracleIndex, q: Query, k: int = 10) -> list[tuple[int, float]]:
    """Top-k by (score desc, docid asc) — the reference tie-break
    (search/TopScoreDocCollector.java:54-62: lower docID wins on equal score).

    Top-level constant-score-filter shapes (a MultiTermQuery with
    rewrite_method=constant_score_filter, or ConstantScore(MultiTermQuery))
    expand UNCAPPED — the engine plans these as a pushed-down postings
    predicate with no enumeration and no 1024-clause limit
    (planner._multiterm_filter_ids; reference MultiTermQuery.java:72
    ConstantScoreFilterRewrite). Nested filter nodes stay capped in both
    engines (they rewrite through the boolean path)."""
    from .queries.ast import REWRITE_CONST_FILTER

    node = None
    mtq = (Prefix, Wildcard, Fuzzy, TermRange, Regexp)
    if isinstance(q, ConstantScore) and isinstance(q.query, mtq):
        node, boost = q.query, q.boost
    elif isinstance(q, mtq) and getattr(q, "rewrite_method", None) == REWRITE_CONST_FILTER:
        node, boost = q, q.boost
    if node is not None:
        terms = expand_multiterm(idx.terms_sorted, node, max_clauses=None)
        docs = set()
        for t in terms:
            docs.update(idx.postings.get(t, {}))
        return sorted(((d, boost * 1.0) for d in docs),
                      key=lambda kv: (-kv[1], kv[0]))[:k]
    scores = _eval(idx, q)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
