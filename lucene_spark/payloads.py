"""Payloads — per-position metadata stored in the postings and consumed by
payload-scoring queries.

Reference surface this re-expresses (cites are /root/reference paths):

- ``PayloadHelper`` (contrib/analyzers/.../payloads/PayloadHelper.java:25-73):
  big-endian 4-byte float/int payload codecs — byte-compatible here.
- ``DelimitedPayloadTokenFilter``
  (contrib/analyzers/.../payloads/DelimitedPayloadTokenFilter.java:39-71):
  ``token|payload`` split at the first delimiter, payload decoded by an
  encoder ('float' ≙ FloatEncoder, 'int' ≙ IntegerEncoder), tokens without
  the delimiter carry NO payload.
- ``NumericPayloadTokenFilter``
  (contrib/analyzers/.../payloads/NumericPayloadTokenFilter.java:31-59):
  a constant payload attached to every token (the reference restricts by
  token *type*; this engine's simple chains have one type, so an optional
  term predicate stands in for the type match).
- ``TokenOffsetPayloadTokenFilter``
  (contrib/analyzers/.../payloads/TokenOffsetPayloadTokenFilter.java):
  position-derived payloads — here generalized to ``payload = fn(pos)``
  (this engine's analysis chain tracks positions, not char offsets).
- ``PayloadTermQuery`` / ``PayloadNearQuery`` / ``PayloadFunction``
  (src/java/org/apache/lucene/search/payloads/*.java): matching documented
  on the AST nodes (queries/ast.py) and the kernel evaluators
  (queries/kernel.py).

Storage note (engine-defined): the index stores payloads as float32 values
aligned one-to-one with the positions stream (``payloads_blob`` =
little-endian float32 array per posting row, tf offsets shared with the
positions split) — the Arrow/parquet-native restatement of the reference's
per-position byte[] payload in the .prx stream
(index/FormatPostingsPositionsWriter.java payload writes). A missing
payload is stored as NaN; NaN therefore cannot itself be used as a payload
value (documented deviation — the reference can store any byte[]).
``encode_float``/``decode_float`` below remain byte-compatible with the
Java PayloadHelper for API parity.
"""

from __future__ import annotations

import struct
from collections.abc import Callable

import numpy as np

# fn(text) -> [(term, position, payload-or-None)]
PayloadPairsFn = Callable[[str], list[tuple[str, int, float | None]]]

# name -> (base_analyzer_name, PayloadPairsFn). The base analyzer defines
# query-side analysis (parser/oracle term+position semantics must match the
# index); the payload fn is the index-time chain.
PAYLOAD_ANALYZERS: dict[str, tuple[str, PayloadPairsFn]] = {}


def register_payload_analyzer(name: str, base_analyzer: str,
                              fn: PayloadPairsFn) -> None:
    """Register a payload-producing chain for build_index(payload_analyzer=
    name) — the Analyzer plug point extended with the payload attribute
    (analysis/Token.java setPayload)."""
    PAYLOAD_ANALYZERS[name] = (base_analyzer, fn)


# ---------------------------------------------------------------------------
# PayloadHelper codecs (byte-compatible with the Java reference)
# ---------------------------------------------------------------------------

def encode_float(payload: float) -> bytes:
    """PayloadHelper.encodeFloat: big-endian IEEE-754 bits (PayloadHelper
    .java:26-32 floatToIntBits then byte-wise big-endian)."""
    return struct.pack(">f", payload)


def decode_float(data: bytes, offset: int = 0) -> float:
    """PayloadHelper.decodeFloat (PayloadHelper.java:56-67)."""
    return struct.unpack_from(">f", data, offset)[0]


def encode_int(payload: int) -> bytes:
    """PayloadHelper.encodeInt (PayloadHelper.java:34-43)."""
    return struct.pack(">i", payload)


def decode_int(data: bytes, offset: int = 0) -> int:
    """PayloadHelper.decodeInt (PayloadHelper.java:69-72)."""
    return struct.unpack_from(">i", data, offset)[0]


# ---------------------------------------------------------------------------
# payload-producing chains
# ---------------------------------------------------------------------------

def make_delimited_payload(tokenizer: str = "whitespace",
                           delimiter: str = "|",
                           encoder: str = "float") -> PayloadPairsFn:
    """DelimitedPayloadTokenFilter (DelimitedPayloadTokenFilter.java:56-70):
    each token splits at the FIRST delimiter; the left side is the term,
    the right side decodes as the payload ('float' or 'int' encoder, the
    FloatEncoder/IntegerEncoder of the reference). No delimiter → no
    payload. The tokenizer must not split on the delimiter (same caveat as
    the reference javadoc) — whitespace/keyword chains qualify.
    Position semantics follow the BASE tokenizer: positions are assigned
    to the pre-split tokens (consecutive 0..n-1 for simple chains), so a
    payload-bearing index is position-compatible with a plain index built
    from the delimiter-stripped text."""
    from .analysis import positional_pairs_fn

    base = positional_pairs_fn(tokenizer)
    to_val = float if encoder == "float" else int
    if encoder not in ("float", "int"):
        raise ValueError(f"unknown payload encoder: {encoder!r}")

    def fn(text: str) -> list[tuple[str, int, float | None]]:
        out: list[tuple[str, int, float | None]] = []
        for tok, pos in base(text or ""):
            i = tok.find(delimiter)
            if i < 0:
                out.append((tok, pos, None))
                continue
            raw = tok[i + 1:]
            try:
                val = float(to_val(raw))
            except ValueError:
                # a malformed payload suffix on crawled text must not fail
                # the build task: keep the full token, no payload
                out.append((tok, pos, None))
                continue
            out.append((tok[:i], pos, val))
        return out

    return fn


def make_numeric_payload(tokenizer: str, payload: float,
                         match: Callable[[str], bool] | None = None
                         ) -> PayloadPairsFn:
    """NumericPayloadTokenFilter (NumericPayloadTokenFilter.java:44-52): a
    constant payload on every token (``match`` restricts which terms get
    it — the reference matches on token TYPE; simple chains here are
    single-typed, so a term predicate is the equivalent hook)."""
    from .analysis import positional_pairs_fn

    base = positional_pairs_fn(tokenizer)
    val = float(payload)

    def fn(text: str) -> list[tuple[str, int, float | None]]:
        return [(t, p, val if (match is None or match(t)) else None)
                for t, p in base(text or "")]

    return fn


def make_position_payload(tokenizer: str,
                          fn_of_pos: Callable[[int], float]
                          ) -> PayloadPairsFn:
    """TokenOffsetPayloadTokenFilter analog
    (TokenOffsetPayloadTokenFilter.java — start/end offset as payload):
    payload = fn(position). This engine's chains track positions, not char
    offsets, so the position is the offset-like quantity available."""
    from .analysis import positional_pairs_fn

    base = positional_pairs_fn(tokenizer)

    def fn(text: str) -> list[tuple[str, int, float | None]]:
        return [(t, p, float(fn_of_pos(p))) for t, p in base(text or "")]

    return fn


# ---------------------------------------------------------------------------
# payload blob codec (index storage)
# ---------------------------------------------------------------------------

_NAN = np.float32(np.nan)


def encode_payloads_blob(pay_lists: list, tfs: np.ndarray) -> bytes:
    """Per-doc payload lists (aligned with the positions lists; None → NaN)
    → little-endian float32 blob. tf offsets shared with the positions
    decode split. Lists shorter than their tf (or missing entirely, e.g. a
    legacy row merged into a payload index) pad with NaN — alignment with
    the tf offsets is an invariant, never an assumption."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    if total == 0:
        return b""
    flat = np.full(total, _NAN, dtype=np.float32)
    ofs = 0
    for i, tf in enumerate(tfs):
        tf = int(tf)
        pl = pay_lists[i] if i < len(pay_lists) and pay_lists[i] is not None else ()
        n = min(len(pl), tf)
        if n:
            flat[ofs:ofs + n] = np.asarray(
                [(_NAN if v is None else v) for v in pl[:n]],
                dtype=np.float32)
        ofs += tf
    return flat.tobytes()


def decode_payloads_flat(blob: bytes) -> np.ndarray:
    """payloads_blob → float32 array (NaN = no payload at that position)."""
    if not blob:
        return np.empty(0, dtype=np.float32)
    return np.frombuffer(bytes(blob), dtype="<f4")


def decode_payloads_at(blob: bytes, tfs: np.ndarray,
                       sel: np.ndarray) -> list[np.ndarray]:
    """Per-doc payload arrays for ONLY the docs at (sorted) posting indices
    ``sel`` — the payload twin of codec.decode_positions_at (lazy payload
    read: the reference loads a position's payload only on demand,
    index/SegmentTermPositions.java getPayload)."""
    flat = decode_payloads_flat(blob)
    offs = np.concatenate(([0], np.cumsum(np.asarray(tfs, dtype=np.int64))))
    return [flat[offs[i]:offs[i + 1]] for i in np.asarray(sel, dtype=np.int64)]


# ---------------------------------------------------------------------------
# PayloadFunction (search/payloads/PayloadFunction.java + Min/Max/Average)
# ---------------------------------------------------------------------------

def payload_doc_score(values: np.ndarray, func: str) -> float:
    """docScore over the doc's AVAILABLE payloads (NaN = absent, skipped —
    the reference increments payloadsSeen only when
    isPayloadAvailable(), PayloadTermQuery.java:117-128). No payloads seen
    → 1 (AveragePayloadFunction.java:36, Min/Max identical rule)."""
    if values.size:
        values = values[~np.isnan(values)]
    if values.size == 0:
        return 1.0
    v = values.astype(np.float64)
    if func == "avg":
        # reference accumulation order: running sum over occurrences, then
        # one divide (AveragePayloadFunction currentScore/docScore)
        return float(v.sum() / v.size)
    if func == "min":
        return float(v.min())
    if func == "max":
        return float(v.max())
    raise ValueError(f"unknown payload function: {func!r}")


# ---------------------------------------------------------------------------
# PayloadSpanUtil (search/payloads/PayloadSpanUtil.java) — query → units
# ---------------------------------------------------------------------------

def payload_units(q) -> list:
    """PayloadSpanUtil.queryToSpanQuery (PayloadSpanUtil.java:74-170)
    re-expressed as flat extraction units:

      ("term", term)                        TermQuery / SpanTermQuery
      ("or", [terms])                       SpanOr of terms
      ("near", clauses, slop, in_order)     PhraseQuery (in_order iff
                                            slop==0, the reference rule) /
                                            MultiPhraseQuery / SpanNear —
                                            each clause a list of
                                            alternative terms

    Boolean recurses into non-prohibited clauses (must + should;
    PayloadSpanUtil.java:80 isProhibited skip); DisjunctionMax into every
    leg; FilteredQuery into its scored side. Shapes the reference's
    if-chain does not handle contribute NOTHING (same silent-skip — its
    javadoc says to rewrite wildcards first). SpanNot/SpanFirst/SpanMask
    raise: the reference serves them through generic Spans payload
    iteration, which this engine does not re-express (documented
    deviation)."""
    from .queries.ast import (Bool, Boosting, ConstantScore, DisjunctionMax,
                              MultiPhrase, PayloadNear, PayloadTerm, Phrase,
                              SpanNear, SpanOr, SpanQuery, SpanTerm, Term)

    def clause_terms(c) -> list[str]:
        if isinstance(c, SpanTerm):
            return [c.term]
        if isinstance(c, SpanOr) and all(
                isinstance(s, SpanTerm) for s in c.clauses):
            return [s.term for s in c.clauses]
        raise ValueError(
            f"unsupported span clause for payload extraction: {type(c).__name__}")

    units: list = []

    def walk(q) -> None:
        if isinstance(q, Bool):
            for c in list(q.must) + list(q.should):
                walk(c)
        elif isinstance(q, Phrase):
            # reference PhraseQuery branch: terms only, in_order iff
            # slop==0 (PayloadSpanUtil.java:86-101; position holes are
            # ignored there too)
            units.append(("near", [[t] for t in q.phrase_terms], q.slop,
                          q.slop == 0))
        elif isinstance(q, MultiPhrase):
            # MultiPhraseQuery branch (PayloadSpanUtil.java:117-166):
            # group alternatives by query position, add position gaps to
            # the slop, in_order iff slop==0
            by_pos: dict[int, list[str]] = {}
            for slot, p in zip(q.slots, q.qpositions()):
                by_pos.setdefault(p, []).extend(slot)
            gaps = (max(by_pos) + 1) - len(by_pos) if by_pos else 0
            units.append(("near", [by_pos[p] for p in sorted(by_pos)],
                          q.slop + gaps, q.slop == 0))
        elif isinstance(q, (Term, PayloadTerm)):
            units.append(("term", q.term))
        elif isinstance(q, PayloadNear):
            units.append(("near", [[t] for t in q.phrase_terms], q.slop,
                          q.in_order))
        elif isinstance(q, SpanTerm):
            units.append(("term", q.term))
        elif isinstance(q, SpanOr):
            units.append(("or", clause_terms(q)))
        elif isinstance(q, SpanNear):
            units.append(("near", [clause_terms(c) for c in q.clauses],
                          q.slop, q.in_order))
        elif isinstance(q, SpanQuery):
            raise ValueError(
                f"unsupported span shape for payload extraction: {type(q).__name__}")
        elif isinstance(q, DisjunctionMax):
            for c in q.queries:
                walk(c)
        elif isinstance(q, (ConstantScore,)):
            walk(q.query)
        elif isinstance(q, Boosting):
            walk(q.match)
        # anything else: silently contributes nothing (reference if-chain)

    walk(q)
    return units


def unit_terms(units: list) -> list[str]:
    """All terms an extraction-unit list touches (postings scan pred)."""
    out: list[str] = []
    for u in units:
        if u[0] == "term":
            out.append(u[1])
        elif u[0] == "or":
            out.extend(u[1])
        else:
            for alts in u[1]:
                out.extend(alts)
    return list(dict.fromkeys(out))


def merge_clause_doc(pos_arrays: list, pay_arrays: list
                     ) -> tuple[np.ndarray, np.ndarray]:
    """One doc, one clause: merge the alternative terms' (positions,
    payloads) into one position-sorted pair (a SpanOr clause's merged
    spans). Alternatives never share a position (one token per position
    in this engine's chains)."""
    pos = np.concatenate(pos_arrays) if pos_arrays else np.empty(0, np.int64)
    pay = (np.concatenate(pay_arrays) if pay_arrays
           else np.empty(0, np.float32))
    order = np.argsort(pos, kind="stable")
    return pos[order], pay[order]


def extract_unit_payloads(unit, pos_of, pay_of) -> list[tuple[int, float]]:
    """(docid, payload) pairs for one extraction unit — payloads at every
    matched position, NaN (absent) skipped like the reference's
    isPayloadAvailable() gate (PayloadSpanUtil.java:173-178). `pos_of` /
    `pay_of`: term → {docid → positions / aligned payloads}. Shared by the
    Spark kernel and the single-node oracle."""
    out: list[tuple[int, float]] = []

    def emit(d: int, vals) -> None:
        for v in vals:
            if not np.isnan(v):
                out.append((d, float(v)))

    if unit[0] in ("term", "or"):
        terms = [unit[1]] if unit[0] == "term" else unit[1]
        docs = sorted({d for t in terms for d in pos_of(t)})
        for d in docs:
            pos_a = [pos_of(t)[d] for t in terms if d in pos_of(t)]
            pay_a = [pay_of(t)[d] for t in terms if d in pay_of(t)]
            _p, pay = merge_clause_doc(pos_a, pay_a)
            emit(d, pay)
        return out

    _kind, clauses, slop, in_order = unit
    docsets = []
    for alts in clauses:
        ds: set = set()
        for t in alts:
            ds |= set(pos_of(t))
        docsets.append(ds)
    cand = sorted(set.intersection(*docsets)) if docsets else []
    for d in cand:
        plists, paylists = [], []
        for alts in clauses:
            pos_a = [pos_of(t)[d] for t in alts if d in pos_of(t)]
            pay_a = [pay_of(t)[d] for t in alts if d in pay_of(t)]
            p, pay = merge_clause_doc(pos_a, pay_a)
            plists.append(p)
            paylists.append(pay)
        for (_s, _e, clause_pos) in payload_near_matches(plists, slop,
                                                         in_order):
            vals = []
            for i, p in enumerate(clause_pos):
                j = int(np.searchsorted(plists[i], p))
                vals.append(paylists[i][j])
            emit(d, vals)
    return out


# ---------------------------------------------------------------------------
# near matching with per-clause match positions (PayloadNearQuery support)
# ---------------------------------------------------------------------------

def payload_near_matches(pos_lists: list[np.ndarray], slop: int,
                         in_order: bool) -> list[tuple[int, int, list[int]]]:
    """Near matches over width-1 (term) clauses, returning each match's
    (start, end, [per-clause matched position]) so payloads can be read at
    the exact matched positions (PayloadNearQuery.getPayloads walks the
    subspans' payloads, PayloadNearQuery.java:152-178).

    Semantics are EXACTLY spans.py's deterministic-greedy matchers
    specialized to width-1 clauses (ordered: earliest following position
    per clause, one chain per first-clause occurrence, Σ gaps ≤ slop;
    unordered: the reference's min-start sliding window), including the
    duplicate-span suppression of spans._as_spans — so a PayloadNear's
    match set is identical to the SpanNear over the same clauses (pinned
    by tests). Both the Spark kernel and the single-node oracle call THIS
    function."""
    matches: list[tuple[int, int, list[int]]] = []
    if in_order:
        for a in pos_lists[0]:
            chain = [int(a)]
            cur_end = int(a) + 1
            gap = 0
            ok = True
            for ps in pos_lists[1:]:
                i = int(np.searchsorted(ps, cur_end))
                if i >= ps.size:
                    ok = False
                    break
                p = int(ps[i])
                gap += p - cur_end
                cur_end = p + 1
                chain.append(p)
            if ok and gap <= slop:
                matches.append((chain[0], cur_end, chain))
    else:
        ptrs = [0] * len(pos_lists)
        last_span: tuple[int, int] | None = None
        while all(p < ps.size for p, ps in zip(ptrs, pos_lists)):
            cur = [int(ps[p]) for p, ps in zip(ptrs, pos_lists)]
            window = (max(cur) + 1) - min(cur)
            if window - len(cur) <= slop:
                span = (min(cur), max(cur) + 1)
                if span != last_span:
                    matches.append((span[0], span[1], list(cur)))
                    last_span = span
            adv = min(range(len(cur)), key=lambda i: cur[i])
            ptrs[adv] += 1
    if not matches:
        return matches
    # _as_spans parity: sort by (start, end), drop exact duplicate spans
    # (first occurrence keeps its clause positions — deterministic)
    matches.sort(key=lambda m: (m[0], m[1]))
    out: list[tuple[int, int, list[int]]] = []
    for m in matches:
        if out and out[-1][0] == m[0] and out[-1][1] == m[1]:
            continue
        out.append(m)
    return out
