"""FastVectorHighlighter — the contrib/fast-vector-highlighter pipeline.

Reference semantics (cites /root/reference/contrib/fast-vector-highlighter/
src/java/org/apache/lucene/search/vectorhighlight/...):

- ``FieldQuery.java:56-185``: flatten the query to terms + multi-term
  phrases (prohibited clauses dropped, other shapes discarded; 1-term
  phrases demote to terms), EXPAND overlapping phrase pairs ("a b" + "b c"
  → "a b c", same slop only), then index everything in a term-sequence
  trie (QueryPhraseMap) whose terminal nodes carry (slop, boost, seqnum).
  With phraseHighlight=False (:64-70) each phrase's individual terms are
  terminal too.
- ``FieldTermStack.java``: per-hit list of (term, position, startOffset,
  endOffset) restricted to query terms, position-ascending. The reference
  reads offsets from stored term vectors; here they come from re-analyzing
  the stored text with an offset-tracking tokenizer (the engine's forward
  index stores positions, not offsets — recompute-at-display is the same
  trade the contrib highlighter makes).
- ``FieldPhraseList.java:40-97``: greedy longest-match walk of the stack
  through the trie with single-step backtrack; validity = terminal node
  AND every adjacent position gap within slop (|next-pos-1| <= slop,
  FieldQuery.java:381-397); adjacent-position matches merge their char
  offsets (WeightedPhraseInfo:105-134); overlapping matches are dropped
  (addIfNoOverlap, first wins).
- ``SimpleFragListBuilder.java:30-82``: fragments of fragCharSize chars
  starting MARGIN=6 before each surviving match (clamped to the previous
  fragment's end), widened to cover the phrase; later phrases that fit
  are absorbed.
- ``BaseFragmentsBuilder.java:96-125`` + Simple/ScoreOrderFragmentsBuilder:
  slice text[start:end], wrap each match with pre/post tags selected by
  seqnum % len(tags); ScoreOrder emits fragments by total boost desc.

Scale shape: stages 1 runs once per query on the driver (tiny); stages
2-4 run per displayed hit — top-k-sized work, exactly the reference's
cost model — inside one Arrow-batched mapInPandas over the hydrated hits.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .queries.ast import Bool, ConstantScore, DisjunctionMax, Phrase, Term

MARGIN = 6                      # SimpleFragListBuilder.java:31
MIN_FRAG_CHAR_SIZE = MARGIN * 3  # :32


# ---------------------------------------------------------------------------
# FieldQuery: flatten → expand → trie
# ---------------------------------------------------------------------------

@dataclass
class _Node:
    """QueryPhraseMap (FieldQuery.java:295-371)."""
    sub: dict = field(default_factory=dict)
    terminal: bool = False
    slop: int = 0
    boost: float = 1.0
    num: int = -1


class FieldQuery:
    """flatten/expand/trie of FieldQuery.java:54-71. ``phrase_highlight``
    False additionally marks each phrase's terms terminal (:64-70)."""

    def __init__(self, query, phrase_highlight: bool = True):
        flat: list = []
        self._flatten(query, flat)
        self.term_set = {t for q in flat for t in q.terms()}
        self.root = _Node()
        self._counter = 0
        for q in self._expand(flat):
            self._add(q)
            if not phrase_highlight and isinstance(q, Phrase) \
                    and len(q.phrase_terms) > 1:
                for t in q.phrase_terms:
                    self._add(Term(t, boost=q.boost))

    def _flatten(self, q, out: list) -> None:
        # FieldQuery.java:74-103 — prohibited clauses dropped, unknown
        # shapes discarded (the reference does exactly this)
        if isinstance(q, Bool):
            for c in list(q.must) + list(q.should):
                self._flatten(c, out)
        elif isinstance(q, DisjunctionMax):
            for c in q.queries:
                self._flatten(c, out)
        elif isinstance(q, ConstantScore):
            self._flatten(q.query, out)
        elif isinstance(q, Term):
            if not any(isinstance(o, Term) and o.term == q.term for o in out):
                out.append(q)
        elif isinstance(q, Phrase):
            if len(q.phrase_terms) == 1:
                self._flatten(Term(q.phrase_terms[0], boost=q.boost), out)
            elif len(q.phrase_terms) > 1 and not any(
                    isinstance(o, Phrase)
                    and o.phrase_terms == q.phrase_terms
                    and o.slop == q.slop for o in out):
                out.append(q)

    def _expand(self, flat: list) -> list:
        # FieldQuery.java:115-186 — merge overlapped phrase pairs
        out = list(flat)
        seen = {(tuple(q.phrase_terms), q.slop) for q in flat
                if isinstance(q, Phrase)}
        phrases = [q for q in flat if isinstance(q, Phrase)]
        for i, a in enumerate(phrases):
            for b in phrases[i + 1:]:
                if a.slop != b.slop:
                    continue
                for src, dst in ((a, b), (b, a)):
                    s, d = src.phrase_terms, dst.phrase_terms
                    for k in range(1, len(s)):
                        tail = s[k:]
                        if tail == d[:len(tail)] and len(s) - k < len(d):
                            merged = tuple(s + d[len(tail):])
                            if (merged, src.slop) not in seen:
                                seen.add((merged, src.slop))
                                out.append(Phrase(list(merged),
                                                  slop=src.slop,
                                                  boost=src.boost))
        return out

    def _add(self, q) -> None:
        node = self.root
        terms = [q.term] if isinstance(q, Term) else q.phrase_terms
        for t in terms:
            node = node.sub.setdefault(t, _Node())
        node.terminal = True
        node.slop = getattr(q, "slop", 0)
        node.boost = q.boost
        node.num = self._counter
        self._counter += 1


def _valid(node: _Node, cand: list) -> bool:
    """isValidTermOrPhrase (FieldQuery.java:381-397)."""
    if not node.terminal:
        return False
    if len(cand) == 1:
        return True
    pos = cand[0][1]
    for ti in cand[1:]:
        if abs(ti[1] - pos - 1) > node.slop:
            return False
        pos = ti[1]
    return True


def _search_phrase(root: _Node, cand: list) -> _Node | None:
    node = root
    for ti in cand:
        node = node.sub.get(ti[0])
        if node is None:
            return None
    return node if _valid(node, cand) else None


# ---------------------------------------------------------------------------
# FieldTermStack: offsets come from re-analysis of the stored text
# ---------------------------------------------------------------------------

_RE_WS = re.compile(r"\S+")
# exact simple_tokenize pattern (analysis.py _RE_LETTER_RUN) — display-time
# offsets must tokenize identically to index-time terms
_RE_LETTERS = re.compile(r"[^\W\d_]+")


def tokenize_with_offsets(text: str, analyzer: str = "whitespace"):
    """[(term, position, start_offset, end_offset)] — the term-vector
    entries the reference stores at index time (TermVectorOffsetInfo),
    recomputed from the stored text. Supported: the offset-preserving
    chains (whitespace verbatim; simple = letter runs lowercased)."""
    if analyzer == "whitespace":
        return [(m.group(), i, m.start(), m.end())
                for i, m in enumerate(_RE_WS.finditer(text or ""))]
    if analyzer == "simple":
        return [(m.group().lower(), i, m.start(), m.end())
                for i, m in enumerate(_RE_LETTERS.finditer(text or ""))]
    raise ValueError(f"fvh: no offset tokenizer for analyzer {analyzer!r}")


def term_stack(tokens, fq: FieldQuery) -> list:
    """FieldTermStack: query terms only, position ascending."""
    return [t for t in tokens if t[0] in fq.term_set]


# ---------------------------------------------------------------------------
# FieldPhraseList
# ---------------------------------------------------------------------------

@dataclass
class WeightedPhraseInfo:
    """WeightedPhraseInfo (FieldPhraseList.java:97-155): matched text,
    merged char-offset runs (adjacent positions fuse), boost, seqnum."""
    text: str
    toffs: list            # [(start, end)]
    boost: float
    seqnum: int

    @property
    def start(self) -> int:
        return self.toffs[0][0]

    @property
    def end(self) -> int:
        return self.toffs[-1][1]

    def overlaps(self, other: "WeightedPhraseInfo") -> bool:
        so, eo, oso, oeo = self.start, self.end, other.start, other.end
        return ((so <= oso < eo) or (so < oeo <= eo)
                or (oso <= so < oeo) or (oso < eo <= oeo))


def _wpi(cand: list, node: _Node) -> WeightedPhraseInfo:
    toffs = [(cand[0][2], cand[0][3])]
    text = cand[0][0]
    pos = cand[0][1]
    for ti in cand[1:]:
        text += ti[0]
        if ti[1] - pos == 1:
            toffs[-1] = (toffs[-1][0], ti[3])
        else:
            toffs.append((ti[2], ti[3]))
        pos = ti[1]
    return WeightedPhraseInfo(text, toffs, node.boost, node.num)


def field_phrase_list(stack: list, fq: FieldQuery) -> list:
    """The literal FieldPhraseList walk (FieldPhraseList.java:40-97):
    greedy longest match through the trie, shrink-and-retry backtrack,
    first-wins overlap suppression."""
    stack = list(stack)  # consumed front-to-back
    i = 0
    out: list[WeightedPhraseInfo] = []

    def add_if_no_overlap(w):
        for e in out:
            if e.overlaps(w):
                return
        out.append(w)

    while i < len(stack):
        ti = stack[i]
        i += 1
        curr = fq.root.sub.get(ti[0])
        if curr is None:
            continue
        cand = [ti]
        while True:
            nxt = stack[i] if i < len(stack) else None
            nxt_map = curr.sub.get(nxt[0]) if nxt is not None else None
            if nxt is None or nxt_map is None:
                if _valid(curr, cand):
                    add_if_no_overlap(_wpi(cand, curr))
                else:
                    while len(cand) > 1:
                        i -= 1      # push the last candidate back
                        cand.pop()
                        m = _search_phrase(fq.root, cand)
                        if m is not None:
                            add_if_no_overlap(_wpi(cand, m))
                            break
                break
            cand.append(nxt)
            i += 1
            curr = nxt_map
    return out


# ---------------------------------------------------------------------------
# SimpleFragListBuilder + fragments builders
# ---------------------------------------------------------------------------

@dataclass
class FragInfo:
    start: int
    end: int
    phrases: list           # WeightedPhraseInfo

    @property
    def total_boost(self) -> float:
        return sum(p.boost for p in self.phrases)


def simple_frag_list(phrases: list, frag_char_size: int) -> list[FragInfo]:
    """SimpleFragListBuilder.createFieldFragList (:34-82)."""
    if frag_char_size < MIN_FRAG_CHAR_SIZE:
        raise ValueError(f"fragCharSize({frag_char_size}) is too small. "
                         f"It must be {MIN_FRAG_CHAR_SIZE} or higher.")
    out: list[FragInfo] = []
    it = iter(phrases)
    phrase = None
    taken = False
    start_offset = 0
    while True:
        if not taken:
            phrase = next(it, None)
        taken = False
        if phrase is None:
            break
        if phrase.start < start_offset:
            continue  # violates the previous fragment's border
        wpil = [phrase]
        st = max(start_offset, phrase.start - MARGIN)
        en = st + frag_char_size
        if phrase.end > en:
            en = phrase.end
        start_offset = en
        while True:
            phrase = next(it, None)
            taken = True
            if phrase is None:
                break
            if phrase.end <= en:
                wpil.append(phrase)
            else:
                break
        out.append(FragInfo(st, en, wpil))
    return out


def make_fragments(text: str, frags: list[FragInfo],
                   pre_tags: tuple[str, ...] = ("<b>",),
                   post_tags: tuple[str, ...] = ("</b>",),
                   max_num: int = 3,
                   score_order: bool = True) -> list[str]:
    """Base/Simple/ScoreOrderFragmentsBuilder: slice + tag. Tag index =
    seqnum % len(tags) (BaseFragmentsBuilder.getPreTag); score_order sorts
    fragments by summed phrase boost desc (ScoreOrderFragmentsBuilder)."""
    if score_order:
        frags = sorted(frags, key=lambda f: -f.total_boost)
    res = []
    for fi in frags[:max_num]:
        src = text[fi.start:min(fi.end, len(text))]
        buf, idx = [], 0
        for p in fi.phrases:
            for so, eo in p.toffs:
                buf.append(src[idx:so - fi.start])
                buf.append(pre_tags[p.seqnum % len(pre_tags)])
                buf.append(src[so - fi.start:eo - fi.start])
                buf.append(post_tags[p.seqnum % len(post_tags)])
                idx = eo - fi.start
        buf.append(src[idx:])
        res.append("".join(buf))
    return res


def highlight_text(text: str, fq: FieldQuery, analyzer: str = "whitespace",
                   frag_char_size: int = 100, max_frags: int = 3,
                   pre_tags: tuple[str, ...] = ("<b>",),
                   post_tags: tuple[str, ...] = ("</b>",),
                   score_order: bool = True) -> list[str]:
    """The whole per-hit pipeline (FastVectorHighlighter.getBestFragments)."""
    stack = term_stack(tokenize_with_offsets(text, analyzer), fq)
    phrases = field_phrase_list(stack, fq)
    frags = simple_frag_list(phrases, frag_char_size)
    return make_fragments(text or "", frags, pre_tags, post_tags,
                          max_frags, score_order)


def fvh_highlight(hits, docs, query, analyzer: str = "whitespace",
                  on: str | list[str] = "url", text_col: str = "text",
                  frag_char_size: int = 100, max_frags: int = 3,
                  pre_tags: tuple[str, ...] = ("<b>",),
                  post_tags: tuple[str, ...] = ("</b>",),
                  phrase_highlight: bool = True,
                  score_order: bool = True):
    """Distributed wrapper: join the (top-k-sized) hits with the stored
    text, run the per-hit pipeline in one Arrow-batched mapInPandas.
    Returns hits + ``fragments array<string>``."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    fq = FieldQuery(query, phrase_highlight=phrase_highlight)
    joined = hits.join(docs.select(
        *([on] if isinstance(on, str) else list(on)), text_col),
        on, "left")
    from pyspark.sql import types as T

    cols = joined.columns
    # fresh StructType — StructType.add would mutate the DataFrame's own
    # cached schema and desync it from the JVM plan
    schema = T.StructType(list(joined.schema.fields) + [
        T.StructField("fragments", T.ArrayType(T.StringType()))])

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["fragments"] = [
                highlight_text(t or "", fq, analyzer, frag_char_size,
                               max_frags, pre_tags, post_tags, score_order)
                for t in pdf[text_col]]
            yield pdf

    return joined.mapInPandas(run, schema=schema).select(*cols, "fragments")


# ---------------------------------------------------------------------------
# Index-served offsets (round 5): FieldTermStack straight from the stored
# term vectors, no display-time re-analysis
# ---------------------------------------------------------------------------

def term_stack_from_vectors(terms, positions, offsets, term_set) -> list:
    """[(term, position, start, end)] position-ascending — FieldTermStack
    built from ONE forward-index row's parallel arrays (terms[i] has
    positions[i] and interleaved char offsets offsets[i] = [s0,e0,...]),
    restricted to query terms. This is the reference's actual data path:
    FieldTermStack.java reads TermPositionVector offsets stored at index
    time (TermVectorOffsetInfo), not re-analyzed text."""
    entries: list = []
    for t, ps, off in zip(terms, positions, offsets):
        if t not in term_set or ps is None or off is None:
            continue
        for j, p in enumerate(ps):
            so = 2 * j
            if so + 1 < len(off):
                entries.append((t, int(p), int(off[so]), int(off[so + 1])))
    entries.sort(key=lambda e: e[1])
    return entries


def fvh_highlight_indexed(reader, hits, docs, query,
                          on: str | list[str] = "url",
                          text_col: str = "text",
                          frag_char_size: int = 100, max_frags: int = 3,
                          pre_tags: tuple[str, ...] = ("<b>",),
                          post_tags: tuple[str, ...] = ("</b>",),
                          phrase_highlight: bool = True,
                          score_order: bool = True):
    """fvh_highlight served from the index's STORED offsets (build option
    ``store_offsets=``): the term stack comes from the tokens forward
    index instead of re-analyzing the stored text — the reference's cost
    model (offsets read back from the .tvf term vectors,
    index/TermVectorsTermsWriter.java:30), which matters when the analysis
    chain is expensive at serving time. Output is byte-identical to the
    re-analysis path for offset-preserving chains (pinned by
    tests/test_fvh_offsets.py).

    Plan shape: tokens is corpus-sized but the hits side is top-k — the
    join broadcasts the hits, so the scan is the only corpus touch and
    carries only the four vector columns."""
    from pyspark.sql import functions as F, types as T

    if not getattr(reader, "store_offsets", False):
        raise ValueError("index was built without store_offsets=True — "
                         "use fvh_highlight (re-analysis) instead")
    fq = FieldQuery(query, phrase_highlight=phrase_highlight)
    keys = [on] if isinstance(on, str) else list(on)
    vec = reader.tokens().select(
        *keys, F.col("terms").alias("_terms"),
        F.col("positions").alias("_positions"),
        F.col("offsets").alias("_offsets"))
    small = hits.join(docs.select(*keys, text_col), keys, "left")
    # inner join is safe (a hit's doc exists in tokens by construction)
    # and lets the top-k side broadcast: the corpus-sized tokens scan
    # streams through a BroadcastHashJoin instead of shuffling
    joined = F.broadcast(small).join(vec, keys)
    cols = [c for c in joined.columns
            if c not in ("_terms", "_positions", "_offsets")]
    schema = T.StructType(
        [f for f in joined.schema.fields
         if f.name not in ("_terms", "_positions", "_offsets")] +
        [T.StructField("fragments", T.ArrayType(T.StringType()))])

    def run(batches):
        for pdf in batches:
            frags = []
            for t, ts, ps, offs in zip(pdf[text_col], pdf["_terms"],
                                       pdf["_positions"], pdf["_offsets"]):
                if ts is None:
                    frags.append([])
                    continue
                stack = term_stack_from_vectors(ts, ps, offs, fq.term_set)
                phrases = field_phrase_list(stack, fq)
                fr = simple_frag_list(phrases, frag_char_size)
                frags.append(make_fragments(t or "", fr, pre_tags,
                                            post_tags, max_frags,
                                            score_order))
            pdf = pdf.drop(columns=["_terms", "_positions", "_offsets"])
            pdf["fragments"] = frags
            yield pdf

    return joined.mapInPandas(run, schema=schema).select(*cols, "fragments")
