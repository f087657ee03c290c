"""Position-span algebra — the reference's span query family re-expressed
as pure functions over per-doc position arrays.

Reference semantics (src/java/org/apache/lucene/search/spans/):
- SpanTermQuery.java:28      — one span (pos, pos+1) per term occurrence
- SpanNearQuery.java:37      — clauses within `slop`, ordered or not;
  ordered matcher NearSpansOrdered.java (spans in order, non-overlapping,
  sum of inter-span gaps ≤ slop), unordered NearSpansUnordered.java
  (sliding window: window_len − Σ span_len ≤ slop)
- SpanOrQuery.java:35        — union of clause spans
- SpanNotQuery.java:31       — include-spans not overlapping any exclude-span
- SpanFirstQuery.java:32     — match-spans ending at position ≤ n
- SpanScorer freq: Σ over matching spans of sloppyFreq(matchLength)
  = 1/(distance+1) (spans/SpanScorer.java + DefaultSimilarity.java:63);
  here distance = (end − start) − minimal_match_width, so an exact-adjacent
  match weighs 1.0 and each position of slack decays harmonically.

Engine-defined refinement (documented divergence): span enumeration is
deterministic-greedy — ordered matches chain each clause to its
earliest-ending following span and emit at most one span per first-clause
occurrence; unordered matches walk the reference's min-start sliding window.
Both the Spark kernel (queries/kernel.py) and the single-node oracle
(oracle.py) call THESE functions, so the two engines agree bit-for-bit and
pytest's rank-identity gate stays meaningful for the surrounding plumbing
(postings decode, candidate pruning, distributed top-k merge).

Everything here is per-doc and numpy-vectorized where the shape allows;
the per-doc loop runs only over the candidate intersection (kernel prunes
candidates with docid-set intersection before calling in).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from .queries.ast import (
    Query,
    SpanFirst,
    SpanMask,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
)

PosProvider = Callable[[str], dict[int, np.ndarray]]
# term → {docid → sorted position array}; missing term → {}


def span_width_min(q: Query) -> int:
    """Minimal width of an exact match — the `matchLength` baseline that
    makes sloppyFreq(exact) == 1.0."""
    if isinstance(q, SpanTerm):
        return 1
    if isinstance(q, SpanNear):
        return sum(span_width_min(c) for c in q.clauses)
    if isinstance(q, SpanOr):
        return min(span_width_min(c) for c in q.clauses) if q.clauses else 1
    if isinstance(q, SpanNot):
        return span_width_min(q.include)
    if isinstance(q, SpanFirst):
        return span_width_min(q.match)
    if isinstance(q, SpanMask):
        return span_width_min(q.inner)
    raise TypeError(type(q))


def span_freq(spans: np.ndarray, width_min: int) -> float:
    """Sloppy frequency of one doc's matching spans (SpanScorer.java freq
    accumulation): Σ 1/(1 + slack), slack = (end−start) − width_min."""
    if spans.size == 0:
        return 0.0
    slack = np.maximum(spans[:, 1] - spans[:, 0] - width_min, 0)
    return float(np.sum(1.0 / (1.0 + slack.astype(np.float64))))


# ---------------------------------------------------------------------------
# per-doc matchers
# ---------------------------------------------------------------------------

def _near_ordered(span_lists: list[np.ndarray], slop: int) -> np.ndarray:
    """Ordered near: chain clause spans left→right, spans non-overlapping
    (start_{i+1} ≥ end_i), Σ gaps ≤ slop. Greedy earliest-end chaining, one
    candidate per first-clause span (NearSpansOrdered's shrink loop made
    deterministic)."""
    out = []
    for a in span_lists[0]:
        cur_end = int(a[1])
        gap = 0
        ok = True
        for spans in span_lists[1:]:
            cand = spans[spans[:, 0] >= cur_end]
            if cand.shape[0] == 0:
                ok = False
                break
            i = int(np.lexsort((cand[:, 0], cand[:, 1]))[0])  # min end, then start
            gap += int(cand[i, 0]) - cur_end
            cur_end = int(cand[i, 1])
        if ok and gap <= slop:
            out.append((int(a[0]), cur_end))
    return _as_spans(out)


def _near_unordered(span_lists: list[np.ndarray], slop: int) -> np.ndarray:
    """Unordered near: the reference's sliding window — keep one span per
    clause, emit when window_len − Σ lengths ≤ slop, advance the clause
    whose span starts (then ends) first (NearSpansUnordered.java queue)."""
    ptrs = [0] * len(span_lists)
    out: list[tuple[int, int]] = []
    while all(p < s.shape[0] for p, s in zip(ptrs, span_lists)):
        cur = [s[p] for p, s in zip(ptrs, span_lists)]
        starts = [int(c[0]) for c in cur]
        ends = [int(c[1]) for c in cur]
        window = max(ends) - min(starts)
        totlen = sum(e - s for s, e in zip(starts, ends))
        if window - totlen <= slop:
            span = (min(starts), max(ends))
            if not out or out[-1] != span:
                out.append(span)
        adv = min(range(len(cur)), key=lambda i: (starts[i], ends[i]))
        ptrs[adv] += 1
    return _as_spans(out)


def _as_spans(pairs: list[tuple[int, int]]) -> np.ndarray:
    if not pairs:
        return np.empty((0, 2), dtype=np.int64)
    arr = np.asarray(pairs, dtype=np.int64)
    order = np.lexsort((arr[:, 1], arr[:, 0]))
    arr = arr[order]
    keep = np.ones(arr.shape[0], dtype=bool)
    keep[1:] = np.any(arr[1:] != arr[:-1], axis=1)  # dedupe exact duplicates
    return arr[keep]


# ---------------------------------------------------------------------------
# tree evaluation: SpanQuery → {docid: (m,2) span array}
# ---------------------------------------------------------------------------

def eval_spans(q: Query, pos_of: PosProvider) -> dict[int, np.ndarray]:
    if isinstance(q, SpanTerm):
        return {
            d: np.stack([p, p + 1], axis=1).astype(np.int64)
            for d, p in pos_of(q.term).items()
            if len(p)
        }
    if isinstance(q, SpanNear):
        subs = [eval_spans(c, pos_of) for c in q.clauses]
        if not subs:
            return {}
        docs = set(subs[0])
        for s in subs[1:]:
            docs &= s.keys()
        match = _near_ordered if q.in_order else _near_unordered
        out = {}
        for d in docs:
            spans = match([s[d] for s in subs], q.slop)
            if spans.shape[0]:
                out[d] = spans
        return out
    if isinstance(q, SpanOr):
        out: dict[int, list[np.ndarray]] = {}
        for c in q.clauses:
            for d, spans in eval_spans(c, pos_of).items():
                out.setdefault(d, []).append(spans)
        return {
            d: _as_spans([tuple(row) for part in parts for row in part])
            for d, parts in out.items()
        }
    if isinstance(q, SpanNot):
        inc = eval_spans(q.include, pos_of)
        exc = eval_spans(q.exclude, pos_of)
        out = {}
        for d, spans in inc.items():
            ex = exc.get(d)
            if ex is None:
                out[d] = spans
                continue
            keep = np.ones(spans.shape[0], dtype=bool)
            for i, (s, e) in enumerate(spans):
                # overlap iff NOT (exclude ends ≤ s or exclude starts ≥ e)
                if np.any((ex[:, 1] > s) & (ex[:, 0] < e)):
                    keep[i] = False
            if keep.any():
                out[d] = spans[keep]
        return out
    if isinstance(q, SpanFirst):
        inner = eval_spans(q.match, pos_of)
        out = {}
        for d, spans in inner.items():
            sel = spans[:, 1] <= q.end
            if sel.any():
                out[d] = spans[sel]
        return out
    if isinstance(q, SpanMask):
        # field masking changes only the field identity for composition —
        # the spans ARE the inner query's spans (FieldMaskingSpanQuery.java:
        # getSpans delegates to maskedQuery)
        return eval_spans(q.inner, pos_of)
    raise TypeError(type(q))
