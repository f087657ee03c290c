"""Per-segment scoring kernel — runs inside applyInPandas, one call per
segment, fully numpy-vectorized.

The reference searches per segment and merges shard top-k with global stats
(search/IndexSearcher.java:202-217, MultiSearcher.java:305-330); this kernel
is the per-segment scorer tree. Pruning:

- AND (MUST) paths leapfrog from the rarest term using the per-block skip
  metadata: only blocks whose docid range intersects the current candidate
  set are decoded (searchsorted over block_last_ids ≙ the reference's
  multi-level skip list, index/DefaultSkipListReader.java:30).
- OR (SHOULD-only term) queries use MaxScore-style early termination with
  block-max upper bounds: once the summed upper bound of the remaining
  (rarest-scored) terms falls strictly below the running k-th score, those
  terms can no longer introduce new top-k docs and are only looked up for
  docs already in the accumulator (block-targeted decode). This is the
  block-max WAND family member best suited to vectorized scoring
  (score-at-a-time); bounds are admissible per scoring.bm25_term_upper_bound.

Exactness: pruning switches use strict inequality with a safety factor, so
tie cases fall back to full evaluation — output is rank-identical (score
desc, docid asc) to the naive oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import BLOCK_SIZE
from ..codec import (decode_block, decode_positions,
                     decode_positions_flat_at, decode_postings)
from ..scoring import DEFAULT_SIMILARITY, phrase_freq
from .ast import (
    Bool,
    Boosting,
    ConstantScore,
    DisjunctionMax,
    MatchAll,
    MultiPhrase,
    PayloadNear,
    PayloadTerm,
    Phrase,
    Query,
    SpanQuery,
    Term,
)

_SAFETY = 1.0 + 1e-9  # pruning bound slack: ties always fall back to full eval


_DELETED_TERM = "\x00deleted"  # tombstone side-car rows (indexing/deletes.py)
_BOOST_TERM = "\x00boost"      # norms side-car rows (indexing/norms.py)


class SegmentPostings:
    """Lazy decoded view of one segment's posting rows for the query terms.
    Tombstone rows (term == \\x00deleted) are split out into ``deleted`` —
    the per-segment ``.del`` bitmap analog (util/BitVector.java:35). Norms
    rows (term == \\x00boost) decode into the per-doc boost table — the
    ``.nrm`` analog (index/NormsWriter.java:61): the tfs slot carries the
    byte315-quantized index-time document boost; docs without a row are
    boost 1.0."""

    def __init__(self, pdf: pd.DataFrame, block_size: int = BLOCK_SIZE):
        self.block_size = block_size
        self.rows: dict[str, list[dict]] = {}
        del_rows: list[dict] = []
        boost_rows: list[dict] = []
        for rec in pdf.to_dict("records"):
            if rec["term"] == _DELETED_TERM:
                del_rows.append(rec)
            elif rec["term"] == _BOOST_TERM:
                boost_rows.append(rec)
            else:
                self.rows.setdefault(rec["term"], []).append(rec)
        for term in self.rows:
            self.rows[term].sort(key=lambda r: r["salt"])
        if del_rows:
            parts = [decode_postings(r, block_size)[0] for r in del_rows]
            self.deleted: np.ndarray | None = np.unique(np.concatenate(parts))
        else:
            self.deleted = None
        if boost_rows:
            from ..scoring import byte315_to_float

            dec = [decode_postings(r, block_size)[:2] for r in boost_rows]
            bids = np.concatenate([d[0] for d in dec])
            bvals = byte315_to_float(np.concatenate([d[1] for d in dec]))
            order = np.argsort(bids, kind="stable")
            self.boost_ids: np.ndarray | None = bids[order]
            self.boost_vals = np.asarray(bvals, dtype=np.float64)[order]
            # admissible pruning scale: no doc's multiplier exceeds this
            self.max_boost = float(max(self.boost_vals.max(), 1.0))
        else:
            self.boost_ids = None
            self.max_boost = 1.0
        self._full: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self._rowdec: dict[str, list] = {}

    def apply_boost(self, ids: np.ndarray, sc: np.ndarray) -> np.ndarray:
        """Multiply per-doc scores by the index-time boost (the norms read
        every leaf scorer does, search/TermScorer.java norms[doc]); identity
        when the segment has no norms side-car."""
        if self.boost_ids is None or not ids.size:
            return sc
        pos = np.searchsorted(self.boost_ids, ids)
        pos_c = np.minimum(pos, self.boost_ids.size - 1)
        hit = self.boost_ids[pos_c] == ids
        if not hit.any():
            return sc
        out = sc.copy()
        out[hit] = out[hit] * self.boost_vals[pos_c[hit]]
        return out

    def has(self, term: str) -> bool:
        return term in self.rows

    def _live(self, ids: np.ndarray, *arrs):
        """Subtract tombstoned docids AT DECODE TIME so every consumer —
        including MaxScore's theta/upper-bound accounting — only ever sees
        live docs. Subtracting after eval_query is too late: a pending
        delete of a high-scoring doc would leave theta inflated and prune a
        live doc that belongs in the top-k (the reference applies the .del
        bitmap inside SegmentTermDocs.next, index/SegmentTermDocs.java:108,
        i.e. below every scorer, for exactly this reason)."""
        if self.deleted is None or not ids.size:
            return (ids, *arrs)
        keep = ~np.isin(ids, self.deleted, assume_unique=False)
        if keep.all():
            return (ids, *arrs)
        return (ids[keep], *(a[keep] for a in arrs))

    def _decoded_rows(self, term: str):
        """Per-row full decode of `term`'s postings rows, memoized:
        [(row, ids, tfs, dls), ...]. full() merges these; the position and
        payload readers need the PER-ROW streams to index into their blobs
        — without the memo each reader re-ran decode_postings on the same
        blobs (payload scoring paid the VByte decode 3x per term per
        segment: docid pass + positions pass + payload pass)."""
        if term not in self._rowdec:
            self._rowdec[term] = [
                (r, *decode_postings(r, self.block_size))
                for r in self.rows[term]]
        return self._rowdec[term]

    def full(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(docids, tfs, dls) — full decode, tombstones stripped, cached."""
        if term not in self._full:
            parts = [(i, t, d) for _r, i, t, d in self._decoded_rows(term)]
            merged = tuple(np.concatenate(x) for x in zip(*parts))
            self._full[term] = self._live(*merged)  # type: ignore[assignment]
        return self._full[term]

    def lookup(self, term: str, targets: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Block-targeted decode: postings of `term` restricted to docids in
        sorted `targets`. Decodes only blocks whose range intersects targets
        (skip-list advance). → (docids∩targets, tfs, dls)."""
        if term in self._full:
            ids, tfs, dls = self._full[term]
            sel = np.isin(ids, targets, assume_unique=True)
            return ids[sel], tfs[sel], dls[sel]
        out_i, out_t, out_d = [], [], []
        for r in self.rows[term]:
            last = np.asarray(r["block_last_ids"], dtype=np.int64)
            first_possible = np.empty_like(last)
            first_possible[0] = 0
            first_possible[1:] = last[:-1] + 1
            # block b needed iff ∃ target in [first_possible[b], last[b]]
            lo_idx = np.searchsorted(targets, first_possible, side="left")
            hi_idx = np.searchsorted(targets, last, side="right")
            needed = np.flatnonzero(hi_idx > lo_idx)
            for b in needed:
                ids, tfs, dls = decode_block(r, int(b), self.block_size)
                sel = np.isin(ids, targets, assume_unique=True)
                if sel.any():
                    out_i.append(ids[sel]); out_t.append(tfs[sel]); out_d.append(dls[sel])
        if not out_i:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return self._live(np.concatenate(out_i), np.concatenate(out_t),
                          np.concatenate(out_d))

    def positions(self, term: str) -> tuple[np.ndarray, list[np.ndarray]]:
        """(docids, per-doc position arrays) — full decode, tombstones
        stripped (phrase/span path)."""
        ids_all, pos_all = [], []
        for r, ids, tfs, _ in self._decoded_rows(term):
            ids_all.append(ids)
            pos_all.extend(decode_positions(r["positions_blob"], tfs))
        ids = np.concatenate(ids_all)
        if self.deleted is not None and ids.size:
            keep = ~np.isin(ids, self.deleted, assume_unique=False)
            if not keep.all():
                pos_all = [p for p, k in zip(pos_all, keep) if k]
                ids = ids[keep]
        return ids, pos_all

    def positions_flat_for(self, term: str, targets: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(docids ∩ targets, per-doc counts, concatenated absolute
        positions) with position decode done ONLY for target docs — and in
        flat ragged form, so the exact-phrase packed-key kernel consumes it
        with zero per-doc Python. `targets` must be sorted, unique, and
        already tombstone-free (callers intersect live docid streams from
        full()). For a phrase of one rare + one common term this removes
        the O(postings) per-doc split of positions() on the common term —
        the reference's lazy .prx skip (index/SegmentTermPositions.java:103
        lazySkip): positions are read only for docs the docid streams
        agreed on."""
        out_ids: list[np.ndarray] = []
        out_lens: list[np.ndarray] = []
        out_flat: list[np.ndarray] = []
        for r, ids, tfs, _ in self._decoded_rows(term):
            sel = np.flatnonzero(np.isin(ids, targets, assume_unique=True))
            if not sel.size:
                continue
            lens, flat = decode_positions_flat_at(r["positions_blob"], tfs, sel)
            out_ids.append(ids[sel])
            out_lens.append(lens)
            out_flat.append(flat)
        if not out_ids:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return (np.concatenate(out_ids), np.concatenate(out_lens),
                np.concatenate(out_flat))

    def positions_for(self, term: str,
                      targets: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
        """Per-doc-list view of positions_flat_for (sloppy-phrase path)."""
        ids, lens, flat = self.positions_flat_for(term, targets)
        if not ids.size:
            return ids, []
        return ids, np.split(flat, np.cumsum(lens)[:-1])

    def payloads_for(self, term: str, targets: np.ndarray
                     ) -> tuple[np.ndarray, list[np.ndarray]]:
        """(docids ∩ targets, per-doc float32 payload arrays, NaN = no
        payload at that position) — the payload twin of positions_for,
        decoded only for target docs (the reference reads a position's
        payload lazily on demand, index/SegmentTermPositions.java
        getPayload). Rows without a payload stream (plain index, or legacy
        rows merged into a payload index) yield all-NaN arrays, so payload
        scoring degrades to docScore=1 exactly like the reference's
        isPayloadAvailable()=false path. `targets` must be sorted, unique,
        tombstone-free (same contract as positions_flat_for)."""
        from ..payloads import decode_payloads_at

        out_ids: list[np.ndarray] = []
        out_pays: list[np.ndarray] = []
        for r, ids, tfs, _ in self._decoded_rows(term):
            sel = np.flatnonzero(np.isin(ids, targets, assume_unique=True))
            if not sel.size:
                continue
            blob = r.get("payloads_blob")
            if not isinstance(blob, (bytes, bytearray, memoryview)):
                # no payload stream on this row (plain index, side-car-free
                # legacy row, or a NULL slot from unionByName)
                out_pays.extend(
                    np.full(int(tfs[i]), np.nan, dtype=np.float32)
                    for i in sel)
            else:
                out_pays.extend(decode_payloads_at(blob, tfs, sel))
            out_ids.append(ids[sel])
        if not out_ids:
            return np.empty(0, dtype=np.int64), []
        return np.concatenate(out_ids), out_pays

    def term_upper_bound(self, term: str, idf: float, avgdl: float,
                         sim=None) -> float:
        sim = sim or DEFAULT_SIMILARITY
        ub = 0.0
        for r in self.rows[term]:
            mt = np.asarray(r["block_max_tf"], dtype=np.float64)
            md = np.asarray(r["block_min_dl"], dtype=np.float64)
            ub = max(ub, float(np.max(sim.tf_weight_upper(mt, md, avgdl))))
        return idf * ub


class Ctx:
    def __init__(self, N: int, avgdl: float, dfs: dict[str, int], k: int,
                 avgdl_fields: dict[str, float] | None = None, sim=None):
        self.N = N
        self.avgdl = avgdl
        self.dfs = dfs
        self.k = k
        self.avgdl_fields = avgdl_fields or {}
        # pluggable Similarity (search/Similarity.java:527): every scorer
        # in this module draws BOTH score factors from here, so a swap is
        # total, never per-query-shape
        self.sim = sim or DEFAULT_SIMILARITY

    def idf(self, term: str) -> float:
        df = self.dfs.get(term, 0)
        return float(self.sim.term_weight(self.N, df)) if df else 0.0

    def avgdl_of(self, term: str) -> float:
        """Per-field average length (the per-field norms of the reference,
        index/NormsWriter.java:61): a `field:term` from an extra ANALYZED
        field normalizes against ITS field's avgdl; default field and
        keyword terms use the corpus text avgdl."""
        if self.avgdl_fields and ":" in term:
            return self.avgdl_fields.get(term.split(":", 1)[0], self.avgdl)
        return self.avgdl


# ---------------------------------------------------------------------------
# sorted-(ids, scores) algebra
# ---------------------------------------------------------------------------

def _merge_sum(a_ids, a_sc, b_ids, b_sc):
    """Union of two sorted id/score sets, scores summed. Addition order is
    pinned left-to-right (clause order) so FP results match the oracle."""
    ids = np.union1d(a_ids, b_ids)
    sc = np.zeros(ids.size, dtype=np.float64)
    sc[np.searchsorted(ids, a_ids)] += a_sc
    sc[np.searchsorted(ids, b_ids)] += b_sc
    return ids, sc


def _eval_term_full(sp: SegmentPostings, ctx: Ctx, q: Term):
    if not sp.has(q.term):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    ids, tfs, dls = sp.full(q.term)
    sc = q.boost * ctx.idf(q.term) * ctx.sim.tf_weight(tfs, dls, ctx.avgdl_of(q.term))
    return ids, sp.apply_boost(ids, sc)


_DOC_OFFSET = np.int64(1) << 24  # > max position (maxTokenLength-bounded docs)


def _exact_phrase_freqs(per_term, qpos) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized exact-phrase matching across ALL docs at once: fold
    (docid, position) into one int64 key `docid*OFFSET + (pos - qpos_i)`;
    a phrase occurrence is a key present in every term's key set, and the
    per-doc phrase freq is the key-match count per docid — no per-candidate
    Python loop (the scalar PhraseScorer PQ walk of the reference,
    search/ExactPhraseScorer.java:31, becomes three numpy set ops).
    per_term[i] is a ragged (ids, lens, flat_abs) triple straight from
    positions_flat_for — end-to-end flat, no per-doc list is ever built."""
    # rebase docids segment-locally so docid*OFFSET stays within int64 even
    # for very large global docid spaces
    base = min(int(ids[0]) for ids, _, _ in per_term if ids.size)
    # shift by max(qpos) so every packed key component is non-negative:
    # with qpos[0] > 0 (leading stopword hole) pos - qpos[i] can be negative
    # and floor division would bucket the key into the PREVIOUS docid
    qshift = np.int64(max(qpos))
    max_component = np.int64(0)
    max_rebased = np.int64(0)
    for ids, _, flat in per_term:
        if flat.size:
            max_component = max(max_component, flat.max() + qshift)
        if ids.size:
            max_rebased = max(max_rebased, ids.max() - base)
    # docs longer than the pinned offset would spill packed keys into the
    # next docid bucket — derive the offset from the batch instead, and if
    # docid_span*offset can't fit int64, take the per-candidate exact path
    offset = max(_DOC_OFFSET, max_component + 1)
    if max_rebased > (np.int64(1) << 62) // max(offset, np.int64(1)):
        return _exact_phrase_freqs_perdoc(per_term, qpos)
    keys = None
    for i, (ids, lens, flat) in enumerate(per_term):
        k = (flat - np.int64(qpos[i]) + qshift
             + np.repeat((ids - base) * offset, lens))
        keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
        if keys.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    docs, counts = np.unique(keys // offset, return_counts=True)
    return docs + base, counts.astype(np.float64)


def _flat_of(stream: tuple[np.ndarray, list[np.ndarray]]
             ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ids, per-doc lists) → (ids, lens, flat) ragged triple (multi-
    alternative MultiPhrase slots, whose per-doc union is inherently
    list-shaped)."""
    ids, pos_lists = stream
    lens = np.fromiter((p.size for p in pos_lists), count=len(pos_lists),
                       dtype=np.int64)
    flat = (np.concatenate(pos_lists) if pos_lists else
            np.empty(0, dtype=np.int64))
    return ids, lens, flat


def _cand_pos_indices(per_term, cand: np.ndarray) -> list[np.ndarray]:
    """For each term, the index into its postings arrays of every candidate
    docid (cand ⊆ that term's ids by construction). Postings rows of a
    salt-split head term concatenate out of global order, so sort each id
    array once (argsort + searchsorted) instead of building a Python dict
    per posting — O(p log p) numpy instead of O(p) interpreter-speed."""
    out = []
    for ids, _ in per_term:
        order = np.argsort(ids, kind="stable")
        out.append(order[np.searchsorted(ids[order], cand)])
    return out


def _exact_phrase_freqs_perdoc(per_term, qpos) -> tuple[np.ndarray, np.ndarray]:
    """Exact-phrase fallback without packed keys (pathological docid × doclen
    ranges): candidate intersection then per-candidate phrase_freq(slop=0).
    Same answer as the packed-key kernel, immune to int64 packing limits.
    Takes the same (ids, lens, flat) triples as the packed-key kernel and
    view-splits them into per-doc lists here."""
    per_term = [(ids, np.split(flat, np.cumsum(lens)[:-1]) if ids.size else [])
                for ids, lens, flat in per_term]
    cand = per_term[0][0]
    for ids, _ in per_term[1:]:
        cand = np.intersect1d(cand, ids, assume_unique=True)
        if cand.size == 0:
            break
    if cand.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cand = np.sort(cand)
    idx_per_term = _cand_pos_indices(per_term, cand)
    out_ids, out_fr = [], []
    for j, d in enumerate(cand):
        pls = [per_term[i][1][idx_per_term[i][j]] for i in range(len(per_term))]
        f = phrase_freq(pls, qpos, 0)
        if f > 0:
            out_ids.append(int(d))
            out_fr.append(f)
    return (np.asarray(out_ids, dtype=np.int64),
            np.asarray(out_fr, dtype=np.float64))


def _sloppy_phrase_freqs_batch(per_term_flat, qpos, slop: int,
                               cand: np.ndarray
                               ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized sloppy-phrase frequency for ALL candidate docs at once —
    the round-5 replacement of the per-candidate Python loop (the one
    interpreter-speed walk left in the kernel, VERDICT r4).

    Semantics are EXACTLY scoring.phrase_freq's greedy machine
    (search/SloppyPhraseScorer.java:25-75 + DefaultSimilarity.java:63
    sloppyFreq), proven equivalent by the differential test in
    tests/test_sloppy_batch.py: every doc runs the same cursor automaton —
    m cursors over its shifted position lists; a window within `slop`
    whose absolute positions are distinct scores 1/(span+1) and advances
    every cursor, anything else advances the minimal-shifted cursor
    (first index on ties, matching Python ``min(key=)``) — but here every
    candidate's automaton steps SIMULTANEOUSLY in numpy. Iterations =
    max steps over docs (positions-per-doc-bounded, typically tf-small);
    each iteration is O(active docs) vector work, so a huge
    post-intersection candidate set costs vector time, not interpreter
    time.

    per_term_flat[i] = (ids, lens, flat_abs) straight from
    positions_flat_for (ids unsorted across salt rows is fine); `cand`
    sorted unique, ⊆ every term's ids."""
    m = len(per_term_flat)
    n = int(cand.size)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    qp = np.asarray(qpos, dtype=np.int64)
    t_start = np.empty((m, n), dtype=np.int64)
    t_len = np.empty((m, n), dtype=np.int64)
    flats: list[np.ndarray] = []
    for i, (ids, lens, flat) in enumerate(per_term_flat):
        starts = np.zeros(ids.size, dtype=np.int64)
        if ids.size > 1:
            starts[1:] = np.cumsum(lens)[:-1]
        order = np.argsort(ids, kind="stable")
        at = order[np.searchsorted(ids[order], cand)]
        t_start[i] = starts[at]
        t_len[i] = lens[at]
        flats.append(flat.astype(np.int64) - qp[i])  # shifted positions
    cur = np.zeros((m, n), dtype=np.int64)
    total = np.zeros(n, dtype=np.float64)
    active = np.ones(n, dtype=bool)
    vals = np.empty((m, n), dtype=np.int64)
    while True:
        idx = np.flatnonzero(active)
        if not idx.size:
            break
        v = vals[:, : idx.size]
        for i in range(m):
            v[i] = flats[i][t_start[i, idx] + cur[i, idx]]
        lo = v.min(axis=0)
        hi = v.max(axis=0)
        within = (hi - lo) <= slop
        # distinct-absolute-positions guard (one token occurrence cannot
        # fill two phrase slots): sort abspos per doc, all diffs nonzero
        ab = np.sort(v + qp[:, None], axis=0)
        distinct = (np.ones(idx.size, dtype=bool) if m == 1 else
                    np.all(np.diff(ab, axis=0) != 0, axis=0))
        match = within & distinct
        total[idx[match]] += 1.0 / (hi[match] - lo[match] + 1.0)
        amin = v.argmin(axis=0)  # first index of the min — the tie rule
        for i in range(m):
            cur[i, idx] += np.where(match, 1, (amin == i).view(np.int8))
        alive = np.ones(idx.size, dtype=bool)
        for i in range(m):
            alive &= cur[i, idx] < t_len[i, idx]
        active[idx] = alive
    sel = total > 0.0
    return cand[sel], total[sel]


def _eval_phrase(sp: SegmentPostings, ctx: Ctx, q: Phrase):
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    if any(not sp.has(t) for t in q.phrase_terms):
        return empty
    qpos = q.qpositions()
    # candidate docids FIRST, from the cheap doc-only decode (cached in
    # _full and reused by the dl lookup below) — positions blobs are never
    # split per-doc for docs outside the intersection, and never touched at
    # all when the terms don't co-occur (the reference's docid-streams-
    # agree-before-.prx-read rule, search/PhrasePositions.java)
    cand = sp.full(q.phrase_terms[0])[0]
    for t in q.phrase_terms[1:]:
        cand = np.intersect1d(cand, sp.full(t)[0], assume_unique=True)
        if cand.size == 0:
            return empty
    cand = np.sort(cand)
    idf = float(sum(ctx.idf(t) for t in dict.fromkeys(q.phrase_terms)))

    if q.slop == 0:
        # flat ragged triples end-to-end: no per-doc list is ever built
        ids_arr, frs = _exact_phrase_freqs(
            [sp.positions_flat_for(t, cand) for t in q.phrase_terms], qpos)
        if ids_arr.size == 0:
            return empty
        l_ids, _, l_dls = sp.lookup(q.phrase_terms[0], ids_arr)
        dls = l_dls[np.searchsorted(l_ids, ids_arr)]
        sc = q.boost * idf * ctx.sim.tf_weight(frs, dls, ctx.avgdl_of(q.phrase_terms[0]))
        return ids_arr, sp.apply_boost(ids_arr, sc)
    # sloppy: the batched greedy-window machine — flat ragged triples
    # end-to-end (same input shape as the exact path), every candidate's
    # cursor automaton stepping simultaneously in numpy
    ids, frs = _sloppy_phrase_freqs_batch(
        [sp.positions_flat_for(t, cand) for t in q.phrase_terms],
        qpos, q.slop, cand)
    if ids.size == 0:
        return empty
    # need dl per candidate: take from any term's postings via lookup
    l_ids, _, l_dls = sp.lookup(q.phrase_terms[0], ids)
    dls = l_dls[np.searchsorted(l_ids, ids)]
    sc = q.boost * idf * ctx.sim.tf_weight(frs, dls, ctx.avgdl_of(q.phrase_terms[0]))
    return ids, sp.apply_boost(ids, sc)


def _dl_map(sp: SegmentPostings, terms: list[str], ids: np.ndarray) -> np.ndarray:
    """doclen for each docid in sorted `ids`: per doc, the dl of the FIRST
    term (in `terms` order) whose postings contain it — the pinned rule
    shared with the oracle (OracleIndex.dl_of_any). Terms of the same field
    agree on dl; for mixed-field span trees the rule makes both engines
    deterministic (the reference's FieldMaskingSpanQuery docs call mixed-
    field scoring semantics undefined — we pin them instead)."""
    out = np.zeros(ids.size, dtype=np.int64)
    found = np.zeros(ids.size, dtype=bool)
    for t in terms:
        if found.all():
            break
        if not sp.has(t):
            continue
        t_ids, _, t_dls = sp.lookup(t, ids)
        pos = np.searchsorted(ids, t_ids)
        new = ~found[pos]
        out[pos[new]] = t_dls[new]
        found[pos[new]] = True
    return out


def _merged_slot(per_term: list[tuple[np.ndarray, list[np.ndarray]]]
                 ) -> tuple[np.ndarray, list[np.ndarray]]:
    """Union alternative terms of one MultiPhrase slot into a single
    (docids, per-doc sorted position arrays) stream."""
    if len(per_term) == 1:
        return per_term[0]
    merged: dict[int, list[np.ndarray]] = {}
    for ids, pos_lists in per_term:
        for d, pl in zip(ids, pos_lists):
            merged.setdefault(int(d), []).append(pl)
    docs = np.asarray(sorted(merged), dtype=np.int64)
    pls = [np.unique(np.concatenate(merged[int(d)])) for d in docs]
    return docs, pls


def _eval_multiphrase(sp: SegmentPostings, ctx: Ctx, q: MultiPhrase):
    """MultiPhraseQuery (search/MultiPhraseQuery.java:39): per-slot position
    union, then the same vectorized exact / sloppy phrase kernels."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    # candidate docids FIRST (union within a slot, intersection across
    # slots) from the cheap doc-only decode; positions are split per-doc
    # only for the intersection — same lazy-.prx rule as _eval_phrase
    live_slots: list[list[str]] = []
    cand: np.ndarray | None = None
    for slot in q.slots:
        terms = [t for t in slot if sp.has(t)]
        if not terms:
            return empty
        live_slots.append(terms)
        slot_ids = (sp.full(terms[0])[0] if len(terms) == 1 else
                    np.unique(np.concatenate([sp.full(t)[0] for t in terms])))
        cand = slot_ids if cand is None else np.intersect1d(
            cand, slot_ids, assume_unique=True)
        if cand.size == 0:
            return empty
    cand = np.sort(cand)
    qpos = q.qpositions()
    uniq = list(dict.fromkeys(q.terms()))
    idf = float(sum(ctx.idf(t) for t in uniq))

    if q.slop == 0:
        # flat triples per slot; only multi-alternative slots pay the
        # per-doc union merge (inherently list-shaped), then re-flatten
        flat_slots = []
        for terms in live_slots:
            if len(terms) == 1:
                st = sp.positions_flat_for(terms[0], cand)
            else:
                alts = [sp.positions_for(t, cand) for t in terms]
                alts = [a for a in alts if a[0].size]
                if not alts:
                    return empty
                st = _flat_of(_merged_slot(alts))
            if not st[0].size:
                return empty
            flat_slots.append(st)
        ids_arr, frs = _exact_phrase_freqs(flat_slots, qpos)
    else:
        slot_streams = []
        for terms in live_slots:
            alts = [sp.positions_for(t, cand) for t in terms]
            alts = [a for a in alts if a[0].size]
            if not alts:
                return empty
            slot_streams.append(_merged_slot(alts))
        cand = slot_streams[0][0]
        for ids, _ in slot_streams[1:]:
            cand = np.intersect1d(cand, ids, assume_unique=True)
            if cand.size == 0:
                return empty
        cand = np.sort(cand)
        # restrict each merged slot stream to the final candidate set, then
        # flatten for the batched machine (slot position unions are sorted
        # unique — np.unique in _merged_slot)
        flat_slots = []
        for ids, pls in slot_streams:
            order = np.argsort(ids, kind="stable")
            keep = order[np.searchsorted(ids[order], cand)]
            flat_slots.append(_flat_of((ids[keep],
                                        [pls[int(j)] for j in keep])))
        ids_arr, frs = _sloppy_phrase_freqs_batch(flat_slots, qpos,
                                                  q.slop, cand)
    if ids_arr.size == 0:
        return empty
    dls = _dl_map(sp, uniq, ids_arr)
    sc = q.boost * idf * ctx.sim.tf_weight(frs, dls, ctx.avgdl_of(uniq[0]))
    return ids_arr, sp.apply_boost(ids_arr, sc)


def _span_term_of(c) -> str | None:
    """Term of a width-1 span clause: SpanTerm, or SpanMask(SpanTerm) —
    masking changes only the field identity, the spans are the inner
    term's (FieldMaskingSpanQuery.java getSpans delegates)."""
    from .ast import SpanMask, SpanTerm
    if isinstance(c, SpanTerm):
        return c.term
    if isinstance(c, SpanMask) and isinstance(c.inner, SpanTerm):
        return c.inner.term
    return None


def _span_candidates(sp: SegmentPostings, q) -> np.ndarray:
    """Structural docid upper bound for a span tree — the docid-streams-
    agree-before-positions rule applied to the span algebra: Near
    intersects its clauses, Or unions, Not/First/Mask pass their payload
    through (exclude/position filters only ever REMOVE spans). Arrays are
    unsorted-unique, tombstone-free (from full())."""
    from .ast import SpanFirst, SpanMask, SpanNear, SpanNot, SpanOr, SpanTerm
    if isinstance(q, SpanTerm):
        return (sp.full(q.term)[0] if sp.has(q.term)
                else np.empty(0, dtype=np.int64))
    if isinstance(q, SpanNear):
        cand: np.ndarray | None = None
        for c in q.clauses:
            ids = _span_candidates(sp, c)
            cand = ids if cand is None else np.intersect1d(
                cand, ids, assume_unique=True)
            if cand.size == 0:
                return cand
        return cand if cand is not None else np.empty(0, dtype=np.int64)
    if isinstance(q, SpanOr):
        parts = [_span_candidates(sp, c) for c in q.clauses]
        return (np.unique(np.concatenate(parts)) if parts
                else np.empty(0, dtype=np.int64))
    if isinstance(q, SpanNot):
        return _span_candidates(sp, q.include)
    if isinstance(q, SpanFirst):
        return _span_candidates(sp, q.match)
    if isinstance(q, SpanMask):
        return _span_candidates(sp, q.inner)
    raise TypeError(type(q))


_SPAN_OFFSET = np.int64(1) << 24  # > max position (shared bound, _DOC_OFFSET)


def _span_fast_freqs(sp: SegmentPostings, q
                     ) -> tuple[np.ndarray, np.ndarray] | None:
    """Vectorized (docs, sloppy freqs) for the hot span shapes — ordered
    all-(masked-)term SpanNear and SpanFirst over a (masked) term — with
    positions consumed lazily in flat ragged form, no per-doc Python.
    Returns None when the shape needs the generic per-doc algebra. The
    greedy semantics are EXACTLY spans.py's: for width-1 clause spans,
    'earliest end then start among spans starting ≥ cur_end' is simply the
    first position ≥ cur_end, so the NearSpansOrdered chain becomes one
    packed-key searchsorted per clause (pinned equal to eval_spans by
    tests/test_spans.py rank identity and the fast≡generic property test)."""
    from .ast import SpanFirst, SpanNear
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))

    if isinstance(q, SpanFirst):
        t = _span_term_of(q.match)
        if t is None:
            return None
        if not sp.has(t):
            return empty
        cand = np.sort(sp.full(t)[0])
        if cand.size == 0:
            return empty
        ids, lens, flat = sp.positions_flat_for(t, cand)
        occ_rank = np.repeat(np.searchsorted(cand, ids), lens)
        sel = flat + 1 <= np.int64(q.end)  # span (p, p+1) must end ≤ n
        if not sel.any():
            return empty
        frs = np.bincount(occ_rank[sel], minlength=cand.size).astype(np.float64)
        keep = frs > 0
        return cand[keep], frs[keep]

    if isinstance(q, SpanNear) and q.in_order and len(q.clauses) >= 2:
        terms = [_span_term_of(c) for c in q.clauses]
        if any(t is None for t in terms):
            return None
        if any(not sp.has(t) for t in terms):
            return empty
        cand: np.ndarray | None = None
        for t in terms:
            ids = sp.full(t)[0]
            cand = ids if cand is None else np.intersect1d(
                cand, ids, assume_unique=True)
            if cand.size == 0:
                return empty
        cand = np.sort(cand)
        streams = [sp.positions_flat_for(t, cand) for t in terms]
        # the packed key is rank*offset + position: a position ≥ offset−1
        # would spill into the next candidate's bucket (cur_end can reach
        # max_pos+1). Derive the offset from the batch like the exact-
        # phrase kernel does, and when rank_span×offset can't fit int64
        # fall back to the generic per-doc span algebra (returns exact
        # results at any document length).
        max_pos = max((int(f.max()) for _i, _l, f in streams if f.size),
                      default=0)
        offset = max(_SPAN_OFFSET, np.int64(max_pos) + 2)
        if cand.size and cand.size > (np.int64(1) << 62) // offset:
            return None
        ids0, lens0, flat0 = streams[0]
        occ_rank = np.repeat(np.searchsorted(cand, ids0), lens0)
        start = flat0
        cur_end = flat0 + 1
        gap = np.zeros_like(flat0)
        alive = np.ones(flat0.size, dtype=bool)
        for ids_i, lens_i, flat_i in streams[1:]:
            keys = (np.repeat(np.searchsorted(cand, ids_i), lens_i)
                    * offset + flat_i)
            keys.sort()
            idx = np.searchsorted(keys, occ_rank * offset + cur_end,
                                  side="left")
            k = keys[np.minimum(idx, keys.size - 1)]
            alive &= (idx < keys.size) & (k // offset == occ_rank)
            p = k % offset
            gap = np.where(alive, gap + p - cur_end, gap)
            cur_end = np.where(alive, p + 1, cur_end)
        match = alive & (gap <= np.int64(q.slop))
        if not match.any():
            return empty
        # slack = (end − start) − width_min = Σ gaps for width-1 clauses
        w = np.ones(int(match.sum()), dtype=np.float64)
        w /= 1.0 + gap[match]
        frs = np.bincount(occ_rank[match], weights=w, minlength=cand.size)
        keep = frs > 0
        return cand[keep], frs[keep]

    return None


def _eval_span(sp: SegmentPostings, ctx: Ctx, q: SpanQuery):
    """Span family (spans/SpanScorer.java): spans via the shared algebra,
    freq = sloppy span frequency, scored like a phrase (Σ unique-term idf).
    Hot shapes take the vectorized flat-ragged path (_span_fast_freqs);
    the generic algebra runs with positions restricted to the tree's
    structural docid candidates (_span_candidates) — the lazy-.prx rule."""
    from ..spans import eval_spans, span_freq, span_width_min

    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))

    fast = _span_fast_freqs(sp, q)
    if fast is not None:
        docs, frs = fast
        if docs.size == 0:
            return empty
        uniq = list(dict.fromkeys(q.terms()))
        idf = float(sum(ctx.idf(t) for t in uniq))
        dls = _dl_map(sp, uniq, docs)
        sc = q.boost * idf * ctx.sim.tf_weight(frs, dls, ctx.avgdl_of(uniq[0]))
        return docs, sp.apply_boost(docs, sc)

    root_cand = np.sort(_span_candidates(sp, q))
    if root_cand.size == 0:
        return empty
    pos_cache: dict[str, dict[int, np.ndarray]] = {}

    def pos_of(term: str) -> dict[int, np.ndarray]:
        if term not in pos_cache:
            if not sp.has(term):
                pos_cache[term] = {}
            else:
                ids, pls = sp.positions_for(term, root_cand)
                pos_cache[term] = {int(d): pl for d, pl in zip(ids, pls)}
        return pos_cache[term]

    spans = eval_spans(q, pos_of)
    if not spans:
        return empty
    wmin = span_width_min(q)
    docs = np.asarray(sorted(spans), dtype=np.int64)
    frs = np.asarray([span_freq(spans[int(d)], wmin) for d in docs])
    sel = frs > 0
    docs, frs = docs[sel], frs[sel]
    if docs.size == 0:
        return empty
    uniq = list(dict.fromkeys(q.terms()))
    idf = float(sum(ctx.idf(t) for t in uniq))
    dls = _dl_map(sp, uniq, docs)
    sc = q.boost * idf * ctx.sim.tf_weight(frs, dls, ctx.avgdl_of(uniq[0]))
    return docs, sp.apply_boost(docs, sc)


def _is_term_disjunction(q: Bool) -> bool:
    return (
        not q.must
        and not q.must_not
        and q.effective_min_should() <= 1
        and all(isinstance(c, Term) for c in q.should)
    )


def _topk_theta(ids: np.ndarray, sc: np.ndarray, k: int) -> float:
    if ids.size < k:
        return -np.inf
    return float(np.partition(sc, sc.size - k)[sc.size - k])


def _combine_sum(results, boost: float = 1.0):
    """Sum per-clause (ids, scores) results in ONE pass: np.unique + a
    bincount over inverse indices. bincount accumulates weights in input
    order, so per doc the additions happen in clause order — bit-identical
    to the incremental left-fold merge (and to the oracle's Σ), but O(total)
    instead of O(clauses × accumulated)."""
    results = [r for r in results if r[0].size]
    if not results:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    all_ids = np.concatenate([r[0] for r in results])
    all_sc = np.concatenate([r[1] for r in results])
    ids, inv = np.unique(all_ids, return_inverse=True)
    sc = np.bincount(inv, weights=all_sc, minlength=ids.size)
    if boost != 1.0:
        sc = sc * boost
    return ids, sc


# above this clause count, MaxScore's incremental accumulator merges cost
# more than they can ever save (the 1024-term MultiTermQuery expansions) —
# decode everything and combine once; below it, block-targeted pruning wins
_OR_PRUNE_MAX_CLAUSES = 64


def _eval_or_maxscore(sp: SegmentPostings, ctx: Ctx, q: Bool):
    """MaxScore over a pure term disjunction (see module docstring).
    Index-time boosts scale each upper bound by the segment's max boost
    (sp.max_boost) — admissible since no doc's multiplier exceeds it, so
    pruning stays exact on boosted segments too."""
    terms = [(c, sp.term_upper_bound(c.term, ctx.idf(c.term),
                                     ctx.avgdl_of(c.term), ctx.sim)
              * c.boost * sp.max_boost)
             for c in q.should if sp.has(c.term)]
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    if len(terms) > _OR_PRUNE_MAX_CLAUSES:
        results = []
        for c, _ub in terms:
            ids, tfs, dls = sp.full(c.term)
            results.append((ids, sp.apply_boost(
                ids, c.boost * ctx.idf(c.term)
                * ctx.sim.tf_weight(tfs, dls, ctx.avgdl_of(c.term)))))
        return _combine_sum(results, q.boost)
    # evaluation must preserve clause order for FP-identical sums → we keep
    # per-clause results and sum in clause order at the end; pruning only
    # decides HOW each clause's postings are obtained (full vs lookup).
    order = np.argsort([-ub for _, ub in terms], kind="stable")
    suffix_ub = np.zeros(len(terms) + 1)
    for i in range(len(terms) - 1, -1, -1):
        suffix_ub[i] = suffix_ub[i + 1] + terms[order[i]][1]

    acc_ids = np.empty(0, dtype=np.int64)
    acc_sc = np.empty(0, dtype=np.float64)
    clause_results: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    theta = -np.inf
    for rank, oi in enumerate(order):
        c, _ub = terms[oi]
        prune = theta > -np.inf and suffix_ub[rank] * _SAFETY < theta
        if prune:
            # no new doc can enter the top-k: only docs already accumulated
            # need this term's contribution (block-targeted decode)
            ids, tfs, dls = sp.lookup(c.term, acc_ids)
        else:
            ids, tfs, dls = sp.full(c.term)
        sc = sp.apply_boost(ids, c.boost * ctx.idf(c.term)
                            * ctx.sim.tf_weight(tfs, dls, ctx.avgdl_of(c.term)))
        clause_results[oi] = (ids, sc)
        acc_ids, acc_sc = _merge_sum(acc_ids, acc_sc, ids, sc)
        theta = _topk_theta(acc_ids, acc_sc, ctx.k)
    # recombine in ORIGINAL clause order for oracle-identical FP summation
    return _combine_sum([clause_results[oi] for oi in range(len(terms))
                         if oi in clause_results], q.boost)


def _eval_payload_term(sp: SegmentPostings, ctx: Ctx, q: PayloadTerm):
    """PayloadTermQuery (search/payloads/PayloadTermQuery.java:48-142):
    every position of the term is a matched position, so docScore =
    PayloadFunction over ALL of the doc's payloads for the term; final
    score = BM25 span score × docScore when include_span_score (the
    reference default), else docScore alone (the boost rides the span
    score, so payload-only scoring ignores it — PayloadTermQuery.java:
    135-140)."""
    from ..payloads import payload_doc_score

    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    if not sp.has(q.term):
        return empty
    ids, tfs, dls = sp.full(q.term)
    if ids.size == 0:
        return empty
    _pids, pays = sp.payloads_for(q.term, ids)
    doc_sc = np.asarray([payload_doc_score(p, q.func) for p in pays],
                        dtype=np.float64)
    if not q.include_span_score:
        return ids, doc_sc
    sc = q.boost * ctx.idf(q.term) * ctx.sim.tf_weight(tfs, dls,
                                                    ctx.avgdl_of(q.term))
    return ids, sp.apply_boost(ids, sc) * doc_sc


def _eval_payload_near(sp: SegmentPostings, ctx: Ctx, q: PayloadNear):
    """PayloadNearQuery (search/payloads/PayloadNearQuery.java:54-200):
    SpanNear over term clauses; docScore = PayloadFunction over the
    payloads at every matched clause position of every matching span
    (getPayloads walks all subspans). Span frequency is the engine's
    sloppy span freq (Σ 1/(1+slack)) so the span-score leg is identical
    to the SpanNear over the same clauses (pinned by tests)."""
    from ..payloads import payload_doc_score, payload_near_matches

    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    terms = list(q.phrase_terms)
    if not terms or any(not sp.has(t) for t in terms):
        return empty
    cand: np.ndarray | None = None
    for t in dict.fromkeys(terms):
        ids = sp.full(t)[0]
        cand = ids if cand is None else np.intersect1d(
            cand, ids, assume_unique=True)
        if cand.size == 0:
            return empty
    cand = np.sort(cand)
    pos_by: list[dict[int, np.ndarray]] = []
    pay_by: list[dict[int, np.ndarray]] = []
    seen: dict[str, int] = {}
    for t in terms:
        if t in seen:  # duplicate clause: share the decoded streams
            pos_by.append(pos_by[seen[t]])
            pay_by.append(pay_by[seen[t]])
            continue
        seen[t] = len(pos_by)
        ids_t, pls = sp.positions_for(t, cand)
        _i2, pas = sp.payloads_for(t, cand)
        pos_by.append({int(d): pl for d, pl in zip(ids_t, pls)})
        pay_by.append({int(d): pa for d, pa in zip(ids_t, pas)})
    wmin = len(terms)
    docs_l: list[int] = []
    frs_l: list[float] = []
    dsc_l: list[float] = []
    for d in cand:
        d = int(d)
        plists = [pos_by[i].get(d) for i in range(len(terms))]
        if any(p is None for p in plists):
            continue
        matches = payload_near_matches(plists, q.slop, q.in_order)
        if not matches:
            continue
        fr = 0.0
        vals: list[float] = []
        for (s, e, clause_pos) in matches:
            fr += 1.0 / (1.0 + max((e - s) - wmin, 0))
            for i, p in enumerate(clause_pos):
                j = int(np.searchsorted(plists[i], p))
                vals.append(pay_by[i][d][j])
        docs_l.append(d)
        frs_l.append(fr)
        dsc_l.append(payload_doc_score(
            np.asarray(vals, dtype=np.float32), q.func))
    if not docs_l:
        return empty
    docs = np.asarray(docs_l, dtype=np.int64)
    doc_sc = np.asarray(dsc_l, dtype=np.float64)
    if not q.include_span_score:
        return docs, doc_sc
    uniq = list(dict.fromkeys(terms))
    idf = float(sum(ctx.idf(t) for t in uniq))
    dls = _dl_map(sp, uniq, docs)
    sc = q.boost * idf * ctx.sim.tf_weight(
        np.asarray(frs_l, dtype=np.float64), dls, ctx.avgdl_of(uniq[0]))
    return docs, sp.apply_boost(docs, sc) * doc_sc


def eval_query(sp: SegmentPostings, ctx: Ctx, q: Query, top: bool = False):
    """→ (sorted docids, scores) for this segment.

    `top` marks the ROOT query node: MaxScore pruning may drop docs that
    cannot enter the top-k, which is only sound where the caller consumes
    the result as a top-k candidate list. Every nested position — Boolean
    sub-clauses (scoring sums / min_should counting / must_not exclusion),
    DisjunctionMax legs, ConstantScore and Boosting inners — needs the
    COMPLETE match set, so recursion always passes top=False and those
    paths evaluate exactly."""
    if isinstance(q, Term):
        return _eval_term_full(sp, ctx, q)
    if isinstance(q, Phrase):
        return _eval_phrase(sp, ctx, q)
    if isinstance(q, MultiPhrase):
        return _eval_multiphrase(sp, ctx, q)
    if isinstance(q, SpanQuery):
        return _eval_span(sp, ctx, q)
    if isinstance(q, PayloadTerm):
        return _eval_payload_term(sp, ctx, q)
    if isinstance(q, PayloadNear):
        return _eval_payload_near(sp, ctx, q)
    if isinstance(q, ConstantScore):
        inner = q.query
        if isinstance(inner, Bool) and _is_term_disjunction(inner):
            # filter-style doc-set union: no per-term BM25 at all (the
            # reference CONSTANT_SCORE_* rewrites score nothing either,
            # search/MultiTermQuery.java:72-98)
            parts = [sp.full(c.term)[0] for c in inner.should if sp.has(c.term)]
            ids = (np.unique(np.concatenate(parts)) if parts
                   else np.empty(0, dtype=np.int64))
        else:
            ids, _ = eval_query(sp, ctx, inner)
        return ids, np.full(ids.size, q.boost, dtype=np.float64)
    if isinstance(q, Boosting):
        ids, sc = eval_query(sp, ctx, q.match)
        if ids.size:
            cids, _ = eval_query(sp, ctx, q.context)
            hit = np.isin(ids, cids, assume_unique=True)
            sc = np.where(hit, sc * q.demote, sc)
        if q.boost != 1.0:
            sc = sc * q.boost
        return ids, sc
    if isinstance(q, DisjunctionMax):
        subs = [eval_query(sp, ctx, s) for s in q.queries]
        all_ids = (np.unique(np.concatenate([i for i, _ in subs]))
                   if subs else np.empty(0, dtype=np.int64))
        if all_ids.size == 0:
            return all_ids, np.empty(0, dtype=np.float64)
        mx = np.full(all_ids.size, -np.inf)
        sm = np.zeros(all_ids.size)
        for ids, sc in subs:
            pos = np.searchsorted(all_ids, ids)
            np.maximum.at(mx, pos, sc)
            sm[pos] += sc
        out = q.boost * (mx + q.tie_breaker * (sm - mx))
        return all_ids, out
    if isinstance(q, MatchAll):
        raise ValueError("MatchAll is planned outside the kernel (docmap scan)")
    if isinstance(q, Bool):
        if not q.must and not q.should:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        if top and _is_term_disjunction(q) and len(
            {c.term for c in q.should}
        ) == len(q.should):
            ids, sc = _eval_or_maxscore(sp, ctx, q)
        else:
            ids, sc = _eval_bool_general(sp, ctx, q)
        return ids, sc
    raise TypeError(type(q))


def _eval_bool_general(sp: SegmentPostings, ctx: Ctx, q: Bool):
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    min_should = q.effective_min_should()

    # --- MUST: leapfrog intersection from the rarest clause, skip-decoding ---
    must_res: list[tuple[np.ndarray, np.ndarray]] = []
    if q.must:
        # candidate narrowing: evaluate Term clauses by ascending global df;
        # non-term clauses evaluated fully
        def clause_df(c: Query) -> int:
            return ctx.dfs.get(c.term, 0) if isinstance(c, Term) else 1 << 60

        idx_order = sorted(range(len(q.must)), key=lambda i: clause_df(q.must[i]))
        cand: np.ndarray | None = None
        res_by_idx: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for i in idx_order:
            c = q.must[i]
            if isinstance(c, Term) and cand is not None:
                if not sp.has(c.term):
                    return empty
                ids, tfs, dls = sp.lookup(c.term, cand)
                sc = sp.apply_boost(
                    ids, c.boost * ctx.idf(c.term)
                    * ctx.sim.tf_weight(tfs, dls, ctx.avgdl_of(c.term)))
            else:
                ids, sc = eval_query(sp, ctx, c)
            if ids.size == 0:
                return empty
            res_by_idx[i] = (ids, sc)
            cand = ids if cand is None else np.intersect1d(cand, ids, assume_unique=True)
            if cand.size == 0:
                return empty
        must_res = [res_by_idx[i] for i in range(len(q.must))]
    else:
        cand = None

    should_res = [eval_query(sp, ctx, c) for c in q.should]

    if cand is None:
        if not should_res:
            return empty
        cand = np.unique(np.concatenate([i for i, _ in should_res]))
    if cand.size == 0:
        return empty

    for c in q.must_not:
        ids, _ = eval_query(sp, ctx, c)
        cand = np.setdiff1d(cand, ids, assume_unique=True)
        if cand.size == 0:
            return empty

    # min_should filter
    if q.should and min_should > 0:
        cnt = np.zeros(cand.size, dtype=np.int64)
        for ids, _ in should_res:
            cnt += np.isin(cand, ids, assume_unique=True)
        cand = cand[cnt >= min_should]
        if cand.size == 0:
            return empty

    # final score: clause-order summation (must then should), FP-identical
    # to the oracle's sum(must) + sum(should)
    sc = np.zeros(cand.size, dtype=np.float64)
    for ids, s in must_res + should_res:
        sel = np.isin(ids, cand, assume_unique=True)
        pos = np.searchsorted(cand, ids[sel])
        sc[pos] += s[sel]
    if q.boost != 1.0:
        sc = sc * q.boost
    return cand, sc


EXPLAIN_SCHEMA = ("docid long, component string, kind string, freq double, "
                  "dl long, idf double, weight double, score double")


def _explain_rows(recs, docids, component, kind, freqs, dls, idf, weights,
                  scores):
    recs.extend(
        {"docid": int(d), "component": component, "kind": kind,
         "freq": float(f), "dl": int(dl), "idf": float(idf),
         "weight": float(w), "score": float(s)}
        for d, f, dl, w, s in zip(docids, freqs, dls, weights, scores))


def _explain_node(sp: SegmentPostings, ctx: Ctx, q: Query, scale: float,
                  recs: list) -> None:
    """Weight.explain analog (search/Weight.java:59): flatten the query
    tree into per-(doc, component) rows. `scale` folds ancestor boolean/
    dismax boosts so that, for pure-sum trees, per-doc component scores sum
    to the search() score. must_not clauses contribute no score and emit no
    rows; DisjunctionMax/Boosting components are emitted with their leaf
    scores (their combination rule — max+tie·rest / demote — is the
    consumer's to apply, as in the reference Explanation tree)."""
    if isinstance(q, Term):
        if not sp.has(q.term):
            return
        ids, sc = _eval_term_full(sp, ctx, q)
        _, tfs, dls = sp.full(q.term)
        w = ctx.sim.tf_weight(tfs, dls, ctx.avgdl_of(q.term))
        _explain_rows(recs, ids, q.term, "term", tfs.astype(np.float64),
                      dls, ctx.idf(q.term), w, sc * scale)
        return
    if isinstance(q, (Phrase, MultiPhrase)):
        is_multi = isinstance(q, MultiPhrase)
        uniq = list(dict.fromkeys(q.terms()))
        label = ("multiphrase(" if is_multi else "phrase(") \
            + " ".join(uniq) + (f")~{q.slop}" if q.slop else ")")
        ids, sc = (_eval_multiphrase(sp, ctx, q) if is_multi
                   else _eval_phrase(sp, ctx, q))
        if not ids.size:
            return
        idf = float(sum(ctx.idf(t) for t in uniq))
        dls = _dl_map(sp, uniq, ids)
        # freq back-derived from the scored weight would lose the greedy
        # sloppyFreq sum; recompute it the same way the scorer did
        boosted = sp.apply_boost(ids, np.ones(ids.size))
        w = sc / (q.boost * idf * boosted) if idf else np.zeros(ids.size)
        # invert tf-weight → freq through the ACTIVE similarity (the
        # scorer emitted w under ctx.sim; a hardcoded BM25 inversion
        # reported nonsense freqs under classic/sweetspot)
        freqs = ctx.sim.invert_tf_weight(w, dls, ctx.avgdl_of(uniq[0]))
        _explain_rows(recs, ids, label, "phrase", freqs, dls, idf, w,
                      sc * scale)
        return
    if isinstance(q, SpanQuery):
        uniq = list(dict.fromkeys(q.terms()))
        label = "span(" + " ".join(uniq) + ")"
        ids, sc = _eval_span(sp, ctx, q)
        if not ids.size:
            return
        idf = float(sum(ctx.idf(t) for t in uniq))
        dls = _dl_map(sp, uniq, ids)
        boosted = sp.apply_boost(ids, np.ones(ids.size))
        w = sc / (q.boost * idf * boosted) if idf else np.zeros(ids.size)
        freqs = ctx.sim.invert_tf_weight(w, dls, ctx.avgdl_of(uniq[0]))
        _explain_rows(recs, ids, label, "span", freqs, dls, idf, w,
                      sc * scale)
        return
    if isinstance(q, ConstantScore):
        ids, _sc = eval_query(sp, ctx, q)
        if not ids.size:
            return
        ones = np.ones(ids.size)
        label = "const(" + " ".join(dict.fromkeys(q.terms())) + ")"
        _explain_rows(recs, ids, label, "const", ones,
                      np.zeros(ids.size, dtype=np.int64), 0.0, ones,
                      np.full(ids.size, q.boost * scale))
        return
    if isinstance(q, Bool):
        for c in list(q.must) + list(q.should):
            _explain_node(sp, ctx, c, scale * q.boost, recs)
        return
    if isinstance(q, DisjunctionMax):
        for c in q.queries:
            _explain_node(sp, ctx, c, scale * q.boost, recs)
        return
    if isinstance(q, Boosting):
        _explain_node(sp, ctx, q.match, scale * q.boost, recs)
        return
    if isinstance(q, (PayloadTerm, PayloadNear)):
        # payload row: freq carries the PayloadFunction docScore (the
        # reference Explanation nests "payload score" under the span
        # score, PayloadTermQuery.java explain), weight the span tf-weight
        from dataclasses import replace

        ids, sc = eval_query(sp, ctx, q)
        if not ids.size:
            return
        _i2, dsc = eval_query(sp, ctx, replace(q, include_span_score=False))
        uniq = list(dict.fromkeys(q.terms()))
        label = "payload(" + " ".join(uniq) + f"):{q.func}"
        idf = float(sum(ctx.idf(t) for t in uniq))
        dls = _dl_map(sp, uniq, ids)
        boosted = sp.apply_boost(ids, np.ones(ids.size))
        denom = q.boost * idf * boosted * dsc
        w = np.divide(sc, denom, out=np.zeros_like(sc),
                      where=denom != 0) if idf else np.zeros(ids.size)
        _explain_rows(recs, ids, label, "payload", dsc, dls, idf, w,
                      sc * scale)
        return
    # MatchAll / unknown shapes: nothing postings-backed to decompose


def segment_explain(pdf: pd.DataFrame, q: Query, ctx: Ctx,
                    block_size: int = BLOCK_SIZE) -> pd.DataFrame:
    """applyInPandas entry point for Searcher.explain_full."""
    sp = SegmentPostings(pdf, block_size)
    recs: list[dict] = []
    _explain_node(sp, ctx, q, 1.0, recs)
    if not recs:
        return pd.DataFrame({
            "docid": pd.Series(dtype="int64"),
            "component": pd.Series(dtype="object"),
            "kind": pd.Series(dtype="object"),
            "freq": pd.Series(dtype="float64"),
            "dl": pd.Series(dtype="int64"),
            "idf": pd.Series(dtype="float64"),
            "weight": pd.Series(dtype="float64"),
            "score": pd.Series(dtype="float64")})
    return pd.DataFrame(recs)


def segment_topk_many(pdf: pd.DataFrame, qs: dict[str, Query], ctx_by: dict[str, Ctx],
                      block_size: int = BLOCK_SIZE) -> pd.DataFrame:
    """Batched entry point: ALL queries of a batch against one segment in a
    single applyInPandas call → (qid, docid, score) per-segment top-k rows.
    One postings scan + one decode per term serves every query that mentions
    it (SegmentPostings caches decodes) — the per-query Spark job scheduling
    floor is paid once per batch instead of once per query. This is the
    batch-serving analog of MultiSearcher fan-out (MultiSearcher.java:48):
    same per-segment scorers, shared readers."""
    sp = SegmentPostings(pdf, block_size)
    frames = []
    for qid, q in qs.items():
        ctx = ctx_by[qid]
        ids, sc = eval_query(sp, ctx, q, top=True)
        if sp.deleted is not None and ids.size:
            keep = ~np.isin(ids, sp.deleted, assume_unique=False)
            ids, sc = ids[keep], sc[keep]
        if ids.size == 0:
            continue
        k = min(ctx.k, ids.size)
        order = np.lexsort((ids, -sc))[:k]
        frames.append(pd.DataFrame({"qid": qid, "docid": ids[order],
                                    "score": sc[order]}))
    if not frames:
        return pd.DataFrame({"qid": pd.Series(dtype="object"),
                             "docid": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    return pd.concat(frames, ignore_index=True)


def segment_filter_ids(pdf: pd.DataFrame, k: int, boost: float,
                       block_size: int = BLOCK_SIZE) -> pd.DataFrame:
    """CONSTANT_SCORE_FILTER rewrite kernel (search/MultiTermQuery.java:72
    ConstantScoreFilterRewrite → MultiTermQueryWrapperFilter): every posting
    row the plan delivered belongs to a matching term — union the live
    docids, uniform score. Per-segment bound: constant scores tie, so the
    global merge keeps the k lowest docids; the segment only needs its own
    first k."""
    sp = SegmentPostings(pdf, block_size)
    parts = [sp.full(t)[0] for t in sp.rows]
    ids = (np.unique(np.concatenate(parts)) if parts
           else np.empty(0, dtype=np.int64))
    ids = ids[: min(k, ids.size)]
    return pd.DataFrame({"docid": ids,
                         "score": np.full(ids.size, boost, dtype=np.float64)})


def segment_payload_values(pdf: pd.DataFrame, units: list,
                           block_size: int = BLOCK_SIZE) -> pd.DataFrame:
    """PayloadSpanUtil extraction for ONE segment → (docid, payload) rows:
    the payloads at every matched position of every extraction unit
    (lucene_spark/payloads.py payload_units), NaN/absent skipped. Decoded
    streams are cached per term so units sharing a term pay once."""
    from ..payloads import extract_unit_payloads

    sp = SegmentPostings(pdf, block_size)
    pos_cache: dict[str, dict] = {}
    pay_cache: dict[str, dict] = {}

    def pos_of(t: str) -> dict:
        if t not in pos_cache:
            if not sp.has(t):
                pos_cache[t] = {}
                pay_cache[t] = {}
            else:
                ids = np.sort(sp.full(t)[0])
                ids_p, pls = sp.positions_for(t, ids)
                _i, pas = sp.payloads_for(t, ids)
                pos_cache[t] = {int(d): pl for d, pl in zip(ids_p, pls)}
                pay_cache[t] = {int(d): pa for d, pa in zip(ids_p, pas)}
        return pos_cache[t]

    def pay_of(t: str) -> dict:
        pos_of(t)
        return pay_cache[t]

    rows: list[tuple[int, float]] = []
    for u in units:
        rows.extend(extract_unit_payloads(u, pos_of, pay_of))
    if not rows:
        return pd.DataFrame({"docid": pd.Series(dtype="int64"),
                             "payload": pd.Series(dtype="float64")})
    return pd.DataFrame(rows, columns=["docid", "payload"])


def segment_topk(pdf: pd.DataFrame, q: Query, ctx: Ctx, block_size: int = BLOCK_SIZE) -> pd.DataFrame:
    """Entry point for applyInPandas: one segment's query-term posting rows →
    per-segment top-k (docid, score) with docid-asc tie-break (the reference
    per-segment bounded heap, search/TopScoreDocCollector.java:46-66)."""
    sp = SegmentPostings(pdf, block_size)
    ids, sc = eval_query(sp, ctx, q, top=True)
    if sp.deleted is not None and ids.size:
        keep = ~np.isin(ids, sp.deleted, assume_unique=False)
        ids, sc = ids[keep], sc[keep]
    if ids.size == 0:
        return pd.DataFrame({"docid": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    k = min(ctx.k, ids.size)
    order = np.lexsort((ids, -sc))[:k]
    return pd.DataFrame({"docid": ids[order], "score": sc[order]})
