"""BM25 scoring + phrase matching — ONE implementation shared by the
single-node oracle and the Spark kernels, so rank-identity is by
construction.

North rule pins BM25 (k1=1.2, b=0.75). The reference's pluggable Similarity
seam (search/Similarity.java:527) licenses the swap from its TF-IDF
(search/DefaultSimilarity.java:23-77); inputs are the same corpus statistics
(tf, df, N, doclen, avgdl). idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — the
non-negative Robertson/Lucene-modern form, pinned in FIXTURES.md §3.3.

All functions are numpy array-at-a-time.
"""

from __future__ import annotations

import numpy as np

from . import BM25_B, BM25_K1


def bm25_idf(N: int, df) -> np.ndarray | float:
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5))


def bm25_tf_weight(tf, dl, avgdl: float) -> np.ndarray:
    """(k1+1)·tf / (tf + k1·(1 − b + b·dl/avgdl)) — monotone ↑ in tf, ↓ in dl."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return (BM25_K1 + 1.0) * tf / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))


def bm25_score(tf, dl, N: int, df: int, avgdl: float) -> np.ndarray:
    return bm25_idf(N, df) * bm25_tf_weight(tf, dl, avgdl)


def bm25_term_upper_bound(N: int, df: int, max_tf: int, min_dl: int, avgdl: float) -> float:
    """Admissible per-block score bound for block-max WAND: tf-weight is
    increasing in tf and decreasing in dl, so f(max_tf, min_dl) dominates."""
    return float(bm25_idf(N, df) * bm25_tf_weight(max_tf, min_dl, avgdl))


# ---------------------------------------------------------------------------
# Index-time boost quantization — the reference norm byte (util/SmallFloat
# .java floatToByte315/byte315ToFloat, used by index/NormsWriter.java:61 to
# store boost×lengthNorm in ONE byte per doc-field). Our BM25 keeps exact
# doclens in the postings, so only the BOOST factor is quantized and stored;
# the same 3-mantissa-bit/zeroExp-15 float8 keeps the storage parity (and
# its precision contract: 1.0/2.0/0.5/1.5… round-trip exactly).
# ---------------------------------------------------------------------------

def float_to_byte315(f) -> np.ndarray:
    """float32 → unsigned byte (3 mantissa bits, zero exponent 15).
    Array-at-a-time; negative/zero → 0, overflow → 255."""
    bits = np.asarray(f, dtype=np.float32).view(np.int32)
    smallfloat = bits >> (24 - 3)
    lo = (63 - 15) << 3
    out = (smallfloat - lo).astype(np.int64)
    out = np.where(smallfloat <= lo, np.where(bits <= 0, 0, 1), out)
    out = np.where(smallfloat >= lo + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b) -> np.ndarray:
    """Inverse of float_to_byte315 (byte 0 → 0.0)."""
    b = np.asarray(b, dtype=np.int64)
    bits = (b & 0xFF) << (24 - 3)
    bits += (63 - 15) << 24
    out = bits.astype(np.int32).view(np.float32).astype(np.float64)
    return np.where(b == 0, 0.0, out)


# ---------------------------------------------------------------------------
# Phrase matching (shared semantic, pinned):
# a document matches iff there exist positions p_i — one from each query
# term's position list, all distinct — such that
#     span = max(p_i − qpos_i) − min(p_i − qpos_i) ≤ slop.
# For slop 0 this is the exact consecutive-phrase condition (with stopword
# holes honoured via qpos). Phrase frequency for scoring sums the reference's
# sloppyFreq = 1/(span+1) over a greedy left-to-right non-overlapping match
# enumeration (reference search/SloppyPhraseScorer.java:25-75 semantics,
# DefaultSimilarity.java:63 sloppyFreq).
# ---------------------------------------------------------------------------

def phrase_freq(position_lists: list[np.ndarray], qpos: list[int], slop: int) -> float:
    """→ summed sloppyFreq (0.0 if no match). position_lists[i] must be a
    sorted int array of term i's positions in the doc."""
    m = len(position_lists)
    if m == 0 or any(len(p) == 0 for p in position_lists):
        return 0.0
    # normalize: shifted[i] = positions - qpos[i]; an exact match is m equal
    # shifted values; a sloppy match is m shifted values within a window slop.
    shifted = [np.asarray(p, dtype=np.int64) - qpos[i] for i, p in enumerate(position_lists)]
    if slop == 0:
        common = shifted[0]
        for s in shifted[1:]:
            common = np.intersect1d(common, s, assume_unique=False)
            if common.size == 0:
                return 0.0
        # distinct-position guard: with distinct terms, equal shifted values
        # at distinct qpos are distinct positions by construction
        return float(common.size)
    # sloppy: greedy minimal-window enumeration over the merged candidates.
    # Two-term fast path: identical greedy semantics, plain-int two-pointer
    # walk (numpy scalar indexing dominates the generic loop's cost).
    if m == 2:
        a, b = shifted[0].tolist(), shifted[1].tolist()
        la, lb = len(a), len(b)
        i = j = 0
        total = 0.0
        q0, q1 = qpos[0], qpos[1]
        while i < la and j < lb:
            av, bv = a[i], b[j]
            d = av - bv if av >= bv else bv - av
            if d <= slop:
                if av + q0 == bv + q1:
                    # repeated-term guard: ONE token occurrence cannot fill
                    # both phrase slots (distinct-positions invariant).
                    # Advance the minimal-shifted cursor — with qpos
                    # increasing that is always j (same rule as the generic
                    # leapfrog), so the a-token stays available to pair
                    # with a LATER b occurrence.
                    j += 1
                else:
                    total += 1.0 / (d + 1.0)
                    i += 1
                    j += 1
            elif av < bv:
                i += 1
            else:
                j += 1
        return total
    total = 0.0
    cursors = [0] * m
    lens = [len(s) for s in shifted]
    while all(cursors[i] < lens[i] for i in range(m)):
        vals = [int(shifted[i][cursors[i]]) for i in range(m)]
        lo, hi = min(vals), max(vals)
        if hi - lo <= slop:
            abspos = [vals[i] + qpos[i] for i in range(m)]
            if len(set(abspos)) == m:
                total += 1.0 / (hi - lo + 1.0)
                # consume all participants (non-overlapping greedy)
                for i in range(m):
                    cursors[i] += 1
                continue
            # duplicate token occurrence across slots: not a valid match —
            # leapfrog the minimal cursor past it
            i_min = min(range(m), key=lambda i: shifted[i][cursors[i]])
            cursors[i_min] += 1
        else:
            # advance the minimal cursor (classic leapfrog)
            i_min = min(range(m), key=lambda i: shifted[i][cursors[i]])
            cursors[i_min] += 1
    return total


def wildcard_to_regex(pattern: str) -> str:
    """Lucene wildcard syntax (* any run, ? one char) → anchored regex
    (reference search/WildcardTermEnum.java semantics)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append("\\" + ch if ch in ".^$+{}[]|()\\" else ch)
    return "^" + "".join(out) + "$"


def levenshtein(a: str, b: str) -> int:
    """Edit distance (reference search/FuzzyTermEnum.java:95 similarity basis)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]
