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
# Pluggable Similarity (search/Similarity.java:527 extension point).
#
# The engine's per-term contribution everywhere is
#     boost · term_weight(N, df) · tf_weight(tf, dl, avgdl)
# with BM25 as the north-rule default. Swapping the strategy swaps BOTH
# factors in every scorer (term, boolean, phrase, span — the kernel calls
# through ctx.sim) and in the single-node oracle, so rank identity between
# the two engines holds per similarity by construction.
#
# Stated deviations from the reference's full VSM pipeline: queryNorm
# (DefaultSimilarity.java:51) is a per-query constant — rank-neutral —
# and omitted; coord (DefaultSimilarity.java:75) is omitted (the
# reference itself ships BooleanQuery coord-disabling, and BM25-era
# scoring dropped coord entirely).
# ---------------------------------------------------------------------------

class Similarity:
    """BM25 (k1=1.2, b=0.75) — the engine default pinned by the north rule."""

    name = "bm25"

    def term_weight(self, N: int, df):
        """Per-term document-frequency weight (the idf factor of the
        score; for ClassicSimilarity this is idf² because the reference
        applies idf once in the Weight and once in the Scorer —
        search/TermQuery.java scorer × DefaultSimilarity.java:69)."""
        return bm25_idf(N, df)

    def tf_weight(self, tf, dl, avgdl: float):
        """tf-and-length component of the score (vectorized)."""
        return bm25_tf_weight(tf, dl, avgdl)

    def tf_weight_upper(self, max_tf, min_dl, avgdl: float):
        """Admissible per-block bound for MaxScore pruning. BM25's
        tf-weight is monotone ↑ in tf and ↓ in dl, so evaluating at
        (max_tf, min_dl) dominates every doc in the block. Similarities
        whose length norm is NOT monotone must override."""
        return self.tf_weight(max_tf, min_dl, avgdl)

    def invert_tf_weight(self, w, dl, avgdl: float):
        """freq such that tf_weight(freq, dl, avgdl) == w — explain_full's
        phrase/span freq reconstruction (the scorer emits only the summed
        sloppy-frequency weight). Must be overridden alongside tf_weight
        or explain rows report BM25-inverted nonsense for other metrics.
        BM25: w = (k1+1)f/(f + k1·B) ⇒ f = k1·B·w/((k1+1)−w)."""
        B = 1.0 - BM25_B + BM25_B * np.asarray(dl, np.float64) / avgdl
        return BM25_K1 * B * w / ((BM25_K1 + 1.0) - w)


class ClassicSimilarity(Similarity):
    """The reference's DefaultSimilarity (search/DefaultSimilarity.java:
    23-77): tf = sqrt(freq) (:57), idf = ln(N/(df+1)) + 1 (:69) applied
    squared per term, lengthNorm = 1/sqrt(numTerms) (:45). avgdl unused."""

    name = "classic"

    def term_weight(self, N: int, df):
        idf = np.log(N / (np.asarray(df, dtype=np.float64) + 1.0)) + 1.0
        return idf * idf

    def tf(self, freq):
        return np.sqrt(np.asarray(freq, dtype=np.float64))

    def length_norm(self, dl):
        return 1.0 / np.sqrt(np.asarray(dl, dtype=np.float64))

    def tf_weight(self, tf, dl, avgdl: float):
        return self.tf(tf) * self.length_norm(dl)
    # tf ↑, length_norm ↓ in dl → the base-class (max_tf, min_dl) bound
    # stays admissible.

    def invert_tf_weight(self, w, dl, avgdl: float):
        """w = sqrt(f)·lengthNorm(dl) ⇒ f = (w / lengthNorm(dl))²."""
        t = np.asarray(w, np.float64) / self.length_norm(dl)
        return t * t


class SweetSpotSimilarity(ClassicSimilarity):
    """contrib/misc SweetSpotSimilarity.java:47-270 — plateau length norm
    `1/sqrt(steepness·(|dl−min| + |dl−max| − (max−min)) + 1)` (:171-186,
    defaults min=max=1, steepness=0.5) with either the baseline tf
    `freq<=tf_min ? tf_base : sqrt(freq + tf_base² − tf_min)` (:221-227,
    defaults 0/0 ⇒ sqrt) or the hyperbolic tf
    `min + (max−min)/2 · (tanh-form((freq−xoffset)·ln base) + 1)`
    (:244-266, defaults min=0 max=2 base=1.3 xoffset=10)."""

    name = "sweetspot"

    def __init__(self, ln_min: int = 1, ln_max: int = 1,
                 steepness: float = 0.5, tf_base: float = 0.0,
                 tf_min: float = 0.0, hyperbolic_tf: bool = False,
                 tf_hyper_min: float = 0.0, tf_hyper_max: float = 2.0,
                 tf_hyper_base: float = 1.3, tf_hyper_xoffset: float = 10.0):
        self.ln_min, self.ln_max, self.steepness = ln_min, ln_max, steepness
        self.tf_base, self.tf_min = tf_base, tf_min
        self.hyperbolic_tf = hyperbolic_tf
        self.tf_hyper_min, self.tf_hyper_max = tf_hyper_min, tf_hyper_max
        self.tf_hyper_base = tf_hyper_base
        self.tf_hyper_xoffset = tf_hyper_xoffset

    def tf(self, freq):
        freq = np.asarray(freq, dtype=np.float64)
        if self.hyperbolic_tf:
            x = (freq - self.tf_hyper_xoffset) * np.log(self.tf_hyper_base)
            out = (self.tf_hyper_min
                   + (self.tf_hyper_max - self.tf_hyper_min) / 2.0
                   * (np.tanh(x) + 1.0))
        else:
            out = np.where(
                freq <= self.tf_min, self.tf_base,
                np.sqrt(np.maximum(freq + self.tf_base ** 2 - self.tf_min,
                                   0.0)))
        return np.where(freq == 0.0, 0.0, out)

    def length_norm(self, dl):
        dl = np.asarray(dl, dtype=np.float64)
        plateau = (np.abs(dl - self.ln_min) + np.abs(dl - self.ln_max)
                   - (self.ln_max - self.ln_min))
        return 1.0 / np.sqrt(self.steepness * plateau + 1.0)

    def tf_weight_upper(self, max_tf, min_dl, avgdl: float):
        """The plateau norm is NOT monotone in dl (it peaks at 1.0 inside
        [ln_min, ln_max]), so bound it by its maximum instead of
        evaluating at min_dl."""
        return self.tf(max_tf) * 1.0

    def invert_tf_weight(self, w, dl, avgdl: float):
        """Invert tf(f)·lengthNorm(dl): baseline tf inverts as
        f = t² − tf_base² + tf_min (t above the tf_base floor); the
        hyperbolic tf inverts through arctanh inside its open range and
        reports NaN at/beyond the saturation plateau (where freq is
        genuinely unrecoverable from the weight)."""
        t = np.asarray(w, np.float64) / self.length_norm(dl)
        if not self.hyperbolic_tf:
            return np.where(t <= self.tf_base, float(self.tf_min),
                            t * t - self.tf_base ** 2 + self.tf_min)
        span = self.tf_hyper_max - self.tf_hyper_min
        y = 2.0 * (t - self.tf_hyper_min) / span - 1.0
        with np.errstate(divide="ignore", invalid="ignore"):
            x = np.where(np.abs(y) < 1.0, np.arctanh(np.clip(y, -1, 1)),
                         np.nan)
        return x / np.log(self.tf_hyper_base) + self.tf_hyper_xoffset


DEFAULT_SIMILARITY = Similarity()

_SIMILARITIES = {"bm25": Similarity, "classic": ClassicSimilarity,
                 "sweetspot": SweetSpotSimilarity}


def similarity_by_name(name_or_sim) -> Similarity:
    """Accepts a Similarity instance, a registered name, or None (BM25)."""
    if name_or_sim is None:
        return DEFAULT_SIMILARITY
    if isinstance(name_or_sim, Similarity):
        return name_or_sim
    return _SIMILARITIES[name_or_sim]()


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
