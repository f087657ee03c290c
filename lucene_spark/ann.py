"""ANN support: deterministic Lloyd's k-means for IVF coarse quantization.

IVF (inverted-file) ANN assigns every vector to its nearest centroid cell
and probes only the query's top cells — the classic scale path beside LSH.
Training is an offline, sample-bounded step (at 100 TB: a driver-side or
single-stage k-means over a uniform sample; the expensive part — assigning
the full corpus — stays distributed as a broadcast-join + argmax).

Determinism contract (shared with the DuckDB oracle's unrolled-CTE
k-means in __spark_entry__.py):
- init: the first k vectors, in vec_id order;
- assignment: argmax over cosine similarity ROUNDED to 10 decimals, ties →
  lowest cell — rounding makes the argmax stable across engines whose
  float summation orders differ;
- update: per-cell component means ROUNDED to 6 decimals — again so both
  engines land on bit-identical centroids;
- fixed iteration count (no convergence test — data-independent plan).
"""

from __future__ import annotations

import numpy as np

KMEANS_ITERS = 3
ASSIGN_ROUND = 10
CENTROID_ROUND = 6


def cosine_matrix(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n,d) × (k,d) → (n,k) cosine similarities, float64."""
    xn = np.linalg.norm(x, axis=1)
    cn = np.linalg.norm(c, axis=1)
    return (x @ c.T) / (xn[:, None] * cn[None, :])


def kmeans_train(x: np.ndarray, k: int,
                 iters: int = KMEANS_ITERS) -> np.ndarray:
    """Deterministic Lloyd's over rows of x (float64) → (k, d) centroids."""
    x = np.asarray(x, dtype=np.float64)
    cent = x[:k].copy()
    for _ in range(iters):
        cos = np.round(cosine_matrix(x, cent), ASSIGN_ROUND)
        assign = np.argmax(cos, axis=1)  # first max → lowest cell on ties
        for cell in range(k):
            members = x[assign == cell]
            if not members.shape[0]:
                # the SQL oracle would silently DROP an empty cell — fail
                # loudly instead so the engines can never diverge unseen
                raise ValueError(f"k-means cell {cell} emptied; "
                                 f"lower k or reseed")
            cent[cell] = np.round(members.mean(axis=0), CENTROID_ROUND)
    return cent


def kmeans_assign(x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Cell id per row of x under the shared determinism contract."""
    cos = np.round(cosine_matrix(np.asarray(x, dtype=np.float64), cent),
                   ASSIGN_ROUND)
    return np.argmax(cos, axis=1)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — memory-compressed ANN (Jégou et al. 2011,
# "Product Quantization for Nearest Neighbor Search")
# ---------------------------------------------------------------------------
#
# PQ splits each d-dim vector into M subvectors and vector-quantizes each
# subspace with its own small codebook (K centroids): a vector compresses
# to M small codes (here M=4, K=16 → 4 bytes for a 64-dim float vector,
# a 64x compression). Search uses ASYMMETRIC DISTANCE COMPUTATION (ADC):
# the query's squared L2 distance to every codebook centroid is tabulated
# once (an M×K lookup table), and a database vector's approximate distance
# is the SUM of M table lookups — no float vector is ever touched at query
# time. This is THE standard memory shape for 10^12-vector corpora
# (IVF-PQ): the engine-side encode is a zero-shuffle broadcast-codebook
# argmin, the search a zero-shuffle table-lookup projection.
#
# Same determinism contract as the cosine k-means above, with squared L2
# as the metric (PQ quantizes raw subvectors, where cosine is meaningless):
# assignment = argmin of squared L2 ROUNDED to 10 decimals (ties → lowest
# code), means rounded to 6 decimals, init first-K, fixed iterations.


def sqdist_matrix(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n,d) × (k,d) → (n,k) squared L2 distances, float64, computed the
    naive way (explicit differences) — NOT the ||x||²+||c||²-2x·c
    expansion, whose cancellation error diverges from the SQL oracle's
    sum((x-c)^2) beyond the rounding contract."""
    diff = x[:, None, :] - c[None, :, :]
    return np.einsum("nkd,nkd->nk", diff, diff)


def kmeans_train_l2(x: np.ndarray, k: int,
                    iters: int = KMEANS_ITERS) -> np.ndarray:
    """Deterministic Lloyd's under squared L2 (the PQ subspace metric)."""
    x = np.asarray(x, dtype=np.float64)
    cent = x[:k].copy()
    for _ in range(iters):
        d2 = np.round(sqdist_matrix(x, cent), ASSIGN_ROUND)
        assign = np.argmin(d2, axis=1)  # first min → lowest code on ties
        for cell in range(k):
            members = x[assign == cell]
            if not members.shape[0]:
                raise ValueError(f"PQ k-means code {cell} emptied; "
                                 f"lower k or reseed")
            cent[cell] = np.round(members.mean(axis=0), CENTROID_ROUND)
    return cent


def pq_train(x: np.ndarray, m: int, k: int,
             iters: int = KMEANS_ITERS) -> list[np.ndarray]:
    """Per-subspace codebooks: split columns into m contiguous equal-width
    subspaces (d % m must be 0) and train each independently."""
    x = np.asarray(x, dtype=np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"PQ: dim {d} not divisible by m={m}")
    w = d // m
    return [kmeans_train_l2(x[:, j * w:(j + 1) * w], k, iters)
            for j in range(m)]


def pq_adc_table(q: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    """ADC lookup table (m, k): squared L2 from each query subvector to
    every centroid of its subspace codebook, rounded under the shared
    contract so engine and oracle tabulate identical partial distances."""
    q = np.asarray(q, dtype=np.float64)
    w = books[0].shape[1]
    return np.round(np.stack([
        sqdist_matrix(q[None, j * w:(j + 1) * w], books[j])[0]
        for j in range(len(books))]), ASSIGN_ROUND)
