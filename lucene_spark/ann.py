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
