"""_sloppy_phrase_freqs_batch ≡ scoring.phrase_freq, differentially.

The round-5 batched sloppy-phrase machine (kernel.py) must produce the
EXACT per-doc sloppyFreq the scalar greedy walk produces
(search/SloppyPhraseScorer.java:25-75 semantics) for every doc — random
ragged corpora, repeated terms, stopword holes, every slop."""

import random

import numpy as np

from lucene_spark.queries.kernel import _sloppy_phrase_freqs_batch
from lucene_spark.scoring import phrase_freq


def _mk_case(rng, m, n_docs, max_tf, max_pos):
    """Random per-term flat triples over n_docs docs where every doc has
    >=1 position for every term (the kernel's candidate contract)."""
    per_doc = [[sorted(rng.sample(range(max_pos),
                                  rng.randint(1, max_tf)))
                for _ in range(n_docs)] for _ in range(m)]
    cand = np.arange(n_docs, dtype=np.int64)
    triples = []
    for i in range(m):
        lens = np.asarray([len(p) for p in per_doc[i]], dtype=np.int64)
        flat = np.asarray([x for p in per_doc[i] for x in p],
                          dtype=np.int64)
        # shuffle doc order inside the triple (salt-split rows arrive
        # unsorted) — the batch machine must handle it
        order = list(range(n_docs))
        rng.shuffle(order)
        ids = cand[order]
        starts = np.zeros(n_docs, dtype=np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        sh_lens = lens[order]
        sh_flat = np.concatenate(
            [flat[starts[j]:starts[j] + lens[j]] for j in order]) \
            if flat.size else flat
        triples.append((ids, sh_lens, sh_flat))
    return per_doc, cand, triples


def _scalar(per_doc, qpos, slop, n_docs):
    out = {}
    for d in range(n_docs):
        f = phrase_freq([np.asarray(per_doc[i][d], dtype=np.int64)
                         for i in range(len(per_doc))], qpos, slop)
        if f > 0:
            out[d] = f
    return out


def test_differential_random():
    rng = random.Random(7)
    for trial in range(60):
        m = rng.randint(2, 4)
        # qpos strictly increasing, possibly with stopword holes
        qpos, p = [], 0
        for _ in range(m):
            qpos.append(p)
            p += rng.randint(1, 3)
        slop = rng.choice([1, 2, 3, 5, 10])
        per_doc, cand, triples = _mk_case(
            rng, m, n_docs=rng.randint(1, 40),
            max_tf=rng.randint(1, 6), max_pos=30)
        ids, frs = _sloppy_phrase_freqs_batch(triples, qpos, slop, cand)
        got = dict(zip(ids.tolist(), frs.tolist()))
        want = _scalar(per_doc, qpos, slop, cand.size)
        assert got.keys() == want.keys(), (trial, qpos, slop)
        for d in got:
            assert got[d] == want[d], (trial, d, qpos, slop)


def test_differential_dense_overlap():
    """Heavy position overlap — the duplicate-abspos guard and the tie
    rule (advance FIRST minimal cursor) must match the scalar machine."""
    rng = random.Random(11)
    for trial in range(40):
        m = rng.randint(2, 3)
        qpos = list(range(m))  # adjacent slots: duplicates likely
        slop = rng.choice([0 + 1, 2])  # sloppy path only
        per_doc, cand, triples = _mk_case(
            rng, m, n_docs=20, max_tf=5, max_pos=8)
        ids, frs = _sloppy_phrase_freqs_batch(triples, qpos, slop, cand)
        got = dict(zip(ids.tolist(), frs.tolist()))
        want = _scalar(per_doc, qpos, slop, 20)
        assert got == want, (trial, qpos, slop)


def test_empty_candidates():
    ids, frs = _sloppy_phrase_freqs_batch(
        [], [0, 1], 2, np.empty(0, dtype=np.int64))
    assert ids.size == 0 and frs.size == 0
