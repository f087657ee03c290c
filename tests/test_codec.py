"""Codec round-trip + property tests (CheckIndex semantics,
reference index/CheckIndex.java:589 — df==len(ids), cf==sum(freqs),
docIDs strictly increasing)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.codec import (
    decode_block,
    decode_positions,
    decode_postings,
    encode_positions,
    encode_postings,
    vbyte_decode,
    vbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**56), max_size=300))
@settings(max_examples=50, deadline=None)
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    blob = vbyte_encode(arr)
    out, end = vbyte_decode(blob)
    assert end == len(blob)
    np.testing.assert_array_equal(out, arr)


def test_vbyte_partial_decode():
    arr = np.array([1, 300, 7, 123456789], dtype=np.uint64)
    blob = vbyte_encode(arr)
    first2, ofs = vbyte_decode(blob, 0, 2)
    np.testing.assert_array_equal(first2, arr[:2])
    rest, _ = vbyte_decode(blob, ofs, 2)
    np.testing.assert_array_equal(rest, arr[2:])


@given(
    st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=500),
)
@settings(max_examples=30, deadline=None)
def test_postings_roundtrip(gaps):
    docids = np.cumsum(np.array(gaps, dtype=np.int64))
    rng = np.random.default_rng(42)
    tfs = rng.integers(1, 50, size=docids.size).astype(np.int64)
    dls = rng.integers(1, 500, size=docids.size).astype(np.int64)
    enc = encode_postings(docids, tfs, dls, block_size=64)
    assert enc["df"] == docids.size
    assert enc["cf"] == int(tfs.sum())
    ids2, tfs2, dls2 = decode_postings(enc, block_size=64)
    np.testing.assert_array_equal(ids2, docids)
    np.testing.assert_array_equal(tfs2, tfs)
    np.testing.assert_array_equal(dls2, dls)
    # block metadata invariants
    nblocks = (docids.size + 63) // 64
    assert len(enc["block_last_ids"]) == nblocks
    assert enc["block_last_ids"][-1] == int(docids[-1])
    # random-access block decode agrees with full decode
    for b in range(nblocks):
        bi, bt, bd = decode_block(enc, b, block_size=64)
        lo, hi = b * 64, min((b + 1) * 64, docids.size)
        np.testing.assert_array_equal(bi, docids[lo:hi])
        np.testing.assert_array_equal(bt, tfs[lo:hi])
        np.testing.assert_array_equal(bd, dls[lo:hi])
        assert int(bt.max()) == enc["block_max_tf"][b]
        assert int(bd.min()) == enc["block_min_dl"][b]


def test_postings_reject_nonmonotonic():
    with pytest.raises(ValueError):
        encode_postings(
            np.array([3, 2], dtype=np.int64),
            np.array([1, 1], dtype=np.int64),
            np.array([5, 5], dtype=np.int64),
        )


def test_positions_roundtrip():
    # two docs: positions [0, 4, 9] and [2, 3]
    tfs = np.array([3, 2], dtype=np.int64)
    deltas = np.array([0, 4, 5, 2, 1], dtype=np.int64)  # per-doc deltas
    blob = encode_positions(deltas)
    out = decode_positions(blob, tfs)
    np.testing.assert_array_equal(out[0], [0, 4, 9])
    np.testing.assert_array_equal(out[1], [2, 3])
