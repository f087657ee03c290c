"""IVF k-means determinism + retrieval quality (recall@10 vs the exact
brute-force baseline) on the driver testdata fixtures."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_spark.ann import kmeans_assign, kmeans_train

SF_DIR = "/root/testdata/sf0.001"


def _vectors():
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"])
    x = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], x[order]


def test_kmeans_deterministic_and_rounded():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(200, 16))
    c1 = kmeans_train(x, 4)
    c2 = kmeans_train(x.copy(), 4)
    assert np.array_equal(c1, c2)
    # centroid components honour the 6-decimal contract
    assert np.array_equal(c1, np.round(c1, 6))


def test_kmeans_empty_cell_raises():
    x = np.vstack([np.eye(3)] * 2)  # 6 points, 3 distinct dirs
    with pytest.raises(ValueError, match="emptied"):
        kmeans_train(x, 5)  # duplicated init rows starve later cells


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_ivf_recall_at_10():
    """VERDICT round-1 gate: recall@10 of the IVF probe path vs brute-force
    cosine ≥ 0.9 on the fixture (query = vec_id 1, nprobe 2 of 8 cells)."""
    ids, x = _vectors()
    cent = kmeans_train(x, 8)
    assign = kmeans_assign(x, cent)
    q = x[ids == 1][0]

    def cos_to_q(m):
        return (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))

    mask = ids != 1
    brute = ids[mask][np.argsort(-cos_to_q(x[mask]))[:10]]
    probe_cells = np.argsort(-np.round(
        (cent @ q) / (np.linalg.norm(cent, axis=1) * np.linalg.norm(q)),
        10))[:2]
    cmask = mask & np.isin(assign, probe_cells)
    ivf = ids[cmask][np.argsort(-cos_to_q(x[cmask]))[:10]]
    recall = len(set(brute) & set(ivf)) / 10.0
    assert recall >= 0.9, f"recall@10 {recall}"


def test_bucket_py_matches_engine(spark):
    """_bucket_py (driver-side LSH signature fold used for the query's own
    bucket) must equal the engine's _bucket_col for every fixture vector —
    the invariant that keeps multi-probe search honest."""
    import __spark_entry__ as entrymod

    got = {int(r["vec_id"]): int(r["bucket"])
           for r in entrymod.extra_queries()["ann_lsh_buckets"](
               spark, SF_DIR).collect()}
    ids, x = _vectors()
    for vid, vec in list(zip(ids, x))[:50]:
        assert got[int(vid)] == entrymod._bucket_py(vec), int(vid)


def test_hostile_embeddings_survive(spark, tmp_path):
    """Crawled embedding tables carry null / empty / odd-dimension /
    all-zero vectors; every embedding op must keep running — one ragged
    row must not kill IVF training (np.array raise) or a zero norm fail
    the stage under ANSI division. Malformed vectors are EXCLUDED from
    cells/top-k (null cosine sinks below any real score); well-formed
    vectors still rank."""
    import shutil

    import pyarrow as pa

    import __spark_entry__ as entrymod

    tmp = str(tmp_path / "hostile")
    os.makedirs(tmp)
    shutil.copy(os.path.join(SF_DIR, "documents.parquet"),
                os.path.join(tmp, "documents.parquet"))
    rng = np.random.RandomState(7)
    rows = []
    for i in range(40):
        if i % 11 == 3:
            v = None
        elif i % 11 == 7:
            v = []
        elif i % 11 == 9:
            v = rng.randn(5).astype("float32").tolist()   # wrong dim
        elif i == 21:
            v = [0.0] * 16                                # zero norm
        else:
            v = rng.randn(16).astype("float32").tolist()
        rows.append({"vec_id": i, "embedding": v, "label": i % 3})
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa.schema(
            [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
             ("label", pa.int32())])),
        os.path.join(tmp, "embeddings.parquet"))

    fns = dict(entrymod.queries())
    fns.update(entrymod.extra_queries())
    for name in ("ann_cosine_topk", "ann_knn_join", "ann_lsh_search",
                 "ann_ivf_search", "dedup_embedding_cosine"):
        df = fns[name](spark, tmp)
        assert df.count() >= 0  # materializes without a stage failure
    # malformed + zero-norm vectors never rank in brute top-k
    bad = {3, 14, 25, 36, 7, 18, 29, 9, 20, 31, 21}  # %11∈{3,7,9} ∪ {21}
    top = {int(r["vec_id"]) for r in
           fns["ann_cosine_topk"](spark, tmp).collect()}
    assert not (top & bad), top & bad
    # clear the memoized hostile-quantizer state for other tests
    entrymod._IVF_CENT_CACHE.pop(
        (spark.sparkContext.applicationId, tmp), None)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_pq_adc_recall_at_10():
    """PQ/ADC shortlist + exact re-rank (ann_pq_search's shape): recall@10
    vs brute-force squared L2 ≥ 0.8 on the fixture (query = vec_id 2,
    m=8 subspaces × k=32 codes, shortlist 100). The synthetic embeddings
    are near-uniform — PQ's worst case (no cluster structure to exploit) —
    which is exactly why the op re-ranks a shortlist instead of trusting
    raw ADC order (raw-ADC recall here is ~0.4)."""
    from lucene_spark.ann import pq_adc_table, pq_train

    ids, x = _vectors()
    q = x[ids == 2][0]
    mask = ids != 2
    xd, idd = x[mask], ids[mask]
    exact = idd[np.lexsort((idd, ((xd - q) ** 2).sum(1)))][:10]

    books = pq_train(x[ids < 65536], 8, 32)
    w = x.shape[1] // 8
    codes = np.stack([
        np.argmin(np.round(
            ((xd[:, None, j * w:(j + 1) * w] - books[j][None, :, :]) ** 2
             ).sum(-1), 10), axis=1)
        for j in range(8)], axis=1)
    lut = pq_adc_table(q, books)
    adist = sum(lut[j][codes[:, j]] for j in range(8))
    short = np.lexsort((idd, adist))[:100]
    rr = short[np.lexsort((idd[short], ((xd[short] - q) ** 2).sum(1)))][:10]
    recall = len(set(idd[rr]) & set(exact)) / 10.0
    assert recall >= 0.8, f"PQ recall@10 {recall}"


def test_pq_train_determinism_and_shapes():
    """pq_train: per-subspace codebooks under the shared rounding contract
    — deterministic across runs, correct shapes, loud on non-divisible
    dims and emptied codes."""
    from lucene_spark.ann import kmeans_train_l2, pq_train

    rng = np.random.RandomState(7)
    x = rng.rand(120, 24)
    b1, b2 = pq_train(x, 4, 8), pq_train(x, 4, 8)
    assert len(b1) == 4 and all(b.shape == (8, 6) for b in b1)
    for a, b in zip(b1, b2):
        assert np.array_equal(a, b)
    # subspace j trains on exactly its own columns
    assert np.array_equal(b1[2], kmeans_train_l2(x[:, 12:18], 8))
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(x, 5, 8)
