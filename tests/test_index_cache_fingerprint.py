"""The contract index cache validates a source fingerprint at every open
(VERDICT r4 'what's wrong' #3): if the documents table is rewritten in
place, the cached index must rebuild — not silently serve stale postings.
Twin of the dedup-artifact fingerprint gate (test_dedup_artifacts)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod


@pytest.fixture()
def private_sf(tmp_path, monkeypatch):
    """A writable copy of the sf0.001 documents table + a private index
    cache, so rewriting the corpus is observable and side-effect free."""
    src = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(src):
        pytest.skip("driver testdata not present")
    sf = tmp_path / "sf"
    os.makedirs(sf)
    if os.path.isdir(src):
        shutil.copytree(src, sf / "documents.parquet")
    else:
        shutil.copy(src, sf / "documents.parquet")
    monkeypatch.setattr(entrymod, "_IDX_CACHE", str(tmp_path / "idx_cache"))
    return str(sf)


def _mtime(entrymod, sf_dir):
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.getmtime(
        os.path.join(entrymod._IDX_CACHE, tag, "stats.json"))


def test_rewrite_triggers_rebuild(spark, private_sf):
    r1 = entrymod._index(spark, private_sf)
    n1 = r1.N
    t1 = _mtime(entrymod, private_sf)
    # a second open with the corpus untouched reuses the cache
    entrymod._index(spark, private_sf)
    assert _mtime(entrymod, private_sf) == t1
    # rewrite the corpus IN PLACE: drop half the docs
    d = os.path.join(private_sf, "documents.parquet")
    tbl = (pq.read_table(d) if not os.path.isdir(d) else
           pq.ParquetDataset(d).read())
    half = tbl.slice(0, tbl.num_rows // 2)
    if os.path.isdir(d):
        shutil.rmtree(d)
        os.makedirs(d)
        pq.write_table(half, os.path.join(d, "part-0000.parquet"))
    else:
        pq.write_table(half, d)
    # the next open detects the fingerprint mismatch and rebuilds
    r2 = entrymod._index(spark, private_sf)
    assert r2.N == half.num_rows != n1
    assert _mtime(entrymod, private_sf) != t1


def test_missing_fingerprint_rebuilds(spark, private_sf):
    entrymod._index(spark, private_sf)
    tag = private_sf.strip("/").replace("/", "_")
    fp = os.path.join(entrymod._IDX_CACHE, tag, "src_fingerprint.json")
    os.remove(fp)  # pre-gate cache layout: treated as stale
    t_before = _mtime(entrymod, private_sf)
    entrymod._index(spark, private_sf)
    assert os.path.exists(fp)
    assert _mtime(entrymod, private_sf) != t_before
