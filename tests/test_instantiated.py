"""InstantiatedSearcher — driver-local serving for sub-RAM indexes
(contrib/instantiated InstantiatedIndex.java analog, VERDICT r4 missing
#5). Gates: hash-identical results vs the distributed Searcher across
query shapes, ZERO Spark jobs on the local path, p50 latency well under
the distributed job floor, and an explicit refusal at the size-guard
boundary."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_spark.fixtures import pages_pdf
from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.queries.instantiated import (IndexTooLargeError,
                                               InstantiatedSearcher)
from lucene_spark.queries.planner import Searcher


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("inst")
    pages = str(root / "pages")
    os.makedirs(pages)
    pdf = pages_pdf(300)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(pages, "part-0000.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    d = str(root / "idx")
    build_index(spark, pages, d, analyzer="whitespace",
                target_docs_per_seg=80, store_positions=True,
                keyword_fields=("lang",))
    merge_index(spark, d)
    return d


QUERIES = [
    "seven",
    "seven AND forty",
    "three OR hundred",
    '"one hundred"',
    '"one hundred"~2',
    "seven -forty",
    "hundr*",
    "sevn~",
    "lang:en AND seven",
]


def _n_jobs(spark):
    return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()


def test_identical_to_distributed(spark, idx):
    reader = IndexReader(spark, idx)
    dist = Searcher(reader)
    inst = InstantiatedSearcher(reader)
    for qs in QUERIES:
        want = [(int(r["docid"]), float(r["score"]))
                for r in dist.search(qs, k=10).collect()]
        got = inst.search_local(qs, k=10)
        assert got == want, qs  # exact floats — same kernel, same ops


def test_local_path_runs_zero_spark_jobs(spark, idx):
    reader = IndexReader(spark, idx)
    inst = InstantiatedSearcher(reader)
    inst.search_local("seven AND forty", k=10)  # warm parse caches
    before = _n_jobs(spark)
    for qs in QUERIES:
        inst.search_local(qs, k=10)
    assert _n_jobs(spark) == before


def test_latency_under_job_floor(spark, idx):
    reader = IndexReader(spark, idx)
    inst = InstantiatedSearcher(reader)
    inst.search_local("seven", k=10)
    laps = []
    for qs in QUERIES:
        t0 = time.time()
        inst.search_local(qs, k=10)
        laps.append(time.time() - t0)
    laps.sort()
    assert laps[len(laps) // 2] <= 0.1, laps  # p50 ≤ 100 ms


def test_search_wraps_dataframe_and_hydrates(spark, idx):
    reader = IndexReader(spark, idx)
    inst = InstantiatedSearcher(reader)
    rows = inst.search("seven", k=5).collect()
    assert len(rows) == 5 and rows[0]["score"] >= rows[-1]["score"]
    h = inst.search("seven", k=3, hydrate=True).collect()
    assert {r["url"] for r in h} and all(r["lang"] for r in h)
    # hydrated rows agree with the distributed hydrate
    want = {(r["docid"], r["url"], r["lang"]) for r in
            Searcher(reader).search("seven", k=3, hydrate=True).collect()}
    assert {(r["docid"], r["url"], r["lang"]) for r in h} == want


def test_exotic_shapes_delegate(spark, idx):
    """MatchAll is served by the distributed plan — transparently."""
    from lucene_spark.queries.ast import MatchAll

    reader = IndexReader(spark, idx)
    inst = InstantiatedSearcher(reader)
    got = [int(r["docid"]) for r in inst.search(MatchAll(), k=5).collect()]
    want = [int(r["docid"]) for r in
            Searcher(reader).search(MatchAll(), k=5).collect()]
    assert got == want


def test_size_guard_refuses(spark, idx):
    reader = IndexReader(spark, idx)
    with pytest.raises(IndexTooLargeError):
        InstantiatedSearcher(reader, max_bytes=1)


def test_deletes_respected(spark, idx, tmp_path):
    import shutil

    from lucene_spark.indexing.deletes import delete_by_docids

    d2 = str(tmp_path / "idx_del")
    shutil.copytree(idx, d2)
    reader = IndexReader(spark, d2)
    victim = InstantiatedSearcher(reader).search_local("seven", 1)[0][0]
    dm = (spark.read.parquet(os.path.join(d2, "docmap"))
          .where(f"docid = {victim}").select("seg", "docid"))
    delete_by_docids(spark, d2, dm)
    reader2 = IndexReader(spark, d2)
    got = InstantiatedSearcher(reader2).search_local("seven", 200)
    want = [(int(r["docid"]), float(r["score"])) for r in
            Searcher(reader2).search("seven", k=200).collect()]
    assert got == want and victim not in [d for d, _ in got]
