"""Incremental append + Structured Streaming ingest: appended segments are
rank-identical to a cold build / oracle over the full corpus (the
NRT-refresh analog, SURVEY.md §2.6)."""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

from lucene_spark.fixtures import page_row, pages_pdf
from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.planner import Searcher
from lucene_spark.streaming import append_to_index, stream_from_directory

from conftest import write_pages_files

K = 10


def _write_wave(path: str, start: int, n: int, name: str) -> None:
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(pages_pdf(n, start=start), preserve_index=False),
        os.path.join(path, name),
        coerce_timestamps="us", allow_truncated_timestamps=True)


def oracle_for(n: int):
    return build_oracle_index(list(enumerate(pages_pdf(n)["text"].tolist())))


def assert_matches_oracle_by_docid(spark, index_dir, n_docs, queries):
    """Exact docid comparison (valid when docids == fixture index)."""
    r = IndexReader(spark, index_dir)
    assert r.N == n_docs
    s = Searcher(r)
    oracle = oracle_for(n_docs)
    for qs in queries:
        got = [(int(x["docid"]), float(x["score"]))
               for x in s.search(qs, k=K).collect()]
        exp = oracle_search(oracle, parse_query(qs), K)
        assert [d for d, _ in got] == [d for d, _ in exp], qs
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, rel_tol=1e-9), qs


def assert_matches_oracle_by_url(spark, index_dir, n_docs, queries):
    """URL-keyed comparison — docid ASSIGNMENT may differ when micro-batch
    staging reorders files, but scores are docid-independent."""
    r = IndexReader(spark, index_dir)
    assert r.N == n_docs
    s = Searcher(r)
    oracle = oracle_for(n_docs)
    for qs in queries:
        got = sorted(
            ((x["url"], float(x["score"]))
             for x in s.search(qs, k=K, hydrate=True).collect()),
            key=lambda t: (-t[1], t[0]))
        exp = sorted(
            ((page_row(d)["url"], sc)
             for d, sc in oracle_search(oracle, parse_query(qs), K)),
            key=lambda t: (-t[1], t[0]))
        assert [u for u, _ in got] == [u for u, _ in exp], qs
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, rel_tol=1e-9), qs


def test_append_to_index(spark, tmp_path):
    src_a = str(tmp_path / "wave_a")
    src_b = str(tmp_path / "wave_b")
    write_pages_files(src_a, 200, 2)
    _write_wave(src_b, 200, 100, "part-0000.parquet")

    idx = str(tmp_path / "idx")
    build_index(spark, src_a, idx, target_docs_per_seg=100)
    merge_index(spark, idx)
    queries = ("one", "seven AND forty", '"twenty one"', "bucketthree")
    assert_matches_oracle_by_docid(spark, idx, 200, queries)

    new_segs = append_to_index(spark, src_b, idx, target_docs_per_seg=100)
    assert new_segs, "expected new segments"
    assert_matches_oracle_by_docid(spark, idx, 300, queries)

    # idempotent: same files again → no new segments
    assert append_to_index(spark, src_b, idx, target_docs_per_seg=100) == []


def test_streaming_ingest(spark, tmp_path):
    source = str(tmp_path / "source")
    idx = str(tmp_path / "sidx")
    _write_wave(source, 0, 75, "part-0000.parquet")
    _write_wave(source, 75, 75, "part-0001.parquet")

    q = stream_from_directory(spark, source, idx, target_docs_per_seg=100,
                              available_now=True)
    q.awaitTermination(180)
    queries = ("one", "seven AND forty", "bucketthree")
    assert_matches_oracle_by_url(spark, idx, 150, queries)

    # second wave arrives; re-run the availableNow drain (NRT refresh)
    _write_wave(source, 150, 50, "part-0002.parquet")
    q2 = stream_from_directory(spark, source, idx, target_docs_per_seg=100,
                               available_now=True)
    q2.awaitTermination(180)
    assert_matches_oracle_by_url(spark, idx, 200, queries)
