"""End-to-end Spark engine tests: build → validate → rank-identity vs the
single-node oracle on the reference query set (the TestBoolean2 "two engines,
one truth" pattern), resume, merge, determinism."""

import json
import math
import os
import shutil

import numpy as np
import pytest

from lucene_spark.indexing import IndexReader, validate_index
from lucene_spark.oracle import oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.planner import Searcher
from lucene_spark.queries.refset import REFERENCE_QUERIES

K = 10


@pytest.fixture(scope="session")
def searcher(spark, index_dir):
    return Searcher(IndexReader(spark, index_dir))


def spark_topk(searcher, qs, k=K):
    rows = searcher.search(qs, k=k).collect()
    return [(int(r["docid"]), float(r["score"])) for r in rows]


def assert_rank_identical(spark_hits, oracle_hits):
    assert [d for d, _ in spark_hits] == [d for d, _ in oracle_hits]
    for (d1, s1), (d2, s2) in zip(spark_hits, oracle_hits):
        assert math.isclose(s1, s2, rel_tol=1e-9), (d1, s1, s2)


def test_index_stats(spark, index_dir, oracle_index):
    rdr = IndexReader(spark, index_dir)
    assert rdr.N == 400
    assert math.isclose(rdr.avgdl, oracle_index.avgdl, rel_tol=1e-12)
    td = {r["term"]: int(r["df"]) for r in rdr.term_dict().collect()}
    odf = {t: len(p) for t, p in oracle_index.postings.items()}
    assert td == odf


def test_validate_index(spark, index_dir):
    report = validate_index(spark, index_dir)
    assert report["ok"], report["violations"]


@pytest.mark.parametrize("qs", REFERENCE_QUERIES)
def test_rank_identity_reference_set(searcher, oracle_index, qs):
    """BM25 top-10 rank-identity rate 1.0 vs oracle (BASELINE.md gate)."""
    q = parse_query(qs)
    assert_rank_identical(spark_topk(searcher, qs), oracle_search(oracle_index, q, K))


def test_random_boolean_trees(searcher, oracle_index):
    """Randomized boolean trees (reference TestBoolean2.java:214 randBoolQuery),
    seed logged for reproducibility (LuceneTestCase.java:234-251)."""
    import random

    from lucene_spark.queries.ast import Bool, Phrase, Term

    seed = 4242
    rng = random.Random(seed)
    vocab = ["one", "two", "seven", "forty", "hundred", "twenty",
             "seventeen", "ninety", "bucketthree", "missingterm"]

    def rand_query(depth=0):
        r = rng.random()
        if depth >= 2 or r < 0.45:
            return Term(rng.choice(vocab), boost=rng.choice([1.0, 1.0, 2.0, 0.5]))
        if r < 0.55:
            return Phrase([rng.choice(vocab), rng.choice(vocab)],
                          slop=rng.choice([0, 0, 1, 3]))
        b = Bool()
        for _ in range(rng.randint(1, 3)):
            dst = rng.choice([b.must, b.should, b.should, b.must_not])
            dst.append(rand_query(depth + 1))
        if not b.must and not b.should:
            b.should.append(Term(rng.choice(vocab)))
        return b

    for i in range(30):
        q = rand_query()
        s_hits = [(int(r["docid"]), float(r["score"]))
                  for r in searcher.search(q, k=K).collect()]
        o_hits = oracle_search(oracle_index, q, K)
        try:
            assert_rank_identical(s_hits, o_hits)
        except AssertionError as e:
            raise AssertionError(f"seed={seed} tree#{i} query={q}") from e


def test_count(searcher, oracle_index):
    from lucene_spark.oracle import _eval

    q = parse_query("seven")
    assert searcher.count(q) == len(_eval(oracle_index, q))


def test_match_all(searcher):
    hits = spark_topk(searcher, "*:*", k=5)
    assert [d for d, _ in hits] == [0, 1, 2, 3, 4]


def test_hydrate(searcher):
    rows = searcher.search("seven", k=3, hydrate=True).collect()
    assert all(r["url"].startswith("https://site") for r in rows)


def test_docid_stability_across_parallelism(spark, pages_dir, tmp_path_factory):
    """North rule: docIDs (hence ranks) stable across cluster sizes — the
    plan derives docids from file row positions, independent of partitioning."""
    from lucene_spark.indexing.plan import make_build_plan

    p1 = make_build_plan(pages_dir, target_docs_per_seg=100)
    p2 = make_build_plan(pages_dir, target_docs_per_seg=100)
    assert [vars(f) for f in p1.files] == [vars(f) for f in p2.files]


def test_resume_after_partial_build(spark, pages_dir, index_dir, tmp_path_factory):
    """Kill a segment (manifest + data), resume, get identical index
    (FIXTURES.md §5 resume property)."""
    from lucene_spark.indexing import build_index, merge_index

    out = str(tmp_path_factory.mktemp("index_resume"))
    build_index(spark, pages_dir, out, target_docs_per_seg=100)
    # simulate a crash that lost segment 2's postings after partial write
    os.remove(os.path.join(out, "manifests", "seg_000002.json"))
    shutil.rmtree(os.path.join(out, "postings", "seg=2"))
    summary = build_index(spark, pages_dir, out, target_docs_per_seg=100)
    assert summary["built"] == 1 and summary["skipped"] == 3
    merge_index(spark, out)
    report = validate_index(spark, out)
    assert report["ok"], report["violations"]
    # identical query results vs the cold index
    s_cold = Searcher(IndexReader(spark, index_dir))
    s_resumed = Searcher(IndexReader(spark, out))
    for qs in ("seven AND forty", '"twenty one"', "one two three"):
        assert spark_topk(s_cold, qs) == spark_topk(s_resumed, qs)


def test_manifests_lineage(index_dir):
    mdir = os.path.join(index_dir, "manifests")
    manifests = sorted(os.listdir(mdir))
    assert len(manifests) == 4
    with open(os.path.join(mdir, manifests[0])) as f:
        m = json.load(f)
    for key in ("seg", "status", "input_files", "docid_range", "docs", "terms",
                "postings", "postings_bytes", "wall_ms", "attempt"):
        assert key in m
    assert m["status"] == "committed"
    assert m["docs"] == 100


def test_merge_equals_cold_build(spark, pages_dir, tmp_path_factory):
    """merge(build(A), build(B)) ≡ build(A ∪ B) at the decoded-postings level
    (reference SegmentMerger correctness, FIXTURES.md §5)."""
    import pandas as pd

    from lucene_spark.codec import decode_postings
    from lucene_spark.indexing import build_index, compact_segments, merge_index

    two = str(tmp_path_factory.mktemp("index_two"))
    build_index(spark, pages_dir, two, target_docs_per_seg=200)  # 2 segs
    merge_index(spark, two)
    one = str(tmp_path_factory.mktemp("index_one"))
    build_index(spark, pages_dir, one, target_docs_per_seg=400)  # 1 seg
    merge_index(spark, one)

    compact_segments(spark, two, [0, 1])

    def decoded(path):
        pdf = spark.read.parquet(os.path.join(path, "postings")).toPandas()
        out = {}
        for _, r in pdf.iterrows():
            ids, tfs, dls = decode_postings(r)
            key = (r["term"], int(r["salt"]))
            out[key] = (ids.tolist(), tfs.tolist(), dls.tolist())
        return out

    d_two, d_one = decoded(two), decoded(one)
    assert d_two.keys() == d_one.keys()
    for key in d_one:
        assert d_two[key] == d_one[key], key


def test_phrase_on_positionless_index_matches_nothing(spark, tmp_path):
    """store_positions=False: a phrase/span query must return EMPTY, not
    crash (regression: decode_positions_flat_at indexed past the empty
    positions blob — IndexError inside the worker killed the whole job;
    decode_positions' graceful empty-slice behavior is now mirrored)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import write_pages_files

    from lucene_spark.indexing import build_index, merge_index

    src = str(tmp_path / "src")
    write_pages_files(src, 30, 1)
    out = str(tmp_path / "idx")
    build_index(spark, src, out, target_docs_per_seg=30,
                store_positions=False)
    merge_index(spark, out)
    s = Searcher(IndexReader(spark, out))
    assert s.count("seven") > 0          # term queries still serve
    # "twenty one" appears adjacently in the fixture text, so only the
    # ABSENCE of positions can make this empty (a one-term phrase after
    # stop-filtering would degenerate to a term query — avoid stopwords)
    assert s.search('"twenty one"', k=5).collect() == []
    from lucene_spark.queries.ast import SpanNear, SpanTerm

    q = SpanNear([SpanTerm("twenty"), SpanTerm("one")], slop=1, in_order=True)
    assert s.search(q, k=5).collect() == []
