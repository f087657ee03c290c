"""Deletes: tombstone exclusion at query time (side-car .del semantics) and
physical expunge (merge-applied deletes), vs the oracle rebuilt without the
deleted docs."""

import math
import os

import pytest

from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.indexing.deletes import (
    delete_by_query,
    deleted_path,
    expunge_deletes,
)
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.planner import Searcher

K = 10


@pytest.fixture(scope="module")
def del_index(spark, pages_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("delidx"))
    build_index(spark, pages_dir, out, target_docs_per_seg=200)
    merge_index(spark, out)
    return out


def topk(s, qs, k=K):
    return [(int(r["docid"]), float(r["score"])) for r in s.search(qs, k=k).collect()]


def test_delete_then_expunge(spark, del_index, pages_dir):
    s = Searcher(IndexReader(spark, del_index))
    before = s.count("seven")
    assert before > 0

    # --- tombstone phase: docs matching 'bucketthree' disappear from results,
    # stats/df stay frozen (reference numDocs vs maxDoc semantics) -----------
    deleted_ids = {i for i in range(400) if i % 50 == 3}
    n_del = delete_by_query(spark, del_index, "bucketthree")
    assert n_del == len(deleted_ids)

    s = Searcher(IndexReader(spark, del_index))
    assert s.count("bucketthree") == 0
    hits = topk(s, "one", k=400)
    assert deleted_ids.isdisjoint({d for d, _ in hits})
    # matchall excludes tombstones too
    assert s.count("*:*") == 400 - len(deleted_ids)
    # idempotent: deleting again tombstones nothing new
    assert delete_by_query(spark, del_index, "bucketthree") == 0

    # scores of surviving docs are unchanged (stats frozen until expunge)
    import pyarrow.dataset as ds
    texts = ds.dataset(pages_dir).to_table(columns=["text"])["text"].to_pylist()
    oracle_full = build_oracle_index(list(enumerate(texts)))
    expect = [(d, sc) for d, sc in
              oracle_search(oracle_full, parse_query("one"), 1 << 30)
              if d not in deleted_ids][:K]
    got = topk(s, "one")
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, s1), (_, s2) in zip(got, expect):
        assert math.isclose(s1, s2, rel_tol=1e-9)

    # --- expunge phase: physical rewrite, stats refreshed -------------------
    report = expunge_deletes(spark, del_index)
    assert report["expunged"] == len(deleted_ids)
    assert not os.path.isdir(deleted_path(del_index))

    r2 = IndexReader(spark, del_index)
    assert r2.N == 400 - len(deleted_ids)
    s2 = Searcher(r2)
    assert s2.count("bucketthree") == 0
    assert s2.count("*:*") == 400 - len(deleted_ids)

    # post-expunge ranking == oracle built WITHOUT the deleted docs
    oracle_live = build_oracle_index(
        [(i, t) for i, t in enumerate(texts) if i not in deleted_ids])
    for qs in ("one", "seven AND forty", '"twenty one"', "s?xty"):
        got = topk(s2, qs)
        exp = oracle_search(oracle_live, parse_query(qs), K)
        assert [d for d, _ in got] == [d for d, _ in exp], qs
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, rel_tol=1e-9), qs


def test_maxscore_pruning_respects_tombstones(spark, tmp_path):
    """Regression (round-1 advice): MaxScore theta must be computed over LIVE
    postings. Pre-fix, a pending delete of the top doc of the highest-upper-
    bound clause left theta inflated, pruning the lower-bound clause whose
    only doc was the true live top-1. Corpus crafted so, with the deleted doc
    included, suffix_ub(mid) < theta(deleted top common doc) — the exact
    prune-the-winner trap."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_spark.queries.ast import Bool, Term

    texts = [
        ("common " * 30) + "zzzmarker",                    # 0: deleted
        "common f1 f2 f3 f4 f5 f6 f7 f8 f9",               # 1: weak common
        "mid mid mid",                                      # 2: true live top
        "mid g1 g2",
        "mid h1 h2",
    ]
    src = str(tmp_path / "pages")
    os.makedirs(src)
    pdf = pd.DataFrame({"url": [str(i) for i in range(len(texts))],
                        "text": texts,
                        "lang": ["en"] * len(texts)})
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(src, "part-0000.parquet"))
    idx = str(tmp_path / "idx")
    build_index(spark, src, idx, target_docs_per_seg=100)
    merge_index(spark, idx)

    assert delete_by_query(spark, idx, "zzzmarker") == 1
    s = Searcher(IndexReader(spark, idx))
    q = Bool(should=[Term("common"), Term("mid")])

    # oracle: frozen stats (tombstone phase), deleted doc filtered
    oracle = build_oracle_index(list(enumerate(texts)))
    expect = [(d, sc) for d, sc in oracle_search(oracle, q, 1 << 30) if d != 0]
    for k in (1, 2, 5):
        got = topk(s, q, k=k)
        assert [d for d, _ in got] == [d for d, _ in expect[:k]], k
        for (_, a), (_, b) in zip(got, expect):
            assert math.isclose(a, b, rel_tol=1e-9)
    assert got[0][0] == 2  # the low-ub clause's doc won — prune was unsound
