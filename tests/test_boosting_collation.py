"""BoostingQuery (contrib/queries/.../BoostingQuery.java) rank identity,
and collated field sort (the LUCENE-2335 Exposed fork use case)."""

import math

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.oracle import oracle_search
from lucene_spark.queries.ast import Bool, Boosting, Phrase, Term
from lucene_spark.queries.planner import Searcher

K = 10


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return Searcher(IndexReader(spark, index_dir))


def topk(searcher, q):
    return [(int(r["docid"]), float(r["score"]))
            for r in searcher.search(q, k=K).collect()]


def assert_rank_identical(spark_hits, oracle_hits):
    assert [d for d, _ in spark_hits] == [d for d, _ in oracle_hits]
    for (d1, s1), (_d2, s2) in zip(spark_hits, oracle_hits):
        assert math.isclose(s1, s2, rel_tol=1e-9), (d1, s1, s2)


@pytest.mark.parametrize("q", [
    Boosting(Term("one"), Term("hundred"), demote=0.2),
    Boosting(Term("seven"), Phrase(["one", "hundred"]), demote=0.5),
    Boosting(Bool(should=[Term("one"), Term("two")]), Term("fifty"),
             demote=0.1, boost=2.0),
], ids=["term-ctx", "phrase-ctx", "bool-match"])
def test_boosting_rank_identity(searcher, oracle_index, q):
    assert_rank_identical(topk(searcher, q), oracle_search(oracle_index, q, K))


def test_boosting_actually_demotes(searcher, oracle_index):
    plain = dict(oracle_search(oracle_index, Term("one"), 1 << 32))
    boosted = dict(oracle_search(
        oracle_index, Boosting(Term("one"), Term("hundred"), demote=0.25),
        1 << 32))
    ctx = {d for d, _ in oracle_search(oracle_index, Term("hundred"), 1 << 32)}
    demoted = [d for d in boosted if d in ctx]
    assert demoted
    for d in demoted:
        assert math.isclose(boosted[d], plain[d] * 0.25, rel_tol=1e-12)


def test_collated_sort(spark, tmp_path_factory):
    """UNICODE_CI collation: case-insensitive url ordering — the Exposed
    fork's collator sort as a Spark collation on the sort key."""
    src = tmp_path_factory.mktemp("collsrc")
    urls = ["Delta", "alpha", "Charlie", "bravo", "ALPHA2"]
    pdf = pd.DataFrame({"url": urls,
                        "text": ["common word"] * len(urls),
                        "lang": ["en"] * len(urls)})
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(src / "p.parquet"))
    out = str(tmp_path_factory.mktemp("collidx"))
    build_index(spark, str(src), out, analyzer="whitespace",
                target_docs_per_seg=10)
    merge_index(spark, out)
    s = Searcher(IndexReader(spark, out))
    rows = s.search_sorted("common", by="url", k=10,
                           collation="UNICODE_CI").collect()
    got = [r["url"] for r in rows]
    # case-insensitive order; binary order would put all capitals first
    assert got == sorted(urls, key=lambda u: u.casefold())
    binary = [r["url"] for r in
              s.search_sorted("common", by="url", k=10).collect()]
    assert binary == sorted(urls)
    assert got != binary
