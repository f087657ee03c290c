"""IR quality harness (reference contrib/benchmark quality,
QualityStats.java:28-85) — metrics checked against hand-computed values,
then driven end-to-end over the engine's own rankings."""

import math

import pytest

from lucene_spark.quality import evaluate, summarize


@pytest.fixture(scope="module")
def toy(spark):
    # q1: ranks 1,3 relevant of 3 relevant total; q2: rank 2 of 1
    results = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3), ("q1", 13, 4),
         ("q2", 20, 1), ("q2", 21, 2)],
        "qid string, docid long, rank int")
    judgements = spark.createDataFrame(
        [("q1", 10), ("q1", 12), ("q1", 99), ("q2", 21)],
        "qid string, docid long")
    return results, judgements


def test_metrics_hand_computed(toy):
    results, judgements = toy
    rows = {r["qid"]: r for r in evaluate(results, judgements, k=4).collect()}
    # q1: P@4 = 2/4; AP = (1/1 + 2/3)/3; NDCG: gains at ranks 1,3 of 3 ideal
    assert math.isclose(rows["q1"]["p_at_k"], 0.5)
    assert math.isclose(rows["q1"]["ap"], (1.0 + 2.0 / 3.0) / 3.0)
    dcg = 1.0 / math.log2(2) + 1.0 / math.log2(4)
    idcg = 1.0 / math.log2(2) + 1.0 / math.log2(3) + 1.0 / math.log2(4)
    assert math.isclose(rows["q1"]["ndcg"], dcg / idcg, rel_tol=1e-9)
    # q2: P@4 = 1/4 (only 2 retrieved), AP = (1/2)/1
    assert math.isclose(rows["q2"]["p_at_k"], 0.25)
    assert math.isclose(rows["q2"]["ap"], 0.5)
    s = summarize(evaluate(results, judgements, k=4)).collect()[0]
    assert s["n_queries"] == 2
    assert math.isclose(s["map"], ((1.0 + 2.0 / 3.0) / 3.0 + 0.5) / 2.0)


def test_quality_over_engine_rankings(spark, index_dir, oracle_index):
    """End-to-end: engine top-k for conjunctions, judged by 'contains all
    query terms' — every retrieved conjunction hit IS relevant, so P@k
    equals n_ret/k and AP/NDCG are 1-ish prefixes (sanity of plumbing)."""
    from pyspark.sql import Window, functions as F

    from lucene_spark.indexing import IndexReader
    from lucene_spark.queries.planner import Searcher

    searcher = Searcher(IndexReader(spark, index_dir))
    queries = {"c1": "seven AND forty", "c2": "one AND two AND three"}
    res = (searcher.search_many(queries, k=10)
           .withColumn("rank", F.row_number().over(
               Window.partitionBy("qid")
               .orderBy(F.desc("score"), F.asc("docid")))))
    # judgements from the oracle: docs containing ALL terms of the query
    from lucene_spark.oracle import _eval
    from lucene_spark.queries import parse_query

    rows = []
    for qid, qs in queries.items():
        for d in _eval(oracle_index, parse_query(qs)):
            rows.append((qid, int(d)))
    judgements = spark.createDataFrame(rows, "qid string, docid long")
    per_q = {r["qid"]: r for r in
             evaluate(res.select("qid", "docid", "rank"),
                      judgements, k=10).collect()}
    for qid in queries:
        r = per_q[qid]
        # every retrieved doc is relevant → precision@k = n_ret/k, AP is the
        # retrieved fraction of all relevant docs
        assert math.isclose(r["p_at_k"], r["n_ret"] / 10.0)
        assert math.isclose(r["ap"], min(r["n_ret"], r["n_rel"]) / r["n_rel"])
        assert r["ndcg"] > 0
