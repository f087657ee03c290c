"""Batched multi-query search (`Searcher.search_many`) must be
result-identical to per-query `search` — one Spark job for the whole batch,
same per-segment kernels underneath."""

import pytest

from lucene_spark.indexing import IndexReader
from lucene_spark.queries.ast import MatchAll, MultiPhrase, SpanNear, SpanTerm
from lucene_spark.queries.planner import Searcher

K = 10

BATCH = {
    "term": "one",
    "tail": "seventyseven",
    "conj": "one AND seven",
    "disj": "three four five",
    "neg": "one -hundred",
    "phrase": '"one hundred"',
    "sloppy": '"one fifty"~2',
    "prefix": "sev*",
    "boost": "one^2 seven^0.5",
    "span": SpanNear([SpanTerm("one"), SpanTerm("hundred")], 1, True),
    "mp": MultiPhrase([["one", "two"], ["hundred"]]),
    "all": MatchAll(),
    "missing": "zzzznotaterm",
}


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return Searcher(IndexReader(spark, index_dir))


def test_batch_equals_individual(searcher):
    batched = searcher.search_many(BATCH, k=K).collect()
    by_qid: dict[str, list] = {}
    for r in batched:
        by_qid.setdefault(r["qid"], []).append(
            (int(r["docid"]), float(r["score"])))
    for qid, q in BATCH.items():
        solo = [(int(r["docid"]), float(r["score"]))
                for r in searcher.search(q, k=K).collect()]
        assert by_qid.get(qid, []) == solo, qid


def test_batch_shares_one_job(searcher):
    """The batch must not launch one kernel job per query: all non-MatchAll
    results come from a single applyInPandas plan (smoke: result DataFrame
    explain contains exactly one FlatMapGroupsInPandas)."""
    df = searcher.search_many({k: v for k, v in BATCH.items() if k != "all"},
                              k=K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1
