"""IR quality harness (contrib/benchmark quality package analog).

The golden is _RefStats — a literal single-node port of
QualityStats.addResult/getAvp/getMRR/getPrecisionAt/average
(QualityStats.java:79-233) — run over randomized judged rankings; the
distributed quality_stats/quality_average must agree to 1e-9 on every
measure. quality_benchmark is gated end-to-end against oracle_search.
"""

from __future__ import annotations

import random

import pytest

from lucene_spark.quality import (MAX_POINTS, MRR_CUTOFF, quality_average,
                                  quality_benchmark, quality_stats)


class _RefStats:
    """Literal QualityStats port (QualityStats.java:79-122)."""

    def __init__(self, max_good: int):
        self.max_good = float(max_good)
        self.num_points = 0.0
        self.num_good = 0.0
        self.p_rel_sum = 0.0
        self.mrr = 0.0
        self.recall = 0.0
        self.p_at = [0.0] * (MAX_POINTS + 1)
        self._first_rel = None

    def add_result(self, n: int, is_relevant: bool):
        assert n == self.num_points + 1
        if is_relevant:
            self.num_good += 1
            if self._first_rel is None:
                self._first_rel = n
                if n <= MRR_CUTOFF:
                    self.mrr = 1.0 / n
        self.num_points = n
        p = self.num_good / self.num_points
        if is_relevant:
            self.p_rel_sum += p
        if n < len(self.p_at):
            self.p_at[n] = p
        self.recall = (p if self.max_good <= 0
                       else self.num_good / self.max_good)

    def precision_at(self, n: int) -> float:
        if n > self.num_points:
            return (self.num_points * self.p_at[int(self.num_points)]) / n
        return self.p_at[n]

    def avp(self) -> float:
        return 0.0 if self.max_good == 0 else self.p_rel_sum / self.max_good


def _random_case(rng, n_queries=6, k=12):
    """Random judged rankings: per query a ranked doc list + qrels set
    (some queries judged empty, some hits unjudged)."""
    results, qrels = [], []
    for qi in range(n_queries):
        qid = f"q{qi}"
        docs = rng.sample(range(100), k=rng.randint(1, k))
        for rank, d in enumerate(docs, 1):
            results.append((qid, f"d{d}", rank))
        if qi % 3 != 2:  # every third query has NO judgments (max_good 0)
            rel = set(rng.sample(range(100), k=rng.randint(1, 8)))
            qrels += [(qid, f"d{d}") for d in rel]
    return results, qrels


def _ref_stats(results, qrels):
    by_q = {}
    rel = {}
    for qid, d in qrels:
        rel.setdefault(qid, set()).add(d)
    for qid, d, rank in sorted(results, key=lambda r: (r[0], r[2])):
        st = by_q.setdefault(qid, _RefStats(len(rel.get(qid, ()))))
        st.add_result(rank, d in rel.get(qid, ()))
    return by_q


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_quality_stats_matches_reference_port(spark, seed):
    rng = random.Random(seed)
    results, qrels = _random_case(rng)
    res_df = spark.createDataFrame(results, "query_id string, doc string, rank int")
    jud_df = spark.createDataFrame(qrels, "query_id string, doc string")
    got = {r["query_id"]: r for r in
           quality_stats(res_df, jud_df).collect()}
    ref = _ref_stats(results, qrels)
    assert set(got) == set(ref)
    for qid, st in ref.items():
        g = got[qid]
        assert g["num_points"] == st.num_points
        assert g["num_good"] == st.num_good
        assert g["max_good"] == st.max_good
        assert g["recall"] == pytest.approx(st.recall, abs=1e-9)
        assert g["avp"] == pytest.approx(st.avp(), abs=1e-9)
        assert g["mrr"] == pytest.approx(st.mrr, abs=1e-9)
        for n in (1, 5, 10, 20):
            assert g[f"p_at_{n}"] == pytest.approx(
                st.precision_at(n), abs=1e-9), (qid, n)


def test_quality_average_reference_semantics(spark):
    """average() folds ONLY queries with positive judgements
    (QualityStats.java:204: m = queries with maxGoodPoints>0)."""
    rng = random.Random(7)
    results, qrels = _random_case(rng)
    res_df = spark.createDataFrame(results, "query_id string, doc string, rank int")
    jud_df = spark.createDataFrame(qrels, "query_id string, doc string")
    stats = quality_stats(res_df, jud_df)
    avg = quality_average(stats).collect()[0]
    ref = _ref_stats(results, qrels)
    good = [st for st in ref.values() if st.max_good > 0]
    m = len(good)
    assert avg["n_good_queries"] == m
    assert avg["recall"] == pytest.approx(sum(s.recall for s in good) / m)
    assert avg["avp"] == pytest.approx(sum(s.avp() for s in good) / m)
    assert avg["mrr"] == pytest.approx(sum(s.mrr for s in good) / m)
    assert avg["p_at_10"] == pytest.approx(
        sum(s.precision_at(10) for s in good) / m)


def test_quality_stats_rejects_bad_cutoff(spark):
    res = spark.createDataFrame([("q", "d", 1)],
                                "query_id string, doc string, rank int")
    with pytest.raises(ValueError, match="outside"):
        quality_stats(res, res.select("query_id", "doc"), p_at=(21,))


def test_quality_benchmark_end_to_end(spark, tmp_path):
    """QualityBenchmark.execute analog over a real index: qrels derived
    from the corpus (docs containing the query term >=2 times), rankings
    from the batched kernel; P@k / recall / MRR / AvP agree with the
    oracle's ranking of the same corpus."""
    import datetime as dt

    from lucene_spark.indexing.build import build_index
    from lucene_spark.indexing.merge import merge_index
    from lucene_spark.indexing.reader import IndexReader
    from lucene_spark.oracle import build_oracle_index, oracle_search
    from lucene_spark.queries.parser import parse_query
    from lucene_spark.queries.planner import Searcher
    from pyspark.sql import types as T

    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(4, 16)))
             for _ in range(40)]
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType())])
    ts = dt.datetime(2020, 1, 1)
    corpus = str(tmp_path / "pages")
    spark.createDataFrame(
        [(str(i), ts, None, t, "en") for i, t in enumerate(texts)],
        schema).coalesce(1).write.mode("overwrite").parquet(corpus)
    idx = str(tmp_path / "idx")
    build_index(spark, corpus, idx, analyzer="whitespace",
                target_docs_per_seg=15)
    merge_index(spark, idx)
    searcher = Searcher(IndexReader(spark, idx))

    queries = {t: t for t in ("alpha", "beta", "gamma AND delta")}
    # binary qrels: docs where the first query word appears >= 2 times
    qrels = [(qid, str(i)) for qid in queries
             for i, t in enumerate(texts)
             if t.split().count(qid.split()[0]) >= 2]
    jud_df = spark.createDataFrame(qrels, "query_id string, doc string")
    stats = {r["query_id"]: r for r in quality_benchmark(
        searcher, queries, jud_df, k=10).collect()}

    # golden: oracle ranking + the literal QualityStats port
    oracle = build_oracle_index(
        [(i, t) for i, t in enumerate(texts)], analyzer="whitespace")
    rel = {}
    for qid, d in qrels:
        rel.setdefault(qid, set()).add(d)
    for qid, qs in queries.items():
        hits = oracle_search(oracle, parse_query(qs, analyzer="whitespace"),
                             k=10)
        st = _RefStats(len(rel.get(qid, ())))
        for rank, (docid, _s) in enumerate(hits, 1):
            st.add_result(rank, str(docid) in rel.get(qid, ()))
        g = stats[qid]
        assert g["num_points"] == st.num_points, qid
        assert g["num_good"] == st.num_good, qid
        assert g["recall"] == pytest.approx(st.recall), qid
        assert g["avp"] == pytest.approx(st.avp()), qid
        assert g["mrr"] == pytest.approx(st.mrr), qid
        assert g["p_at_5"] == pytest.approx(st.precision_at(5)), qid
