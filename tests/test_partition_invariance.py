"""Segmentation/parallelism invariance: the same corpus built with very
different segment layouts (and hence different shuffle partitioning, task
counts, postings bucket counts, and encode-group boundaries) must produce
the SAME corpus stats and rank-identical scored results. This is the
distributed-engine contract that lets a 1000-executor build and a
32-thread build answer queries identically — the reference's analog is
that any LogMergePolicy state of the same documents scores identically
(merge policy never changes scores, index/LogMergePolicy.java:41)."""

import math

from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.oracle import oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.planner import Searcher

QUERIES = ["seven", "seven AND forty", '"nineteen ninety"',
           "seve*", "hundred -thousand", "one two three"]
K = 10


def _build(spark, pages_dir, out, per_seg):
    build_index(spark, pages_dir, out, target_docs_per_seg=per_seg)
    merge_index(spark, out)
    return IndexReader(spark, out)


def test_segment_layout_invariance(spark, pages_dir, oracle_index,
                                   tmp_path_factory):
    coarse = _build(spark, pages_dir,
                    str(tmp_path_factory.mktemp("inv_coarse")), 400)
    fine = _build(spark, pages_dir,
                  str(tmp_path_factory.mktemp("inv_fine")), 25)
    # genuinely different layouts
    assert coarse.stats["n_segments"] < fine.stats["n_segments"]
    # identical corpus statistics (exact integers, fp avgdl to 1e-12)
    assert coarse.N == fine.N
    assert coarse.stats["total_tokens"] == fine.stats["total_tokens"]
    assert coarse.stats["n_terms"] == fine.stats["n_terms"]
    assert math.isclose(coarse.avgdl, fine.avgdl, rel_tol=1e-12)

    sc, sf = Searcher(coarse), Searcher(fine)
    oracle = oracle_index
    for qs in QUERIES:
        a = [(int(r["docid"]), float(r["score"]))
             for r in sc.search(qs, k=K).collect()]
        b = [(int(r["docid"]), float(r["score"]))
             for r in sf.search(qs, k=K).collect()]
        assert [d for d, _ in a] == [d for d, _ in b], qs
        for (_, x), (_, y) in zip(a, b):
            assert math.isclose(x, y, rel_tol=1e-12), qs
        # and both equal the single-node oracle
        exp = oracle_search(oracle, parse_query(qs), K)
        assert [d for d, _ in a] == [d for d, _ in exp], qs
        for (_, x), (_, y) in zip(a, exp):
            assert math.isclose(x, y, rel_tol=1e-9), qs
