"""Query-side scale probe: the reference query set + the dedup pipeline at
~500k docs (10× the sf0.1 bench), recording latency growth vs the sf0.1
numbers — evidence that top-k latency stays ~flat (bounded heaps + pruned
scans) while dedup grows ~linearly (corpus-sized shuffles), i.e. the plans
scale the way PLANS.md claims.

Writes one JSON line; BENCH.md §5 records the narrative table.

Usage: python scripts/size_probe.py [n_docs] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("BENCH_WORK", "/tmp/lucene_spark_bench")


def _docs_table(spark, n_docs: int, path: str) -> None:
    """documents-shaped table (doc_id, text, lang, source, n_chars) from the
    deterministic fixture pages — same schema as testdata/sf*/documents."""
    from pyspark.sql import functions as F

    from lucene_spark.fixtures import pages_df

    # doc_id parsed from the fixture url (".../<i>") — contiguous, unique,
    # partition-layout independent (the probe measures latency, not hashes)
    (pages_df(spark, n_docs, partitions=128)
     .select(F.regexp_extract("url", r"(\d+)$", 1).cast("long")
             .alias("doc_id"),
             "text", F.lit("en").alias("lang"),
             F.lit("fixture").alias("source"),
             F.length("text").cast("long").alias("n_chars"))
     .write.mode("overwrite").parquet(path))


def main() -> None:
    from lucene_spark.fixtures import write_pages
    from lucene_spark.indexing.build import build_index
    from lucene_spark.indexing.merge import merge_index
    from lucene_spark.indexing.reader import IndexReader
    from lucene_spark.queries.planner import Searcher
    from lucene_spark.queries.refset import REFERENCE_QUERIES
    from lucene_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("size-probe", cores=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))

    corpus = os.path.join(WORK, f"pages_{n_docs}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        write_pages(spark, n_docs, corpus, partitions=128)
    idx_dir = os.path.join(WORK, f"probe_idx_{n_docs}")
    if not os.path.exists(os.path.join(idx_dir, "stats.json")):
        t0 = time.time()
        build_index(spark, corpus, idx_dir, analyzer="standard",
                    store_positions=True,
                    target_docs_per_seg=max(2000, n_docs // 64))
        merge_index(spark, idx_dir)
        print(f"# built {n_docs} docs in {time.time()-t0:.1f}s",
              file=sys.stderr)

    searcher = Searcher(IndexReader(spark, idx_dir))
    for q in REFERENCE_QUERIES:
        searcher.search(q, k=10).collect()  # warm
    per_q: dict[str, float] = {q: float("inf") for q in REFERENCE_QUERIES}
    for _ in range(rounds):
        for q in REFERENCE_QUERIES:
            t0 = time.time()
            searcher.search(q, k=10).collect()
            per_q[q] = min(per_q[q], time.time() - t0)
    qvals = sorted(per_q.values())
    query_set = sum(qvals)

    # dedup/text pipeline over a documents-shaped table of the same corpus
    docs_dir = os.path.join(WORK, f"probe_docs_{n_docs}")
    if not os.path.exists(os.path.join(docs_dir, "documents.parquet",
                                       "_SUCCESS")):
        _docs_table(spark, n_docs,
                    os.path.join(docs_dir, "documents.parquet"))
    import __spark_entry__ as entry

    pipeline = {}
    fns = dict(entry.queries())
    fns.update(entry.extra_queries())
    for name in ("dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
                 "dedup_simhash", "text_quality", "text_token_count",
                 "text_dup_ngram_coverage"):
        fn = fns[name]
        best = float("inf")
        for _ in range(max(2, rounds - 1)):
            t0 = time.time()
            fn(spark, docs_dir).count()  # count, not collect: corpus-sized
            best = min(best, time.time() - t0)
        pipeline[name] = round(best, 2)

    print(json.dumps({
        "metric": "query_and_pipeline_latency_at_size",
        "n_docs": n_docs,
        "query_set_sec": round(query_set, 2),
        "query_p50_sec": round(qvals[len(qvals) // 2], 3),
        "query_max_sec": round(max(qvals), 3),
        "pipeline": pipeline,
        "rounds": rounds,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
