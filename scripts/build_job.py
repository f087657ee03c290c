"""spark-submit entry for the distributed index build (north rule: the
pipeline runs via ``spark-submit --py-files`` on multi-executor clusters).

The engine package arrives on the executors via --py-files (see
scripts/spark_submit_build.sh); this driver script only parses arguments and
calls the library. On a real cluster the master/executor topology comes from
spark-submit flags; nothing in the build depends on it — docIDs and segment
layout are fixed by the path-sorted build plan (lucene_spark/indexing/plan.py),
so output is identical at any parallelism.

Usage:
  scripts/spark_submit_build.sh INPUT OUT_DIR [--docs-per-seg N]
      [--analyzer standard] [--no-positions] [--query 'foo AND bar']

INPUT is a parquet directory or an Iceberg table source
(``iceberg:catalog.db.pages`` with optional ``@snapshot-id=``/``@as-of=``
time-travel pin — see lucene_spark/sources/pages.py). Iceberg runs need the
runtime jar: add ``--packages org.apache.iceberg:iceberg-spark-runtime-...``
and catalog conf to the spark-submit flags.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input",
                    help="parquet dir or iceberg:catalog.db.table[@pin]")
    ap.add_argument("out")
    ap.add_argument("--docs-per-seg", type=int, default=50_000)
    ap.add_argument("--analyzer", default="standard")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--query", default=None,
                    help="optionally run one query after the build")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_spark.indexing.build import build_index
    from lucene_spark.indexing.merge import merge_index
    from lucene_spark.indexing.reader import IndexReader
    from lucene_spark.queries.planner import Searcher

    spark = SparkSession.builder.appName("lucene_spark_build").getOrCreate()
    summary = build_index(
        spark, args.input, args.out,
        target_docs_per_seg=args.docs_per_seg,
        analyzer=args.analyzer,
        store_positions=not args.no_positions,
        resume=not args.no_resume,
    )
    stats = merge_index(spark, args.out)
    print(json.dumps({"build": summary, "stats": stats}))

    if args.query:
        top = Searcher(IndexReader(spark, args.out)).search(
            args.query, k=args.k, hydrate=True)
        for row in top.collect():
            print(json.dumps({"docid": row["docid"], "score": row["score"],
                              "url": row["url"]}))
    spark.stop()


if __name__ == "__main__":
    main()
