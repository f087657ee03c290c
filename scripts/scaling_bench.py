"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion, sandbox-proxied as two parallelism levels on the same input:
the same index-build job at local[N] and local[4N] cores.

Writes one JSON line; BENCH.md records the narrative numbers.

Usage: python scripts/scaling_bench.py [n_docs] [n_small] [n_large]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("BENCH_WORK", "/tmp/lucene_spark_bench")


def timed_build(cores: int, corpus: str, n_docs: int) -> float:
    from lucene_spark.indexing.build import build_index
    from lucene_spark.indexing.merge import merge_index
    from lucene_spark.session import get_spark

    spark = get_spark(f"scale-{cores}", cores=cores)
    out = os.path.join(WORK, f"scale_idx_{n_docs}_c{cores}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    build_index(spark, corpus, out, target_docs_per_seg=max(2000, n_docs // 64),
                analyzer="standard", store_positions=True)
    merge_index(spark, out)
    wall = time.time() - t0
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    return wall


def main() -> None:
    from lucene_spark.fixtures import write_pages
    from lucene_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    corpus = os.path.join(WORK, f"pages_{n_docs}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        spark = get_spark("scale-gen", cores=n_large)
        write_pages(spark, n_docs, corpus, partitions=128)
        spark.stop()

    # warmup pass (OS page cache for the corpus), then INTERLEAVED measured
    # passes with the min wall per level — each pass starts its own JVM
    # (startup inside both measurements symmetrically), and interleaving +
    # best-of cancels this shared host's ~4x co-tenant speed swings
    # (single-shot pairs measured efficiency anywhere from 0.4 to 0.9 on
    # identical code)
    rounds = int(os.environ.get("BENCH_ROUNDS", "2"))
    timed_build(n_large, corpus, n_docs)
    t_small, t_large = float("inf"), float("inf")
    for _ in range(rounds):
        t_small = min(t_small, timed_build(n_small, corpus, n_docs))
        t_large = min(t_large, timed_build(n_large, corpus, n_docs))

    tp_small = n_docs / t_small
    tp_large = n_docs / t_large
    factor = n_large / n_small
    eff = tp_large / (factor * tp_small)
    print(json.dumps({
        "metric": "indexing_scaling_efficiency",
        "n_docs": n_docs,
        "cores_small": n_small, "cores_large": n_large,
        "wall_small_sec": round(t_small, 2), "wall_large_sec": round(t_large, 2),
        "docs_per_sec_small": round(tp_small, 1),
        "docs_per_sec_large": round(tp_large, 1),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
