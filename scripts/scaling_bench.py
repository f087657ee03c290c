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


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i & 7
    return x


def cpu_ceiling(n_small: int, n_large: int, tasks: int = 32,
                n_per_task: int = 20_000_000) -> dict:
    """Pure-CPU control (no Spark): the same fixed work split over w
    processes at both parallelism levels → the HARDWARE's scaling
    efficiency at this moment on this shared host. The job's efficiency
    can't exceed this ceiling; reporting both separates engine scaling
    from co-tenant load."""
    import multiprocessing as mp

    def wall(w: int) -> float:
        t0 = time.time()
        with mp.Pool(w) as pool:
            pool.map(_burn, [n_per_task] * tasks)
        return time.time() - t0

    wall(n_large)  # warm the pool/page cache symmetrically
    # interleaved, like the build passes in main(): a co-tenant burst that
    # lands on one level only would otherwise skew the ceiling itself
    t_s = t_l = float("inf")
    for _ in range(2):
        t_s = min(t_s, wall(n_small))
        t_l = min(t_l, wall(n_large))
    eff = (1.0 / t_l) / ((n_large / n_small) * (1.0 / t_s))
    return {"cpu_wall_small_sec": round(t_s, 2),
            "cpu_wall_large_sec": round(t_l, 2),
            "cpu_ceiling": round(eff, 3)}


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
    ceil = cpu_ceiling(n_small, n_large)
    print(json.dumps({
        "metric": "indexing_scaling_efficiency",
        "n_docs": n_docs,
        "cores_small": n_small, "cores_large": n_large,
        "wall_small_sec": round(t_small, 2), "wall_large_sec": round(t_large, 2),
        "docs_per_sec_small": round(tp_small, 1),
        "docs_per_sec_large": round(tp_large, 1),
        "scaling_efficiency": round(eff, 3),
        **ceil,
        "efficiency_vs_ceiling": round(min(1.0, eff / ceil["cpu_ceiling"]), 3)
        if ceil["cpu_ceiling"] else None,
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
