#!/usr/bin/env python
"""Headline benchmark — one JSON line on stdout.

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

1. Index-build throughput (docs/sec) over the deterministic synthetic
   Common-Crawl-style pages corpus (lucene_spark.fixtures, seed 42), sized
   ~500k docs × sf. This is the BASELINE.json headline metric (reference
   contrib/benchmark ReportTask rec/s semantics).
2. Per-query latency for the reference query set (queries/refset.py —
   EnwikiQueryMaker-style) over the built index.
3. A sample of the training-data pipeline operators from __spark_entry__
   over the sf_dir tables.

SELF-DEFENDING ARTIFACT: this host is shared and its effective CPU speed
swings ~4x on minute timescales, so a min-only number can't distinguish a
slow engine from a stolen host (round 2 lost its ANN/sessionize signal to
exactly that). Therefore the JSON carries, per entry, EVERY round's wall
("rounds"), and per section a same-moment single-core pure-CPU control
("cpu_control": seconds for a fixed Python burn measured at the start of
each round — a control spike marks a co-tenant window, which indicts the
HOST for that round, not the engine). Rounds are also INTERLEAVED across
entries (round-major, not entry-major) so a burst degrades one round of
everything instead of every round of one entry. Headline scalars stay
min-of-rounds (reference contrib/benchmark "Rounds" semantics).

Scaling-efficiency evidence (local[8] vs local[32] on the same input) is
produced by scripts/scaling_bench.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
_m = re.search(r"sf([0-9.]+)", SF_DIR)
SF = float(_m.group(1).rstrip(".")) if _m else 0.1
N_DOCS = int(os.environ.get("BENCH_DOCS", str(max(2000, int(500_000 * SF)))))
WORK = os.environ.get("BENCH_WORK", "/tmp/lucene_spark_bench")

_BURN_N = 5_000_000  # ~0.2-0.4 s single-core on an idle host


def _burn(n: int = _BURN_N) -> float:
    """Fixed single-core Python work → seconds. The per-round host-speed
    control: engine code never runs here, so a slow control is co-tenant
    steal by construction."""
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i & 7
    assert x >= 0
    return time.time() - t0


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


# --- clean-window gate (round 5) -------------------------------------------
# A section's headline is min-of-rounds, so ONE round measured in a clean
# host window suffices. The gate: track the fastest control burn observed
# anywhere in this run (the cleanest window the host showed us); a section
# whose every round ran with a control > 1.25x that floor (+20 ms noise
# allowance) was entirely measured under co-tenant steal — re-run it
# (bounded extra rounds, every attempt recorded) instead of leaving the
# adjudication to the reader of BENCH_DETAIL.json (round-4's ask).
_MAX_EXTRA = int(os.environ.get("BENCH_MAX_EXTRA_ROUNDS", "3"))
_clean_floor = [float("inf")]


def _control(cpu_control: dict, section: str) -> float:
    c = _burn()
    _clean_floor[0] = min(_clean_floor[0], c)
    cpu_control[section].append(round(c, 3))
    return c


def _section_clean(cpu_control: dict, section: str) -> bool:
    return min(cpu_control[section]) <= 1.25 * _clean_floor[0] + 0.02


def main() -> None:
    from lucene_spark.fixtures import write_pages
    from lucene_spark.indexing.build import build_index
    from lucene_spark.indexing.merge import merge_index
    from lucene_spark.indexing.reader import IndexReader
    from lucene_spark.queries.planner import Searcher
    from lucene_spark.queries.refset import REFERENCE_QUERIES
    from lucene_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS)

    corpus = os.path.join(WORK, f"pages_{N_DOCS}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        write_pages(spark, N_DOCS, corpus, partitions=max(CPUS * 4, 16))

    # warm the execution paths the build exercises so the metric is engine
    # throughput, not JVM/Python-worker startup — the reference benchmark's
    # warm rounds (contrib/benchmark conf/*.alg "Rounds") do the same. A
    # MINIATURE REAL BUILD is the only warmup that actually loads the
    # tokenizer + numpy into every reused Python worker and compiles the
    # full build plan's codegen; a generic mapInPandas round-trip leaves the
    # first timed build ~2x slow (observed 25-30 s cold vs 15 s warm at 50k)
    spark.range(100_000).selectExpr("sum(id)").collect()
    warm_corpus = os.path.join(WORK, "pages_warm2000")
    if not os.path.exists(os.path.join(warm_corpus, "_SUCCESS")):
        write_pages(spark, 2000, warm_corpus, partitions=CPUS)
    warm_idx = os.path.join(WORK, "_warmup_idx")
    shutil.rmtree(warm_idx, ignore_errors=True)
    build_index(spark, warm_corpus, warm_idx, analyzer="standard",
                store_positions=True, target_docs_per_seg=1000)
    merge_index(spark, warm_idx)

    rounds: dict[str, list[float]] = {}
    cpu_control: dict[str, list[float]] = {"build": [], "query": [],
                                           "pipeline": []}

    # --- 1. index build (timed: build + merge, fresh output) ---------------
    # best-of-N with per-round walls AND a control burn per round: the build
    # is the HEADLINE metric and a single shot on this shared host measures
    # the co-tenant as often as the engine (observed 1.5k vs 2.9k docs/s on
    # identical code)
    # seed the clean floor before any section: three quick burns give the
    # gate an idle-host reference even if the first section lands stolen
    for _ in range(3):
        _clean_floor[0] = min(_clean_floor[0], _burn())

    idx_dir = os.path.join(WORK, f"idx_{N_DOCS}_c{CPUS}")
    rounds["build"] = []

    def _build_round():
        _control(cpu_control, "build")
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        build_index(
            spark, corpus, idx_dir,
            analyzer="standard", store_positions=True,
            target_docs_per_seg=max(2000, N_DOCS // 64),
        )
        merge_index(spark, idx_dir)
        rounds["build"].append(round(time.time() - t0, 3))

    for _ in range(int(os.environ.get("BENCH_BUILD_ROUNDS", "3"))):
        _build_round()
    extra = 0
    while not _section_clean(cpu_control, "build") and extra < _MAX_EXTRA:
        extra += 1
        _build_round()
    t_build = min(rounds["build"])
    docs_per_sec = N_DOCS / t_build

    # --- 2. reference query set over the built index -----------------------
    # fresh session: the query service is a separate process from the batch
    # build in any real deployment, and build-job shuffle state otherwise
    # pollutes latency numbers
    spark.stop()
    spark = get_spark("bench-query", cores=CPUS)
    # a serving node runs warm (reference search nodes serve from the OS
    # page cache / RAMDirectory): pin postings + docmap in the columnar
    # cache; pruning still applies to cached batches
    searcher = Searcher(IndexReader(spark, idx_dir).warm())
    slug = re.compile(r"[^a-z0-9]+")
    N_ROUNDS = int(os.environ.get("BENCH_ROUNDS", "3"))

    qnames = {}
    for i, q in enumerate(REFERENCE_QUERIES):
        qnames[f"q{i:02d}_" + slug.sub("_", q.lower()).strip("_")[:24]] = q
    batch = {f"q{i:02d}": q for i, q in enumerate(REFERENCE_QUERIES)}

    # interleaved round-major passes: pass r times every query once, then
    # the batched set — a co-tenant burst eats one ROUND of everything, and
    # the per-round control burn timestamps the host's speed for that round
    for name in list(qnames) + ["batch_all"]:
        rounds[name] = []

    def _query_round():
        _control(cpu_control, "query")
        for name, q in qnames.items():
            rounds[name].append(round(
                _timed(lambda: searcher.search(q, k=10).collect()), 3))
        rounds["batch_all"].append(round(
            _timed(lambda: searcher.search_many(batch, k=10).collect()), 3))

    for _ in range(N_ROUNDS):
        _query_round()
    extra = 0
    while not _section_clean(cpu_control, "query") and extra < _MAX_EXTRA:
        extra += 1
        _query_round()
    queries = {name: min(rs) for name, rs in rounds.items()
               if name.startswith("q")}
    batch_all_sec = min(rounds["batch_all"])

    # --- 2b. driver-local serving (InstantiatedSearcher, round 5) ---------
    # the contrib/instantiated analog: sub-RAM indexes serve search() with
    # zero Spark jobs through the same kernel — measure the latency the
    # distributed job floor hides. Falls back silently (inst_* absent) if
    # the index outgrows the size guard at a larger BENCH_DOCS.
    inst_stats = {}
    try:
        from lucene_spark.queries.instantiated import InstantiatedSearcher

        inst = InstantiatedSearcher(IndexReader(spark, idx_dir))
        for q in list(qnames.values())[:4]:
            inst.search_local(q, k=10)  # warm load + parse caches
        laps = []
        for _ in range(N_ROUNDS):
            for q in qnames.values():
                t0 = time.time()
                inst.search_local(q, k=10)
                laps.append(time.time() - t0)
        laps.sort()
        inst_stats = {
            "inst_p50_ms": round(laps[len(laps) // 2] * 1000, 2),
            "inst_p95_ms": round(laps[int(len(laps) * 0.95)] * 1000, 2),
            "inst_qps": round(len(laps) / sum(laps), 1),
        }
    except Exception as e:  # size guard or shape — the metric is optional
        inst_stats = {"inst_skipped": type(e).__name__}

    # --- 3. pipeline operators over the sf_dir tables ----------------------
    import __spark_entry__ as entry

    PIPELINE = ("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
                "dedup_cluster", "text_quality", "text_repetition",
                "text_decontaminate", "text_dup_ngram_coverage",
                "ft_percolate",
                "ann_cosine_topk", "ann_knn_join",
                "ann_ivf_search", "ann_pq_search", "dedup_semantic",
                "events_sessionize",
                # round 4: URL canonicalization/host stats, PII scrub,
                # payload-scored term query (its warm pass also pays the
                # one-time payload-index build, cached per sf dir)
                "text_url_stats", "text_pii_scrub", "ft_payload_term",
                # round 4: IR quality harness (batched search + window fold)
                "ft_quality_eval")
    efns = dict(entry.queries())
    efns.update(entry.extra_queries())
    for name in PIPELINE:
        rounds[name] = []
    # one unmeasured warm pass first (same "Rounds" warmup semantics as the
    # build section): the first execution of the dedup family pays the
    # ONE-TIME _dedup_artifacts materialization (capped shingle/set/signature
    # caches — a persisted build-side artifact in production, measured
    # separately in BENCH.md §5), and the first run of each entry pays plan
    # compilation. Without this pass the min-of-rounds still carries warmup:
    # round-4's driver run recorded jaccard [90.8, 21.1, 11.4] — strictly
    # decreasing, i.e. never warm.
    for name in PIPELINE:
        efns[name](spark, SF_DIR).collect()

    def _pipeline_round():
        _control(cpu_control, "pipeline")
        for name in PIPELINE:
            fn = efns[name]
            rounds[name].append(round(
                _timed(lambda: fn(spark, SF_DIR).collect()), 3))

    for _ in range(N_ROUNDS):
        _pipeline_round()
    extra = 0
    while not _section_clean(cpu_control, "pipeline") and extra < _MAX_EXTRA:
        extra += 1
        _pipeline_round()
    for name in PIPELINE:
        queries[name] = min(rounds[name])

    # the driver captures only the LAST 2000 CHARS of stdout and parses the
    # JSON line out of that window — round 3's line grew past 2000 chars
    # (per-round arrays) and the whole bench signal was lost ("parsed": null
    # in BENCH_r03.json). So: the printed line is COMPACT (short q-keys, no
    # per-round detail) and the full self-defending record — per-entry
    # per-round walls, per-section single-core host controls, long query
    # names — goes to BENCH_DETAIL.json next to this script.
    compact_queries = {}
    for name, v in queries.items():
        compact_queries[name.split("_")[0] if name.startswith("q") else name] = v
    out = {
        "metric": "index_build_docs_per_sec",
        "value": round(docs_per_sec, 1),
        "unit": "docs/sec",
        "queries": compact_queries,
        "sf": SF,
        "n_docs": N_DOCS,
        "build_sec": round(t_build, 2),
        "cores": CPUS,
        "query_set_sec": round(sum(v for k, v in queries.items()
                                   if k.startswith("q")), 2),
        "batch_all_sec": round(batch_all_sec, 2),
        "batch_qps": round(len(REFERENCE_QUERIES) / batch_all_sec, 1),
        **inst_stats,
        "detail": "BENCH_DETAIL.json",
    }
    detail = dict(out)
    detail.update({
        # self-defense: per-entry per-round walls + per-section per-round
        # single-core controls (see module docstring). A reader can mark any
        # round whose control is ≫ the section min as a stolen-host window
        # and judge entries by their clean rounds.
        "queries": queries,
        "rounds": rounds,
        "cpu_control": cpu_control,
        "cpu_control_burn_n": _BURN_N,
        # clean-window gate record: the fastest control observed this run
        # (the host's demonstrated idle speed) and the per-section verdict —
        # a section still unclean after the bounded retries ran ENTIRELY
        # under co-tenant steal and its numbers should be read against its
        # own controls
        "clean_floor_sec": round(_clean_floor[0], 3),
        "section_clean": {s: _section_clean(cpu_control, s)
                          for s in cpu_control},
    })
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    line = json.dumps(out)
    assert len(line) < 1900, f"bench JSON line too long ({len(line)} chars)"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
