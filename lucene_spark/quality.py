"""IR quality harness — the contrib/benchmark quality package re-expressed
as distributed DataFrame ops.

Reference semantics (cites /root/reference/contrib/benchmark/src/java/org/
apache/lucene/benchmark/quality/...):

- ``QualityStats.java:79-101 addResult``: walk the ranked result list,
  rank n = 1..numPoints; relevant hits accumulate numGoodPoints and
  recall points; ``pAt[n] = numGood@n / n``.
- ``QualityStats.java:106-117 getPrecisionAt``: for n beyond the result
  list, P@n scales down — ``numPoints * pAt[numPoints] / n`` which equals
  ``numGood / n``; together with the in-list case P@n is uniformly
  ``|relevant in first n| / n``.
- ``QualityStats.java:86-88``: MRR = 1/rank of the FIRST relevant hit,
  but only when that rank ≤ 5 (the reference's hard cutoff), else 0.
- ``QualityStats.java:119-122 getAvp``: average precision =
  Σ_{relevant ranks r} (numGood@r / r) / maxGoodPoints.
- ``QualityStats.java:98-99``: recall = numGood / maxGoodPoints, except
  maxGoodPoints ≤ 0 degenerates to the running precision (numGood /
  numPoints).
- ``QualityStats.java:178-233 average``: the aggregate averages every
  measure over the m queries WITH positive judgements only (times over
  all queries — not tracked here).
- ``trec/TrecJudge.java:86-89``: binary relevance — a (query, doc) pair
  is relevant iff present in the qrels set.
- ``QualityBenchmark.java:96-120 execute``: run each quality query
  through the searcher top-maxResults, judge each ranked doc, fold into
  QualityStats.

Scale shape: results are (query × k) rows — tiny relative to the corpus —
so the per-query cumulative walk is one window over a shuffle keyed by
query_id, and judgments join in by (query_id, doc). Nothing corpus-sized
ever reaches the driver; the expensive part (the searches) stays the
batched kernel's one-job plan (Searcher.search_many).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_POINTS = 20   # QualityStats.java:28 MAX_POINTS
MRR_CUTOFF = 5    # QualityStats.java:87 "only within 5 top scores"


def quality_stats(results: DataFrame, judgments: DataFrame,
                  p_at: tuple[int, ...] = (1, 5, 10, 20)) -> DataFrame:
    """Per-query QualityStats over ranked results.

    ``results``: (query_id, doc, rank) — rank 1-based within each query,
    the searcher's ordering. ``judgments``: (query_id, doc) binary qrels
    (TrecJudge). Returns one row per query_id present in ``results``:
    num_points, num_good, max_good, recall, avp, mrr, p_at_<n>...
    Queries absent from the qrels get max_good 0 (recall degenerates to
    running precision, avp 0 — QualityStats.java:98,120).
    """
    for n in p_at:
        if n < 1 or n > MAX_POINTS:
            raise ValueError(f"p_at point {n} outside [1,{MAX_POINTS}]"
                             " (QualityStats.getPrecisionAt contract)")
    rel = judgments.select("query_id", "doc").distinct()
    max_good = rel.groupBy("query_id").agg(F.count("*").alias("max_good"))

    judged = (results.select("query_id", "doc", "rank")
              .join(rel.withColumn("rel", F.lit(1)), ["query_id", "doc"],
                    "left")
              .withColumn("rel", F.coalesce("rel", F.lit(0))))
    w = (Window.partitionBy("query_id").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    judged = judged.withColumn("cum_good", F.sum("rel").over(w))

    aggs = [
        F.max("rank").alias("num_points"),
        F.sum("rel").alias("num_good"),
        # Σ over relevant ranks of precision-at-that-rank (pReleventSum)
        F.sum(F.when(F.col("rel") == 1,
                     F.col("cum_good") / F.col("rank"))).alias("p_rel_sum"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
    ]
    # P@n = |relevant in first n| / n — covers both the in-list case and
    # the reference's beyond-list scaling (see module docstring)
    aggs += [F.sum(F.when(F.col("rank") <= n, F.col("rel")))
             .cast("double").alias(f"_good_at_{n}") for n in p_at]
    per_q = judged.groupBy("query_id").agg(*aggs)

    out = (per_q.join(max_good, "query_id", "left")
           .withColumn("max_good", F.coalesce("max_good", F.lit(0))))
    out = (out
           .withColumn("recall", F.when(
               F.col("max_good") > 0,
               F.col("num_good") / F.col("max_good"))
               .otherwise(F.col("num_good") / F.col("num_points")))
           .withColumn("avp", F.when(
               F.col("max_good") > 0,
               F.coalesce(F.col("p_rel_sum"), F.lit(0.0)) /
               F.col("max_good")).otherwise(F.lit(0.0)))
           .withColumn("mrr", F.when(
               F.col("first_rel") <= MRR_CUTOFF,
               F.lit(1.0) / F.col("first_rel")).otherwise(F.lit(0.0))))
    cols = [F.col("query_id"),
            F.col("num_points").cast("long").alias("num_points"),
            F.col("num_good").cast("long").alias("num_good"),
            F.col("max_good").cast("long").alias("max_good"),
            "recall", "avp", "mrr"]
    cols += [(F.col(f"_good_at_{n}") / n).alias(f"p_at_{n}") for n in p_at]
    return out.select(*cols)


def quality_average(stats: DataFrame,
                    p_at: tuple[int, ...] = (1, 5, 10, 20)) -> DataFrame:
    """QualityStats.average analog: one row averaging every measure over
    the queries with positive judgements only (QualityStats.java:204-226;
    m = queries with maxGoodPoints > 0)."""
    good = stats.where(F.col("max_good") > 0)
    aggs = [F.count("*").alias("n_good_queries"),
            F.avg("num_points").alias("num_points"),
            F.avg("num_good").alias("num_good"),
            F.avg("max_good").alias("max_good"),
            F.avg("recall").alias("recall"),
            F.avg("avp").alias("avp"),  # MAP over judged queries
            F.avg("mrr").alias("mrr")]
    aggs += [F.avg(f"p_at_{n}").alias(f"p_at_{n}") for n in p_at]
    return good.agg(*aggs)


def quality_benchmark(searcher, quality_queries: dict[str, object],
                      judgments: DataFrame, k: int = 20,
                      p_at: tuple[int, ...] = (1, 5, 10, 20)) -> DataFrame:
    """QualityBenchmark.execute analog: run every quality query through
    the batched search kernel (ONE Spark job for the whole set —
    Searcher.search_many), rank 1-based by (score desc, docid asc), judge
    against the qrels, return per-query QualityStats.

    ``quality_queries``: {query_id: Query | str}. ``judgments``:
    (query_id, doc) with doc matching the index's url column (the
    reference's docNameField)."""
    hits = searcher.search_many(quality_queries, k=k)
    # search_many returns (qid, docid, score) ranked per query; rebuild the
    # 1-based rank with the kernel's own ordering rule
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    ranked = (hits.withColumn("rank", F.row_number().over(w))
              .select(F.col("qid").alias("query_id"),
                      F.col("docid").alias("doc"), "rank"))
    # doc names: the reference judges by a stored field (docNameField);
    # our docid IS derived from url in the contract corpus, but translate
    # through docmap so arbitrary corpora judge by url
    dm = searcher.reader.docmap().select("docid", "url")
    ranked = (ranked.join(dm, ranked.doc == dm.docid, "left")
              .select("query_id", F.col("url").alias("doc"), "rank"))
    return quality_stats(ranked, judgments, p_at=p_at)
