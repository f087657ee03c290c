"""IR quality harness — precision@k, average precision (MAP), NDCG over
ranked results vs relevance judgements.

Reference: contrib/benchmark quality package — QualityStats.java:28-85
(recall/precision-at-N/MAP accumulation), trec/TrecJudge.java (binary
judgements), QueryDriver.java (run queries → judge → report). Re-expressed
as DataFrame aggregations: results and judgements are DataFrames, metrics
come out of one groupBy — at scale this scores millions of queries in one
shuffle instead of a driver loop.

Inputs:
  results(qid string, docid long, rank int)   — rank 1-based, dense per qid
  judgements(qid string, docid long[, grade double])  — relevant docs
    (grade defaults to 1.0; used by NDCG)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def evaluate(results: DataFrame, judgements: DataFrame, k: int = 10) -> DataFrame:
    """Per-query metrics → DataFrame(qid, n_rel, n_ret, p_at_k, ap, ndcg).

    - p_at_k: |relevant in top k| / k (QualityStats precision-at-N)
    - ap: average precision over the FULL ranking and ALL relevant docs
      (unretrieved relevant docs count 0 — the TREC convention; results
      deeper than k still contribute)
    - ndcg: NDCG@k — DCG/IDCG with log2(rank+1) discount over graded
      judgements, cut off at k
    """
    j = judgements.withColumn(
        "grade",
        F.col("grade") if "grade" in judgements.columns else F.lit(1.0))
    # AP and n_ret use the FULL ranking (TREC convention: a relevant doc at
    # rank 12 still contributes to AP even when reporting P@10); only
    # p_at_k and NDCG@k apply the k cutoff
    hits = results.join(j, ["qid", "docid"], "inner")

    w = Window.partitionBy("qid").orderBy("rank")
    # precision at each relevant hit's rank: (#relevant ≤ rank)/rank
    prec = hits.withColumn("n_rel_at", F.count("*").over(w)) \
               .withColumn("p_at", F.col("n_rel_at") / F.col("rank")) \
               .withColumn("gain", F.when(
                   F.col("rank") <= k,
                   (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                   / F.log2(F.col("rank") + 1.0)).otherwise(F.lit(0.0)))
    per_hit = prec.groupBy("qid").agg(
        F.sum((F.col("rank") <= k).cast("int")).alias("n_hit"),
        F.sum("p_at").alias("sum_p"),
        F.sum("gain").alias("dcg"))

    n_rel = j.groupBy("qid").agg(F.count("*").alias("n_rel"),
                                 F.collect_list("grade").alias("grades"))
    # ideal DCG: top-k grades sorted desc
    idcg = n_rel.select(
        "qid", "n_rel",
        F.aggregate(
            F.zip_with(
                F.slice(F.sort_array("grades", asc=False), 1, k),
                F.sequence(F.lit(1), F.least(F.size("grades"), F.lit(k))),
                lambda g, r: (F.pow(F.lit(2.0), g) - 1.0)
                / F.log2(r.cast("double") + 1.0)),
            F.lit(0.0), lambda acc, x: acc + x).alias("idcg"))

    n_ret = results.groupBy("qid").agg(F.count("*").alias("n_ret"))
    return (idcg.join(n_ret, "qid", "left")
            .join(per_hit, "qid", "left")
            .select(
                "qid", "n_rel",
                F.coalesce("n_ret", F.lit(0)).cast("long").alias("n_ret"),
                (F.coalesce("n_hit", F.lit(0)) / float(k)).alias("p_at_k"),
                (F.coalesce("sum_p", F.lit(0.0)) / F.col("n_rel")).alias("ap"),
                F.when(F.col("idcg") > 0,
                       F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"))
                .otherwise(F.lit(0.0)).alias("ndcg"))
            .orderBy("qid"))


def summarize(per_query: DataFrame) -> DataFrame:
    """Macro averages → DataFrame(n_queries, mean_p_at_k, map, mean_ndcg)."""
    return per_query.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.avg("p_at_k").alias("mean_p_at_k"),
        F.avg("ap").alias("map"),
        F.avg("ndcg").alias("mean_ndcg"))
