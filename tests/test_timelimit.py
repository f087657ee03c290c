"""Deadline-bounded search (TimeLimitingCollector analog): a generous
budget returns exactly the plain search's rows; an elapsed budget cancels
the job group and raises TimeExceededException promptly; the searcher
(and the session) stay fully usable afterwards."""

import time

import pytest
from pyspark.sql import functions as F

from lucene_spark.indexing import IndexReader
from lucene_spark.queries.planner import (Searcher, TimeExceededException,
                                          collect_with_deadline)


@pytest.fixture(scope="module")
def mini_searcher(spark, index_dir):
    return Searcher(IndexReader(spark, index_dir))


def test_generous_budget_matches_plain_search(mini_searcher):
    plain = mini_searcher.search("seven AND forty", k=10).collect()
    timed = mini_searcher.search_timed("seven AND forty", k=10,
                                       timeout_ms=120_000)
    assert [(r["docid"], r["score"]) for r in timed] == \
        [(r["docid"], r["score"]) for r in plain]


def test_no_budget_is_plain_collect(mini_searcher):
    assert mini_searcher.search_timed("seven", k=5) == \
        mini_searcher.search("seven", k=5).collect()


def _slow_df(spark, per_row_sleep_s: float, n: int = 64):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def crawl(col: pd.Series) -> pd.Series:
        time.sleep(per_row_sleep_s * len(col))
        return col

    return (spark.range(n).repartition(8)
            .select(crawl(F.col("id")).alias("id")))


def test_deadline_cancels_and_raises(spark):
    t0 = time.time()
    with pytest.raises(TimeExceededException) as ei:
        # 64 rows x 0.5 s spread over 8 tasks ≈ 4 s of work vs 600 ms
        collect_with_deadline(spark, _slow_df(spark, 0.5), timeout_ms=600)
    wall = time.time() - t0
    assert ei.value.timeout_ms == 600
    assert ei.value.elapsed_ms >= 500
    # the cancel is prompt: nowhere near the ~4 s the job would need
    assert wall < 3.5, wall


def test_session_healthy_after_timeout(spark, mini_searcher):
    with pytest.raises(TimeExceededException):
        collect_with_deadline(spark, _slow_df(spark, 0.5), timeout_ms=500)
    # job group cleared: both a bare action and a fresh search succeed
    assert spark.range(10).count() == 10
    assert len(mini_searcher.search_timed("seven", k=5,
                                          timeout_ms=120_000)) > 0
