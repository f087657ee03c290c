"""URL canonicalization / URL dedup / host stats (lucene_spark/urls.py).

Two-statements-one-spec: the Spark expression (`canonical_url`) and the
independent urllib reference (`canonical_url_py`) are pinned equal over a
combinatorial URL grid plus curated hostile inputs; the dedup/stats ops
are checked on hand corpora and their plan shapes gated."""

import itertools
import re

import pytest

from pyspark.sql import functions as F

from lucene_spark.urls import (
    canonical_host,
    canonical_url,
    canonical_url_py,
    host_stats,
    url_dedup,
)


def _grid() -> list[str]:
    schemes = ["http", "HTTPS", "https"]
    hosts = ["Example.COM", "sub.ex-1.org:8080", "h.example:443",
             "h.example:80", "a.b.c.example"]
    paths = ["", "/", "/a/b", "/a/b/", "/a//b///", "/%7Euser/x"]
    queries = ["", "?", "?b=2&a=1", "?utm_source=x&a=1",
               "?fbclid=z", "?a=1&a=0&B=2", "?ref=tw&gclid=1&k"]
    frags = ["", "#frag"]
    urls = []
    for s, h, p, q, f in itertools.product(schemes, hosts, paths,
                                           queries, frags):
        urls.append(f"{s}://{h}{p}{q}{f}")
    return urls


HOSTILE = [
    None,
    "",
    "notaurl",
    "http://",
    "ftp://files.example/a/b?x=1",     # non-http scheme: ports untouched
    "http://h.example/path?",
    "http://h.example/?utm_source=a&utm_medium=b",  # all params tracked
    "http://h.example#only-frag",
    "https://USER@h.example/p",        # userinfo folds into the authority
]


def test_canonical_matches_reference(spark):
    urls = _grid() + [u for u in HOSTILE if u is not None]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    want = [canonical_url_py(u) for u in urls]
    bad = [(u, g, w) for u, g, w in zip(urls, got, want) if g != w]
    assert not bad, bad[:10]


def test_canonical_null_inputs(spark):
    df = spark.createDataFrame([(None,), ("notaurl",), ("http://",)],
                               "url string")
    out = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    assert out == [None, None, None]
    assert canonical_url_py(None) is None
    assert canonical_url_py("notaurl") is None


def test_canonical_spec_points():
    # each spec bullet pinned on the reference implementation (the Spark
    # side is equal by test_canonical_matches_reference)
    f = canonical_url_py
    assert f("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#z") \
        == "https://www.ex.com/a/b?a=1&b=2"
    assert f("http://h.example:80/") == "http://h.example/"
    assert f("http://h.example:8080/") == "http://h.example:8080/"
    assert f("http://h.example") == "http://h.example/"
    assert f("http://h.example/p/") == "http://h.example/p"
    assert f("http://h.example/?fbclid=1") == "http://h.example/"
    # sort is bytewise over whole k=v atoms ('B=2' < 'a=0' in ASCII)
    assert f("http://h.example/?a=1&a=0&B=2") \
        == "http://h.example/?B=2&a=0&a=1"


def test_url_dedup_semantics(spark):
    rows = [
        (1, "http://Ex.com/a/?utm_source=x", "t1"),
        (2, "http://ex.com/a", "t2"),            # alias of row 1
        (3, "http://ex.com/b", "t3"),
        (4, "notaurl", "t4"),                    # NULL canonical: kept
        (5, "also not", "t5"),                   # NULL canonical: kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = url_dedup(df, order_col="doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 3, 4, 5]
    assert out.columns == df.columns


def test_host_stats_values(spark):
    rows = [
        ("http://ex.com/a", "same"),
        ("http://EX.com/a/", "same"),       # url alias, same text
        ("http://ex.com/b", "same"),        # distinct url, dup text
        ("http://ex.com/c", "other"),
        ("http://two.org/x", None),         # NULL text participates
        ("garbage", "zzz"),                 # no host: excluded
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    out = {r["host"]: r.asDict() for r in host_stats(df).collect()}
    ex = out["ex.com"]
    assert ex["n_pages"] == 4 and ex["n_urls"] == 3
    assert ex["url_alias_rate"] == 0.25
    assert ex["n_distinct_texts"] == 2 and ex["text_dup_rate"] == 0.5
    assert out["two.org"]["n_pages"] == 1
    assert set(out) == {"ex.com", "two.org"}


def test_canonical_is_narrow_and_dedup_single_shuffle(spark):
    df = spark.createDataFrame([(i, f"http://h{i % 3}.ex/p{i}/")
                                for i in range(50)],
                               "doc_id long, url string")
    proj = df.select(canonical_url("url"), canonical_host("url"))
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan      # pure narrow projection
    dd = url_dedup(df, order_col="doc_id")
    plan2 = dd._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan2)) == 1, plan2
    assert "Window" not in plan2, plan2      # min_by agg, not a sort window


def test_fixture_corpus_roundtrip(spark, pages_dir):
    """The crawl fixture corpus canonicalizes losslessly (its URLs are
    already canonical) — dedup keeps every page."""
    df = spark.read.parquet(pages_dir)
    assert url_dedup(df).count() == df.count()
    hs = host_stats(df)
    assert hs.agg(F.sum("n_pages")).first()[0] == df.count()
