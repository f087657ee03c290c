"""Streaming exact dedup (ingest-side, over the north-rule page stream):
built-in dropDuplicatesWithinWatermark variant and the stateful
TTL-decoupled variant must both emit exactly the first occurrence per
content key, match the batch exact-dedup of the same pages, and keep
bounded state (TTL eviction observable as a re-emit after expiry)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_pages(path, name, rows):
    """rows: (url, ts_str, text)."""
    os.makedirs(path, exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], format="ISO8601")
    pdf["html"] = [t.encode() for t in pdf["text"]]
    pdf["lang"] = "en"
    pdf = pdf[["url", "warc_ts", "html", "text", "lang"]]
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(path, name),
                   coerce_timestamps="us", allow_truncated_timestamps=True)


def _rows(spark, q, table):
    q.processAllAvailable()
    return spark.sql(f"SELECT * FROM {table}").collect()


def test_dedup_builtin_within_watermark(spark, tmp_path):
    """First occurrence survives; a same-key page arriving in a later
    micro-batch inside the watermark window is dropped."""
    from lucene_spark.streaming.dedup import run_dedup_to_memory

    src = str(tmp_path / "pages_dd")
    _write_pages(src, "w1.parquet", [
        ("u1", "2026-01-01 10:00:00", "alpha beta"),
        ("u2", "2026-01-01 10:01:00", "gamma delta"),
    ])
    q = run_dedup_to_memory(spark, src, query_name="dd_b",
                            watermark="30 minutes")
    try:
        _rows(spark, q, "dd_b")
        _write_pages(src, "w2.parquet", [
            ("u3", "2026-01-01 10:02:00", "alpha beta"),   # dup of u1
            ("u4", "2026-01-01 10:03:00", "epsilon zeta"), # fresh
        ])
        rows = _rows(spark, q, "dd_b")
    finally:
        q.stop()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r["url"])
    # 3 distinct texts -> 3 emitted keys, each exactly once; the dup key
    # kept its FIRST url
    assert sorted(len(v) for v in by_key.values()) == [1, 1, 1]
    urls = {u for v in by_key.values() for u in v}
    assert urls == {"u1", "u2", "u4"}


def test_dedup_stateful_ttl(spark, tmp_path):
    """Stateful variant: (a) cross-batch dup suppressed while the key is
    inside the TTL even after the WATERMARK has long passed it (the
    decoupling the operator exists for); (b) after event time moves past
    first-seen + TTL the key is evicted and a re-occurrence re-emits;
    (c) within-batch dups collapse to the earliest (url, ts)."""
    from lucene_spark.streaming.dedup import run_dedup_to_memory

    src = str(tmp_path / "pages_dds")
    _write_pages(src, "w1.parquet", [
        ("u2", "2026-01-01 10:05:00", "alpha beta"),  # later ts, same batch
        # sub-second earlier than a0 below: microsecond order must decide
        # (a0 sorts FIRST alphabetically, so whole-second truncation would
        # wrongly pick it via the url tiebreak)
        ("u1", "2026-01-01 10:00:00.250", "alpha beta"),
        ("a0", "2026-01-01 10:00:00.750", "alpha beta"),
        ("u3", "2026-01-01 10:00:00", "gamma delta"),
    ])
    # watermark 1 minute, TTL 1 day: the dup below arrives 2 h later —
    # far outside the watermark, well inside the TTL
    q = run_dedup_to_memory(spark, src, query_name="dd_s", stateful=True,
                            ttl_s=86_400, watermark="1 minute")
    try:
        rows = _rows(spark, q, "dd_s")
        assert sorted(r["url"] for r in rows) == ["u1", "u3"]
        _write_pages(src, "w2.parquet", [
            ("u4", "2026-01-01 12:00:00", "alpha beta"),  # inside TTL: drop
        ])
        rows = _rows(spark, q, "dd_s")
        assert sorted(r["url"] for r in rows) == ["u1", "u3"]
        # event time jumps 3 days -> watermark passes every TTL, keys
        # evicted; the SAME text re-emits as a fresh first occurrence
        _write_pages(src, "w3.parquet", [
            ("u5", "2026-01-04 12:00:00", "omega"),
        ])
        _rows(spark, q, "dd_s")
        _write_pages(src, "w4.parquet", [
            ("u6", "2026-01-04 12:30:00", "alpha beta"),
        ])
        rows = _rows(spark, q, "dd_s")
    finally:
        q.stop()
    assert sorted(r["url"] for r in rows) == ["u1", "u3", "u5", "u6"]


def test_dedup_matches_batch_twin(spark, tmp_path):
    """The streamed first-occurrence set equals the batch exact-dedup
    (min-ts, min-url tiebreak) of the same pages."""
    from pyspark.sql import functions as F

    from lucene_spark.streaming.dedup import run_dedup_to_memory

    src = str(tmp_path / "pages_ddb")
    waves = [
        [("a", "2026-01-01 09:00:00", "t one"),
         ("b", "2026-01-01 09:01:00", "t two")],
        [("c", "2026-01-01 09:02:00", "t one"),
         ("d", "2026-01-01 09:03:00", "t three")],
        [("e", "2026-01-01 09:04:00", "t two"),
         ("f", "2026-01-01 09:05:00", "t four")],
    ]
    q = None
    try:
        for i, w in enumerate(waves):
            _write_pages(src, f"w{i}.parquet", w)
            if q is None:
                q = run_dedup_to_memory(spark, src, query_name="dd_t",
                                        stateful=True, ttl_s=86_400,
                                        watermark="1 minute")
            q.processAllAvailable()
        got = sorted((r["key"], r["url"])
                     for r in spark.sql("SELECT * FROM dd_t").collect())
    finally:
        if q is not None:
            q.stop()
    batch = (
        spark.read.parquet(src)
        .select(F.md5(F.col("text").cast("binary")).alias("key"),
                "url", "warc_ts")
        .groupBy("key")
        .agg(F.min(F.struct("warc_ts", "url")).alias("first"))
        .select("key", F.col("first.url").alias("url"))
    )
    exp = sorted((r["key"], r["url"]) for r in batch.collect())
    assert got == exp
