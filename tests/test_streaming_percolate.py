"""Streaming percolation: the bank evaluates per micro-batch as a
stateless map-only projection; matches arrive append-mode with the
page's event time, incrementally (new files -> only new alerts), and
the union of all micro-batch outputs equals the batch percolate() of
the union of the pages."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_pages(path, name, rows):
    """rows: (url, ts_str, text)."""
    os.makedirs(path, exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], format="ISO8601")
    pdf["html"] = [t.encode() if t is not None else None
                   for t in pdf["text"]]
    pdf["lang"] = "en"
    pdf = pdf[["url", "warc_ts", "html", "text", "lang"]]
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(path, name),
                   coerce_timestamps="us", allow_truncated_timestamps=True)


BANK = [
    ("q_term", "alpha"),
    ("q_must", "+alpha +beta"),
    ("q_phrase", '"gamma delta"'),
    ("q_prefix", "eps*"),
    ("q_not", "alpha -beta"),
]

W1 = [
    ("u1", "2026-01-01 10:00:00", "alpha beta gamma"),
    ("u2", "2026-01-01 10:01:00", "gamma delta epsilon"),
    ("u3", "2026-01-01 10:02:00", "zeta eta"),
]
W2 = [
    ("u4", "2026-01-01 10:03:00", "alpha omicron"),
    ("u5", "2026-01-01 10:04:00", "delta gamma delta"),
    ("u6", "2026-01-01 10:05:00", None),  # null text: no terms, no alert
]


def _alerts(spark, q, table):
    q.processAllAvailable()
    return {(r["url"], r["query_id"])
            for r in spark.sql(f"SELECT * FROM {table}").collect()}


def test_streaming_percolate_incremental(spark, tmp_path):
    from lucene_spark.streaming.percolate import run_percolate_to_memory

    src = str(tmp_path / "pages_perc")
    _write_pages(src, "w1.parquet", W1)
    q = run_percolate_to_memory(spark, src, BANK, query_name="perc_t1")
    try:
        first = _alerts(spark, q, "perc_t1")
        assert first == {
            ("u1", "q_term"), ("u1", "q_must"),
            ("u2", "q_phrase"), ("u2", "q_prefix"),
        }
        _write_pages(src, "w2.parquet", W2)
        both = _alerts(spark, q, "perc_t1")
    finally:
        q.stop()
    # only the NEW pages' matches were appended; nothing re-emitted
    assert both - first == {
        ("u4", "q_term"), ("u4", "q_not"), ("u5", "q_phrase"),
    }
    # event time rides along for the alert sink
    row = spark.sql("SELECT warc_ts FROM perc_t1 WHERE url='u4' "
                    "AND query_id='q_term'").collect()[0]
    assert str(row["warc_ts"]).startswith("2026-01-01 10:03:00")


def test_streaming_matches_batch_twin(spark, tmp_path):
    """Union of micro-batch outputs == batch percolate of all pages."""
    from lucene_spark.queries.percolate import percolate
    from lucene_spark.streaming.percolate import (_parse_bank,
                                                  run_percolate_to_memory)

    src = str(tmp_path / "pages_perc_b")
    _write_pages(src, "w1.parquet", W1)
    q = run_percolate_to_memory(spark, src, BANK, query_name="perc_t2")
    try:
        _alerts(spark, q, "perc_t2")
        _write_pages(src, "w2.parquet", W2)
        streamed = _alerts(spark, q, "perc_t2")
    finally:
        q.stop()
    batch = percolate(
        spark.read.parquet(src).where(F.col("text").isNotNull()),
        _parse_bank(BANK), id_col="url")
    assert streamed == {(r["url"], r["query_id"]) for r in batch.collect()}


def test_streaming_indexed_large_bank_parity(spark, tmp_path):
    """foreachBatch + percolate_indexed (the large-bank path): streamed
    alerts equal the batch percolate of the same pages."""
    from lucene_spark.queries.percolate import percolate
    from lucene_spark.streaming.percolate import (
        _parse_bank, run_percolate_indexed_to_parquet)

    src = str(tmp_path / "pages_perc_ix")
    out = str(tmp_path / "alerts_ix")
    ckpt = str(tmp_path / "ckpt_ix")
    _write_pages(src, "w1.parquet", W1)
    q = run_percolate_indexed_to_parquet(spark, src, BANK, out, ckpt)
    try:
        q.processAllAvailable()
        _write_pages(src, "w2.parquet", W2)
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {(r["url"], r["query_id"])
                for r in spark.read.parquet(out).collect()}
    batch = percolate(
        spark.read.parquet(src).where(F.col("text").isNotNull()),
        _parse_bank(BANK), id_col="url")
    assert streamed == {(r["url"], r["query_id"]) for r in batch.collect()}


def test_streaming_percolate_plan_is_stateless(spark, tmp_path):
    """No state store, no shuffle: the streaming plan must carry no
    StateStore/Exchange operator — the property that makes the op safe
    at unbounded stream length."""
    from lucene_spark.streaming.percolate import streaming_percolate

    src = str(tmp_path / "pages_perc_p")
    _write_pages(src, "w1.parquet", W1)
    sdf = streaming_percolate(spark, src, BANK)
    assert sdf.isStreaming
    # (optimizedPlan() would demand writeStream.start(); the analyzed
    # logical plan already shows any stateful/shuffling operator)
    plan = sdf._jdf.queryExecution().analyzed().toString()
    for marker in ("Aggregate", "Join", "Deduplicate", "FlatMapGroups"):
        assert marker not in plan, plan
    assert "Generate explode" in plan  # the one-projection evaluator
