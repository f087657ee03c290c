"""Incremental append + Structured Streaming ingest: appended segments are
rank-identical to a cold build / oracle over the full corpus (the
NRT-refresh analog, SURVEY.md §2.6)."""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

from lucene_spark.fixtures import page_row, pages_pdf
from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.planner import Searcher
from lucene_spark.streaming import append_to_index, stream_from_directory

from conftest import write_pages_files

K = 10


def _write_wave(path: str, start: int, n: int, name: str) -> None:
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(pages_pdf(n, start=start), preserve_index=False),
        os.path.join(path, name),
        coerce_timestamps="us", allow_truncated_timestamps=True)


def oracle_for(n: int):
    return build_oracle_index(list(enumerate(pages_pdf(n)["text"].tolist())))


def assert_matches_oracle_by_docid(spark, index_dir, n_docs, queries):
    """Exact docid comparison (valid when docids == fixture index)."""
    r = IndexReader(spark, index_dir)
    assert r.N == n_docs
    s = Searcher(r)
    oracle = oracle_for(n_docs)
    for qs in queries:
        got = [(int(x["docid"]), float(x["score"]))
               for x in s.search(qs, k=K).collect()]
        exp = oracle_search(oracle, parse_query(qs), K)
        assert [d for d, _ in got] == [d for d, _ in exp], qs
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, rel_tol=1e-9), qs


def assert_matches_oracle_by_url(spark, index_dir, n_docs, queries):
    """URL-keyed comparison — docid ASSIGNMENT may differ when micro-batch
    staging reorders files, but scores are docid-independent."""
    r = IndexReader(spark, index_dir)
    assert r.N == n_docs
    s = Searcher(r)
    oracle = oracle_for(n_docs)
    for qs in queries:
        got = sorted(
            ((x["url"], float(x["score"]))
             for x in s.search(qs, k=K, hydrate=True).collect()),
            key=lambda t: (-t[1], t[0]))
        exp = sorted(
            ((page_row(d)["url"], sc)
             for d, sc in oracle_search(oracle, parse_query(qs), K)),
            key=lambda t: (-t[1], t[0]))
        assert [u for u, _ in got] == [u for u, _ in exp], qs
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, rel_tol=1e-9), qs


def test_append_to_index(spark, tmp_path):
    src_a = str(tmp_path / "wave_a")
    src_b = str(tmp_path / "wave_b")
    write_pages_files(src_a, 200, 2)
    _write_wave(src_b, 200, 100, "part-0000.parquet")

    idx = str(tmp_path / "idx")
    build_index(spark, src_a, idx, target_docs_per_seg=100)
    merge_index(spark, idx)
    queries = ("one", "seven AND forty", '"twenty one"', "bucketthree")
    assert_matches_oracle_by_docid(spark, idx, 200, queries)

    new_segs = append_to_index(spark, src_b, idx, target_docs_per_seg=100)
    assert new_segs, "expected new segments"
    assert_matches_oracle_by_docid(spark, idx, 300, queries)

    # idempotent: same files again → no new segments
    assert append_to_index(spark, src_b, idx, target_docs_per_seg=100) == []


def test_streaming_ingest(spark, tmp_path):
    source = str(tmp_path / "source")
    idx = str(tmp_path / "sidx")
    _write_wave(source, 0, 75, "part-0000.parquet")
    _write_wave(source, 75, 75, "part-0001.parquet")

    q = stream_from_directory(spark, source, idx, target_docs_per_seg=100,
                              available_now=True)
    q.awaitTermination(180)
    queries = ("one", "seven AND forty", "bucketthree")
    assert_matches_oracle_by_url(spark, idx, 150, queries)

    # second wave arrives; re-run the availableNow drain (NRT refresh)
    _write_wave(source, 150, 50, "part-0002.parquet")
    q2 = stream_from_directory(spark, source, idx, target_docs_per_seg=100,
                               available_now=True)
    q2.awaitTermination(180)
    assert_matches_oracle_by_url(spark, idx, 200, queries)


# ---------------------------------------------------------------------------
# watermarked windowed aggregation (streaming/windows.py)
# ---------------------------------------------------------------------------

def _write_events(path, name, rows):
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(path, name),
                   coerce_timestamps="us", allow_truncated_timestamps=True)


def test_windowed_watermark_drops_late(spark, tmp_path):
    """Append-mode windowed agg: a window is emitted once the watermark
    passes it; an event later than the watermark is dropped (the late-data
    contract of Structured Streaming the brief requires)."""
    from lucene_spark.streaming import run_windowed_to_memory

    src = str(tmp_path / "events_stream")
    # wave 1: two events in the 10:00 window, one at 12:00 (advances
    # watermark to 11:30 with a 30 min delay → 10:00 window closes)
    _write_events(src, "w1.parquet", [
        (1, "2026-01-01 10:05:00", 1, "click", 1.0, ""),
        (2, "2026-01-01 10:20:00", 2, "click", 2.0, ""),
        (3, "2026-01-01 12:00:00", 3, "view", 5.0, ""),
    ])
    q = run_windowed_to_memory(spark, src, query_name="win_t",
                               window="1 hour", watermark="30 minutes")
    try:
        q.processAllAvailable()
        # wave 2: a LATE click at 10:40 (before watermark 11:30) must be
        # dropped; a fresh event at 14:00 closes the 12:00 window
        _write_events(src, "w2.parquet", [
            (4, "2026-01-01 10:40:00", 4, "click", 100.0, ""),
            (5, "2026-01-01 14:00:00", 5, "view", 7.0, ""),
        ])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r["win_start"].hour, r["event_type"]): (r["n"], r["total_value"])
            for r in spark.sql("SELECT * FROM win_t").collect()}
    # 10:00 window: exactly the two on-time clicks — the late one is absent
    assert rows[(10, "click")] == (2, 3.0)
    # 12:00 window emitted after wave 2 advanced the watermark
    assert rows[(12, "view")] == (1, 5.0)


def test_stateful_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionization: gap inside a batch closes a
    session immediately; the event-time timeout (watermark past
    last + gap) flushes the rest. Closed sessions must match the batch
    sessionization of the same events."""
    from lucene_spark.streaming.sessions import run_sessionize_to_memory

    src = str(tmp_path / "sess_stream")
    # user 1: two events 10 min apart, then (wave 2) one 2 h later → the
    # first session closes on the in-stream gap. user 2: one event only.
    _write_events(src, "w1.parquet", [
        (1, "2026-01-01 10:00:00", 1, "click", 1.0, ""),
        (2, "2026-01-01 10:10:00", 1, "click", 1.0, ""),
        (3, "2026-01-01 10:05:00", 2, "view", 1.0, ""),
    ])
    q = run_sessionize_to_memory(spark, src, query_name="sess_t",
                                 gap_s=1800, watermark="10 minutes")
    try:
        q.processAllAvailable()
        _write_events(src, "w2.parquet", [
            (4, "2026-01-01 12:10:00", 1, "click", 1.0, ""),
            # far-future event drives the watermark past every timeout
            (5, "2026-01-01 23:00:00", 3, "view", 1.0, ""),
        ])
        q.processAllAvailable()
        _write_events(src, "w3.parquet", [
            (6, "2026-01-02 12:00:00", 3, "view", 1.0, ""),
        ])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted((int(r["user_id"]), int(r["duration_s"]), int(r["n_events"]))
                  for r in spark.sql("SELECT * FROM sess_t").collect())
    # user1 session1: 10:00-10:10 (600s, 2 events); user1 session2: the
    # 12:10 single; user2: single event session — all closed by timeouts
    assert (1, 600, 2) in rows
    assert (1, 0, 1) in rows
    assert (2, 0, 1) in rows


def test_sessionize_watermark_clamp_and_stragglers(spark, tmp_path):
    """(a) a timeout landing below the advanced watermark must be clamped,
    not crash the query (backlog-drain edge); (b) an in-gap straggler from
    a later batch extends the session START backwards like the batch twin."""
    from lucene_spark.streaming.sessions import run_sessionize_to_memory

    src = str(tmp_path / "sess_clamp")
    _write_events(src, "w1.parquet", [
        (1, "2026-01-01 12:00:00", 9, "view", 1.0, ""),
    ])
    q = run_sessionize_to_memory(spark, src, query_name="sess_c",
                                 gap_s=1800, watermark="30 minutes")
    try:
        q.processAllAvailable()
        # u8's event is above the previous watermark (11:30) but u9's 13:00
        # pushes the CURRENT watermark to 12:30 — u8's natural timeout
        # (11:35 + 30min = 12:05) is below it and must be clamped.
        # u9's 11:40 straggler falls within the gap BEFORE its open session
        # (12:00) and must extend the session start backwards.
        _write_events(src, "w2.parquet", [
            (2, "2026-01-01 11:35:00", 8, "click", 1.0, ""),
            (3, "2026-01-01 11:40:00", 9, "view", 1.0, ""),
            (4, "2026-01-01 13:00:00", 9, "view", 1.0, ""),
        ])
        q.processAllAvailable()
        _write_events(src, "w3.parquet", [
            (5, "2026-01-02 12:00:00", 7, "view", 1.0, ""),
        ])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM sess_c").collect()
    by_user: dict[int, set] = {}
    for r in rows:
        by_user.setdefault(int(r["user_id"]), set()).add(
            (int(r["duration_s"]), int(r["n_events"])))
    assert by_user[8] == {(0, 1)}  # survived the clamp, flushed by timeout
    # u9: the 11:40 straggler extends the 12:00 session BACKWARDS
    # (duration 20 min, 2 events); 13:00 is past the gap → its own session
    assert by_user[9] == {(1200, 2), (0, 1)}


def test_sessionize_null_user_and_ts(spark, tmp_path):
    """Crawled event logs carry null user ids and null event times. The
    stateful sessionizer used to fail the whole stage on int(NaN) for a
    null-user group; the pinned contract (same as the batch twin): null
    user_id is a REAL session group, null ts carries no session
    information (dropped)."""
    import pandas as pd

    from lucene_spark.streaming.sessions import run_sessionize_to_memory

    src = str(tmp_path / "sess_nulls")
    os.makedirs(src)
    rows = [
        (1, "2026-01-01 10:00:00", None, "click", 1.0, ""),
        (2, "2026-01-01 10:05:00", None, "click", 1.0, ""),
        (3, None, 1, "view", 1.0, ""),                 # no ts → no session
        (4, "2026-01-01 10:03:00", 1, "view", 1.0, ""),
        # far-future event drives the watermark past every timeout
        (5, "2026-01-01 23:00:00", 2, "view", 1.0, ""),
        (6, "2026-01-02 23:00:00", 2, "view", 1.0, ""),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(src, "w1.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    q = run_sessionize_to_memory(spark, src, query_name="sess_nulls",
                                 gap_s=1800, watermark="10 minutes")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(None if r["user_id"] is None else int(r["user_id"]),
            int(r["duration_s"]), int(r["n_events"]))
           for r in spark.sql("SELECT * FROM sess_nulls").collect()
           if r["user_id"] is None or int(r["user_id"]) < 2}
    # null-user pair = one 300s session; user 1 = one single-event session
    # (the null-ts event contributed nothing)
    assert got == {(None, 300, 2), (1, 0, 1)}
