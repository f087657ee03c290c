"""Streaming minhash-LSH near-dup detection: per-row signature projection
must be value-identical to the batch aggregation; detections must equal a
reference banding of the same signatures (incl. across micro-batches);
TTL eviction bounds state (a bucket forgets after event time passes)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tests.test_streaming_dedup import _write_pages

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
OTHER = "one two three four five six seven eight nine ten"


def _reference_pairs(signed_rows):
    """Banding + estimate over collected (url, ts, mh0..mh7) rows — the
    batch op's candidate+prefilter math in plain Python (md5 band hashing
    is injective enough here to use the component PAIR as the bucket)."""
    from lucene_spark.streaming.neardup import EST_MIN, N_BANDS, N_MINHASH

    rows = sorted(signed_rows, key=lambda r: (r["warc_ts"], r["url"]))
    pairs = set()
    for b in range(N_BANDS):
        buckets = {}
        for r in rows:
            buckets.setdefault((r[f"mh{2*b}"], r[f"mh{2*b+1}"]),
                               []).append(r)
        for members in buckets.values():
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    nm = sum(members[i][f"mh{k}"] == members[j][f"mh{k}"]
                             for k in range(N_MINHASH))
                    if nm >= EST_MIN:
                        pairs.add((members[i]["url"], members[j]["url"]))
    return pairs


def test_sig_parity_with_batch(spark, tmp_path):
    """The streaming per-row signature projection produces the exact
    component values of the batch `_minhash_sigs` aggregation."""
    import __spark_entry__ as entrymod
    from lucene_spark.streaming.neardup import N_MINHASH, signed_pages

    texts = [BASE, NEAR, OTHER, "short doc here", "alpha beta gamma"]
    sf = str(tmp_path / "sfdir")
    os.makedirs(sf, exist_ok=True)
    pdf = pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts, "lang": "en",
        "source": "s", "n_chars": [len(t) for t in texts]})
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(sf, "documents.parquet"))
    batch = {r["doc_id"]: [r[f"mh{j}"] for j in range(N_MINHASH)]
             for r in entrymod._minhash_sigs(spark, sf).collect()}

    src = str(tmp_path / "pages_sig")
    _write_pages(src, "w.parquet",
                 [(str(i), "2026-01-01 10:00:00", t)
                  for i, t in enumerate(texts)])
    stream = {int(r["url"]): [r[f"mh{j}"] for j in range(N_MINHASH)]
              for r in signed_pages(spark.read.parquet(src)).collect()}
    assert batch == stream  # same docs survive, same 8 components each


def test_streaming_detections_match_reference(spark, tmp_path):
    """Detections across micro-batches equal the reference banding of the
    same signatures; the exact dup (8/8) is always caught, and `dup_of`
    is the earlier page."""
    from lucene_spark.streaming.neardup import (run_neardup_to_memory,
                                                signed_pages)

    src = str(tmp_path / "pages_nd")
    _write_pages(src, "w1.parquet", [
        ("u1", "2026-01-01 10:00:00", BASE),
        ("u2", "2026-01-01 10:01:00", OTHER),
    ])
    q = run_neardup_to_memory(spark, src, query_name="nd_m",
                              watermark="1 minute")
    try:
        q.processAllAvailable()
        _write_pages(src, "w2.parquet", [
            ("u3", "2026-01-01 10:02:00", BASE),   # exact dup of u1
            ("u4", "2026-01-01 10:03:00", NEAR),   # near dup of u1/u3
            ("u5", "2026-01-01 10:04:00", "unrelated text entirely new"),
        ])
        q.processAllAvailable()
        got_rows = spark.sql("SELECT * FROM nd_m").collect()
    finally:
        q.stop()

    got = {(r["dup_of"], r["url"]) for r in got_rows}
    exp = _reference_pairs(
        [r.asDict() for r in
         signed_pages(spark.read.parquet(src)).collect()])
    assert got == exp
    assert ("u1", "u3") in got          # exact dup detected cross-batch
    # every detection is oriented earlier <- later (event-time order)
    order = {"u1": 0, "u2": 1, "u3": 2, "u4": 3, "u5": 4}
    assert all(order[a] < order[b] for a, b in got)
    # the exact dup matched on all 8 components in every emitting band
    assert {r["n_match"] for r in got_rows
            if (r["dup_of"], r["url"]) == ("u1", "u3")} == {8}


def test_params_match_batch():
    """Drift guard: the streaming module's minhash/LSH constants and hash
    expression are the batch op's — a change on one side without the other
    breaks the 'same math end to end' contract this test pins."""
    import __spark_entry__ as entrymod
    from lucene_spark.streaming import neardup as nd

    assert nd.N_MINHASH == entrymod._N_MINHASH
    assert nd.EST_MIN == entrymod._MH_EST_MIN
    assert nd.BUCKET_CAP == entrymod._LSH_BAND_CAP
    probe = "concat('0', '|', s)"
    assert (nd._H60.format(s=probe)
            == f"cast({entrymod._H15.format(s=probe)} as bigint)")


def test_late_arrival_orientation(spark, tmp_path):
    """A LATE page (earlier warc_ts, arriving in a later micro-batch inside
    the watermark) must come out as dup_of, not url — event-time
    orientation, not arrival order."""
    from lucene_spark.streaming.neardup import run_neardup_to_memory

    src = str(tmp_path / "pages_late")
    _write_pages(src, "w1.parquet", [
        ("late_of", "2026-01-01 10:10:00", BASE),  # later EVENT time, first
    ])
    q = run_neardup_to_memory(spark, src, query_name="nd_l",
                              watermark="30 minutes")
    try:
        q.processAllAvailable()
        _write_pages(src, "w2.parquet", [
            # earlier event time, arrives second (inside the watermark)
            ("early", "2026-01-01 10:00:00", BASE),
        ])
        q.processAllAvailable()
        got = {(r["dup_of"], r["url"])
               for r in spark.sql("SELECT * FROM nd_l").collect()}
    finally:
        q.stop()
    assert got == {("early", "late_of")}


def test_ttl_evicts_buckets(spark, tmp_path):
    """After event time passes last-seen + TTL the bucket is forgotten: the
    same text re-arriving is NOT flagged against the pre-eviction copy,
    then a further copy IS flagged against the post-eviction one."""
    from lucene_spark.streaming.neardup import run_neardup_to_memory

    src = str(tmp_path / "pages_ttl")
    _write_pages(src, "w1.parquet", [
        ("u1", "2026-01-01 10:00:00", BASE),
    ])
    q = run_neardup_to_memory(spark, src, query_name="nd_t",
                              ttl_s=3_600, watermark="1 minute")
    try:
        q.processAllAvailable()
        # event time jumps 2 days: watermark passes u1's bucket TTL
        _write_pages(src, "w2.parquet", [
            ("u2", "2026-01-03 10:00:00", OTHER),
        ])
        q.processAllAvailable()
        _write_pages(src, "w3.parquet", [
            ("u3", "2026-01-03 10:05:00", BASE),   # u1 evicted: no match
            ("u4", "2026-01-03 10:10:00", BASE),   # matches u3
        ])
        q.processAllAvailable()
        got = {(r["dup_of"], r["url"])
               for r in spark.sql("SELECT * FROM nd_t").collect()}
    finally:
        q.stop()
    assert got == {("u3", "u4")}
