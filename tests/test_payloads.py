"""Payloads — per-position metadata in the postings + payload-scoring
queries (lucene_spark/payloads.py).

Reference surface: contrib/analyzers payloads package
(DelimitedPayloadTokenFilter.java:39-71, NumericPayloadTokenFilter.java:31,
PayloadHelper.java:25-73) and search/payloads
(PayloadTermQuery.java:48-142, PayloadNearQuery.java:54-200,
Min/Max/AveragePayloadFunction). Strategy: byte-golden codec checks, chain
unit tests, then two-engines-one-truth rank identity — the Spark engine
over a payload-built index vs the single-node oracle fed the SAME payload
chain — and lifecycle durability (merge / expunge / append preserve the
payload stream)."""

import math
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_spark.fixtures import page_row
from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.payloads import (
    PAYLOAD_ANALYZERS,
    decode_float,
    decode_int,
    decode_payloads_at,
    decode_payloads_flat,
    encode_float,
    encode_int,
    encode_payloads_blob,
    make_delimited_payload,
    make_numeric_payload,
    make_position_payload,
    payload_doc_score,
    payload_near_matches,
    register_payload_analyzer,
)
from lucene_spark.queries.ast import Bool, PayloadNear, PayloadTerm, SpanNear, SpanTerm, Term
from lucene_spark.queries.planner import Searcher
from lucene_spark.spans import eval_spans

K = 10


# ---------------------------------------------------------------------------
# PayloadHelper codecs — byte goldens vs the Java reference
# ---------------------------------------------------------------------------

def test_encode_float_byte_golden():
    # Float.floatToIntBits(1.5f) = 0x3FC00000, written big-endian
    # (PayloadHelper.java:26-32)
    assert encode_float(1.5) == b"\x3f\xc0\x00\x00"
    assert encode_float(-2.0) == b"\xc0\x00\x00\x00"
    assert decode_float(encode_float(3.25)) == 3.25


def test_encode_int_byte_golden():
    assert encode_int(1) == b"\x00\x00\x00\x01"  # PayloadHelper.java:34-43
    assert encode_int(-1) == b"\xff\xff\xff\xff"
    assert decode_int(encode_int(123456)) == 123456


def test_decode_at_offset():
    buf = b"\x00" * 3 + encode_float(7.5)
    assert decode_float(buf, 3) == 7.5
    assert struct.unpack(">f", buf[3:7])[0] == 7.5


# ---------------------------------------------------------------------------
# payload-producing chains
# ---------------------------------------------------------------------------

def test_delimited_payload_chain():
    fn = make_delimited_payload("whitespace", "|", "float")
    out = fn("the|0.5 quick brown|2 fox|bad")
    # DelimitedPayloadTokenFilter.java:56-70: split at FIRST delimiter,
    # no delimiter → no payload; malformed suffix keeps the full token
    assert out == [("the", 0, 0.5), ("quick", 1, None),
                   ("brown", 2, 2.0), ("fox|bad", 3, None)]


def test_delimited_payload_int_encoder():
    fn = make_delimited_payload("whitespace", "|", "int")
    assert fn("a|3 b|2.5") == [("a", 0, 3.0), ("b|2.5", 1, None)]


def test_delimited_unknown_encoder_rejected():
    with pytest.raises(ValueError):
        make_delimited_payload("whitespace", "|", "base64")


def test_numeric_payload_chain():
    fn = make_numeric_payload("whitespace", 42.0,
                              match=lambda t: t.startswith("b"))
    assert fn("alpha beta") == [("alpha", 0, None), ("beta", 1, 42.0)]


def test_position_payload_chain():
    fn = make_position_payload("whitespace", lambda p: float(p * p))
    assert fn("x y z") == [("x", 0, 0.0), ("y", 1, 1.0), ("z", 2, 4.0)]


# ---------------------------------------------------------------------------
# blob codec
# ---------------------------------------------------------------------------

def test_payload_blob_roundtrip():
    tfs = np.array([2, 1, 3])
    pays = [[1.0, None], None, [5.0, 6.0]]  # doc 2: short list → NaN pad
    blob = encode_payloads_blob(pays, tfs)
    flat = decode_payloads_flat(blob)
    assert flat.size == 6
    assert flat[0] == 1.0 and np.isnan(flat[1])
    assert np.isnan(flat[2])
    assert flat[3] == 5.0 and flat[4] == 6.0 and np.isnan(flat[5])
    per_doc = decode_payloads_at(blob, tfs, np.array([0, 2]))
    assert per_doc[0].tolist()[:1] == [1.0]
    assert per_doc[1][0] == 5.0


def test_payload_blob_empty():
    assert encode_payloads_blob([], np.array([], dtype=np.int64)) == b""
    assert decode_payloads_flat(b"").size == 0


def test_payload_doc_score_rules():
    # no payloads seen → 1 (AveragePayloadFunction.java:36)
    assert payload_doc_score(np.array([], dtype=np.float32), "avg") == 1.0
    nanarr = np.array([np.nan, np.nan], dtype=np.float32)
    assert payload_doc_score(nanarr, "max") == 1.0
    v = np.array([1.0, np.nan, 3.0], dtype=np.float32)
    assert payload_doc_score(v, "avg") == 2.0
    assert payload_doc_score(v, "min") == 1.0
    assert payload_doc_score(v, "max") == 3.0
    with pytest.raises(ValueError):
        payload_doc_score(v, "sum")


# ---------------------------------------------------------------------------
# near matcher ≡ span algebra on width-1 clauses
# ---------------------------------------------------------------------------

def _rand_poslists(rng, n_clauses):
    return [np.unique(rng.integers(0, 30, size=rng.integers(1, 8)))
            for _ in range(n_clauses)]


def test_payload_near_matches_spans_parity():
    """payload_near_matches' (start, end) set must equal the span
    algebra's spans for SpanNear over the same width-1 clauses — the
    PayloadNearQuery-scores-like-SpanNearQuery contract."""
    rng = np.random.default_rng(7)
    for _ in range(300):
        k = int(rng.integers(2, 4))
        plists = _rand_poslists(rng, k)
        slop = int(rng.integers(0, 5))
        in_order = bool(rng.integers(0, 2))
        q = SpanNear([SpanTerm(f"t{i}") for i in range(k)], slop=slop,
                     in_order=in_order)
        spans = eval_spans(
            q, lambda t: {0: plists[int(t[1:])]})
        got = [(s, e) for s, e, _c in
               payload_near_matches(plists, slop, in_order)]
        want = ([tuple(r) for r in spans[0].tolist()] if 0 in spans else [])
        assert got == want, (plists, slop, in_order)


def test_payload_near_matched_positions_ordered():
    # "a b x b" : a@0 chains to earliest b@1; payload positions exact
    m = payload_near_matches([np.array([0]), np.array([1, 3])], 2, True)
    assert m == [(0, 2, [0, 1])]


# ---------------------------------------------------------------------------
# end-to-end: payload index build + query vs oracle
# ---------------------------------------------------------------------------

_VOC = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _pay_text(i: int) -> str:
    """Deterministic delimited-payload body for doc i: Zipf-ish term draw,
    ~2/3 of tokens carry a payload (value varies per slot), occasional
    malformed suffix exercises the keep-token fallback."""
    import random
    rng = random.Random(9000 + i)
    toks = []
    for j in range(20 + i % 13):
        w = _VOC[min(int(rng.random() * rng.random() * len(_VOC)),
                     len(_VOC) - 1)]
        r = rng.random()
        if r < 0.6:
            toks.append(f"{w}|{(j % 7) + 1}")
        elif r < 0.7:
            toks.append(f"{w}|oops")
        else:
            toks.append(w)
    return " ".join(toks)


register_payload_analyzer(
    "test_delim", "whitespace", make_delimited_payload("whitespace", "|"))


@pytest.fixture(scope="module")
def pay_corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("paypages"))
    rows = []
    for i in range(150):
        r = page_row(i)
        r["text"] = _pay_text(i)
        r["html"] = None  # text column is authoritative for this corpus
        rows.append(r)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows),
                                        preserve_index=False),
                   os.path.join(d, "part-0000.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    return d


@pytest.fixture(scope="module")
def pay_index(spark, pay_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("payidx"))
    build_index(spark, pay_corpus, out, payload_analyzer="test_delim",
                target_docs_per_seg=50)
    merge_index(spark, out)
    return out


@pytest.fixture(scope="module")
def pay_searcher(spark, pay_index):
    return Searcher(IndexReader(spark, pay_index))


@pytest.fixture(scope="module")
def pay_oracle():
    fn = PAYLOAD_ANALYZERS["test_delim"][1]
    docs = [(i, _pay_text(i)) for i in range(150)]
    return build_oracle_index(docs, analyzer="whitespace", payload_fn=fn)


def _topk(searcher, q):
    return [(int(r["docid"]), float(r["score"]))
            for r in searcher.search(q, k=K).collect()]


def assert_rank_identical(spark_hits, oracle_hits):
    assert [d for d, _ in spark_hits] == [d for d, _ in oracle_hits]
    for (d1, s1), (_d2, s2) in zip(spark_hits, oracle_hits):
        assert math.isclose(s1, s2, rel_tol=1e-9), (d1, s1, s2)


PAYLOAD_QUERIES = [
    PayloadTerm("alpha", func="avg"),
    PayloadTerm("alpha", func="min"),
    PayloadTerm("beta", func="max"),
    PayloadTerm("theta", func="avg", boost=2.0),
    PayloadTerm("gamma", func="max", include_span_score=False),
    PayloadNear(["alpha", "beta"], slop=2, in_order=True, func="avg"),
    PayloadNear(["alpha", "beta"], slop=3, in_order=False, func="max"),
    PayloadNear(["beta", "gamma", "alpha"], slop=4, in_order=True,
                func="min"),
    PayloadNear(["alpha", "beta"], slop=1, in_order=True, func="avg",
                include_span_score=False),
]


@pytest.mark.parametrize("q", PAYLOAD_QUERIES, ids=lambda q: (
    type(q).__name__ + "_" + q.func +
    ("" if q.include_span_score else "_payonly")))
def test_payload_rank_identity(pay_searcher, pay_oracle, q):
    assert_rank_identical(_topk(pay_searcher, q),
                          oracle_search(pay_oracle, q, K))


def test_payload_inside_bool(pay_searcher, pay_oracle):
    q = Bool(must=[Term("alpha"), PayloadTerm("beta", func="max")])
    assert_rank_identical(_topk(pay_searcher, q),
                          oracle_search(pay_oracle, q, K))


def test_payload_term_no_payload_degrades_to_term(pay_searcher, spark,
                                                  tmp_path_factory,
                                                  pay_corpus):
    """Over a PLAIN index (no payload stream) PayloadTerm scores exactly
    like TermQuery — isPayloadAvailable() false everywhere → docScore 1."""
    out = str(tmp_path_factory.mktemp("plainidx"))
    build_index(spark, pay_corpus, out, analyzer="whitespace",
                target_docs_per_seg=50)
    merge_index(spark, out)
    s = Searcher(IndexReader(spark, out))
    # plain whitespace keeps "alpha|3" intact; plain "alpha" tokens exist
    pt = _topk(s, PayloadTerm("alpha", func="avg"))
    tm = _topk(s, Term("alpha"))
    assert pt == tm


def test_payload_analyzer_recorded(spark, pay_index):
    r = IndexReader(spark, pay_index)
    assert r.payload_analyzer == "test_delim"
    assert r.analyzer == "whitespace"  # base chain drives query analysis


def test_unregistered_payload_analyzer_rejected(spark, pay_corpus,
                                                tmp_path_factory):
    with pytest.raises(ValueError):
        build_index(spark, pay_corpus,
                    str(tmp_path_factory.mktemp("badidx")),
                    payload_analyzer="nope")


# ---------------------------------------------------------------------------
# lifecycle durability: merge / expunge / append keep the payload stream
# ---------------------------------------------------------------------------

def test_payloads_survive_compact(spark, pay_corpus, pay_oracle,
                                  tmp_path_factory):
    from lucene_spark.indexing.merge import compact_segments
    from lucene_spark.indexing.plan import read_build_plan

    out = str(tmp_path_factory.mktemp("payidx_compact"))
    build_index(spark, pay_corpus, out, payload_analyzer="test_delim",
                target_docs_per_seg=30)
    merge_index(spark, out)
    segs = sorted({f.seg for f in read_build_plan(out).files})
    compact_segments(spark, out, segs[:3])
    merge_index(spark, out)
    s = Searcher(IndexReader(spark, out))
    for q in (PayloadTerm("alpha", func="avg"),
              PayloadNear(["alpha", "beta"], slop=2, in_order=True,
                          func="max")):
        assert_rank_identical(_topk(s, q), oracle_search(pay_oracle, q, K))


def test_payloads_survive_expunge(spark, pay_corpus, tmp_path_factory):
    from lucene_spark.indexing.deletes import delete_by_docids, expunge_deletes

    out = str(tmp_path_factory.mktemp("payidx_expunge"))
    build_index(spark, pay_corpus, out, payload_analyzer="test_delim",
                target_docs_per_seg=50)
    merge_index(spark, out)
    s = Searcher(IndexReader(spark, out))
    q = PayloadTerm("alpha", func="avg")
    before = _topk(s, q)
    victim = before[0][0]
    dm = IndexReader(spark, out).docmap()
    delete_by_docids(spark, out,
                     dm.where(dm.docid == victim).select("seg", "docid"))
    expunge_deletes(spark, out)
    merge_index(spark, out)
    s2 = Searcher(IndexReader(spark, out))
    after = _topk(s2, q)
    assert victim not in [d for d, _ in after]
    # the survivors keep their EXACT payload-scored values (idf shifts are
    # not in play: expunge rewrites postings, stats refresh via merge)
    fn = PAYLOAD_ANALYZERS["test_delim"][1]
    docs = [(i, _pay_text(i)) for i in range(150) if i != victim]
    oracle = build_oracle_index(docs, analyzer="whitespace", payload_fn=fn)
    assert_rank_identical(after, oracle_search(oracle, q, K))


def test_payloads_survive_append(spark, pay_corpus, tmp_path_factory):
    """append_to_index re-reads the payload chain from the manifest config
    — an increment indexed later scores payload queries identically to a
    cold build over the union."""
    from lucene_spark.streaming.ingest import append_to_index

    base = str(tmp_path_factory.mktemp("payinc_base"))
    rows = []
    for i in range(100):
        r = page_row(i)
        r["text"] = _pay_text(i)
        r["html"] = None
        rows.append(r)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows),
                                        preserve_index=False),
                   os.path.join(base, "part-0000.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    out = str(tmp_path_factory.mktemp("payinc_idx"))
    build_index(spark, base, out, payload_analyzer="test_delim",
                target_docs_per_seg=50)
    merge_index(spark, out)
    inc = str(tmp_path_factory.mktemp("payinc_inc"))
    rows2 = []
    for i in range(100, 150):
        r = page_row(i)
        r["text"] = _pay_text(i)
        r["html"] = None
        rows2.append(r)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows2),
                                        preserve_index=False),
                   os.path.join(inc, "part-0001.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    append_to_index(spark, inc, out)
    s = Searcher(IndexReader(spark, out))
    fn = PAYLOAD_ANALYZERS["test_delim"][1]
    oracle = build_oracle_index([(i, _pay_text(i)) for i in range(150)],
                                analyzer="whitespace", payload_fn=fn)
    for q in (PayloadTerm("beta", func="max"),
              PayloadNear(["alpha", "beta"], slop=2, in_order=True,
                          func="avg")):
        assert_rank_identical(_topk(s, q), oracle_search(oracle, q, K))


# ---------------------------------------------------------------------------
# PayloadSpanUtil analog: payloads at a query's matched positions
# ---------------------------------------------------------------------------

def test_payload_units_conversion():
    from lucene_spark.payloads import payload_units
    from lucene_spark.queries.ast import (Bool, MultiPhrase, Phrase, Prefix,
                                          SpanNear, SpanNot, SpanOr,
                                          SpanTerm, Term)

    # boolean: prohibited (must_not) clauses skipped, must+should recurse
    u = payload_units(Bool(must=[Term("a")], should=[Phrase(["b", "c"])],
                           must_not=[Term("x")]))
    assert u == [("term", "a"), ("near", [["b"], ["c"]], 0, True)]
    # sloppy phrase: in_order iff slop == 0 (the reference rule)
    assert payload_units(Phrase(["a", "b"], slop=2)) == [
        ("near", [["a"], ["b"]], 2, False)]
    # multiphrase: alternatives grouped per position, gaps fold into slop
    mp = MultiPhrase([["a", "b"], ["c"]], positions=[0, 2])
    assert payload_units(mp) == [("near", [["a", "b"], ["c"]], 1, True)]
    # span near with an or-clause
    sn = SpanNear([SpanTerm("a"), SpanOr([SpanTerm("b"), SpanTerm("c")])],
                  slop=1, in_order=True)
    assert payload_units(sn) == [("near", [["a"], ["b", "c"]], 1, True)]
    # unhandled non-span shapes contribute nothing (reference if-chain)
    assert payload_units(Prefix("ab")) == []
    # unsupported span subtypes raise (documented deviation)
    with pytest.raises(ValueError):
        payload_units(SpanNot(SpanTerm("a"), SpanTerm("b")))


def test_payload_extraction_hand_values():
    from lucene_spark.oracle import oracle_payloads_for_query
    from lucene_spark.queries.ast import Bool, Phrase, Term

    fn = make_delimited_payload("whitespace", "|")
    idx = build_oracle_index(
        [(0, "a|1 b|2 a|3"), (1, "a|9 c b"), (2, "b|5 a|4")],
        analyzer="whitespace", payload_fn=fn)
    # term unit: every 'a' payload per doc
    assert oracle_payloads_for_query(idx, Term("a")) == [
        (0, 1.0), (0, 3.0), (1, 9.0), (2, 4.0)]
    # phrase 'a b': doc0 a@0 b@1 -> payloads 1,2; doc1 a@0 c@1 (no adj b);
    # doc2 b@0 a@1 wrong order
    assert oracle_payloads_for_query(idx, Phrase(["a", "b"])) == [
        (0, 1.0), (0, 2.0)]
    # boolean multiset: term 'b' (NaN-absent at doc1 skipped) + phrase
    got = oracle_payloads_for_query(
        idx, Bool(should=[Term("b"), Phrase(["a", "b"])]))
    assert got == [(0, 1.0), (0, 2.0), (0, 2.0), (2, 5.0)]


PAYX_QUERIES = [
    Term("alpha"),
    Bool(must=[Term("alpha")], should=[Term("beta")],
         must_not=[Term("gamma")]),
    PayloadNear(["alpha", "beta"], slop=2, in_order=True),
    SpanNear([SpanTerm("beta"), SpanTerm("gamma")], slop=1, in_order=False),
]


@pytest.mark.parametrize("q", PAYX_QUERIES, ids=lambda q: type(q).__name__)
def test_payloads_for_query_engine_vs_oracle(pay_searcher, pay_oracle, q):
    from lucene_spark.oracle import oracle_payloads_for_query

    got = [(int(r["docid"]), float(r["payload"]))
           for r in pay_searcher.payloads_for_query(q).collect()]
    assert got == oracle_payloads_for_query(pay_oracle, q)


def test_payloads_for_query_phrase(pay_searcher, pay_oracle):
    from lucene_spark.oracle import oracle_payloads_for_query
    from lucene_spark.queries.ast import Phrase

    q = Phrase(["alpha", "beta"])
    got = [(int(r["docid"]), float(r["payload"]))
           for r in pay_searcher.payloads_for_query(q).collect()]
    want = oracle_payloads_for_query(pay_oracle, q)
    assert got == want and len(want) > 0


def test_explain_full_payload_components(pay_searcher):
    """explain_full decomposes payload queries: kind='payload' rows whose
    freq column carries the PayloadFunction docScore and whose score
    equals the search() score per doc."""
    q = PayloadTerm("alpha", func="avg")
    ex = {int(r["docid"]): r for r in
          pay_searcher.explain_full(q).collect()}
    top = {int(r["docid"]): float(r["score"])
           for r in pay_searcher.search(q, k=5).collect()}
    assert top and set(top) <= set(ex)
    for d, s in top.items():
        r = ex[d]
        assert r["kind"] == "payload" and r["component"].endswith(":avg")
        assert math.isclose(float(r["score"]), s, rel_tol=1e-9)
        assert r["freq"] > 0  # the docScore leg


# ---------------------------------------------------------------------------
# property tests (hypothesis): blob codec alignment invariants
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_pay_val = st.one_of(st.none(), st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=32))


@given(st.lists(st.tuples(
    st.integers(min_value=1, max_value=6),           # tf
    st.lists(_pay_val, max_size=8)), max_size=20))   # payload list (any len)
@settings(max_examples=60, deadline=None)
def test_payload_blob_alignment_property(doc_specs):
    """For ANY tf vector and ANY ragged/short/None payload lists, the blob
    decodes to exactly sum(tf) float32 slots, each doc's slice carries its
    first min(len, tf) values (None → NaN) and NaN-pads the rest — the
    alignment-is-an-invariant contract of encode_payloads_blob."""
    tfs = np.array([tf for tf, _ in doc_specs], dtype=np.int64)
    pays = [pl for _, pl in doc_specs]
    blob = encode_payloads_blob(pays, tfs)
    flat = decode_payloads_flat(blob)
    assert flat.size == int(tfs.sum())
    per_doc = decode_payloads_at(blob, tfs, np.arange(tfs.size)) \
        if tfs.size else []
    for (tf, pl), arr in zip(doc_specs, per_doc):
        assert arr.size == tf
        for j in range(tf):
            want = pl[j] if j < len(pl) else None
            if want is None:
                assert np.isnan(arr[j])
            else:
                assert arr[j] == np.float32(want)
