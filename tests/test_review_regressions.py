"""Regression tests for the round-1 code-review findings:

1. exact-phrase kernel with a leading query-position hole (qpos[0] > 0)
   must not shift matches into the previous docid
2. MaxScore pruning must not leak into nested contexts (must_not /
   Boosting context / ConstantScore over a disjunction)
3. expunge_deletes on an index built with store_positions=False
4. _dl_map first-found-wins rule for mixed-field span trees
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_spark.indexing import IndexReader, build_index, merge_index
from lucene_spark.oracle import oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.ast import Bool, Boosting, ConstantScore, Phrase, Term
from lucene_spark.queries.kernel import _exact_phrase_freqs
from lucene_spark.queries.planner import Searcher

K = 10


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return Searcher(IndexReader(spark, index_dir))


def topk(searcher, q, k=K):
    return [(int(r["docid"]), float(r["score"]))
            for r in searcher.search(q, k=k).collect()]


def assert_rank_identical(spark_hits, oracle_hits):
    assert [d for d, _ in spark_hits] == [d for d, _ in oracle_hits]
    for (d1, s1), (_d2, s2) in zip(spark_hits, oracle_hits):
        assert math.isclose(s1, s2, rel_tol=1e-9), (d1, s1, s2)


# --- 1. leading-hole phrase ------------------------------------------------

def test_exact_phrase_negative_offset_unit():
    """A match at doc start with qpos=[1,2] must stay in ITS doc (the
    packed-key floor division previously bucketed it into docid-1)."""
    per_term = [
        (np.array([7], dtype=np.int64), np.array([1], dtype=np.int64),
         np.array([0], dtype=np.int64)),
        (np.array([7], dtype=np.int64), np.array([1], dtype=np.int64),
         np.array([1], dtype=np.int64)),
    ]
    docs, freqs = _exact_phrase_freqs(per_term, [1, 2])
    assert docs.tolist() == [7]
    assert freqs.tolist() == [1.0]


def test_leading_stopword_hole_phrase(searcher, oracle_index):
    """Phrase with a position hole at slot 0 (e.g. parsed '"the one
    hundred"' under the standard analyzer) — rank identity."""
    q = Phrase(["one", "hundred"], positions=[1, 2])
    assert_rank_identical(topk(searcher, q), oracle_search(oracle_index, q, K))
    # and it matches exactly what the hole-free phrase matches (equal gaps)
    q0 = Phrase(["one", "hundred"], positions=[0, 1])
    assert topk(searcher, q) == topk(searcher, q0)


# --- 2. pruning must not leak into nested contexts -------------------------

NESTED_DISJUNCTION_CASES = [
    # big common-term disjunction in must_not: every matching doc must be
    # excluded, not just the disjunction's own top-k
    Bool(must=[Term("seven")],
         must_not=[Bool(should=[Term("one"), Term("two"), Term("three"),
                                Term("hundred")])]),
    # Boosting context: ALL context matches demote
    Boosting(Term("seven"),
             Bool(should=[Term("one"), Term("two"), Term("hundred")]),
             demote=0.25),
    # ConstantScore over a disjunction: the full match set scores 1
    ConstantScore(Bool(should=[Term("one"), Term("two"), Term("hundred")]),
                  boost=1.0),
    # min_should over common terms
    Bool(should=[Term("one"), Term("two"), Term("hundred"), Term("seven")],
         min_should=3),
]


@pytest.mark.parametrize("q", NESTED_DISJUNCTION_CASES,
                         ids=["mustnot", "boost-ctx", "constscore", "minshould"])
@pytest.mark.parametrize("k", [1, 3])
def test_nested_disjunction_exactness(searcher, oracle_index, q, k):
    """k small so top-level theta engages early — nested disjunctions must
    still evaluate their COMPLETE match sets."""
    assert_rank_identical(topk(searcher, q, k=k),
                          oracle_search(oracle_index, q, k))


# --- 3. expunge without positions ------------------------------------------

def test_expunge_without_positions(spark, tmp_path_factory):
    from lucene_spark.indexing.deletes import delete_by_query, expunge_deletes

    src = tmp_path_factory.mktemp("npsrc")
    pdf = pd.DataFrame({
        "url": [str(i) for i in range(40)],
        "text": [f"alpha beta doc{i} {'drop' if i % 4 == 0 else 'keep'}"
                 for i in range(40)],
        "lang": ["en"] * 40,
    })
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(src / "p.parquet"))
    out = str(tmp_path_factory.mktemp("npidx"))
    build_index(spark, str(src), out, analyzer="whitespace",
                target_docs_per_seg=20, store_positions=False)
    merge_index(spark, out)
    n = delete_by_query(spark, out, "drop")
    assert n == 10
    res = expunge_deletes(spark, out)
    assert res["expunged"] == 10
    s = Searcher(IndexReader(spark, out))
    assert s.count("drop") == 0
    assert s.count("keep") == 30


# --- 4. mixed-field dl rule -------------------------------------------------

def test_mixed_field_span_or_dl_rule(spark, tmp_path_factory):
    from lucene_spark.oracle import build_oracle_index
    from lucene_spark.queries.ast import SpanOr, SpanTerm

    rows = []
    for i in range(60):
        body = " ".join(["w%d" % (j % 9) for j in range(i % 7 + 4)])
        body += " shared" if i % 2 else ""
        title = "shared note" if i % 3 == 0 else "other"
        rows.append((str(i), body, title, "en"))
    src = tmp_path_factory.mktemp("mixsrc")
    pdf = pd.DataFrame(rows, columns=["url", "text", "title", "lang"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(src / "p.parquet"))
    out = str(tmp_path_factory.mktemp("mixidx"))
    build_index(spark, str(src), out, analyzer="whitespace",
                target_docs_per_seg=60, analyzed_fields=("title",))
    merge_index(spark, out)
    oracle = build_oracle_index(
        [(i, r[1]) for i, r in enumerate(rows)],
        extra_fields={"title": {i: r[2] for i, r in enumerate(rows)}})
    s = Searcher(IndexReader(spark, out))
    # docs matching only the body term take the body dl; docs with the
    # title term take the title dl (first-found-wins, title term first)
    q = SpanOr([SpanTerm("title:shared"), SpanTerm("shared")])
    assert_rank_identical(topk(s, q), oracle_search(oracle, q, K))


# --- second review batch -----------------------------------------------------

def test_repeated_term_sloppy_phrase_unit():
    """One token occurrence cannot fill two slots of "foo foo"~1; two
    occurrences within the window still match."""
    from lucene_spark.scoring import phrase_freq

    one = np.array([5], dtype=np.int64)
    assert phrase_freq([one, one], [0, 1], 1) == 0.0
    two = np.array([5, 7], dtype=np.int64)
    assert phrase_freq([two, two], [0, 1], 1) == pytest.approx(0.5)
    # generic 3-slot path: 'a b a'~2 on doc with a@0 b@1 only — no second a
    a = np.array([0], dtype=np.int64)
    b = np.array([1], dtype=np.int64)
    assert phrase_freq([a, b, a], [0, 1, 2], 2) == 0.0


def test_repeated_term_sloppy_rank_identity(searcher, oracle_index):
    q = parse_query('"one one"~2')
    assert_rank_identical(topk(searcher, q), oracle_search(oracle_index, q, K))


def test_vbyte_decode_truncated_and_empty():
    from lucene_spark.codec import vbyte_decode, vbyte_encode

    vals, end = vbyte_decode(b"\x81\x82", 0, None)  # no terminator byte
    assert vals.size == 0 and end == 0
    vals, end = vbyte_decode(vbyte_encode(np.array([7], dtype=np.uint64)), 0, 0)
    assert vals.size == 0


def test_prefix_does_not_sweep_namespaced_terms(spark, tmp_path_factory):
    """Default-field multiterm expansion must skip 'field:term' entries —
    keyword url terms have df=1 and would otherwise dominate."""
    src = tmp_path_factory.mktemp("nssrc")
    pdf = pd.DataFrame({
        "url": [f"u{i}" for i in range(30)],
        "text": [f"alpha umbrella{i % 3} beta" for i in range(30)],
        "lang": ["en"] * 30,
    })
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(src / "p.parquet"))
    out = str(tmp_path_factory.mktemp("nsidx"))
    build_index(spark, str(src), out, analyzer="whitespace",
                target_docs_per_seg=30, keyword_fields=("url", "lang"))
    merge_index(spark, out)
    s = Searcher(IndexReader(spark, out))
    # 'u*' must expand to umbrella0/1/2 only, never the url: keyword terms
    expanded = s.rewrite(parse_query("u*"))
    terms = {c.term for c in expanded.should}
    assert terms == {"umbrella0", "umbrella1", "umbrella2"}
    hits = topk(s, "u*", k=30)
    assert len(hits) == 30  # every doc has an umbrella token


def test_compact_preserves_tombstones_and_resume(spark, tmp_path_factory):
    """Compacting segments must carry pending tombstones into the merged
    segment, and a resumed build must NOT re-create absorbed segments."""
    from lucene_spark.indexing.deletes import delete_by_query
    from lucene_spark.indexing.merge import compact_segments

    src = tmp_path_factory.mktemp("cpsrc")
    for k, (lo, hi) in enumerate(((0, 20), (20, 40))):
        pdf = pd.DataFrame({
            "url": [str(i) for i in range(lo, hi)],
            "text": [f"alpha token{i} {'zap' if i == 30 else 'keep'}"
                     for i in range(lo, hi)],
            "lang": ["en"] * (hi - lo),
        })
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       str(src / f"part-{k:04d}.parquet"))
    out = str(tmp_path_factory.mktemp("cpidx"))
    build_index(spark, str(src), out, analyzer="whitespace",
                target_docs_per_seg=20)
    merge_index(spark, out)
    s = Searcher(IndexReader(spark, out))
    assert delete_by_query(spark, out, "zap") == 1  # doc 30 lives in seg 1
    assert s.count("zap") == 0
    compact_segments(spark, out, [0, 1])
    s2 = Searcher(IndexReader(spark, out))
    assert s2.count("zap") == 0, "tombstone lost during compaction"
    assert s2.count("alpha") == 39
    # resumed build: every input file is still accounted for
    summary = build_index(spark, str(src), out, analyzer="whitespace",
                          target_docs_per_seg=20, resume=True)
    assert summary["built"] == 0 and summary["skipped"] == 2


def test_fresh_rebuild_clears_stale_segments(spark, tmp_path_factory):
    from lucene_spark.indexing import validate_index

    src = tmp_path_factory.mktemp("frsrc")
    pdf = pd.DataFrame({
        "url": [str(i) for i in range(40)],
        "text": [f"alpha w{i}" for i in range(40)],
        "lang": ["en"] * 40,
    })
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(src / "p.parquet"))
    out = str(tmp_path_factory.mktemp("fridx"))
    build_index(spark, str(src), out, analyzer="whitespace",
                target_docs_per_seg=10)  # 4 segments
    merge_index(spark, out)
    build_index(spark, str(src), out, analyzer="whitespace",
                target_docs_per_seg=40, resume=False)  # 1 segment
    merge_index(spark, out)
    r = IndexReader(spark, out)
    assert r.N == 40
    assert Searcher(r).count("alpha") == 40  # not 80
    assert validate_index(spark, out)["ok"]


# --- third review batch: parser + analyzer ----------------------------------

def test_parenthesized_groups_stay_nested():
    q = parse_query("(one AND two) OR (three AND seven)")
    assert isinstance(q, Bool)
    assert not q.must and len(q.should) == 2
    g1, g2 = q.should
    assert [t.term for t in g1.must] == ["one", "two"]
    assert [t.term for t in g2.must] == ["three", "seven"]
    # bare +/- runs still fold flat (Lucene flat clause parse)
    q2 = parse_query("one OR seven -hundred")
    assert [t.term for t in q2.must_not] == ["hundred"]
    # x OR (y -z): the group keeps its own negation scope
    q3 = parse_query("one OR (seven -hundred)")
    assert not q3.must_not
    assert [t.term for t in q3.should[1].must_not] == ["hundred"]


def test_intra_word_hyphen_not_negation():
    q = parse_query("wi-fi")
    assert isinstance(q, Phrase)
    assert q.phrase_terms == ["wi", "fi"]
    q2 = parse_query("one -seven")  # leading '-' is still the operator
    assert [t.term for t in q2.must_not] == ["seven"]


def test_quoted_phrase_boost():
    q = parse_query('"one hundred"^2')
    assert isinstance(q, Phrase) and q.boost == 2.0
    q2 = parse_query('"one hundred"~1^3')
    assert q2.slop == 1 and q2.boost == 3.0


def test_field_scoped_multiterm_syntax():
    from lucene_spark.queries.ast import Fuzzy, Prefix, Wildcard

    q = parse_query("title:doc*", analyzed_fields=("title",))
    assert q == Prefix("title:doc")
    q = parse_query("title:d?c", analyzed_fields=("title",))
    assert q == Wildcard("title:d?c")
    q = parse_query("title:docs~1", analyzed_fields=("title",))
    assert q == Fuzzy("title:docs", max_edits=1)
    q = parse_query("url:http*")  # keyword wildcard → constant-score
    assert isinstance(q, ConstantScore) and isinstance(q.query, Wildcard)


def test_overlong_token_leaves_position_hole():
    from lucene_spark.analysis import analyze

    pairs = analyze("foo " + "x" * 300 + " bar")
    assert pairs == [("foo", 0), ("bar", 2)]


def test_multifield_open_range_stays_in_namespace():
    from lucene_spark.queries.parser import _expand_fields
    from lucene_spark.queries.ast import TermRange

    q = _expand_fields(TermRange(None, "five"), ("text", "title"))
    text_r, title_r = q.should
    assert text_r.lo is None and text_r.hi == "five"
    assert title_r.lo == "title:" and title_r.hi == "title:five"


def test_rank_identity_still_holds_after_parser_changes(searcher, oracle_index):
    for qs in ["(one AND two) OR (three AND seven)",
               '"one hundred"^2',
               "one OR (seven -hundred)"]:
        q = parse_query(qs)
        assert_rank_identical(topk(searcher, q),
                              oracle_search(oracle_index, q, K))


# --------------------------------------------------------------------- #
# round-2 self-review fixes
# --------------------------------------------------------------------- #


def test_const_filter_uncapped_vs_capped_boolean_oracle():
    """Top-level constant-score-filter expands UNCAPPED (the engine plans
    it as a pushed-down predicate with no enumeration); the scoring
    boolean rewrite stays capped at 1024 in term order. Dictionary is
    built so term order is INVERSE to docid order — a silent cap would
    surface as the wrong docids in the filter top-k."""
    from lucene_spark.oracle import build_oracle_index
    from lucene_spark.queries.ast import REWRITE_CONST_FILTER, Prefix

    n = 1500
    docs = [(i, f"za{n - i:04d} filler") for i in range(n)]
    idx = build_oracle_index(docs, analyzer="whitespace")
    # uncapped filter: every doc matches → top-10 by docid asc = 0..9
    hits = oracle_search(idx, ConstantScore(Prefix("za")), k=10)
    assert [d for d, _s in hits] == list(range(10))
    assert all(s == 1.0 for _d, s in hits)
    hits2 = oracle_search(
        idx, Prefix("za", rewrite_method=REWRITE_CONST_FILTER), k=10)
    assert [d for d, _s in hits2] == list(range(10))
    # capped boolean rewrite: only the first 1024 terms in TERM order
    # (za0001..za1024 ↔ docids 476..1499) can match
    from lucene_spark.oracle import expand_multiterm
    capped = expand_multiterm(idx.terms_sorted, Prefix("za"))
    assert len(capped) == 1024
    uncapped = expand_multiterm(idx.terms_sorted, Prefix("za"),
                                max_clauses=None)
    assert len(uncapped) == n


def test_const_filter_consistent_across_apis(searcher):
    """search / matching / count / search_many must agree on a top-level
    constant-score-filter query (all take the same uncapped pushdown)."""
    from lucene_spark.queries.ast import REWRITE_CONST_FILTER, Prefix

    q = Prefix("seven", rewrite_method=REWRITE_CONST_FILTER)
    top = [(int(r["docid"]), float(r["score"]))
           for r in searcher.search(q, k=10).collect()]
    all_ids = sorted(int(r["docid"]) for r in searcher.matching(q).collect())
    assert [d for d, _s in top] == all_ids[:10]
    assert searcher.count(q) == len(all_ids)
    batch = searcher.search_many({"f": q}, k=10).collect()
    assert [(int(r["docid"]), float(r["score"])) for r in batch] == top


def test_manifest_config_tolerates_pre_upgrade_manifests(tmp_path):
    """An old index (manifests without field_analyzers) appended to by new
    code must still pass config validation, in either manifest order."""
    import json as _json
    import os as _os

    from lucene_spark.indexing.build import read_manifest_config

    base = {"analyzer": "whitespace", "analyzed_fields": [],
            "keyword_fields": ["lang", "url"], "store_positions": True,
            "block_size": 128, "status": "committed"}
    mdir = tmp_path / "manifests"
    mdir.mkdir()
    old = dict(base)  # pre-upgrade: no field_analyzers key
    new = dict(base, field_analyzers={})
    for order, (a, b) in enumerate(((old, new), (new, old))):
        for p in mdir.glob("*.json"):
            _os.remove(p)
        (mdir / "seg_000000.json").write_text(_json.dumps(a))
        (mdir / "seg_000001.json").write_text(_json.dumps(b))
        cfg = read_manifest_config(str(tmp_path))
        assert cfg["field_analyzers"] == {}, order


def test_compact_updates_destination_manifest_docs(spark, tmp_path_factory):
    """compact_segments must re-level the DESTINATION manifest (docs =
    group total): find_merges levels by manifest docs, and a stale
    per-source count would re-merge the big destination with every fresh
    small batch (LogMergePolicy.java:41 cascade)."""
    import json as _json
    import os as _os

    from lucene_spark.indexing.merge import compact_segments
    from tests.conftest import write_pages_files

    d = str(tmp_path_factory.mktemp("pages_cmp"))
    out = str(tmp_path_factory.mktemp("idx_cmp"))
    write_pages_files(d, 120, 4)
    build_index(spark, d, out, target_docs_per_seg=30)
    merge_index(spark, out)
    dest = compact_segments(spark, out, [0, 1, 2])
    with open(_os.path.join(out, "manifests", f"seg_{dest:06d}.json")) as f:
        m = _json.load(f)
    assert m["docs"] == 90
    assert m["merged_from"] == [0, 1, 2]
    assert m["docid_range"] == [0, 89]


def test_multimodal_truncated_raises_valueerror():
    from lucene_spark.multimodal import build_jpeg, build_png, decode_meta

    for blob in (build_png(10, 10)[:20], build_jpeg(8, 8)[:6]):
        with pytest.raises(ValueError):
            decode_meta(blob)


def test_unknown_field_matches_nothing(searcher, oracle_index):
    """Schema-free field semantics (reference QueryParser): an unindexed
    field name yields a field-scoped query that matches nothing — never a
    silent fallback to the default field."""
    for qs in ['author:"one hundred"', "author:one", "author:on*",
               "author:one~1"]:
        q = searcher.parse(qs)
        assert searcher.search(q, k=5).count() == 0, qs
        assert oracle_search(oracle_index, q, 5) == [], qs
