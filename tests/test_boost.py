"""Index-time document boost (document/Document.java:88 setBoost folded
into the norms byte, index/NormsWriter.java:61 via util/SmallFloat
.floatToByte315): build_index(boost_col=...) must make a boosted doc
outrank an unboosted twin, rank- and score-identical to the oracle, with
the boost surviving quantization, MaxScore pruning, and compaction."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.indexing import IndexReader, build_index, merge_index  # noqa: E402
from lucene_spark.oracle import build_oracle_index, oracle_search  # noqa: E402
from lucene_spark.queries.planner import Searcher  # noqa: E402
from lucene_spark.scoring import byte315_to_float, float_to_byte315  # noqa: E402

from conftest import write_pages_files  # noqa: E402


def _boost_of(i: int) -> float:
    # mixed exact (2.0, 0.5) and non-representable (1.7 → quantized) values
    return {0: 2.0, 1: 0.5, 2: 1.7}.get(i % 5, 1.0)


@pytest.fixture(scope="module")
def boosted(spark, tmp_path_factory):
    """120 fixture pages with a per-doc `boost` column, 2 segments."""
    from lucene_spark.fixtures import pages_pdf

    pages = str(tmp_path_factory.mktemp("boost_pages"))
    os.makedirs(pages, exist_ok=True)
    texts: list[str] = []
    for k, lo in enumerate((0, 60)):  # two files → two segments
        pdf = pages_pdf(60, start=lo)
        pdf["boost"] = [_boost_of(lo + i) for i in range(len(pdf))]
        texts.extend(pdf["text"])
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(pages, f"part-{k:04d}.parquet"),
                       coerce_timestamps="us", allow_truncated_timestamps=True)
    out = str(tmp_path_factory.mktemp("boost_index"))
    build_index(spark, pages, out, target_docs_per_seg=60, boost_col="boost")
    merge_index(spark, out)
    oracle = build_oracle_index(
        list(enumerate(texts)),
        boosts={i: _boost_of(i) for i in range(len(texts))})
    return out, oracle


def _top(spark, idx_dir, q, k=10):
    s = Searcher(IndexReader(spark, idx_dir))
    return [(r["docid"], round(r["score"], 9))
            for r in s.search(q, k=k).collect()]


QUERIES = [
    "seven",                       # term (boosted docs rescored)
    "seven forty ninety",          # pure OR — the MaxScore pruning path
    "seven AND forty",             # MUST leapfrog path
    '"seven forty"',               # exact phrase
    "seven -forty",                # must_not
    "fourty~1",                    # fuzzy expansion over the RAM dict
]


@pytest.mark.parametrize("q", QUERIES)
def test_rank_and_score_identity_vs_oracle(spark, boosted, q):
    idx_dir, oracle = boosted
    s = Searcher(IndexReader(spark, idx_dir))
    want = [(d, round(sc, 9))
            for d, sc in oracle_search(oracle, s.parse(q), 10)]
    assert _top(spark, idx_dir, q) == want, q


def test_boosted_doc_outranks_unboosted_twin(spark, tmp_path):
    """Two docs with IDENTICAL text — the boosted one must rank first with
    exactly boost× the twin's score."""
    d = str(tmp_path / "twin_pages")
    os.makedirs(d)
    tbl = pa.table({
        "url": ["u0", "u1", "u2"],
        "text": ["alpha beta gamma", "alpha beta gamma", "delta delta"],
        "lang": ["en", "en", "en"],
        "boost": [1.0, 2.0, 1.0],
    })
    pq.write_table(tbl, os.path.join(d, "part-0000.parquet"))
    out = str(tmp_path / "twin_idx")
    build_index(spark, d, out, target_docs_per_seg=10, boost_col="boost",
                analyzer="whitespace")
    merge_index(spark, out)
    top = _top(spark, out, "alpha", k=2)
    assert [t[0] for t in top] == [1, 0]
    assert top[0][1] == pytest.approx(2.0 * top[1][1], rel=1e-12)


def test_quantization_is_byte315(spark, boosted):
    """Boost 1.7 must score as byte315(1.7)'s decode, not raw 1.7 — the
    engine stores the reference norm byte, and the oracle quantizes
    identically."""
    from lucene_spark.fixtures import pages_pdf

    q17 = float(byte315_to_float(float_to_byte315([1.7]))[0])
    assert q17 != 1.7  # non-representable on 3 mantissa bits
    idx_dir, oracle = boosted
    assert oracle.boost_of(2) == q17
    s = Searcher(IndexReader(spark, idx_dir))
    hits = {r["docid"]: r["score"] for r in s.matching("seven").collect()}
    assert hits
    base = build_oracle_index(list(enumerate(pages_pdf(120)["text"])))
    raw = dict(oracle_search(base, s.parse("seven"), 1 << 30))
    for d, sc in hits.items():
        expect = raw[d] * (q17 if d % 5 == 2 else _boost_of(d))
        assert sc == pytest.approx(expect, rel=1e-12)


def test_constant_score_ignores_boost(spark, boosted):
    """ConstantScoreQuery bypasses norms (reference ConstantScoreQuery) —
    uniform scores regardless of per-doc boost."""
    from lucene_spark.queries.ast import Bool, ConstantScore, Term

    idx_dir, _ = boosted
    s = Searcher(IndexReader(spark, idx_dir))
    q = ConstantScore(Bool(should=[Term("seven")]), boost=0.7)
    rows = s.matching(q).collect()
    assert rows and all(r["score"] == pytest.approx(0.7) for r in rows)


def test_boost_survives_compaction(spark, boosted):
    import shutil

    from lucene_spark.indexing.merge import compact_segments

    idx_dir, oracle = boosted
    clone = idx_dir + "_compact"
    shutil.rmtree(clone, ignore_errors=True)
    shutil.copytree(idx_dir, clone)
    compact_segments(spark, clone, [0, 1])
    merge_index(spark, clone)
    for q in ("seven", "seven forty ninety"):
        assert _top(spark, clone, q) == _top(spark, idx_dir, q), q


def test_fresh_rebuild_clears_stale_norms(spark, tmp_path):
    """Rebuilding an out_dir WITHOUT boost_col must not union the previous
    build's norms side-car into queries (regression: the fresh-build clear
    list skipped norms/ — stale byte315 boosts silently multiplied into
    the NEW index's scores at colliding (seg, docid)). Same for spellgrams
    and commit generations pinning the vanished segment set."""
    src = str(tmp_path / "src")
    write_pages_files(src, 20, 1)
    out = str(tmp_path / "idx")
    import pandas as pd

    from lucene_spark.fixtures import pages_pdf

    pdf = pages_pdf(20)
    pdf["w"] = [4.0] * 20  # every doc heavily boosted
    p2 = str(tmp_path / "srcb")
    os.makedirs(p2)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(p2, "part.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    build_index(spark, p2, out, target_docs_per_seg=10, boost_col="w")
    merge_index(spark, out)
    assert os.path.isdir(os.path.join(out, "norms"))

    # fresh rebuild over the same dir, no boosts: scores must equal a
    # clean-dir build's exactly
    build_index(spark, src, out, target_docs_per_seg=10, resume=False)
    merge_index(spark, out)
    assert not os.path.isdir(os.path.join(out, "norms"))
    clean = str(tmp_path / "clean")
    build_index(spark, src, clean, target_docs_per_seg=10)
    merge_index(spark, clean)
    got = [(int(r["docid"]), round(float(r["score"]), 9))
           for r in Searcher(IndexReader(spark, out)).search("seven", k=10)
           .collect()]
    want = [(int(r["docid"]), round(float(r["score"]), 9))
            for r in Searcher(IndexReader(spark, clean)).search("seven", k=10)
            .collect()]
    assert got == want
