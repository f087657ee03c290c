"""IndexWriter.addIndexes / contrib IndexMergeTool — rebase-copy merge of
whole foreign indexes (index/IndexWriter.java:3172 addIndexesNoOptimize,
contrib/misc/.../IndexMergeTool.java). Gate: the merged index ranks
identically to the oracle over the concatenated corpus, with each source's
docids shifted by its offset; deletes travel; CheckIndex passes."""

import math

import pyarrow.dataset as ds
import pytest

from conftest import write_pages_files
from lucene_spark.indexing import (IndexReader, IndexWriter, add_indexes,
                                   build_index, merge_index,
                                   merge_indexes_tool, validate_index)
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries.ast import Bool, Phrase, Term
from lucene_spark.queries.planner import Searcher


def _build(spark, pages, out, seg_docs=40):
    build_index(spark, pages, out, target_docs_per_seg=seg_docs,
                store_positions=True)
    merge_index(spark, out)


def _texts(pages_dir):
    return ds.dataset(pages_dir).to_table(columns=["text"])["text"].to_pylist()


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory):
    """dest: 100 pages [0,100) · srcA: 60 pages [300,360) · srcB: 30 pages
    [500,530). Distinct start offsets give distinct texts per index."""
    root = tmp_path_factory.mktemp("addidx")
    dirs = {}
    for name, start, n in (("dest", 0, 100), ("srcA", 300, 60),
                           ("srcB", 500, 30)):
        pages = str(root / f"pages_{name}")
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from lucene_spark.fixtures import pages_pdf
        os.makedirs(pages)
        pdf = pages_pdf(n, start=start)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(pages, "part-0000.parquet"),
                       coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        idx = str(root / f"idx_{name}")
        _build(spark, pages, idx)
        dirs[name] = (pages, idx)
    report = add_indexes(spark, dirs["dest"][1],
                         [dirs["srcA"][1], dirs["srcB"][1]])
    return dirs, report


def test_add_indexes_offsets_and_stats(spark, merged):
    dirs, report = merged
    # dest had docids [0,100) → srcA shifts by 100, srcB by 100+60
    offs = {r["source"].rsplit("_", 1)[-1]: r["offset"]
            for r in report["sources"]}
    assert offs == {"srcA": 100, "srcB": 160}
    reader = IndexReader(spark, dirs["dest"][1])
    assert reader.N == 190
    assert validate_index(spark, dirs["dest"][1])["ok"]


def test_add_indexes_rank_identity_vs_concat_oracle(spark, merged):
    dirs, report = merged
    docs = []
    docs += list(enumerate(_texts(dirs["dest"][0])))
    docs += [(100 + i, t) for i, t in enumerate(_texts(dirs["srcA"][0]))]
    docs += [(160 + i, t) for i, t in enumerate(_texts(dirs["srcB"][0]))]
    oracle = build_oracle_index(docs)
    searcher = Searcher(IndexReader(spark, dirs["dest"][1]))
    for q in [Term("seven"), Bool(must=[Term("seven"), Term("forty")]),
              Bool(should=[Term("three"), Term("hundred")]),
              Phrase(["three", "hundred"])]:
        got = [(int(r["docid"]), float(r["score"]))
               for r in searcher.search(q, k=25).collect()]
        exp = oracle_search(oracle, q, 25)
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, rel_tol=1e-9)
    # hits surface docs from dest AND both sources
    all_hits = {d for d, _ in oracle_search(oracle, Term("seven"), 1 << 30)}
    assert any(d < 100 for d in all_hits) and any(d >= 160 for d in all_hits)


def test_add_indexes_deletes_travel(spark, tmp_path):
    """Tombstones in a source stay effective after the merge (the
    reference's .del files travel with the copied segments)."""
    pages_a = str(tmp_path / "pa")
    pages_b = str(tmp_path / "pb")
    write_pages_files(pages_a, 30, 1)
    write_pages_files(pages_b, 30, 1)
    idx_a = str(tmp_path / "ia")
    idx_b = str(tmp_path / "ib")
    _build(spark, pages_a, idx_a, seg_docs=30)
    _build(spark, pages_b, idx_b, seg_docs=30)
    w = IndexWriter(spark, idx_b)
    # "eleven" covers 15 of B's 30 fixture docs — a PARTIAL delete
    n_del = w.delete_documents("eleven")
    assert 0 < n_del < 30
    IndexWriter(spark, idx_a).add_indexes([idx_b])
    searcher = Searcher(IndexReader(spark, idx_a))
    hits = {int(r["docid"])
            for r in searcher.search(Term("eleven"), k=100).collect()}
    # every surviving "eleven" hit is from the dest copy (docid < 30):
    # B's matching docs arrived tombstoned
    assert hits and all(d < 30 for d in hits)
    # but B's non-deleted docs are searchable (rebased ids >= 30)
    other = {int(r["docid"])
             for r in searcher.search(Term("seven"), k=100).collect()}
    assert any(d >= 30 for d in other)


def test_merge_indexes_tool(spark, tmp_path):
    """IndexMergeTool: fresh destination from N sources."""
    pages_a = str(tmp_path / "pa")
    pages_b = str(tmp_path / "pb")
    write_pages_files(pages_a, 20, 1)
    write_pages_files(pages_b, 20, 1)
    idx_a = str(tmp_path / "ia")
    idx_b = str(tmp_path / "ib")
    _build(spark, pages_a, idx_a, seg_docs=20)
    _build(spark, pages_b, idx_b, seg_docs=20)
    out = str(tmp_path / "merged")
    rep = merge_indexes_tool(spark, out, [idx_a, idx_b])
    assert IndexReader(spark, out).N == 40
    assert rep["sources"][0]["offset"] == 0
    assert rep["sources"][1]["offset"] == 20
    with pytest.raises(ValueError, match="already has segments"):
        merge_indexes_tool(spark, out, [idx_a])


def test_add_indexes_validation(spark, tmp_path):
    idx = str(tmp_path / "i")
    pages = str(tmp_path / "p")
    write_pages_files(pages, 10, 1)
    _build(spark, pages, idx, seg_docs=10)
    with pytest.raises(ValueError, match="source == destination"):
        add_indexes(spark, idx, [idx])
    with pytest.raises(ValueError, match="no committed segments"):
        add_indexes(spark, idx, [str(tmp_path / "nope")])


def test_add_indexes_cross_block_size(spark, tmp_path):
    """A source built with a non-default block_size must decode with ITS
    block size and re-encode with the destination's — the regression was
    decoding foreign blobs with the module default, which scrambles every
    docid silently (delta restarts land on the wrong boundaries)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_spark.fixtures import pages_pdf

    pages_a = str(tmp_path / "pa")
    pages_b = str(tmp_path / "pb")
    write_pages_files(pages_a, 30, 1)
    os.makedirs(pages_b)
    pq.write_table(
        pa.Table.from_pandas(pages_pdf(30, start=300), preserve_index=False),
        os.path.join(pages_b, "part-0000.parquet"),
        coerce_timestamps="us", allow_truncated_timestamps=True)
    idx_a = str(tmp_path / "ia")   # destination: default block_size
    idx_b = str(tmp_path / "ib")   # source: tiny block_size (many restarts)
    _build(spark, pages_a, idx_a, seg_docs=30)
    build_index(spark, pages_b, idx_b, target_docs_per_seg=30,
                store_positions=True, block_size=4)
    merge_index(spark, idx_b)
    add_indexes(spark, idx_a, [idx_b])
    assert validate_index(spark, idx_a)["ok"]
    # rank identity vs the oracle over the concatenated corpus (source
    # docids shift by 30)
    texts = _texts(pages_a) + _texts(pages_b)
    oidx = build_oracle_index(list(enumerate(texts)))
    searcher = Searcher(IndexReader(spark, idx_a))
    for q in (Term("seven"), Bool(should=[Term("one"), Term("forty")]),
              Phrase(["the", "seven"])):
        got = [(r["docid"], r["score"])
               for r in searcher.search(q, k=10).collect()]
        want = oracle_search(oidx, q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=0, abs_tol=5e-5)
