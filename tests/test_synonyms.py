"""Synonym surface (contrib/wordnet): Syns2Index prolog parse →
synonym map, SynExpand query expansion, and index-time
SynonymTokenFilter injection (same-position stack) — expansion shape
unit-tested, then engine ≡ oracle rank identity end-to-end."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_spark.analysis import (
    POSITIONAL_ANALYZERS, make_chain, make_synonym_injector,
)
from lucene_spark.indexing.build import build_index
from lucene_spark.indexing.merge import merge_index
from lucene_spark.indexing.reader import IndexReader
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries.ast import Bool, Phrase, Term
from lucene_spark.queries.planner import Searcher
from lucene_spark.queries.synonyms import expand_synonyms, parse_wordnet_prolog

WN_SAMPLE = """\
s(100001740,1,'entity',n,1,11).
s(100002056,1,'thing',n,12,0).
s(100002056,2,'entity',n,1,11).
s(100003011,1,'object',n,1,51).
s(100003011,2,'thing',n,12,0).
s(100004123,1,'pit bull',n,1,0).
s(100004124,1,'don''t',n,1,0).
s(100005000,1,'Big',n,1,0).
s(100005000,2,'large',n,1,0).
""".splitlines()


def test_parse_wordnet_prolog_reference_rules():
    m = parse_wordnet_prolog(WN_SAMPLE)
    # synonyms = union over shared synsets, sorted, self removed
    assert m["entity"] == ["thing"]
    assert m["thing"] == ["entity", "object"]
    assert m["object"] == ["thing"]
    # 'pit bull' (space) and "don't" (apostrophe) rejected by isDecent
    assert "pit bull" not in m and "don't" not in m
    # lowercase at parse time: 'Big' and 'large' share a synset
    assert m["big"] == ["large"] and m["large"] == ["big"]


def test_expand_synonyms_shape():
    syn = {"big": ["adult", "large"], "dog": ["hound", "large"]}
    q = expand_synonyms("big dog big", syn, boost=0.9)
    assert isinstance(q, Bool) and not q.must and not q.must_not
    got = [(c.term, c.boost) for c in q.should]
    # top-level words at 1.0; synonyms at 0.9; global dedup: the second
    # 'big' collapses, and 'large' (already added under big) is not
    # re-added under dog
    assert got == [("big", 1.0), ("adult", 0.9), ("large", 0.9),
                   ("dog", 1.0), ("hound", 0.9)]
    # a synonym equal to a query word is skipped
    q2 = expand_synonyms("big dog", {"big": ["dog", "huge"]})
    assert [(c.term, c.boost) for c in q2.should] == \
        [("big", 1.0), ("huge", 0.9), ("dog", 1.0)]
    # boost=0 keeps synonyms unboosted (reference: "else keep normal 1.0")
    q3 = expand_synonyms("big", {"big": ["huge"]}, boost=0)
    assert [(c.term, c.boost) for c in q3.should] == \
        [("big", 1.0), ("huge", 1.0)]


CORPUS = [
    (0, "big dog runs fast"),
    (1, "large hound sleeps"),
    (2, "huge cat naps"),
    (3, "the dog and the dog"),
    (4, "large large big dog"),
    (5, "nothing relevant here"),
]


def _write(tmp_path, rows):
    d = tmp_path / "pages"
    d.mkdir()
    pdf = pd.DataFrame({
        "url": [f"u{i}" for i, _ in rows],
        "text": [t for _, t in rows],
        "lang": ["en"] * len(rows),
    })
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(d / "part0.parquet"))
    return str(d)


def test_expand_rank_identity_engine_vs_oracle(spark, tmp_path):
    syn = {"big": ["large", "huge"], "dog": ["hound"]}
    src = _write(tmp_path, CORPUS)
    out = str(tmp_path / "idx")
    build_index(spark, src, out, analyzer="whitespace",
                target_docs_per_seg=3)
    merge_index(spark, out)
    q = expand_synonyms("big dog", syn)
    eng = [(int(r["docid"]), round(r["score"], 4))
           for r in Searcher(IndexReader(spark, out)).search(q, k=6).collect()]
    idx = build_oracle_index(CORPUS, analyzer="whitespace")
    orc = [(d, round(s, 4)) for d, s in oracle_search(idx, q, k=6)]
    assert eng == orc and eng[0][0] in (0, 4)


def test_synonym_injector_same_position(spark, tmp_path):
    syn = {"big": ["large"], "dog": ["hound"]}
    chain = make_chain(tokenizer="whitespace",
                       pair_filters=(make_synonym_injector(syn),))
    assert chain("big dog") == [("big", 0), ("large", 0),
                                ("dog", 1), ("hound", 1)]
    # max_synonyms caps deterministically
    capped = make_chain(tokenizer="whitespace", pair_filters=(
        make_synonym_injector({"x": ["a", "b", "c"]}, max_synonyms=2),))
    assert capped("x") == [("x", 0), ("a", 0), ("b", 0)]

    # index-time: a phrase query through a synonym matches, engine ≡
    # oracle (both resolve the chain from the shared registry)
    POSITIONAL_ANALYZERS["_test_syn"] = chain
    try:
        src = _write(tmp_path, CORPUS)
        out = str(tmp_path / "idx2")
        build_index(spark, src, out, analyzer="_test_syn",
                    target_docs_per_seg=3)
        merge_index(spark, out)
        q = Phrase(["large", "hound"])  # doc 0 only via injected synonyms
        eng = [(int(r["docid"]), round(r["score"], 4))
               for r in Searcher(IndexReader(spark, out)).search(q, k=6).collect()]
        idx = build_oracle_index(CORPUS, analyzer="_test_syn")
        orc = [(d, round(s, 4)) for d, s in oracle_search(idx, q, k=6)]
        assert eng == orc
        assert {d for d, _ in eng} == {0, 1, 4}
    finally:
        del POSITIONAL_ANALYZERS["_test_syn"]
