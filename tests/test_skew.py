"""Zipf-head-term skew: a term present in EVERY doc with high tf, indexed
with a tiny max_postings_per_row so its posting list salt-splits into many
rows — the engine must stay correct across the splits (build, WAND scoring,
block-targeted lookup, compaction)."""

import math

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_spark.indexing import IndexReader, build_index, merge_index, validate_index
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.planner import Searcher

N_DOCS = 600


def _texts():
    # "head" in every doc (tf 1..4), a torso term in half, serials for tails
    out = []
    for i in range(N_DOCS):
        toks = ["head"] * (1 + i % 4)
        if i % 2 == 0:
            toks.append("torso")
        toks.append(f"serial{i}")
        toks.extend(["filler", "words"][: 1 + i % 2])
        out.append(" ".join(toks))
    return out


@pytest.fixture(scope="module")
def skew_index(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("skewsrc")
    texts = _texts()
    # two files: the plan packs whole files into segments (never splits one)
    for k, (lo, hi) in enumerate(((0, 300), (300, 600))):
        pdf = pd.DataFrame({
            "url": [str(i) for i in range(lo, hi)],
            "text": texts[lo:hi],
            "lang": ["en"] * (hi - lo),
        })
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       str(src / f"part-{k:04d}.parquet"))
    out = str(tmp_path_factory.mktemp("skewidx"))
    # 2 segments × ≤300 docs; head term df=300/seg ≫ max_postings_per_row=64
    # → ≥5 salt rows per segment for 'head'
    build_index(spark, str(src), out, target_docs_per_seg=300,
                analyzer="whitespace", max_postings_per_row=64)
    merge_index(spark, out)
    return out, texts


def test_salt_split_layout(spark, skew_index):
    out, _ = skew_index
    r = IndexReader(spark, out)
    rows = (r.postings().where(r.postings()["term"] == "head")
            .select("seg", "salt", "df").collect())
    by_seg: dict[int, list[int]] = {}
    for row in rows:
        by_seg.setdefault(int(row["seg"]), []).append(int(row["df"]))
    assert len(by_seg) == 2
    for dfs in by_seg.values():
        assert len(dfs) >= 5          # genuinely split
        assert max(dfs) <= 64         # bounded rows
        assert sum(dfs) == 300        # nothing lost
    td = {x["term"]: int(x["df"]) for x in r.term_dict().collect()}
    assert td["head"] == N_DOCS
    assert validate_index(spark, out)["ok"]


def test_skew_rank_identity(spark, skew_index):
    out, texts = skew_index
    s = Searcher(IndexReader(spark, out))
    oracle = build_oracle_index(list(enumerate(texts)))
    # oracle tokenizes with the standard analyzer; these tokens are
    # identical under both chains (lowercase alnum, no stopwords)
    for qs in ("head", "head AND torso", "torso -filler",
               "head torso serial7", "serial123"):
        got = [(int(x["docid"]), float(x["score"]))
               for x in s.search(qs, k=10).collect()]
        exp = oracle_search(oracle, parse_query(qs), 10)
        assert [d for d, _ in got] == [d for d, _ in exp], qs
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, rel_tol=1e-9), qs
    assert s.count("head") == N_DOCS
