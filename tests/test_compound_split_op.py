"""text_compound_split (round-5 extras entry): the corpus-scale JVM
restatement of DictionaryCompoundWordTokenFilter must agree token-by-
token with the per-token Python decomposer (lang/__init__
make_compound_decomposer — itself pinned by the reference's own SE
goldens), including the minSubwordSize-1 loop quirk."""

import os
from collections import Counter

import pytest

import __spark_entry__ as E
from lucene_spark.lang import make_compound_decomposer

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF),
                                reason="driver testdata not present")


def test_matches_per_token_decomposer(spark):
    rows = (E._docs(spark, SF).select("doc_id", "text").limit(50)
            .collect())
    decomp = make_compound_decomposer(
        E._COMPOUND_DICT, min_word_size=E._COMPOUND_MINW,
        min_subword_size=E._COMPOUND_MINSUB,
        max_subword_size=E._COMPOUND_MAXSUB)
    want: Counter = Counter()
    for r in rows:
        toks = [(t, i) for i, t in enumerate((r["text"] or "").split(" "))]
        # emitted subwords = decomposer output minus the originals
        originals = Counter(t for t, _ in toks)
        out = Counter(t for t, _ in decomp(toks))
        for term, n in (out - originals).items():
            want[(int(r["doc_id"]), term)] += n
    got = {(int(r["doc_id"]), r["subword"]): int(r["n"])
           for r in E._q_text_compound_split(spark, SF)
           .where(E.F.col("doc_id").isin(
               [int(r["doc_id"]) for r in rows])).collect()}
    assert got == {k: v for k, v in want.items() if v > 0}


def test_plan_is_jvm_only(spark):
    plan = (E._q_text_compound_split(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
