"""BPE train + apply (lucene_spark/bpe.py): hand-pinned merges on a known
corpus, distributed-vs-single-node training identity, apply parity between
the Arrow UDF and the Python reference, determinism and plan shape."""

from collections import Counter

import pytest

from lucene_spark.bpe import (EOW, bpe_segment, bpe_token_count_py,
                              train_bpe, train_bpe_from_counts,
                              with_bpe_token_count, word_counts)


def test_train_hand_corpus():
    # Sennrich's toy corpus shape: 'low'x5, 'lower'x2, 'newest'x6, 'widest'x3
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_from_counts(wc, 4)
    # most frequent first pair: ('e','s') with 6+3=9; then ('es','t') 9;
    # then ('est','</w>') 9; then ('l','o') 7
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]


def test_train_tie_break_deterministic():
    # two pairs with equal counts: lexicographically smallest wins
    merges = train_bpe_from_counts({"ab": 2, "cd": 2}, 1)
    assert merges[0] == ("a", "b")


def test_segment_and_count():
    merges = train_bpe_from_counts({"low": 5, "newest": 6}, 3)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    assert bpe_segment("newest", ranks)[-1].endswith(EOW) or \
        EOW in "".join(bpe_segment("newest", ranks))
    # unseen word degrades to characters + EOW
    assert bpe_segment("zq", {}) == ["z", "q", EOW]
    assert bpe_token_count_py("zq zq", {}) == 6
    assert bpe_token_count_py(None, {}) is None
    assert bpe_token_count_py("", {}) == 0


def test_distributed_training_matches_single_node(spark):
    rows = [(i, f"the quick brown fox jump{'s' * (i % 3)} over dog {i % 7}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, n_merges=25)
    # independent single-node restatement: Counter over the same texts
    cnt: Counter = Counter()
    for _i, t in rows:
        cnt.update(w for w in t.split(" ") if w)
    assert merges == train_bpe_from_counts(dict(cnt), 25)


def test_apply_udf_matches_reference(spark):
    rows = [(i, None if i == 5 else f"alpha beta{i % 4} gamma gamma")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, n_merges=15)
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in with_bpe_token_count(df, merges).collect()}
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for i, t in rows:
        assert got[i] == bpe_token_count_py(t, ranks), (i, t)


def test_word_counts_bounded_and_ordered(spark):
    df = spark.createDataFrame([(i, "a a a b b c") for i in range(10)],
                               "doc_id long, text string")
    wc = word_counts(df, max_words=2)
    assert wc == [("a", 30), ("b", 20)]  # top-k only, count desc


def test_apply_is_narrow(spark):
    df = spark.createDataFrame([(i, f"w{i}") for i in range(20)],
                               "doc_id long, text string")
    out = with_bpe_token_count(df, [("a", "b")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan or "Python" in plan, plan
