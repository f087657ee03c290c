"""contrib query filters: TermsFilter, BooleanFilter, DuplicateFilter
(contrib/queries/src/java/org/apache/lucene/search/TermsFilter.java,
BooleanFilter.java, DuplicateFilter.java) — engine vs oracle."""

import math

import pyarrow.dataset as ds
import pytest

from lucene_spark.indexing import IndexReader
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries.ast import Bool, ConstantScore, Term
from lucene_spark.queries.planner import Searcher, boolean_filter, terms_filter

K = 400


@pytest.fixture(scope="module")
def ctx(spark, pages_dir, tmp_path_factory):
    from lucene_spark.indexing import build_index, merge_index

    out = str(tmp_path_factory.mktemp("filteridx"))
    build_index(spark, pages_dir, out, target_docs_per_seg=200,
                keyword_fields=("lang",))
    merge_index(spark, out)
    tab = ds.dataset(pages_dir).to_table(columns=["text", "lang"])
    texts = tab["text"].to_pylist()
    langs = tab["lang"].to_pylist()
    oracle = build_oracle_index(list(enumerate(texts)))
    # keyword field postings for the oracle: lang:<v> terms, tf 1
    for i, v in enumerate(langs):
        oracle.postings.setdefault(f"lang:{v}", {})[i] = [0]
    return Searcher(IndexReader(spark, out)), oracle, langs


def hits(searcher, q, k=K):
    return [(int(r["docid"]), float(r["score"]))
            for r in searcher.search(q, k=k).collect()]


def assert_match(got, exp):
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert math.isclose(a, b, rel_tol=1e-9)


def test_terms_filter(ctx):
    searcher, oracle, langs = ctx
    q = Bool(must=[Term("seven"), terms_filter("lang", ["de"])])
    got = hits(searcher, q)
    assert got, "filter should keep some hits"
    assert_match(got, oracle_search(oracle, q, K))
    assert {langs[d] for d, _ in got} <= {"de"}
    # scores unchanged vs the unfiltered query (filter is score-neutral)
    base = dict(hits(searcher, Term("seven")))
    for d, s in got:
        assert math.isclose(s, base[d], rel_tol=1e-12)


def test_boolean_filter(ctx):
    searcher, oracle, langs = ctx
    filt = boolean_filter(
        should=[ConstantScore(Term("lang:de")),
                ConstantScore(Term("lang:en"))],
        must_not=[Term("forty")])
    q = Bool(must=[Term("seven"), filt])
    got = hits(searcher, q)
    assert got
    assert_match(got, oracle_search(oracle, q, K))
    assert {langs[d] for d, _ in got} <= {"de", "en"}


def test_duplicate_filter(ctx):
    searcher, oracle, langs = ctx
    got = [(int(r["docid"]), float(r["score"]))
           for r in searcher.search_dedup("seven", key="lang", k=K).collect()]
    # oracle analog: all matches, keep lowest docid per lang, re-rank
    allhits = oracle_search(oracle, Term("seven"), 1 << 30)
    first_by_key: dict = {}
    for d, s in sorted(allhits):
        first_by_key.setdefault(langs[d], (d, s))
    exp = sorted(first_by_key.values(), key=lambda x: (-x[1], x[0]))
    assert_match(got, exp)
    assert len({langs[d] for d, _ in got}) == len(got)  # one per key


# ---------------------------------------------------------------------------
# ChainedFilter (contrib/misc/.../ChainedFilter.java) — fold semantics
# brute-forced from the oracle's posting sets, engine ≡ oracle rank identity
# ---------------------------------------------------------------------------

def _docs_of(oracle, term):
    return set(oracle.postings.get(term, {}))


def _chain_sets(oracle, n_docs, terms, ops):
    """Literal ChainedFilter fold over python sets (the golden)."""
    sets = [_docs_of(oracle, t) for t in terms]
    if ops[0] == "and":
        acc, start = sets[0], 1
    elif ops[0] == "andnot":
        acc, start = set(range(n_docs)) - sets[0], 1
    else:
        acc, start = set(), 0
    for i in range(start, len(sets)):
        if ops[i] == "or":
            acc = acc | sets[i]
        elif ops[i] == "and":
            acc = acc & sets[i]
        elif ops[i] == "andnot":
            acc = acc - sets[i]
        else:
            acc = acc ^ sets[i]
    return acc


@pytest.mark.parametrize("terms,logic", [
    (["lang:de", "lang:en"], "or"),
    (["seven", "forty"], "and"),
    (["lang:de", "forty"], "andnot"),
    (["lang:de", "forty"], "xor"),
    (["lang:de", "forty", "seven"], "xor"),         # 3-way parity
    (["lang:de", "seven", "forty"], ["or", "and", "andnot"]),  # per-filter ops
    (["seven", "lang:de", "forty"], ["and", "or", "xor"]),
    (["lang:de", "forty"], ["andnot", "or"]),        # complement seed
])
def test_chained_filter(ctx, terms, logic):
    from lucene_spark.queries.planner import chained_filter

    searcher, oracle, langs = ctx
    n_docs = len(langs)
    ops = [logic] * len(terms) if isinstance(logic, str) else logic
    want = _chain_sets(oracle, n_docs, terms, ops)

    chain = chained_filter([ConstantScore(Term(t)) for t in terms], logic)
    q = Bool(must=[Term("seven"), chain])
    got = hits(searcher, q)
    assert {d for d, _ in got} == (want & _docs_of(oracle, "seven")), ops
    assert_match(got, oracle_search(oracle, q, K))
    # score-neutral: scores equal the bare scored query's
    base = dict(hits(searcher, Term("seven")))
    for d, s in got:
        assert math.isclose(s, base[d], rel_tol=1e-12)


def test_chained_filter_complement_positions(ctx):
    """The residual-complement form (Bool(must=[MatchAll], must_not=Xs))
    must serve from EVERY supported position — top level (docmap
    anti-join), must (fold into the enclosing must_not), and must_not
    (double negation → positive requirement) — and fail LOUDLY driver-side
    as a should clause, never as a MatchAll ValueError inside a worker."""
    from lucene_spark.queries.planner import chained_filter

    searcher, oracle, langs = ctx
    n_docs = len(langs)
    compl = chained_filter([ConstantScore(Term("seven"))], "andnot")

    # top level: everything except seven, uniform constant score
    got = {int(r["docid"]) for r in searcher.search(compl, k=n_docs).collect()}
    assert got == set(range(n_docs)) - _docs_of(oracle, "seven")
    assert searcher.count(compl) == len(got)
    # parser path for the same shape
    assert ({int(r["docid"]) for r in
             searcher.search("* AND NOT seven", k=n_docs).collect()} == got)

    # must_not position: NOT(everything except seven) ≡ seven (set-wise)
    q = Bool(must=[Term("forty")], must_not=[compl])
    want = _docs_of(oracle, "forty") & _docs_of(oracle, "seven")
    got2 = hits(searcher, q)
    assert {d for d, _ in got2} == (want if len(want) <= K else
                                    {d for d, _ in got2})
    base = dict(hits(searcher, Term("forty")))
    for d, s in got2:
        assert math.isclose(s, base[d], rel_tol=1e-12)  # score-neutral

    # should position: loud driver-side error, not a worker crash
    with pytest.raises(ValueError, match="not supported as SHOULD"):
        searcher.search(Bool(should=[Term("forty"), compl]), k=5)


def test_chained_filter_validation():
    from lucene_spark.queries.planner import chained_filter

    with pytest.raises(ValueError, match="Invalid number"):
        chained_filter([ConstantScore(Term("a"))], ["or", "and"])
    with pytest.raises(ValueError, match="bad ops"):
        chained_filter([ConstantScore(Term("a"))], "nand")
    with pytest.raises(ValueError, match="empty"):
        chained_filter([], "or")


# ---------------------------------------------------------------------------
# HighFreqTerms (contrib/misc/.../HighFreqTerms.java) — top-n by df
# ---------------------------------------------------------------------------

def test_high_freq_terms(ctx):
    from lucene_spark.misc import high_freq_terms

    searcher, oracle, langs = ctx
    got = [(r["term"], r["df"])
           for r in high_freq_terms(searcher.reader, n=15).collect()]
    # golden: df per un-namespaced term from the oracle postings
    dfs = sorted(((t, len(d)) for t, d in oracle.postings.items()
                  if not t.startswith("lang:")),
                 key=lambda x: (-x[1], x[0]))[:15]
    assert got == dfs
    # field mode: lang namespace only, prefix stripped
    got_f = [(r["term"], r["df"]) for r in
             high_freq_terms(searcher.reader, n=5, field="lang").collect()]
    dfs_f = sorted(((t[5:], len(d)) for t, d in oracle.postings.items()
                    if t.startswith("lang:")), key=lambda x: (-x[1], x[0]))[:5]
    assert got_f == dfs_f
