"""Oracle engine + query parser sanity (reference TestSearch.java golden
pattern: tiny corpus, known hits)."""

import math

import pytest

from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries import Bool, Fuzzy, Phrase, Prefix, Term, Wildcard, parse_query
from lucene_spark.scoring import bm25_idf, bm25_tf_weight

DOCS = [
    (0, "seven quick foxes jump"),
    (1, "seven seven lazy dogs"),
    (2, "forty seven degrees outside"),
    (3, "twenty one pilots play"),
    (4, "one hundred twenty one items"),
    (5, "quick quick quick repetition"),
]
IDX = build_oracle_index(DOCS)


def ids(hits):
    return [d for d, _ in hits]


def test_term_query():
    hits = oracle_search(IDX, Term("seven"), 10)
    assert set(ids(hits)) == {0, 1, 2}
    # doc1 has tf=2 and same length → highest
    assert ids(hits)[0] == 1


def test_bm25_value():
    hits = oracle_search(IDX, Term("lazy"), 1)
    d, score = hits[0]
    assert d == 1
    N, df, dl, avgdl = IDX.N, 1, IDX.doclen[1], IDX.avgdl
    expected = float(bm25_idf(N, df) * bm25_tf_weight(1, dl, avgdl))
    assert math.isclose(score, expected, rel_tol=1e-12)


def test_bool_must():
    q = Bool(must=[Term("seven"), Term("forty")])
    assert ids(oracle_search(IDX, q)) == [2]


def test_bool_must_not():
    q = Bool(should=[Term("seven")], must_not=[Term("forty")])
    assert set(ids(oracle_search(IDX, q))) == {0, 1}


def test_bool_should_sums():
    q = Bool(should=[Term("quick"), Term("seven")])
    hits = dict(oracle_search(IDX, q, 10))
    t_quick = dict(oracle_search(IDX, Term("quick"), 10))
    t_seven = dict(oracle_search(IDX, Term("seven"), 10))
    for d in hits:
        assert math.isclose(hits[d], t_quick.get(d, 0) + t_seven.get(d, 0), rel_tol=1e-12)


def test_phrase_exact():
    q = Phrase(["twenty", "one"])
    assert set(ids(oracle_search(IDX, q))) == {3, 4}
    q2 = Phrase(["one", "twenty"])
    assert ids(oracle_search(IDX, q2)) == []


def test_phrase_sloppy():
    # doc4: "one hundred twenty one" — 'one ... twenty' within slop 2
    q = Phrase(["one", "twenty"], slop=2)
    assert 4 in ids(oracle_search(IDX, q))


def test_prefix_wildcard_fuzzy():
    assert set(ids(oracle_search(IDX, Prefix("qu")))) == {0, 5}
    assert set(ids(oracle_search(IDX, Wildcard("f*es")))) == {0}
    assert set(ids(oracle_search(IDX, Fuzzy("sevan", max_edits=1)))) == {0, 1, 2}


def test_tiebreak_docid_asc():
    # docs 0 and 2 have seven tf=1; same doclen → identical score; 0 first
    hits = oracle_search(IDX, Term("seven"), 10)
    tied = [d for d, s in hits if math.isclose(s, hits[-1][1], rel_tol=1e-12)]
    assert tied == sorted(tied)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

def test_parse_term():
    q = parse_query("Seven")
    assert isinstance(q, Term) and q.term == "seven"


def test_parse_default_or():
    q = parse_query("one two three")
    assert isinstance(q, Bool)
    assert [t.term for t in q.should] == ["one", "two", "three"]
    assert q.effective_min_should() == 1


def test_parse_and():
    q = parse_query("seven AND forty")
    assert isinstance(q, Bool)
    assert sorted(t.term for t in q.must) == ["forty", "seven"]
    assert not q.should


def test_parse_must_not():
    q = parse_query("seven -forty")
    assert isinstance(q, Bool)
    assert [t.term for t in q.should] == ["seven"]
    assert [t.term for t in q.must_not] == ["forty"]


def test_parse_phrase_and_slop():
    q = parse_query('"twenty one"')
    assert isinstance(q, Phrase) and q.phrase_terms == ["twenty", "one"] and q.slop == 0
    q2 = parse_query('"one hundred"~2')
    assert isinstance(q2, Phrase) and q2.slop == 2


def test_parse_boost():
    q = parse_query("seven^2 forty")
    assert isinstance(q, Bool)
    boosts = {t.term: t.boost for t in q.should}
    assert boosts == {"seven": 2.0, "forty": 1.0}


def test_parse_phrase_stopword_holes():
    # 'the' analyzed away inside the phrase → position hole
    q = parse_query('"quick the fox"')
    assert isinstance(q, Phrase)
    assert q.phrase_terms == ["quick", "fox"]
    assert q.qpositions() == [0, 2]


def test_parse_prefix_wildcard_fuzzy():
    assert isinstance(parse_query("sev*"), Prefix)
    assert isinstance(parse_query("s?ven"), Wildcard)
    f = parse_query("seven~1")
    assert isinstance(f, Fuzzy) and f.max_edits == 1


def test_parse_end_to_end_matches_manual():
    got = oracle_search(IDX, parse_query("seven AND forty"), 10)
    manual = oracle_search(IDX, Bool(must=[Term("seven"), Term("forty")]), 10)
    assert got == manual


def test_phrase_freq_two_term_fast_path_matches_generic():
    """The m==2 int fast path must equal the generic greedy enumeration
    (independent re-implementation here, randomized inputs)."""
    import random

    import numpy as np

    from lucene_spark.scoring import phrase_freq

    def generic(position_lists, qpos, slop):
        m = len(position_lists)
        shifted = [np.asarray(p, dtype=np.int64) - qpos[i]
                   for i, p in enumerate(position_lists)]
        total = 0.0
        cursors = [0] * m
        lens = [len(s) for s in shifted]
        while all(cursors[i] < lens[i] for i in range(m)):
            vals = [int(shifted[i][cursors[i]]) for i in range(m)]
            lo, hi = min(vals), max(vals)
            if hi - lo <= slop and len(
                    {vals[i] + qpos[i] for i in range(m)}) == m:
                total += 1.0 / (hi - lo + 1.0)
                for i in range(m):
                    cursors[i] += 1
            else:
                # leapfrog past non-matches AND duplicate-position windows
                # (distinct-absolute-positions invariant)
                i_min = min(range(m), key=lambda i: shifted[i][cursors[i]])
                cursors[i_min] += 1
        return total

    rng = random.Random(7)
    for trial in range(300):
        n1, n2 = rng.randint(1, 8), rng.randint(1, 8)
        p1 = np.array(sorted(rng.sample(range(40), n1)), dtype=np.int64)
        p2 = np.array(sorted(rng.sample(range(40), n2)), dtype=np.int64)
        qpos = [0, rng.randint(1, 3)]
        slop = rng.randint(1, 5)
        got = phrase_freq([p1, p2], qpos, slop)
        exp = generic([p1, p2], qpos, slop)
        assert got == exp, (trial, p1, p2, qpos, slop, got, exp)
