"""Pluggable Similarity (search/Similarity.java:527): formula parity of
ClassicSimilarity (search/DefaultSimilarity.java:23-77) and
SweetSpotSimilarity (contrib/misc/.../SweetSpotSimilarity.java:47-270)
against hand-derived values from the Java source, and engine ≡ oracle
rank identity under each swapped strategy — the same "two engines, one
truth" gate the BM25 contract runs."""

import math

import pytest

from lucene_spark.indexing import IndexReader
from lucene_spark.oracle import build_oracle_index, oracle_search
from lucene_spark.queries import parse_query
from lucene_spark.queries.planner import Searcher
from lucene_spark.scoring import (
    ClassicSimilarity, DEFAULT_SIMILARITY, Similarity, SweetSpotSimilarity,
    bm25_idf, bm25_tf_weight, similarity_by_name,
)

K = 10


# ---------------------------------------------------------------------------
# formula parity vs the Java definitions
# ---------------------------------------------------------------------------

def test_default_is_bm25():
    sim = similarity_by_name(None)
    assert sim is DEFAULT_SIMILARITY and sim.name == "bm25"
    assert float(sim.term_weight(100, 7)) == pytest.approx(
        float(bm25_idf(100, 7)))
    assert float(sim.tf_weight(3, 50, 40.0)) == pytest.approx(
        float(bm25_tf_weight(3, 50, 40.0)))


def test_classic_formulas():
    """DefaultSimilarity.java: tf=sqrt(freq) (:57), idf=ln(N/(df+1))+1
    (:69) squared per term (Weight × Scorer), lengthNorm=1/sqrt(n) (:45)."""
    sim = ClassicSimilarity()
    idf = math.log(100 / 10.0) + 1.0
    assert float(sim.term_weight(100, 9)) == pytest.approx(idf * idf)
    assert float(sim.tf_weight(4, 16, 999.0)) == pytest.approx(2.0 / 4.0)
    # avgdl plays no role in classic scoring
    assert float(sim.tf_weight(4, 16, 1.0)) == float(sim.tf_weight(4, 16, 77.0))


def test_sweetspot_length_norm_plateau():
    """SweetSpotSimilarity.java:171-186: 1.0 across [min,max], hyperbolic
    falloff outside; defaults min=max=1, steepness=0.5."""
    sim = SweetSpotSimilarity()
    assert float(sim.length_norm(1)) == 1.0
    assert float(sim.length_norm(3)) == pytest.approx(1 / math.sqrt(3))
    wide = SweetSpotSimilarity(ln_min=1, ln_max=5, steepness=0.5)
    for n in (1, 2, 3, 4, 5):
        assert float(wide.length_norm(n)) == 1.0, n
    # |10-1| + |10-5| - (5-1) = 10 → 1/sqrt(0.5*10 + 1)
    assert float(wide.length_norm(10)) == pytest.approx(1 / math.sqrt(6.0))


def test_sweetspot_baseline_tf():
    """SweetSpotSimilarity.java:221-227: freq<=min ? base :
    sqrt(freq + base² − min); degrades to sqrt at the 0/0 defaults."""
    sim = SweetSpotSimilarity()
    assert float(sim.tf(0)) == 0.0
    assert float(sim.tf(9)) == pytest.approx(3.0)
    tuned = SweetSpotSimilarity(tf_base=1.5, tf_min=5.0)
    assert float(tuned.tf(0)) == 0.0
    assert float(tuned.tf(3)) == pytest.approx(1.5)
    assert float(tuned.tf(6)) == pytest.approx(math.sqrt(6 + 2.25 - 5))


def test_sweetspot_hyperbolic_tf():
    """SweetSpotSimilarity.java:244-266 with the documented defaults
    (min=0, max=2, base=1.3, xoffset=10): 0 at freq 0, exactly
    (max−min)/2 + min at the xoffset, → max as freq → ∞."""
    sim = SweetSpotSimilarity(hyperbolic_tf=True)
    assert float(sim.tf(0)) == 0.0
    assert float(sim.tf(10)) == pytest.approx(1.0)
    assert float(sim.tf(1000)) == pytest.approx(2.0, abs=1e-9)
    assert float(sim.tf(1)) < float(sim.tf(5)) < float(sim.tf(50))


def test_sweetspot_upper_bound_admissible():
    """The plateau norm is non-monotone in dl, so the block bound must
    dominate tf_weight at EVERY (tf<=max_tf, any dl)."""
    sim = SweetSpotSimilarity(ln_min=3, ln_max=8, steepness=0.5)
    ub = float(sim.tf_weight_upper(7, 5, 40.0))
    for tf in (1, 3, 7):
        for dl in (1, 3, 5, 8, 20, 200):
            assert float(sim.tf_weight(tf, dl, 40.0)) <= ub + 1e-12


def test_registry_roundtrip():
    assert isinstance(similarity_by_name("classic"), ClassicSimilarity)
    assert isinstance(similarity_by_name("sweetspot"), SweetSpotSimilarity)
    custom = SweetSpotSimilarity(ln_min=2, ln_max=9)
    assert similarity_by_name(custom) is custom
    with pytest.raises(KeyError):
        similarity_by_name("nope")


# ---------------------------------------------------------------------------
# engine ≡ oracle under swapped similarities (two engines, one truth)
# ---------------------------------------------------------------------------

_SIMS = [
    ClassicSimilarity(),
    SweetSpotSimilarity(ln_min=20, ln_max=60, steepness=0.5),
    SweetSpotSimilarity(hyperbolic_tf=True, ln_min=20, ln_max=60),
]

_QUERIES = [
    "seven", "seven AND forty", "one two three", "hundred -ninety",
    '"seven forty"~2', "seve*", "bucketthree^2 seventeen",
]


@pytest.fixture(scope="module")
def oracle_indexes(pages_dir):
    import pyarrow.dataset as ds

    texts = ds.dataset(pages_dir).to_table(columns=["text"])["text"].to_pylist()
    docs = list(enumerate(texts))
    return {s.name + str(i): build_oracle_index(docs, similarity=s)
            for i, s in enumerate(_SIMS)}


@pytest.mark.parametrize("qi", range(len(_QUERIES)))
@pytest.mark.parametrize("si", range(len(_SIMS)))
def test_rank_identity_under_swapped_similarity(spark, index_dir, pages_dir,
                                                oracle_indexes, si, qi):
    sim = _SIMS[si]
    searcher = Searcher(IndexReader(spark, index_dir), similarity=sim)
    oidx = oracle_indexes[sim.name + str(si)]
    qs = _QUERIES[qi]
    got = [(int(r["docid"]), float(r["score"]))
           for r in searcher.search(qs, k=K).collect()]
    want = oracle_search(oidx, parse_query(qs), K)
    assert [d for d, _ in got] == [d for d, _ in want], (sim.name, qs)
    for (d, s1), (_, s2) in zip(got, want):
        assert math.isclose(s1, s2, rel_tol=1e-9), (sim.name, qs, d, s1, s2)


def test_similarity_changes_ranking(spark, index_dir):
    """Sanity that the seam is live: classic and bm25 produce different
    score values for the same query (else the swap is a no-op)."""
    base = Searcher(IndexReader(spark, index_dir))
    classic = Searcher(IndexReader(spark, index_dir), similarity="classic")
    s_b = [float(r["score"]) for r in base.search("seven", k=5).collect()]
    s_c = [float(r["score"]) for r in classic.search("seven", k=5).collect()]
    assert s_b and s_c and s_b != s_c


def test_invert_tf_weight_roundtrip():
    """explain_full reconstructs phrase/span freqs by inverting the ACTIVE
    similarity's tf-weight (regression: a hardcoded BM25 inversion reported
    nonsense freqs under classic/sweetspot). Pin invert(tf_weight(f)) == f
    for every strategy, including hyperbolic sweetspot inside its open
    range."""
    import numpy as np

    from lucene_spark.scoring import (ClassicSimilarity, Similarity,
                                      SweetSpotSimilarity)

    f = np.array([1.0, 2.0, 3.5, 8.0])
    dl = np.array([10, 50, 100, 30])
    for sim in (Similarity(), ClassicSimilarity(), SweetSpotSimilarity(),
                SweetSpotSimilarity(hyperbolic_tf=True)):
        w = sim.tf_weight(f, dl, 40.0)
        assert np.allclose(sim.invert_tf_weight(w, dl, 40.0), f,
                           rtol=1e-8), sim.name
