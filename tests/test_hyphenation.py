"""HyphenationCompoundWordTokenFilter (compound/HyphenationCompound-
WordTokenFilter.java + FOP HyphenationTree — Liang's algorithm): goldens
ported from the reference's own TestCompoundWordTokenFilter hyphenation
cases, driven with the reference's own Danish pattern file."""

import os

import pytest

from lucene_spark.lang.hyphenation import (HyphenationPatterns,
                                           make_hyphenation_decomposer,
                                           parse_hyphenation_xml)

DA_XML = ("/root/reference/contrib/analyzers/common/src/test/org/apache/"
          "lucene/analysis/compound/da_UTF8.xml")

needs_da = pytest.mark.skipif(not os.path.exists(DA_XML),
                              reason="reference pattern file not present")


@pytest.fixture(scope="module")
def da():
    with open(DA_XML, encoding="utf-8") as f:
        return parse_hyphenation_xml(f.read())


# --- pure Liang unit behavior (environment-independent) --------------------

def test_liang_max_rule_and_bounds():
    # classic toy set: breaks where max interleaved value is odd
    pats = HyphenationPatterns(["h1y", "p1h", "1na", "n2at", "hy3ph",
                                "he2n", "hena4", "hen5at"])
    pts = pats.hyphenate("hyphenation")
    assert pts is not None and pts[0] == 0 and pts[-1] == len("hyphenation")
    assert 2 in pts  # hy|phenation
    # n2at (even) overrides 1na at the n|ation gap: 7 must NOT break
    assert 7 not in pts
    # too short for remain+push
    assert pats.hyphenate("h") is None
    # remain/push clamp moves the window
    assert pats.hyphenate("hyphenation", remain=3, push=3) is not None
    assert 2 not in pats.hyphenate("hyphenation", remain=3, push=3)


def test_interior_nonletter_rejected_leading_skipped():
    pats = HyphenationPatterns(["a1b"])
    assert pats.hyphenate("a-b") is None  # interior non-letter
    p = pats.hyphenate("--abab")  # leading ignored, indices shifted
    assert p is not None and all(x >= 2 for x in p[1:-1])


def test_exceptions_override():
    pats = HyphenationPatterns(["a1b"], exceptions=["ta-ble"])
    assert pats.hyphenate("table") == [0, 2, 5]


# --- the reference's own DA/DE goldens -------------------------------------

@needs_da
def test_hyphenation_compound_words_da(da):
    """testHyphenationCompoundWordsDA: dict {læse, hest} over
    'min veninde som er lidt af en læsehest'."""
    decomp = make_hyphenation_decomposer(da, ["læse", "hest"])
    text = "min veninde som er lidt af en læsehest"
    pairs = [(t, i) for i, t in enumerate(text.split())]
    out = decomp(pairs)
    assert [t for t, _ in out] == ["min", "veninde", "som", "er", "lidt",
                                   "af", "en", "læsehest", "læse", "hest"]
    # subwords share the original's position (posinc 0)
    assert [p for t, p in out if t in ("læse", "hest")] == [7, 7]


@needs_da
def test_hyphenation_compound_words_de_longest_match(da):
    """testHyphenationCompoundWordsDELongestMatch: 'basketballkurv' with
    maxSubwordSize=40 and onlyLongestMatch — the word 'basket' is NOT
    added (basketball wins its start point)."""
    decomp = make_hyphenation_decomposer(
        da, ["basketball", "basket", "ball", "kurv"],
        max_subword_size=40, only_longest_match=True)
    out = decomp([("basketballkurv", 0)])
    assert [t for t, _ in out] == ["basketballkurv", "basketball",
                                   "ball", "kurv"]
    assert all(p == 0 for _, p in out)


@needs_da
def test_registered_hyphenation_analyzer(da):
    from lucene_spark.analysis import positional_pairs_fn
    from lucene_spark.lang import register_hyphenation_compound_analyzer

    register_hyphenation_compound_analyzer(
        "da_hyph_test", "whitespace", da, ["læse", "hest"])
    out = positional_pairs_fn("da_hyph_test")("en læsehest")
    assert ("læsehest", 1) in out
    assert ("læse", 1) in out and ("hest", 1) in out
