"""Golden tests for the analysis chain (FIXTURES.md §3.1–3.2).

Goldens encode the reference semantics: demo HTMLParser.jj extraction and
StandardAnalyzer tokenization (StandardTokenizerImpl.jflex, StandardFilter,
LowerCaseFilter, StopFilter 33-word set).
"""

import pytest

from lucene_spark.analysis import (
    ENGLISH_STOP_WORDS,
    analyze,
    doc_term_stats,
    extract_text,
    extract_title,
    standard_tokenize_typed,
    tokenize,
)
from lucene_spark.fixtures import long_to_english, page_row, pages_pdf

EXTRACT_GOLDENS = [
    (b"<html><body>hello world</body></html>", "hello world"),
    (b"<p>one</p><p>two</p>", "one two"),
    (b"a &amp; b", "a & b"),
    (b"x &lt;tag&gt; y", "x <tag> y"),
    (b"spaces   \t\n  collapse", "spaces collapse"),
    (b"<script>var x = '<nope>';</script>visible", "visible"),
    (b"<SCRIPT a=b>x</SCRIPT>ok", "ok"),
    (b"<style>.c{color:red}</style>text", "text"),
    (b"<!-- secret -->shown", "shown"),
    (b"<!DOCTYPE html>doc", "doc"),
    (b"<title>My Title</title>body only", "body only"),
    (b"<a href='x'>link</a>text", "link text"),
    (b"&#65;&#66;", "AB"),
    (b"", ""),
    (b"no markup at all", "no markup at all"),
    (b"<div>punct, stays.</div>", "punct, stays."),
]

TOKENIZE_GOLDENS = [
    ("Hello World", ["hello", "world"]),
    ("The quick brown fox", ["quick", "brown", "fox"]),  # 'the' is a stopword
    ("O'Reilly's book", ["o'reilly", "book"]),  # 's stripped (APOSTROPHE)
    ("you're right", ["you're", "right"]),
    ("U.S.A. rocks", ["usa", "rocks"]),  # acronym dots stripped
    ("I.B.M", ["i.b.m"]),  # no trailing dot → HOST, dots kept
    ("visit www.example.com now", ["visit", "www.example.com", "now"]),
    ("mail bob@example.com today", ["mail", "bob@example.com", "today"]),
    ("AT&T stock", ["at&t", "stock"]),
    ("version 3.14 shipped", ["version", "3.14", "shipped"]),
    ("model X-500 spec", ["model", "x-500", "spec"]),
    ("wi-fi setup", ["wi", "fi", "setup"]),  # no digit → not NUM, splits
    ("1-2-3 go", ["1-2-3", "go"]),
    ("word, next", ["word", "next"]),
    ("end.Start", ["end.start"]),  # missing space → HOST, genuine Lucene behavior
    ("a an and are", []),  # all stopwords
    ("donut", ["donut"]),
    ("C++ rules", ["c", "rules"]),
    ("42", ["42"]),
    ("twenty one", ["twenty", "one"]),
    ("seven hundred forty", ["seven", "hundred", "forty"]),
    ("x" * 256 + " ok", ["ok"]),  # maxTokenLength 255 drop
    ("x" * 255, ["x" * 255]),
    ("Don't stop", ["don't", "stop"]),
]


@pytest.mark.parametrize("html,expected", EXTRACT_GOLDENS)
def test_extract_text_goldens(html, expected):
    assert extract_text(html) == expected


@pytest.mark.parametrize("text,expected", TOKENIZE_GOLDENS)
def test_tokenize_goldens(text, expected):
    assert tokenize(text) == expected


def test_stopword_set_is_reference_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    for w in ("a", "the", "will", "with", "such", "into"):
        assert w in ENGLISH_STOP_WORDS
    assert "he" not in ENGLISH_STOP_WORDS


def test_positions_have_stopword_holes():
    # 'the' occupies position 1 but is removed → hole
    pairs = analyze("quick the fox")
    assert pairs == [("quick", 0), ("fox", 2)]


def test_token_types():
    typed = standard_tokenize_typed("O'Reilly U.S.A. www.site.com a@b.cd AT&T 99")
    types = [t for t, _ in typed]
    assert types == ["APOSTROPHE", "ACRONYM", "HOST", "EMAIL", "COMPANY", "ALPHANUM"]


def test_doc_term_stats():
    terms, tfs, poss, dl = doc_term_stats("one two one the one")
    d = dict(zip(terms, tfs))
    assert d == {"one": 3, "two": 1}
    assert dl == 4
    assert poss[terms.index("one")] == [0, 2, 4]


def test_extract_title():
    assert extract_title(b"<title>A  B</title><body>x</body>") == "A B"


def test_long_to_english():
    assert long_to_english(0) == "zero"
    assert long_to_english(21) == "twenty one"
    assert long_to_english(121) == "one hundred twenty one"
    assert long_to_english(1005) == "one thousand five"


def test_fixture_invariant_extract_text_roundtrip():
    """THE invariant (BASELINE input_hint): extract_text(html) == text, byte-identical."""
    for i in list(range(25)) + [999, 12345]:
        row = page_row(i)
        assert extract_text(row["html"]) == row["text"], f"doc {i}"


def test_fixture_determinism():
    a = pages_pdf(5)
    b = pages_pdf(5)
    assert a.equals(b)
    assert a["url"].is_unique
