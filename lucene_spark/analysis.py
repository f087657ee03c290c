"""Analysis chain: HTML text extraction + StandardAnalyzer-equivalent tokenization.

Pure Python/numpy functions (usable from pytest without Spark) plus
pandas-batch wrappers for use inside Arrow UDFs. No per-row Python on the
Spark side: batches are processed with compiled regexes in C loops.

Reference semantics reproduced (cites are /root/reference paths):

- HTML extraction: demo HTMLParser grammar
  (src/demo/org/apache/lucene/demo/html/HTMLParser.jj:152-190,217-220,318,342):
  words / decoded entities / punctuation kept, whitespace runs collapsed to a
  single separator, ``<script>``/``<style>`` contents skipped, comments and
  declarations skipped, ``<title>`` captured separately (excluded from body
  text per FIXTURES.md contract).
- Tokenization: StandardTokenizer JFlex grammar
  (src/java/org/apache/lucene/analysis/standard/StandardTokenizerImpl.jflex:55-131)
  with longest-match semantics over ALPHANUM / APOSTROPHE / ACRONYM / COMPANY /
  EMAIL / HOST / NUM / CJ token classes; StandardFilter
  (analysis/standard/StandardFilter.java:58-64) strips trailing ``'s`` from
  APOSTROPHE tokens and dots from ACRONYM tokens; LowerCaseFilter
  (analysis/LowerCaseFilter.java:35); StopFilter with the 33-word English stop
  set (analysis/StopAnalyzer.java:48-54) keeping position holes
  (enablePositionIncrements, analysis/StopFilter.java:45).
- maxTokenLength 255 (analysis/standard/StandardAnalyzer.java:114): longer
  tokens are dropped.
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import Iterable

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Stop words — the exact 33-word set from StopAnalyzer.ENGLISH_STOP_WORDS_SET
# (reference analysis/StopAnalyzer.java:48-54).
# ---------------------------------------------------------------------------
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255

# ---------------------------------------------------------------------------
# HTML extraction
# ---------------------------------------------------------------------------

_RE_SCRIPT = re.compile(rb"(?is)<script\b.*?</script[^<>]*>")
_RE_STYLE = re.compile(rb"(?is)<style\b.*?</style[^<>]*>")
_RE_COMMENT = re.compile(rb"(?s)<!--.*?-->")
_RE_DECL = re.compile(rb"(?s)<![^>]*>")
_RE_TITLE = re.compile(rb"(?is)<title[^>]*>(.*?)</title>")
_RE_TAG = re.compile(rb"(?s)</?[A-Za-z][^>]*>")
_RE_WS = re.compile(r"[ \t\r\n\f]+")


def extract_text(html: bytes | str) -> str:
    """Extract visible text from an HTML byte string.

    Deterministic pure function; the per-url invariant of the engine is
    ``extract_text(html) == text`` byte-identically (BASELINE input_hint).
    Semantics follow the reference demo HTMLParser (HTMLParser.jj): script /
    style / comment / declaration content removed, ``<title>`` excluded from
    body, tags become separators, entities decoded, whitespace runs collapsed
    to a single space, result stripped.
    """
    if html is None:
        return ""
    raw = html.encode("utf-8") if isinstance(html, str) else bytes(html)
    raw = _RE_SCRIPT.sub(b" ", raw)
    raw = _RE_STYLE.sub(b" ", raw)
    raw = _RE_COMMENT.sub(b" ", raw)
    raw = _RE_TITLE.sub(b" ", raw)  # title captured separately, not body text
    raw = _RE_DECL.sub(b" ", raw)
    raw = _RE_TAG.sub(b" ", raw)
    text = raw.decode("utf-8", errors="replace")
    text = _htmllib.unescape(text)
    text = _RE_WS.sub(" ", text).strip()
    return text


def extract_title(html: bytes | str) -> str:
    """Extract the <title> contents (reference HTMLParser.jj title capture)."""
    if html is None:
        return ""
    raw = html.encode("utf-8") if isinstance(html, str) else bytes(html)
    m = _RE_TITLE.search(raw)
    if not m:
        return ""
    t = _htmllib.unescape(m.group(1).decode("utf-8", errors="replace"))
    return _RE_WS.sub(" ", t).strip()


# ---------------------------------------------------------------------------
# StandardTokenizer
#
# JFlex uses longest-match with rule-order tie-breaks. We implement this in
# two layers:
#   1. a C-speed span regex that finds maximal "token-ish" spans (token chars
#      joined by the connector chars ' & @ _ . , - /),
#   2. within each span, either the trivial single-token fast path (no
#      connectors — the overwhelmingly common case) or an exact longest-match
#      scanner over the JFlex rules.
# Token *type* only matters where it changes the emitted text (APOSTROPHE 's
# strip, ACRONYM dot strip) or token boundaries (NUM digit constraints), so
# the scanner tracks exactly those distinctions.
# ---------------------------------------------------------------------------

# CJ ranges (StandardTokenizerImpl.jflex:129-131): Chinese & Japanese, not Korean.
_CJ_CLASS = (
    "㄀-ㄯ぀-ゟ゠-ヿㇰ-ㇿ"
    "㌀-㍿㐀-䶿一-鿿豈-﫿･-ﾟ"
)
_CJ_RE = re.compile(f"[{_CJ_CLASS}]")

# LETTER = unicode letter minus CJ; ALPHANUM adds digits. [^\W\d_] = unicode letter.
_L = f"(?:(?![{_CJ_CLASS}])[^\\W\\d_])"  # LETTER
_AN = f"(?:{_L}|\\d)"  # ALPHANUM char
_ALPHANUM = f"{_AN}+"
_ALPHA = f"{_L}+"
_HAS_DIGIT = f"(?:{_L}|\\d)*\\d(?:{_L}|\\d)*"
_P = r"[_\-/.,]"

_EMAIL = f"{_ALPHANUM}(?:[._-]{_ALPHANUM})*@{_ALPHANUM}(?:[.-]{_ALPHANUM})+"
_APOSTROPHE = f"{_ALPHA}(?:'{_ALPHA})+"
_ACRONYM = f"{_L}\\.(?:{_L}\\.)+"
_COMPANY = f"{_ALPHA}[&@]{_ALPHA}"
_HOST = f"{_ALPHANUM}(?:\\.{_ALPHANUM})+"
_NUM = (
    f"(?:{_ALPHANUM}{_P}{_HAS_DIGIT}(?:{_P}{_ALPHANUM}{_P}{_HAS_DIGIT})*(?:{_P}{_ALPHANUM})?"
    f"|{_HAS_DIGIT}{_P}{_ALPHANUM}(?:{_P}{_HAS_DIGIT}{_P}{_ALPHANUM})*(?:{_P}{_HAS_DIGIT})?)"
)
_CJ_TOK = f"[{_CJ_CLASS}]"

# Longest-match emulation: each rule compiled separately; the scanner takes
# the max match length, ties broken by JFlex rule order (ALPHANUM, APOSTROPHE,
# ACRONYM, COMPANY, EMAIL, HOST, NUM, CJ — jflex:135-143).
_RULES: list[tuple[str, re.Pattern[str]]] = [
    ("ALPHANUM", re.compile(_ALPHANUM)),
    ("APOSTROPHE", re.compile(_APOSTROPHE)),
    ("ACRONYM", re.compile(_ACRONYM)),
    ("COMPANY", re.compile(_COMPANY)),
    ("EMAIL", re.compile(_EMAIL)),
    ("HOST", re.compile(_HOST)),
    ("NUM", re.compile(_NUM)),
    ("CJ", re.compile(_CJ_TOK)),
]

# Maximal token-ish spans: token chars joined by connectors. A connector only
# binds if surrounded by token chars (so "word, next" yields span "word").
_TOKCH = f"(?:[^\\W_]|[{_CJ_CLASS}])"
# trailing dots kept in the span so ACRONYMs ("U.S.A.") see their final dot;
# a trailing dot is inert for every other rule (scanner skips bare connectors)
_RE_SPAN = re.compile(f"{_TOKCH}+(?:['&@_.,/\\-]+{_TOKCH}+)*\\.*")
_RE_SIMPLE = re.compile(f"^[^\\W_]+$")  # no connectors, no CJ → one ALPHANUM
_RE_SIMPLE_CJ = re.compile(f"[{_CJ_CLASS}]")


def _scan_span(span: str, rules=None) -> list[tuple[str, str]]:
    """Exact longest-match scan of one span → [(type, raw_text)].
    ``rules`` overrides the JFlex tie-break ORDER (WikipediaTokenizerImpl
    .jflex:181-187 places NUM before HOST, unlike the standard grammar)."""
    out: list[tuple[str, str]] = []
    pos, n = 0, len(span)
    while pos < n:
        best_len = 0
        best: tuple[str, str] | None = None
        for typ, pat in (rules if rules is not None else _RULES):
            m = pat.match(span, pos)
            if m is not None:
                ln = m.end() - pos
                if ln > best_len:
                    best_len = ln
                    best = (typ, m.group())
        if best is None:
            pos += 1  # skip non-token char (connector run, stray punct)
            continue
        out.append(best)
        pos += best_len
    return out


def standard_tokenize_typed(text: str) -> list[tuple[str, str]]:
    """StandardTokenizer: text → [(token_type, raw_token)], pre-filters."""
    out: list[tuple[str, str]] = []
    append = out.append
    extend = out.extend
    simple_match = _RE_SIMPLE.match
    cj_search = _RE_SIMPLE_CJ.search
    for m in _RE_SPAN.finditer(text):
        span = m.group()
        # ASCII fast path (the overwhelming case): C-level isascii/isalnum
        # ≡ _RE_SIMPLE without CJ ('_' fails isalnum, so the [^\W_] set
        # matches exactly); non-ASCII spans take the regex checks
        if span.isascii():
            if span.isalnum():
                append(("ALPHANUM", span))
            else:
                extend(_scan_span(span))
        elif simple_match(span) and not cj_search(span):
            append(("ALPHANUM", span))
        else:
            extend(_scan_span(span))
    return out


def _standard_filter(typ: str, tok: str) -> str:
    """StandardFilter.java:58-64 — 's strip on APOSTROPHE, dot strip on ACRONYM."""
    if typ == "APOSTROPHE" and (tok.endswith("'s") or tok.endswith("'S")):
        return tok[:-2]
    if typ == "ACRONYM":
        return tok.replace(".", "")
    return tok


def analyze(text: str) -> list[tuple[str, int]]:
    """Full StandardAnalyzer chain → [(term, position)] with stopword holes.

    Pipeline (StandardAnalyzer.java:99-104): StandardTokenizer → StandardFilter
    → LowerCaseFilter → StopFilter(33 words, position increments preserved).
    Tokens longer than 255 chars dropped (maxTokenLength). Positions are
    0-based token indexes in the pre-stop stream, so removed stopwords leave
    gaps (StopFilter.java:45 enablePositionIncrements).
    """
    out: list[tuple[str, int]] = []
    append = out.append
    stop = ENGLISH_STOP_WORDS
    maxlen = MAX_TOKEN_LENGTH
    pos = 0
    for typ, raw in standard_tokenize_typed(text):
        if len(raw) > maxlen:
            # StandardTokenizer skips over-long tokens but still advances
            # the position (a position hole, like a stopword) — phrase
            # adjacency must not collapse across the skipped token
            pos += 1
            continue
        # ALPHANUM (the common type) is a no-op in StandardFilter
        term = (raw if typ == "ALPHANUM" else _standard_filter(typ, raw)).lower()
        if term in stop:
            pos += 1  # hole: position increment carries over
            continue
        append((term, pos))
        pos += 1
    return out


def tokenize(text: str) -> list[str]:
    """Terms only (analyze() minus positions)."""
    return [t for t, _ in analyze(text)]


# ---------------------------------------------------------------------------
# Simple analyzers (reference WhitespaceTokenizer / SimpleAnalyzer /
# KeywordTokenizer — analysis/WhitespaceTokenizer.java:38, LetterTokenizer.java:45,
# KeywordTokenizer.java:30)
# ---------------------------------------------------------------------------

_RE_LETTER_RUN = re.compile(r"[^\W\d_]+")


def whitespace_tokenize(text: str) -> list[str]:
    return text.split()


def simple_tokenize(text: str) -> list[str]:
    """SimpleAnalyzer: letter runs, lowercased."""
    return [m.group().lower() for m in _RE_LETTER_RUN.finditer(text)]


def keyword_tokenize(text: str) -> list[str]:
    return [text] if text else []


ANALYZERS = {
    "standard": tokenize,
    "whitespace": whitespace_tokenize,
    "simple": simple_tokenize,
    "keyword": keyword_tokenize,
}


# ---------------------------------------------------------------------------
# pandas-batch wrappers (called from Arrow UDFs — batch in, batch out;
# the regex work runs in C via re on each string, no Spark-side per-row Python)
# ---------------------------------------------------------------------------

def extract_text_batch(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def analyze_batch(text: pd.Series) -> tuple[pd.Series, pd.Series]:
    """→ (terms: Series[list[str]], positions: Series[list[int]])."""
    terms: list[list[str]] = []
    positions: list[list[int]] = []
    for t in text:
        pairs = analyze(t or "")
        terms.append([p[0] for p in pairs])
        positions.append([p[1] for p in pairs])
    return pd.Series(terms, index=text.index), pd.Series(positions, index=text.index)


def doc_term_stats(text: str) -> tuple[list[str], list[int], list[list[int]], int]:
    """Per-doc inverted view: (unique_terms, tfs, positions_per_term, doclen).

    doclen counts post-stop tokens (reference FieldInvertState.length —
    index/FieldInvertState.java:30 — counts tokens the inverter sees, i.e.
    after the stop filter).
    """
    pairs = analyze(text or "")
    agg: dict[str, list[int]] = {}
    for term, pos in pairs:
        agg.setdefault(term, []).append(pos)
    terms = list(agg.keys())
    return (
        terms,
        [len(agg[t]) for t in terms],
        [agg[t] for t in terms],
        len(pairs),
    )


# ---------------------------------------------------------------------------
# Optional token filters (SURVEY.md §2.2): Porter stemmer
# (analysis/PorterStemFilter.java:49 — Lucene ports Martin Porter's canonical
# C implementation, including its two marked departures from the 1980 paper:
# step2 bli→ble and logi→log), ASCIIFoldingFilter (analysis/ASCIIFoldingFilter
# .java:60, approximated via NFKD + combining-mark strip), LengthFilter
# (analysis/LengthFilter.java:27), ShingleFilter (contrib shingle/
# ShingleFilter.java), NGramTokenizer (contrib ngram/NGramTokenizer.java).
# ---------------------------------------------------------------------------


def _p_is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return False
    if c == "y":
        return i == 0 or not _p_is_cons(w, i - 1)
    return True


def _p_measure(w: str, j: int) -> int:
    """Number of VC sequences in w[:j+1] (Porter's m)."""
    m = 0
    i = 0
    n = j + 1
    while True:
        if i >= n:
            return m
        if not _p_is_cons(w, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i >= n:
                return m
            if _p_is_cons(w, i):
                break
            i += 1
        i += 1
        m += 1
        while True:
            if i >= n:
                return m
            if not _p_is_cons(w, i):
                break
            i += 1
        i += 1


def _p_has_vowel(w: str, j: int) -> bool:
    return any(not _p_is_cons(w, i) for i in range(j + 1))


def _p_double_cons(w: str, j: int) -> bool:
    return j >= 1 and w[j] == w[j - 1] and _p_is_cons(w, j)


def _p_cvc(w: str, j: int) -> bool:
    if j < 2 or not _p_is_cons(w, j) or _p_is_cons(w, j - 1) or not _p_is_cons(w, j - 2):
        return False
    return w[j] not in "wxy"


def porter_stem(word: str) -> str:
    """Porter stemmer, Martin Porter's canonical variant (what the reference
    PorterStemFilter ships). Lowercase ASCII input assumed."""
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag = False
    if w.endswith("eed"):
        if _p_measure(w, len(w) - 4) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _p_has_vowel(w, len(w) - 3):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _p_has_vowel(w, len(w) - 4):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _p_double_cons(w, len(w) - 1) and w[-1] not in "lsz":
            w = w[:-1]
        elif _p_measure(w, len(w) - 1) == 1 and _p_cvc(w, len(w) - 1):
            w += "e"

    # step 1c
    if w.endswith("y") and _p_has_vowel(w, len(w) - 2):
        w = w[:-1] + "i"

    def replace(suffixes: list[tuple[str, str]], min_m: int = 1) -> None:
        nonlocal w
        for suf, rep in suffixes:
            if w.endswith(suf):
                stem_j = len(w) - len(suf) - 1
                if stem_j >= 0 and _p_measure(w, stem_j) >= min_m:
                    w = w[: len(w) - len(suf)] + rep
                return

    # step 2 (m>0) — canonical variant: bli→ble, logi→log departures
    replace([
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
        ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
        ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
    ])

    # step 3 (m>0)
    replace([
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ])

    # step 4 (m>1)
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if w.endswith(suf):
            stem_j = len(w) - len(suf) - 1
            if stem_j >= 0 and _p_measure(w, stem_j) > 1:
                if suf == "ion" and w[stem_j] not in "st":
                    pass  # ion only drops after s/t
                else:
                    w = w[: len(w) - len(suf)]
            break

    # step 5a
    if w.endswith("e"):
        m = _p_measure(w, len(w) - 2)
        if m > 1 or (m == 1 and not _p_cvc(w, len(w) - 2)):
            w = w[:-1]
    # step 5b
    if w.endswith("ll") and _p_measure(w, len(w) - 1) > 1:
        w = w[:-1]
    return w


def ascii_fold(text: str) -> str:
    """Fold accented/extended-Latin characters to ASCII (reference
    ASCIIFoldingFilter semantics for the Latin ranges, approximated via
    Unicode NFKD decomposition + combining-mark removal)."""
    import unicodedata

    out = []
    for ch in text:
        if ord(ch) < 128:
            out.append(ch)
            continue
        dec = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in dec if not unicodedata.combining(c)
                       and ord(c) < 128)
        # a few common non-decomposable Latin letters
        kept = kept or {"ß": "ss", "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O",
                        "đ": "d", "Đ": "D", "þ": "th", "Þ": "TH",
                        "ł": "l", "Ł": "L", "œ": "oe", "Œ": "OE"}.get(ch, "")
        out.append(kept)
    return "".join(out)


def length_filter(tokens: list[str], min_len: int = 1,
                  max_len: int = MAX_TOKEN_LENGTH) -> list[str]:
    """Drop tokens outside [min_len, max_len] (analysis/LengthFilter.java:27)."""
    return [t for t in tokens if min_len <= len(t) <= max_len]


def shingles(tokens: list[str], max_shingle: int = 2, sep: str = " ",
             output_unigrams: bool = True) -> list[str]:
    """Token shingles (word n-grams), unigrams included by default —
    contrib shingle/ShingleFilter.java behaviour."""
    out = list(tokens) if output_unigrams else []
    for n in range(2, max_shingle + 1):
        for i in range(len(tokens) - n + 1):
            out.append(sep.join(tokens[i:i + n]))
    return out


def ngram_tokenize(text: str, min_n: int = 2, max_n: int = 3) -> list[str]:
    """Character n-grams (contrib ngram/NGramTokenizer.java): all n-grams of
    each length, shorter-first, left-to-right."""
    out = []
    for n in range(min_n, max_n + 1):
        for i in range(len(text) - n + 1):
            out.append(text[i:i + n])
    return out


def analyze_english(text: str) -> list[tuple[str, int]]:
    """StandardAnalyzer chain + PorterStemFilter — the classic English
    analysis chain (StandardAnalyzer → ... → StopFilter → PorterStemFilter,
    the usual reference composition for English corpora)."""
    return [(porter_stem(t), p) for t, p in analyze(text)]


# ---------------------------------------------------------------------------
# chain-composition utilities (SURVEY §2.2 "note for parity" filters)
# ---------------------------------------------------------------------------

def make_mapping_char_filter(mapping: dict[str, str]):
    """MappingCharFilter (analysis/MappingCharFilter.java:30): char-sequence
    normalization BEFORE tokenization, longest match wins at each position
    (the reference's NormalizeCharMap trie). Returns text → text."""
    import re as _re

    if not mapping:
        return lambda text: text
    alt = "|".join(_re.escape(k) for k in
                   sorted(mapping, key=len, reverse=True))
    rx = _re.compile(alt)
    return lambda text: rx.sub(lambda m: mapping[m.group(0)], text or "")


def make_keyword_marker(stem, keywords: set[str]):
    """KeywordMarkerTokenFilter (analysis/KeywordMarkerTokenFilter.java:34):
    terms in `keywords` pass the downstream stemmer untouched (the keyword
    attribute the reference sets so PorterStemFilter skips them)."""
    kw = set(keywords)
    return lambda term: term if term in kw else stem(term)


def tee_sink(pairs: list[tuple[str, int]], *sinks):
    """TeeSinkTokenFilter (analysis/TeeSinkTokenFilter.java:75): one
    analysis pass feeds several consumers. The token stream is already a
    materialized list here, so the tee is: apply every sink to the SAME
    list (no re-analysis). Returns one result per sink."""
    return tuple(sink(pairs) for sink in sinks)


def cached_analyzer(name: str, maxsize: int = 4096):
    """CachingTokenFilter analog (analysis/CachingTokenFilter.java:36): a
    memoized positional analyzer — repeated analysis of the same text
    (reference: a query body consumed by several clauses) is served from an
    LRU cache instead of re-running the chain."""
    from functools import lru_cache

    base = positional_pairs_fn(name)

    @lru_cache(maxsize=maxsize)
    def cached(text: str) -> tuple:
        return tuple(base(text))

    return lambda text: list(cached(text or ""))


def make_chain(char_filters=(), tokenizer=None, token_filters=(),
               pair_filters=()):
    """Compose a custom positional analyzer from char filters (text→text),
    a tokenizer name or positional fn, per-term filters (term→term or
    None to drop), and pair filters (pairs→pairs — the 1:many seam for
    filters that inject tokens, e.g. make_synonym_injector) — the
    Analyzer/TokenFilter extension seam of the reference expressed
    functionally. Registerable via ANALYZERS / POSITIONAL_ANALYZERS for
    build_index(field_analyzers=...)."""
    tok = tokenizer or analyze
    if isinstance(tok, str):
        tok = positional_pairs_fn(tok)

    def chain(text: str) -> list[tuple[str, int]]:
        for cf in char_filters:
            text = cf(text or "")
        pairs = tok(text or "")
        for tf in token_filters:
            pairs = [(t2, p) for t, p in pairs
                     for t2 in (tf(t),) if t2]
        for pf in pair_filters:
            pairs = pf(pairs)
        return pairs

    return chain


def make_synonym_injector(synonyms: dict, max_synonyms: int | None = None):
    """Index-time synonym injection (contrib/wordnet
    SynonymTokenFilter.java:35): for each token, emit the token followed
    by its synonyms AT THE SAME POSITION (the reference's
    positionIncrement=0 stack), so phrases and spans match through
    synonyms. `max_synonyms` caps the injected count per token; the
    reference RANDOMIZES which survive over the cap
    (SynonymTokenFilter.java:93 randomize()) — here the cap is
    deterministic first-N in the map's order, because a reproducible
    index beats unbiased truncation for this engine's resume/merge
    identities. Use as a make_chain pair filter."""
    def inject(pairs):
        out = []
        for t, p in pairs:
            out.append((t, p))
            syns = synonyms.get(t, ())
            if max_synonyms is not None:
                syns = list(syns)[:max_synonyms]
            out.extend((s, p) for s in syns)
        return out

    return inject


ANALYZERS["english"] = lambda text: [t for t, _ in analyze_english(text)]
POSITIONAL_ANALYZERS = {"standard": analyze, "english": analyze_english}


def _ensure_registered(name: str) -> None:
    """Lazy-load the contrib language pack on a registry miss so
    ``build_index(analyzer="german")`` etc. work without an explicit
    ``import lucene_spark.lang`` (the pack registers its 15 chains at
    import)."""
    if name not in ANALYZERS and name not in POSITIONAL_ANALYZERS:
        from . import lang  # noqa: F401 — import side effect: register()
    if name == "wikipedia" and name not in POSITIONAL_ANALYZERS:
        from . import wiki  # noqa: F401 — register() at import


def get_analyzer(name: str, default: str = "whitespace"):
    """Simple (terms-only) analyzer by name, language pack included;
    unknown names fall back to `default` (the parser's contract)."""
    _ensure_registered(name)
    return ANALYZERS.get(name, ANALYZERS[default])


def positional_pairs_fn(name: str):
    """Analyzer name → fn(text) -> [(term, pos)]. THE single definition of
    the position-assignment rule for simple (non-positional) chains:
    consecutive positions 0..n-1, no holes. Build side, oracle, caching
    wrapper, and chain composer all resolve through here — the
    engine/oracle analysis-identity contract depends on one copy."""
    _ensure_registered(name)
    pa = POSITIONAL_ANALYZERS.get(name)
    if pa is not None:
        return lambda text: pa(text or "")
    simple = ANALYZERS[name]

    def fn(text):
        toks = simple(text or "")
        return list(zip(toks, range(len(toks))))
    return fn
