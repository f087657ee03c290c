"""Contrib language analyzers: 14 reference analysis chains + filters.

Spark-first shape: each analyzer is a pure ``text → [(term, position)]``
function (exactly the seam ``analysis.positional_pairs_fn`` serves), so the
chains run inside the existing Arrow-batched build UDF and the query parser
with zero new plan shapes. Importing this package registers every chain in
``analysis.ANALYZERS`` / ``POSITIONAL_ANALYZERS`` under its language name,
usable as ``build_index(analyzer="german")``, per-field via
``field_analyzers``, or per-document via ``analyzer="by_lang"`` (routes each
row through its ``lang`` column's chain — the Common-Crawl multilingual
corpus shape; unknown/missing lang falls back to "standard").

Reference chain order per analyzer (cites /root/reference/contrib/analyzers/
common/src/java/org/apache/lucene/analysis/<pkg>/<Name>Analyzer.java
createComponents; the classic pre-3.1 chains with their own algorithmic
stemmers are implemented — the 3.1+ variants that swap in tartarus snowball
stemmers are out of scope, stated deviation):

- german     Standard → StandardFilter → lower → stop → GermanStemmer
- french     Standard → StandardFilter → stop(UNLOWERED) → FrenchStemmer
             → lower  (the reference lowercases AFTER stemming pre-3.1)
- dutch      Standard → StandardFilter → stop(UNLOWERED) → DutchStemmer
- brazilian  Standard → lower → StandardFilter → stop → BrazilianStemmer
- czech      Standard → StandardFilter → lower → stop → CzechStemmer (3.1)
- russian    RussianLetterTokenizer → lower → stop → RussianStemmer
- bulgarian  Standard → StandardFilter → lower → stop → BulgarianStemmer
- greek      Standard → GreekLowerCase → StandardFilter → stop
- arabic     ArabicLetterTokenizer → lower → stop → normalize → stem
- persian    ArabicLetterTokenizer → lower → ar-normalize → fa-normalize
             → stop
- hindi      IndicTokenizer → lower → IndicNormalizer → HindiNormalizer
             → stop → HindiStemmer
- spanish    Standard → StandardFilter → lower → stop → snowball
             SpanishStemmer (the one 3.1+ snowball chain implemented —
             es has no classic contrib stemmer and the test corpus is
             partly Spanish; lang/spanish.py follows the published
             algorithm definition)
- turkish    Standard → StandardFilter → TurkishLowerCase → stop
             (snowball TurkishStemmer out of scope, stated deviation)
- cjk        CJKTokenizer (overlapping bigrams) → stop
- chinese    ChineseTokenizer (unigrams) → ChineseFilter

StopFilter semantics everywhere: position increments preserved (holes), the
reference default since 2.9 (StopFilter.java:45). Utility filters from the
remaining contrib packages (reverse/position/ngram/fr-Elision) are exported
for make_chain composition.
"""

from __future__ import annotations

from ..analysis import (ANALYZERS, MAX_TOKEN_LENGTH, POSITIONAL_ANALYZERS,
                        _standard_filter, standard_tokenize_typed)
from . import stopdata as _sw
from .stemmers import (arabic_normalize, arabic_stem, brazilian_stem,
                       bulgarian_stem, czech_stem, dutch_stem, french_stem,
                       german_stem, greek_lower, hindi_normalize, hindi_stem,
                       indic_normalize, persian_normalize, russian_stem,
                       turkish_lower)
from .tokenizers import (arabic_letter_tokenize, chinese_filter,
                         chinese_tokenize, cjk_tokenize, indic_tokenize)

__all__ = [
    "register", "LANG_CHAINS", "make_elision", "reverse_token",
    "position_filter", "edge_ngrams", "ngram_filter",
    "make_compound_decomposer", "register_compound_analyzer",
    "register_hyphenation_compound_analyzer",
]


# ---------------------------------------------------------------------------
# chain plumbing: every chain yields [(term, pos)] with stopword holes
# ---------------------------------------------------------------------------

def _std_stream(text: str):
    """StandardTokenizer stream with the >255-char position-hole rule the
    core analyzer applies — yields (type, raw, pos)."""
    pos = 0
    for typ, raw in standard_tokenize_typed(text or ""):
        if len(raw) > MAX_TOKEN_LENGTH:
            pos += 1
            continue
        yield typ, raw, pos
        pos += 1


def _hole_stop(pairs, stop):
    """StopFilter with position increments: input [(term, pos)] already
    positioned; dropped terms leave their position hole."""
    return [(t, p) for t, p in pairs if t not in stop]


def _enumerate_pairs(tokens):
    return list(zip(tokens, range(len(tokens))))


def analyze_german(text: str):
    out = []
    for typ, raw, pos in _std_stream(text):
        t = _standard_filter(typ, raw).lower()
        if t in _sw.GERMAN_STOP:
            continue
        out.append((german_stem(t), pos))
    return out


def analyze_french(text: str):
    out = []
    for typ, raw, pos in _std_stream(text):
        t = _standard_filter(typ, raw)
        if t in _sw.FRENCH_STOP:  # stop BEFORE lowercasing (pre-3.1 quirk)
            continue
        out.append((french_stem(t).lower(), pos))
    return out


def analyze_dutch(text: str):
    out = []
    for typ, raw, pos in _std_stream(text):
        t = _standard_filter(typ, raw)
        if t in _sw.DUTCH_STOP:  # unlowered match, like the reference
            continue
        out.append((dutch_stem(t), pos))
    return out


def analyze_brazilian(text: str):
    out = []
    for typ, raw, pos in _std_stream(text):
        t = _standard_filter(typ, raw.lower())
        if t in _sw.BRAZILIAN_STOP:
            continue
        stemmed = brazilian_stem(t)
        out.append((t if stemmed is None else stemmed, pos))
    return out


def analyze_czech(text: str):
    out = []
    for typ, raw, pos in _std_stream(text):
        t = _standard_filter(typ, raw).lower()
        if t in _sw.CZECH_STOP:
            continue
        out.append((czech_stem(t), pos))
    return out


def analyze_bulgarian(text: str):
    out = []
    for typ, raw, pos in _std_stream(text):
        t = _standard_filter(typ, raw).lower()
        if t in _sw.BULGARIAN_STOP:
            continue
        out.append((bulgarian_stem(t), pos))
    return out


def analyze_greek(text: str):
    out = []
    for typ, raw, pos in _std_stream(text):
        t = _standard_filter(typ, greek_lower(raw))
        if t in _sw.GREEK_STOP:
            continue
        out.append((t, pos))
    return out


def analyze_turkish(text: str):
    out = []
    for typ, raw, pos in _std_stream(text):
        t = turkish_lower(_standard_filter(typ, raw))
        if t in _sw.TURKISH_STOP:
            continue
        out.append((t, pos))
    return out


def analyze_russian(text: str):
    import re as _re
    toks = _re.findall(r"[^\W_]+", text or "", _re.UNICODE)
    out = []
    for pos, raw in enumerate(toks):
        t = raw.lower()
        if t in _sw.RUSSIAN_STOP:
            continue
        out.append((russian_stem(t), pos))
    return out


def analyze_arabic(text: str):
    out = []
    for pos, raw in enumerate(arabic_letter_tokenize(text or "")):
        t = raw.lower()
        if t in _sw.ARABIC_STOP:  # the stop list is NOT normalized
            continue
        out.append((arabic_stem(arabic_normalize(t)), pos))
    return out


def analyze_persian(text: str):
    out = []
    for pos, raw in enumerate(arabic_letter_tokenize(text or "")):
        t = persian_normalize(arabic_normalize(raw.lower()))
        if t in _sw.PERSIAN_STOP:  # the stop list IS normalized
            continue
        out.append((t, pos))
    return out


def analyze_hindi(text: str):
    out = []
    for pos, raw in enumerate(indic_tokenize(text or "")):
        t = hindi_normalize(indic_normalize(raw.lower()))
        if t in _sw.HINDI_STOP:
            continue
        out.append((hindi_stem(t), pos))
    return out


def analyze_spanish(text: str):
    # SpanishAnalyzer (es/SpanishAnalyzer.java createComponents):
    # Standard → StandardFilter → lower → stop(snowball list) → snowball
    # SpanishStemmer (lang/spanish.py — published algorithm, the reference
    # ships only the generated tartarus Java)
    from .spanish import spanish_stem
    out = []
    for typ, raw, pos in _std_stream(text):
        t = _standard_filter(typ, raw).lower()
        if t in _sw.SPANISH_STOP:
            continue
        out.append((spanish_stem(t), pos))
    return out


def analyze_cjk(text: str):
    pairs = [(tok, pos) for pos, (_typ, tok)
             in enumerate(cjk_tokenize(text or ""))]
    return _hole_stop(pairs, _sw.CJK_STOP)


def analyze_chinese(text: str):
    # ChineseFilter drops tokens WITHOUT leaving holes (cn/ChineseFilter.java
    # has no position-increment handling)
    return _enumerate_pairs(chinese_filter(chinese_tokenize(text or "")))


def _snowball_chain(stop, stem_fn):
    """SnowballAnalyzer chain (contrib snowball/SnowballAnalyzer.java:76
    tokenStream): StandardTokenizer → StandardFilter → LowerCase → Stop →
    SnowballFilter. Stop lists are the snowball resource files the
    reference ships (contrib resources snowball/*_stop.txt)."""
    def chain(text: str):
        out = []
        for typ, raw, pos in _std_stream(text):
            t = _standard_filter(typ, raw).lower()
            if t in stop:
                continue
            out.append((stem_fn(t), pos))
        return out
    return chain


def _make_nordic_chains():
    from .nordic import (danish_stem, finnish_stem, norwegian_stem,
                         swedish_stem)
    return {
        "danish": _snowball_chain(_sw.DANISH_STOP, danish_stem),
        "norwegian": _snowball_chain(_sw.NORWEGIAN_STOP, norwegian_stem),
        "swedish": _snowball_chain(_sw.SWEDISH_STOP, swedish_stem),
        "finnish": _snowball_chain(_sw.FINNISH_STOP, finnish_stem),
    }


LANG_CHAINS = {
    "german": analyze_german,
    "french": analyze_french,
    "dutch": analyze_dutch,
    "brazilian": analyze_brazilian,
    "czech": analyze_czech,
    "bulgarian": analyze_bulgarian,
    "greek": analyze_greek,
    "turkish": analyze_turkish,
    "russian": analyze_russian,
    "spanish": analyze_spanish,
    "arabic": analyze_arabic,
    "persian": analyze_persian,
    "hindi": analyze_hindi,
    "cjk": analyze_cjk,
    "chinese": analyze_chinese,
    **_make_nordic_chains(),
}

# ISO-639-1 lang-column codes → chain names (the documents/pages tables
# carry 2-letter codes); English routes to the standard chain
LANG_CODES = {
    "de": "german", "fr": "french", "nl": "dutch", "pt": "brazilian",
    "es": "spanish", "cs": "czech", "bg": "bulgarian", "el": "greek",
    "tr": "turkish",
    "ru": "russian", "ar": "arabic", "fa": "persian", "hi": "hindi",
    "zh": "cjk", "ja": "cjk", "ko": "cjk", "en": "standard",
    "da": "danish", "no": "norwegian", "nb": "norwegian",
    "nn": "norwegian", "sv": "swedish", "fi": "finnish",
}


def analyze_by_lang(text: str, lang: str | None = None):
    """Per-document routing: the ``lang`` column picks the chain
    (ISO code or chain name); unknown/missing lang → standard chain.
    The reference has no single-analyzer equivalent — routing is the
    PerFieldAnalyzerWrapper idea turned row-wise for a multilingual crawl."""
    from ..analysis import analyze as _standard
    name = LANG_CODES.get((lang or "").lower(), (lang or "").lower())
    chain = LANG_CHAINS.get(name)
    return chain(text) if chain is not None else _standard(text or "")


# ---------------------------------------------------------------------------
# utility filters (contrib fr/ElisionFilter, reverse/, position/, ngram/)
# for make_chain composition
# ---------------------------------------------------------------------------

def make_compound_decomposer(dictionary, min_word_size: int = 5,
                             min_subword_size: int = 2,
                             max_subword_size: int = 15,
                             only_longest_match: bool = False):
    """DictionaryCompoundWordTokenFilter
    (contrib/analyzers/.../compound/DictionaryCompoundWordTokenFilter.java
    decomposeInternal:192-223 + CompoundWordTokenFilterBase.java): brute-
    force Germanic compound splitting — the original token is always kept,
    and every dictionary word found inside it is ADDED at the SAME
    position (createToken sets positionIncrement 0,
    CompoundWordTokenFilterBase.java:249), so "donaudampfschiff" also
    matches queries for "schiff". Matching is lowercase; emitted subwords
    slice the ORIGINAL buffer.

    The reference's loop bounds are reproduced verbatim, including the
    known quirk that subwords of length ``minSubwordSize - 1`` can match
    (``for j = minSubwordSize - 1 ...``, fixed upstream only much later):
    golden behavior, not an off-by-one here.

    Returns a PAIRS filter: [(term, pos)] → [(term, pos)], composable
    with any chain (wrap a chain like
    ``lambda text: decomp(chain(text))``)."""
    dic = {w.lower() for w in dictionary}

    def decompose(pairs):
        out = []
        for term, pos in pairs:
            out.append((term, pos))
            n = len(term)
            if n < min_word_size:
                continue
            low = term.lower()
            for i in range(0, n - min_subword_size):
                longest = None
                for j in range(min_subword_size - 1, max_subword_size):
                    if i + j > n:
                        break
                    if low[i:i + j] in dic:
                        if only_longest_match:
                            if longest is None or len(longest) < j:
                                longest = term[i:i + j]
                        else:
                            out.append((term[i:i + j], pos))
                if only_longest_match and longest is not None:
                    out.append((longest, pos))
        return out

    return decompose


def register_compound_analyzer(name: str, base: str, dictionary,
                               **kw) -> None:
    """Register ``name`` as ``base`` chain + dictionary compound
    decomposition — usable as build_index(analyzer=name) or per-field."""
    from ..analysis import positional_pairs_fn

    base_fn = positional_pairs_fn(base)
    decomp = make_compound_decomposer(dictionary, **kw)

    def chain(text: str):
        return decomp(base_fn(text))

    POSITIONAL_ANALYZERS[name] = chain
    ANALYZERS[name] = lambda text: [t for t, _ in chain(text)]


def register_hyphenation_compound_analyzer(name: str, base: str,
                                           patterns, dictionary,
                                           **kw) -> None:
    """Hyphenation twin of register_compound_analyzer
    (HyphenationCompoundWordTokenFilter — lang/hyphenation.py):
    ``patterns`` is a HyphenationPatterns (parse_hyphenation_xml for FOP
    pattern files) and subwords come from dictionary-checked substrings
    between hyphenation points."""
    from ..analysis import positional_pairs_fn
    from .hyphenation import make_hyphenation_decomposer

    base_fn = positional_pairs_fn(base)
    decomp = make_hyphenation_decomposer(patterns, dictionary, **kw)

    def chain(text: str):
        return decomp(base_fn(text))

    POSITIONAL_ANALYZERS[name] = chain
    ANALYZERS[name] = lambda text: [t for t, _ in chain(text)]


_DEFAULT_ARTICLES = frozenset(("l", "m", "t", "qu", "n", "s", "j"))


def make_elision(articles=_DEFAULT_ARTICLES):
    """ElisionFilter (fr/ElisionFilter.java:72): strip everything through
    the FIRST apostrophe (' or U+2019) when the prefix is an article
    (case-insensitive). Use as a make_chain token filter."""
    arts = frozenset(a.lower() for a in articles)

    def elide(term: str) -> str:
        cut = len(term)
        for apos in ("'", "’"):
            p = term.find(apos)
            if p != -1:
                cut = min(cut, p)
        if cut < len(term) and term[:cut].lower() in arts:
            return term[cut + 1:]
        return term

    return elide


def reverse_token(term: str, marker: str = "") -> str:
    """ReverseStringFilter (reverse/ReverseStringFilter.java:101): reverse
    the term, optionally appending a marker BEFORE reversal (so it lands at
    the front — the leading-wildcard trick: index reversed terms, rewrite
    ``*suffix`` into a prefix scan over them)."""
    return (term + marker)[::-1]


def position_filter(pairs, position_increment: int = 0):
    """PositionFilter (position/PositionFilter.java:44): first token keeps
    its position, every later token advances by `position_increment`
    (0 = stack the whole stream at one position). A make_chain pair filter."""
    out = []
    cur = None
    for i, (t, p) in enumerate(pairs):
        if i == 0:
            cur = p
        else:
            cur += position_increment
        out.append((t, cur))
    return out


def edge_ngrams(term: str, min_gram: int = 1, max_gram: int = 1,
                side: str = "front") -> list[str]:
    """EdgeNGramTokenFilter (ngram/EdgeNGramTokenFilter.java:98): grams of
    increasing size anchored at the front (or back) edge; grams longer than
    the term are not emitted."""
    out = []
    for n in range(min_gram, max_gram + 1):
        if n > len(term):
            break
        out.append(term[:n] if side == "front" else term[len(term) - n:])
    return out


def ngram_filter(term: str, min_gram: int = 1, max_gram: int = 2) -> list[str]:
    """NGramTokenFilter (ngram/NGramTokenFilter.java:81): all grams of each
    size, shorter first, left to right."""
    out = []
    for n in range(min_gram, max_gram + 1):
        for i in range(len(term) - n + 1):
            out.append(term[i:i + n])
    return out


def register() -> None:
    """Install every language chain into the analyzer registries (idempotent).
    Runs at import; names resolve through analysis.positional_pairs_fn for
    build_index / oracle / parser."""
    for name, chain in LANG_CHAINS.items():
        POSITIONAL_ANALYZERS[name] = chain
        ANALYZERS[name] = (lambda c: (lambda text: [t for t, _ in c(text)]))(chain)


register()
