"""Contrib language pack: stemmers/tokenizers/chains pinned to the
reference's own test vectors (tests/lang_golden.py), plus build/query
integration (per-language index ≡ oracle rank identity, by_lang routing).

Reference test models (cites /root/reference/contrib/analyzers/common/src/
test/org/apache/lucene/analysis/): de/TestGermanStemFilter (data.txt),
ru/TestRussianStemmer (words/stemsUTF8.txt), br/TestBrazilianStemmer,
nl/TestDutchStemmer, cz/TestCzechStemmer, bg/TestBulgarianStemmer,
ar/TestArabic*, fa/TestPersianNormalizationFilter, hi/TestHindi*,
in/TestIndicNormalizer, fr/TestFrenchAnalyzer.testAnalyzer30,
el/GreekAnalyzerTest, cjk/TestCJKTokenizer, tr/TestTurkishLowerCaseFilter,
fr/TestElision, reverse/TestReverseStringFilter, position/PositionFilter.
"""

from __future__ import annotations

import pytest

import lang_golden as G
from lucene_spark.lang import (LANG_CHAINS, analyze_arabic, analyze_by_lang,
                               analyze_chinese, analyze_cjk, analyze_dutch,
                               analyze_french, analyze_german, analyze_greek,
                               analyze_hindi, analyze_persian,
                               analyze_russian, analyze_turkish, edge_ngrams,
                               make_elision, ngram_filter, position_filter,
                               reverse_token)
from lucene_spark.lang.stemmers import (arabic_normalize, arabic_stem,
                                        brazilian_stem, bulgarian_stem,
                                        czech_stem, dutch_stem, french_stem,
                                        german_stem, greek_lower,
                                        hindi_normalize, hindi_stem,
                                        indic_normalize, persian_normalize,
                                        russian_stem, turkish_lower)
from lucene_spark.lang.tokenizers import (chinese_filter, chinese_tokenize,
                                          cjk_tokenize)


# ---------------------------------------------------------------------------
# stemmers / normalizers vs reference goldens
# ---------------------------------------------------------------------------

def test_german_stemmer_goldens():
    for word, stem in G.GERMAN_PAIRS:
        assert german_stem(word.lower()) == stem, word


def test_russian_stemmer_goldens():
    for word, stem in G.RUSSIAN_PAIRS:
        assert russian_stem(word) == stem, word


def test_brazilian_stemmer_goldens():
    # TestBrazilianStemmer drives the full analyzer; the stem filter keeps
    # the original lowercased term when the stemmer returns None
    for word, stem in G.BRAZILIAN_PAIRS:
        got = brazilian_stem(word.lower())
        assert (word.lower() if got is None else got) == stem, word


def test_dutch_analyzer_goldens():
    for word, stem in G.DUTCH_PAIRS:
        toks = [t for t, _ in analyze_dutch(word)]
        assert toks and toks[0] == stem, word


def test_czech_stemmer_goldens():
    for word, stem in G.CZECH_PAIRS:
        assert czech_stem(word.lower()) == stem, word


def test_bulgarian_stemmer_goldens():
    for word, stem in G.BULGARIAN_PAIRS:
        assert bulgarian_stem(word.lower()) == stem, word


def test_arabic_goldens():
    for word, norm in G.ARABIC_NORM_PAIRS:
        assert arabic_normalize(word) == norm, word
    for word, stem in G.ARABIC_STEM_PAIRS:
        assert arabic_stem(word) == stem, word


def test_persian_hindi_indic_goldens():
    for word, norm in G.PERSIAN_NORM_PAIRS:
        assert persian_normalize(word) == norm, word
    for word, norm in G.HINDI_NORM_PAIRS:
        assert hindi_normalize(word) == norm, word
    for word, stem in G.HINDI_STEM_PAIRS:
        assert hindi_stem(word) == stem, word
    for word, norm in G.INDIC_NORM_PAIRS:
        assert indic_normalize(word) == norm, word


def test_french_stemmer_unit():
    # spot vectors inside testAnalyzer30's assertions
    assert french_stem("lances") == "lanc"
    assert french_stem("habitable") == "habit"
    assert french_stem("finissions") == "fin"
    assert french_stem("souffrirent") == "souffr"
    assert french_stem("rugissante") == "rug"


def test_turkish_lowercase():
    # TestTurkishLowerCaseFilter: composed İ → i, bare I → ı, decomposed
    # I+combining-dot → i (dot consumed), marks between preserved
    assert [turkish_lower(w) for w in "İSTANBUL İZMİR ISPARTA".split()] == \
        ["istanbul", "izmir", "ısparta"]
    assert [turkish_lower(w) for w in
            "I\u0307STANBUL I\u0307ZMI\u0307R ISPARTA".split()] == \
        ["istanbul", "izmir", "\u0131sparta"]
    assert turkish_lower("I̖SPARTA") == "ı̖sparta"


def test_greek_lower():
    assert greek_lower("ΑΨΟΓΟΣ") == "αψογοσ"
    assert greek_lower("ής") == "ησ"  # tonos folded, final sigma normalized


# ---------------------------------------------------------------------------
# tokenizers / full chains vs reference goldens
# ---------------------------------------------------------------------------

def test_cjk_tokenizer_goldens():
    for text, expected in G.CJK_VECTORS:
        got = [(tok, typ) for typ, tok in cjk_tokenize(text)]
        assert got == expected, text


def test_cjk_analyzer_stops_with_holes():
    # CJKAnalyzer = tokenizer + StopFilter (position increments preserved)
    assert analyze_cjk("一丁丂") == [("一丁", 0),
                                                 ("丁丂", 1)]
    # "the" is a CJK stopword: hole at its position
    assert analyze_cjk("java the 一二") == [
        ("java", 0), ("一二", 2)]


def test_chinese_tokenizer_and_filter():
    # unigram CJK; latin runs lowercased; digits tokenized then dropped by
    # the filter; 1-letter latin dropped; English stopwords dropped
    assert chinese_tokenize("中华 Java 123") == \
        ["中", "华", "java", "123"]
    assert analyze_chinese("中华 the C 123 java") == [
        ("中", 0), ("华", 1), ("java", 2)]


def test_french_analyzer_goldens():
    for text, expected in G.FRENCH_VECTORS:
        got = [t for t, _ in analyze_french(text)]
        assert got == expected, text


def test_greek_analyzer_goldens():
    for text, expected in G.GREEK_VECTORS:
        got = [t for t, _ in analyze_greek(text)]
        assert got == expected, text
    # 3.1 chain includes StandardFilter: acronym dots stripped (the kept-dots
    # variant is the pre-3.1 chain, GreekAnalyzerTest.testAcronymBWCompat)
    assert [t for t, _ in analyze_greek("Α.Π.Τ.")] == ["απτ"]


def test_stop_holes_and_position_semantics():
    # German: "der" is a stopword — position hole preserved
    assert analyze_german("der Hund") == [("hund", 1)]
    # French: stop matches the UNLOWERED token (pre-3.1 quirk): "Le" is not
    # stopped, "le" is
    assert [t for t, _ in analyze_french("le chien")] == ["chien"]
    assert [t for t, _ in analyze_french("Le chien")] == ["le", "chien"]
    # Russian chain: letter/digit tokenizer + lower + stop + stem
    assert analyze_russian("и вместе с тем о силе электромагнитной")[0][0] \
        == "вмест"


def test_arabic_persian_hindi_chains():
    # stopword removal happens at the documented chain stage
    assert [t for t, _ in analyze_arabic("من كتاب")] \
        == ["كتاب"]  # "من" is a stopword, "كتاب" survives normalize+stem
    assert analyze_hindi("लड़के")[0][0] == hindi_stem(
        hindi_normalize(indic_normalize("लड़के")))
    assert analyze_persian("آب") == [("اب", 0)]


# ---------------------------------------------------------------------------
# utility filters
# ---------------------------------------------------------------------------

def test_elision():
    elide = make_elision()
    assert elide("l'avion") == "avion"
    assert elide("j'aime") == "aime"
    assert elide("qu'avoir") == "avoir"  # multi-char article
    assert elide("d'avion") == "d'avion"  # not a default article
    assert elide("chien") == "chien"
    assert elide("L’avion") == "avion"  # U+2019 apostrophe, ignore case


def test_reverse_and_position_and_ngrams():
    assert reverse_token("hello") == "olleh"
    assert reverse_token("hello", "") == "olleh"  # marker leads
    pairs = [("a", 0), ("b", 1), ("c", 2)]
    assert position_filter(pairs) == [("a", 0), ("b", 0), ("c", 0)]
    assert position_filter(pairs, 1) == [("a", 0), ("b", 1), ("c", 2)]
    assert edge_ngrams("abcde", 1, 3) == ["a", "ab", "abc"]
    assert edge_ngrams("abcde", 2, 3, side="back") == ["de", "cde"]
    assert edge_ngrams("ab", 3, 5) == []
    assert ngram_filter("abc", 1, 2) == ["a", "b", "c", "ab", "bc"]


# ---------------------------------------------------------------------------
# registration + build/query integration
# ---------------------------------------------------------------------------

def test_chains_registered_via_lazy_resolution():
    from lucene_spark.analysis import get_analyzer, positional_pairs_fn
    for name in LANG_CHAINS:
        assert positional_pairs_fn(name) is not None
        assert get_analyzer(name)("") == []
    # parser resolves language analyzers for query analysis
    from lucene_spark.queries.parser import parse_query
    q = parse_query("Häuser der Tische", analyzer="german")
    # "der" stopped; remaining terms stemmed like the index side
    terms = sorted(str(q).split()) if isinstance(q, str) else None
    assert "hau" in repr(q) and "tisch" in repr(q) and "der" not in repr(q)


def test_by_lang_routing_unit():
    assert analyze_by_lang("Häuser", "de") == [("hau", 0)]
    assert analyze_by_lang("Häuser", "german") == [("hau", 0)]
    assert analyze_by_lang("running cats", "en")[0][0] == "running"
    assert analyze_by_lang("running cats", None)[0][0] == "running"
    assert analyze_by_lang("一二三", "zh") == [
        ("一二", 0), ("二三", 1)]


def _write_pages(spark, tmpdir, rows):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(tmpdir)


def test_build_and_search_german_oracle_identity(spark, tmp_path):
    """Index built with analyzer='german' ranks identically to the oracle
    running the same chain (the per-language engine/oracle contract)."""
    import datetime as dt

    from lucene_spark.indexing.build import build_index
    from lucene_spark.indexing.merge import merge_index
    from lucene_spark.indexing.reader import IndexReader
    from lucene_spark.oracle import build_oracle_index, oracle_search
    from lucene_spark.queries.planner import Searcher

    texts = [
        "Die Häuser und die Tische sind groß",
        "Ein Haus mit vielen Tischen",
        "Hunde laufen durch das Haus",
        "Tisch und Stuhl im Haus",
        "abschließender Bericht über Häuser",
    ]
    ts = dt.datetime(2020, 1, 1)
    corpus = str(tmp_path / "pages")
    _write_pages(spark, corpus, [
        (f"http://x.de/{i}", ts, None, t, "de") for i, t in enumerate(texts)])
    idx = str(tmp_path / "idx")
    build_index(spark, corpus, idx, analyzer="german", store_positions=True,
                target_docs_per_seg=3)
    merge_index(spark, idx)
    from lucene_spark.queries.parser import parse_query

    searcher = Searcher(IndexReader(spark, idx))
    oracle = build_oracle_index(list(enumerate(texts)), analyzer="german")

    # the Searcher parses strings with the INDEX's recorded analyzer
    # (german, from the manifest); the oracle side parses explicitly
    for qs in ["Häuser", "tisch", "Haus Hunde", "\"die Häuser\"", "tisch*"]:
        eng = [(r["docid"], round(r["score"], 4)) for r in
               searcher.search(qs, k=5).collect()]
        orc = [(d, round(s, 4)) for d, s in
               oracle_search(oracle, parse_query(qs, analyzer="german"), k=5)]
        assert eng == orc, qs


def test_build_by_lang_routes_each_document(spark, tmp_path):
    """analyzer='by_lang': every document's forward index equals its own
    language chain's output (German stems, CJK bigrams, English Porter-less
    standard chain)."""
    import datetime as dt

    from lucene_spark.indexing.build import build_index
    from lucene_spark.analysis import analyze

    rows = [
        ("http://a.de/1", dt.datetime(2020, 1, 1), None,
         "Die Häuser sind groß", "de"),
        ("http://a.cn/2", dt.datetime(2020, 1, 1), None,
         "一二三四", "zh"),
        ("http://a.com/3", dt.datetime(2020, 1, 1), None,
         "the quick brown fox", "en"),
        ("http://a.xx/4", dt.datetime(2020, 1, 1), None,
         "unknown language text", None),
    ]
    corpus = str(tmp_path / "pages")
    _write_pages(spark, corpus, rows)
    idx = str(tmp_path / "idx")
    build_index(spark, corpus, idx, analyzer="by_lang", store_positions=True,
                target_docs_per_seg=10)
    tok = {r["url"]: sorted(r["terms"])
           for r in spark.read.parquet(f"{idx}/tokens").collect()}
    assert tok["http://a.de/1"] == sorted({t for t, _ in
                                           analyze_by_lang(rows[0][3], "de")})
    assert tok["http://a.cn/2"] == sorted({"一二", "二三",
                                           "三四"})
    assert tok["http://a.com/3"] == sorted({t for t, _ in
                                            analyze(rows[2][3])})
    assert tok["http://a.xx/4"] == sorted({t for t, _ in
                                           analyze(rows[3][3])})


def test_by_lang_rejects_extra_field_default(spark, tmp_path):
    import datetime as dt

    from lucene_spark.indexing.build import build_index

    corpus = str(tmp_path / "pages")
    _write_pages(spark, corpus, [
        ("http://x/1", dt.datetime(2020, 1, 1), None, "text", "en")])
    with pytest.raises(ValueError, match="by_lang"):
        build_index(spark, corpus, str(tmp_path / "idx"), analyzer="by_lang",
                    analyzed_fields=("url",))


# ---------------------------------------------------------------------------
# Spanish (snowball) — reference gate TestSpanishAnalyzer.testBasics plus
# vectors hand-traced from the published algorithm definition
# ---------------------------------------------------------------------------

def test_spanish_stemmer_and_chain():
    from lucene_spark.lang import analyze_spanish
    from lucene_spark.lang.spanish import spanish_stem

    # the reference's own assertions (TestSpanishAnalyzer.testBasics)
    assert spanish_stem("chicana") == "chican"
    assert spanish_stem("chicano") == "chican"
    assert [t for t, _ in analyze_spanish("los")] == []  # stopword

    # hand-traced vectors (step number noted)
    vectors = {
        "amigo": "amig",              # step3 residual o
        "canciones": "cancion",       # step2b es
        "corriendo": "corr",          # step2b iendo
        "haciéndola": "hac",          # step0 pronoun+accent, then 2b iendo
        "construyendo": "constru",    # step2a yendo after u
        "llegues": "lleg",            # step2b es + gu→g undouble
        "nacionalidad": "nacional",   # step1 idad in R2
        "felizmente": "feliz",        # step1 mente in R2
        "rápidamente": "rapid",       # step1 amente in R1 + accent fold
        "lógicamente": "logic",       # step1 amente, ic survives (not R2)
        "creativamente": "creativ",   # step1 amente; iv NOT in R2 → kept
        "atómico": "atom",            # step1 ico in R2
        "organización": "organiz",    # step1 ación in R2
        "tecnología": "tecnolog",     # step1 logía → log
        "universidades": "univers",   # step1 idades in R2
        "belleza": "bellez",          # step3 residual a
        "guerra": "guerr",            # step3 residual a
        "cantando": "cant",           # step2b ando
    }
    for w, exp in vectors.items():
        assert spanish_stem(w) == exp, w


def test_spanish_in_by_lang_routing():
    assert analyze_by_lang("canciones felices", "es") == [
        ("cancion", 0), ("felic", 1)]


def test_by_lang_index_oracle_rank_identity(spark, tmp_path):
    """Mixed-language corpus indexed with analyzer='by_lang' ranks
    identically to the oracle's by_lang route (the multilingual-crawl
    engine/oracle contract): each doc analyzed by its own lang chain,
    each query by its query-language chain (Searcher lang=)."""
    import datetime as dt

    from lucene_spark.indexing.build import build_index
    from lucene_spark.indexing.merge import merge_index
    from lucene_spark.indexing.reader import IndexReader
    from lucene_spark.oracle import build_oracle_index, oracle_search
    from lucene_spark.queries.planner import Searcher

    rows = [
        ("Die Häuser und die Tische sind groß", "de"),
        ("Ein Haus mit vielen Tischen und Stühlen", "de"),
        ("las canciones felices de los amigos", "es"),
        ("mis amigos cantando canciones tristes", "es"),
        ("la organización de la universidad", "es"),
        ("the quick brown fox jumps over the lazy dog", "en"),
        ("a quick fox and a happy dog", "en"),
        ("texto sin idioma declarado", None),
    ]
    ts = dt.datetime(2020, 1, 1)
    corpus = str(tmp_path / "pages")
    _write_pages(spark, corpus, [
        (f"http://x/{i}", ts, None, t, lg) for i, (t, lg) in enumerate(rows)])
    idx = str(tmp_path / "idx")
    build_index(spark, corpus, idx, analyzer="by_lang", store_positions=True,
                target_docs_per_seg=3)
    merge_index(spark, idx)

    searcher = Searcher(IndexReader(spark, idx))
    oracle = build_oracle_index(
        [(i, t) for i, (t, _lg) in enumerate(rows)], analyzer="by_lang",
        doc_langs={i: lg for i, (_t, lg) in enumerate(rows) if lg})

    from lucene_spark.queries.parser import parse_query
    cases = [("Häuser tisch", "de"), ("\"die Häuser\"", "de"),
             ("canciones amigos", "es"), ("cantar OR universidades", "es"),
             ("quick dog", "en"), ("texto", None)]
    for qs, lang in cases:
        eng = [(r["docid"], round(r["score"], 4)) for r in
               searcher.search(qs, k=5, lang=lang).collect()]
        from lucene_spark.lang import LANG_CODES
        chain = LANG_CODES.get(lang or "", "standard")
        orc = [(d, round(s, 4)) for d, s in
               oracle_search(oracle, parse_query(qs, analyzer=chain), k=5)]
        assert eng == orc, qs
        assert eng, qs  # every case matches something
