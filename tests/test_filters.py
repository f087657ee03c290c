"""Optional analysis filters: Porter stemmer (canonical Martin Porter
variant, as shipped by the reference PorterStemFilter), ASCII folding,
length filter, shingles, char n-grams, english analyzer chain."""

from lucene_spark.analysis import (
    ANALYZERS,
    POSITIONAL_ANALYZERS,
    analyze_english,
    ascii_fold,
    length_filter,
    ngram_tokenize,
    porter_stem,
    shingles,
)

# full-pipeline outputs (steps compose: e.g. differently →1c differentli
# →2 different →4 differ)
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "radicalli": "radic",
    "differentli": "differ", "differently": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electricity": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "effective": "effect", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controlling": "control",
    "rolling": "roll", "generalization": "gener", "oscillators": "oscil",
    "analogi": "analog", "apologize": "apolog",
}


def test_porter_vectors():
    bad = {w: (porter_stem(w), e) for w, e in PORTER_VECTORS.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_porter_idempotent_short():
    for w in ("a", "is", "be", "ox"):
        assert porter_stem(w) == w


def test_ascii_fold():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("über STRAßE") == "uber STRASSE" or \
        ascii_fold("über STRAßE") == "uber STRAssE"
    assert ascii_fold("łódź œuvre") == "lodz oeuvre"
    assert ascii_fold("plain ascii") == "plain ascii"


def test_length_filter():
    assert length_filter(["a", "ab", "abc"], 2, 2) == ["ab"]


def test_shingles():
    assert shingles(["a", "b", "c"], max_shingle=2) == [
        "a", "b", "c", "a b", "b c"]
    assert shingles(["a", "b", "c"], max_shingle=3, output_unigrams=False) == [
        "a b", "b c", "a b c"]


def test_ngram_tokenize():
    assert ngram_tokenize("abcd", 2, 3) == ["ab", "bc", "cd", "abc", "bcd"]


def test_english_analyzer_chain():
    # standard chain (stopword 'the' removed with position hole) + stemming
    pairs = analyze_english("the motoring ponies")
    assert pairs == [("motor", 1), ("poni", 2)]
    assert ANALYZERS["english"]("the motoring ponies") == ["motor", "poni"]
    assert "english" in POSITIONAL_ANALYZERS


def test_english_index_e2e(spark, pages_dir, tmp_path_factory):
    """Index built with the english (stemming) analyzer: dictionary holds
    stems, and query text is stemmed by the SAME analyzer at parse time
    (reference QueryParser.java:513)."""
    from lucene_spark.indexing import IndexReader, build_index, merge_index
    from lucene_spark.queries.planner import Searcher

    out = str(tmp_path_factory.mktemp("enidx"))
    build_index(spark, pages_dir, out, target_docs_per_seg=200,
                analyzer="english")
    merge_index(spark, out)
    r = IndexReader(spark, out)
    assert r.analyzer == "english"
    td = {row["term"] for row in r.term_dict().select("term").collect()}
    assert "seventi" in td and "seventy" not in td  # porter: seventy→seventi
    s = Searcher(r)
    hits = s.search("seventy", k=5).collect()  # stemmed at parse time
    assert hits and hits[0]["score"] > 0
    assert [r_["docid"] for r_ in hits] == [
        r_["docid"] for r_ in s.search("seventi", k=5).collect()]


# --- chain-composition utilities (MappingCharFilter / KeywordMarker /
# TeeSink / Caching / custom chains) --------------------------------------

def test_mapping_char_filter_longest_match():
    from lucene_spark.analysis import make_mapping_char_filter

    cf = make_mapping_char_filter({"ph": "f", "pher": "fer", "qu": "kw"})
    # longest alternative wins at each position (NormalizeCharMap trie)
    assert cf("philosopher quack") == "filosofer kwack"
    assert make_mapping_char_filter({})("same") == "same"


def test_keyword_marker_skips_stemmer():
    from lucene_spark.analysis import make_keyword_marker

    stem = make_keyword_marker(porter_stem, {"maltese", "laziness"})
    assert stem("running") == "run"
    assert stem("maltese") == "maltese"       # marked → untouched
    assert stem("laziness") == "laziness"
    assert porter_stem("maltese") != "maltese"  # would have stemmed


def test_tee_sink_single_analysis_pass():
    from lucene_spark.analysis import analyze, tee_sink

    pairs = analyze("quick brown foxes")
    terms_sink = lambda ps: [t for t, _ in ps]            # noqa: E731
    stemmed_sink = lambda ps: [porter_stem(t) for t, _ in ps]  # noqa: E731
    bigram_sink = lambda ps: shingles([t for t, _ in ps], 2,
                                      output_unigrams=False)
    a, b, c = tee_sink(pairs, terms_sink, stemmed_sink, bigram_sink)
    assert a == ["quick", "brown", "foxes"]
    assert b == ["quick", "brown", "fox"]
    assert c == ["quick brown", "brown foxes"]


def test_cached_analyzer_memoizes():
    from lucene_spark.analysis import analyze, cached_analyzer

    ca = cached_analyzer("standard")
    assert ca("The Quick-Brown fox") == analyze("The Quick-Brown fox")
    assert ca("The Quick-Brown fox") is not None  # second hit from cache
    ca_ws = cached_analyzer("whitespace")
    assert ca_ws("A b") == [("A", 0), ("b", 1)]


def test_make_chain_composes_and_registers():
    from lucene_spark.analysis import (
        analyze,
        make_chain,
        make_keyword_marker,
        make_mapping_char_filter,
    )

    chain = make_chain(
        char_filters=(make_mapping_char_filter({"-": " "}),),
        tokenizer="standard",
        token_filters=(make_keyword_marker(porter_stem, {"foxes"}),),
    )
    got = chain("anti-aliasing foxes running")
    assert [t for t, _ in got] == ["anti", "alias", "foxes", "run"]
    # registerable like any analyzer (build_index field_analyzers seam)
    POSITIONAL_ANALYZERS["_test_chain"] = chain
    try:
        assert POSITIONAL_ANALYZERS["_test_chain"]("x-y") == chain("x-y")
    finally:
        del POSITIONAL_ANALYZERS["_test_chain"]
