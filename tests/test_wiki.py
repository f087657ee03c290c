"""WikipediaTokenizer — vectors ported from the reference's own
WikipediaTokenizerTest.java (testSimple, testHandwritten, testLinkPhrases,
testLinks, testLucene1133, testBoth)."""

from lucene_spark.wiki import (BOTH, TOKENS_ONLY, UNTOKENIZED_ONLY,
                               UNTOKENIZED_TOKEN_FLAG, CATEGORY, ITALICS,
                               wikipedia_tokenize, wikipedia_tokenize_typed)

LINK_PHRASES = ("click [[link here again]] click "
                "[http://lucene.apache.org here again] [[Category:a b c d]]")


def toks(text, **kw):
    return wikipedia_tokenize_typed(text, **kw)


def test_simple():
    # WikipediaTokenizerTest.testSimple — terms, offsets, types
    got = toks("This is a [[Category:foo]]")
    assert [(t, so, eo, tt) for t, tt, _i, so, eo, _f in got] == [
        ("This", 0, 4, "<ALPHANUM>"), ("is", 5, 7, "<ALPHANUM>"),
        ("a", 8, 9, "<ALPHANUM>"), ("foo", 21, 24, "c")]
    assert [i for _t, _tt, i, _s, _e, _f in got] == [1, 1, 1, 1]


def test_link_phrases():
    # testLinkPhrases — terms + position increments (anchor rides the URL)
    got = toks(LINK_PHRASES)
    assert [(t, i) for t, _tt, i, _s, _e, _f in got] == [
        ("click", 1), ("link", 1), ("here", 1), ("again", 1),
        ("click", 1), ("http://lucene.apache.org", 1), ("here", 0),
        ("again", 1), ("a", 1), ("b", 1), ("c", 1), ("d", 1)]


def test_links():
    test = ("[http://lucene.apache.org/java/docs/index.html#news here] "
            "[http://lucene.apache.org/java/docs/index.html?b=c here] "
            "[https://lucene.apache.org/java/docs/index.html?b=c here]")
    got = [(t, tt) for t, tt, _i, _s, _e, _f in toks(test)]
    assert got == [
        ("http://lucene.apache.org/java/docs/index.html#news", "elu"),
        ("here", "el"),
        ("http://lucene.apache.org/java/docs/index.html?b=c", "elu"),
        ("here", "el"),
        ("https://lucene.apache.org/java/docs/index.html?b=c", "elu"),
        ("here", "el")]


def test_handwritten_types():
    # testHandwritten — every token maps to exactly its expected type
    test = ("[[link]] This is a [[Category:foo]] Category  This is a linked "
            "[[:Category:bar none withstanding]] "
            "Category This is (parens) This is a [[link]]  This is an "
            "external URL [http://lucene.apache.org] "
            "Here is ''italics'' and ''more italics'', '''bold''' and "
            "'''''five quotes''''' "
            " This is a [[link|display info]]  This is a period.  "
            "Here is $3.25 and here is 3.50.  Here's Johnny.  "
            "==heading== ===sub head=== followed by some text  "
            "[[Category:blah| ]] "
            "''[[Category:ital_cat]]''  here is some that is ''italics "
            "[[Category:foo]] but is never closed."
            "'''same [[Category:foo]] goes for this '''''and2 "
            "[[Category:foo]] and this"
            " [http://foo.boo.com/test/test/ Test Test] "
            "[http://foo.boo.com/test/test/test.html Test Test]"
            " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] "
            "<ref>Citation</ref> <sup>martian</sup> "
            "<span class=\"glue\">code</span>")
    tcm = {
        "link": "il", "display": "il", "info": "il",
        "http://lucene.apache.org": "elu",
        "http://foo.boo.com/test/test/": "elu",
        "http://foo.boo.com/test/test/test.html": "elu",
        "http://foo.boo.com/test/test/test.html?g=b&c=d": "elu",
        "Test": "el",
        "foo": "c", "bar": "c", "none": "c", "withstanding": "c",
        "blah": "c", "ital": "c", "cat": "c",
        "italics": "i", "more": "i",
        "bold": "b", "same": "b",
        "five": "bi", "and2": "bi", "quotes": "bi",
        "heading": "h", "sub": "sh", "head": "sh",
        "Citation": "ci",
        "3.25": "<NUM>", "3.50": "<NUM>",
        "Here's": "<APOSTROPHE>",
    }
    counts = {"i": 0, "bi": 0, "c": 0, "ci": 0}
    n = 0
    for t, tt, _i, _s, _e, _f in toks(test):
        expected = tcm.get(t, "<ALPHANUM>")
        assert tt == expected, (t, tt, expected)
        n += 1
        if tt in counts:
            counts[tt] += 1
    assert n >= len(tcm)
    # the reference's own span counts
    assert counts == {"i": 4, "bi": 3, "c": 10, "ci": 1}


def test_untokenized_only():
    # testLucene1133: untoks={c, i} — those spans collapse, links don't
    untoks = {CATEGORY, ITALICS}
    test = ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
            "[[link there]] ''italics here'' something ''more italics'' "
            "[[Category:h   i   j]]")
    got = [(t, so, eo) for t, _tt, _i, so, eo, _f in
           toks(test, mode=UNTOKENIZED_ONLY, untokenized_types=untoks)]
    assert got == [
        ("a b c d", 11, 18), ("e f g", 32, 37),
        ("link", 42, 46), ("here", 47, 51),
        ("link", 56, 60), ("there", 61, 66),
        ("italics here", 71, 83), ("something", 86, 95),
        ("more italics", 98, 110), ("h   i   j", 124, 133)]


def test_both_mode():
    untoks = {CATEGORY, ITALICS}
    test = "[[Category:a b c d]] [[Category:e f g]]"
    got = toks(test, mode=BOTH, untokenized_types=untoks)
    assert [(t, i, f) for t, _tt, i, _s, _e, f in got] == [
        ("a b c d", 1, UNTOKENIZED_TOKEN_FLAG),
        ("a", 0, 0), ("b", 1, 0), ("c", 1, 0), ("d", 1, 0),
        ("e f g", 1, UNTOKENIZED_TOKEN_FLAG),
        ("e", 0, 0), ("f", 1, 0), ("g", 1, 0)]
    # offsets of the untokenized token = the raw span (testBoth: 11..18)
    assert (got[0][3], got[0][4]) == (11, 18)


def test_registered_chain(spark, tmp_path):
    """analyzer='wikipedia' works through the registry: markup-aware terms,
    lowercased, positions from the increments (anchor shares the URL's)."""
    from lucene_spark.analysis import positional_pairs_fn

    fn = positional_pairs_fn("wikipedia")
    assert fn("Click [[Link Here]]") == [
        ("click", 0), ("link", 1), ("here", 2)]
    assert fn("[http://x.org Anchor]") == [
        ("http://x.org", 0), ("anchor", 0)]

    import datetime as dt

    from pyspark.sql import types as T

    from lucene_spark.indexing.build import build_index
    from lucene_spark.indexing.merge import merge_index
    from lucene_spark.indexing.reader import IndexReader
    from lucene_spark.queries.planner import Searcher

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType())])
    rows = [("u0", dt.datetime(2020, 1, 1), None,
             "The [[Space Needle]] is in [[Category:Seattle]]", "en"),
            ("u1", dt.datetime(2020, 1, 1), None,
             "plain needle text", "en")]
    corpus = str(tmp_path / "pages")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(corpus)
    idx = str(tmp_path / "idx")
    build_index(spark, corpus, idx, analyzer="wikipedia",
                store_positions=True)
    merge_index(spark, idx)
    s = Searcher(IndexReader(spark, idx))
    hits = {int(r["docid"]) for r in s.search("needle", k=10).collect()}
    assert hits == {0, 1}
    # phrase works across the link markup
    hits = {int(r["docid"])
            for r in s.search('"space needle"', k=10).collect()}
    assert hits == {0}


def test_hostile_markup():
    """Unterminated constructs never raise and never loop: the scanner
    treats EOF as every close delimiter (crawled wikitext is ragged)."""
    cases = [
        "", None, "[[", "[[never closed", "[http://x.org never closed",
        "''", "'''", "''unclosed italics", "=== ", "==a", "<ref>no close",
        "]] stray close [[a]]", "|pipe alone|", "[[|]]", "[[Category:]]",
        "<not-a-tag <<< > ''[['']]''", "’curly’ isn't markup",
        "🎉 emoji [[né]] ''ünïcode''",
    ]
    for c in cases:
        out = wikipedia_tokenize_typed(c or "")
        assert isinstance(out, list)
        for t, _tt, inc, so, eo, _f in out:
            assert t and inc in (0, 1) and 0 <= so < eo <= len(c or "") + 1
    # unterminated internal link still types its words
    got = wikipedia_tokenize_typed("[[never closed")
    assert [(t, tt) for t, tt, *_ in got] == [("never", "il"),
                                              ("closed", "il")]
