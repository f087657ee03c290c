"""FastVectorHighlighter — goldens ported from the reference's own tests
(contrib/fast-vector-highlighter/src/test/.../FieldPhraseListTest.java,
SimpleFragListBuilderTest.java, SimpleFragmentsBuilderTest.java), asserted
through the reference's toString formats."""

import pytest

from lucene_spark.fvh import (MIN_FRAG_CHAR_SIZE, FieldQuery,
                              field_phrase_list, fvh_highlight,
                              highlight_text, make_fragments,
                              simple_frag_list, term_stack,
                              tokenize_with_offsets)
from lucene_spark.queries.ast import Bool, Phrase, Term


def _fpl(query, doc, phrase_highlight=True):
    fq = FieldQuery(query, phrase_highlight=phrase_highlight)
    stack = term_stack(tokenize_with_offsets(doc), fq)
    return field_phrase_list(stack, fq), fq


def _wpi_str(w):
    """WeightedPhraseInfo.toString (FieldPhraseList.java:157-165) minus the
    trailing seqnum the reference omits too."""
    offs = "".join(f"({s},{e})" for s, e in w.toffs)
    return f"{w.text}({w.boost})({offs})"


def _frag_str(f):
    """WeightedFragInfo.toString (FieldFragList.java:85-95)."""
    subs = "".join(f"{p.text}({''.join(f'({s},{e})' for s, e in p.toffs)})"
                   for p in f.phrases)
    return f"subInfos=({subs})/{f.total_boost}({f.start},{f.end})"


# --- FieldPhraseListTest ported goldens -----------------------------------

def test_1term_index():
    fpl, _ = _fpl(Term("a"), "a")
    assert [_wpi_str(w) for w in fpl] == ["a(1.0)((0,1))"]
    fpl, _ = _fpl(Term("b"), "a")
    assert fpl == []


def test_2terms_index():
    fpl, _ = _fpl(Term("a"), "a a")
    assert [_wpi_str(w) for w in fpl] == ["a(1.0)((0,1))", "a(1.0)((2,3))"]


def test_1phrase_index():
    fpl, _ = _fpl(Phrase(["a", "b"]), "a b")
    assert [_wpi_str(w) for w in fpl] == ["ab(1.0)((0,3))"]
    fpl, _ = _fpl(Term("b"), "a b")
    assert [_wpi_str(w) for w in fpl] == ["b(1.0)((2,3))"]


def test_2terms_1phrase_index():
    # phraseHighlight=True: only the full phrase
    fpl, _ = _fpl(Phrase(["a", "b"]), "c a a b")
    assert [_wpi_str(w) for w in fpl] == ["ab(1.0)((4,7))"]
    # phraseHighlight=False: lone 'a' highlights too
    fpl, _ = _fpl(Phrase(["a", "b"]), "c a a b", phrase_highlight=False)
    assert [_wpi_str(w) for w in fpl] == ["a(1.0)((2,3))", "ab(1.0)((4,7))"]


def test_phrase_slop():
    fpl, _ = _fpl(Phrase(["a", "c"], slop=1, boost=2.0), "c a a b c")
    assert [_wpi_str(w) for w in fpl] == ["ac(2.0)((4,5)(8,9))"]
    assert fpl[0].start == 4 and fpl[0].end == 9


def test_2phrases_overlap_expand():
    q = Bool(should=[Phrase(["a", "b"]), Phrase(["b", "c"])])
    fpl, _ = _fpl(q, "d a b c d")
    assert [_wpi_str(w) for w in fpl] == ["abc(1.0)((2,7))"]


def test_3terms_phrase_backtrack():
    fpl, _ = _fpl(Phrase(["a", "b", "c"]), "d a b a b c d")
    assert [_wpi_str(w) for w in fpl] == ["abc(1.0)((6,11))"]


def test_search_longest_phrase():
    q = Bool(should=[Phrase(["a", "b"]), Phrase(["a", "b", "c"])])
    fpl, _ = _fpl(q, "d a b d c a b c")
    assert [_wpi_str(w) for w in fpl] == ["ab(1.0)((2,5))",
                                          "abc(1.0)((10,15))"]


# --- SimpleFragListBuilderTest ported goldens ------------------------------

def _ffl(query, doc, frag_size):
    fpl, _ = _fpl(query, doc)
    return simple_frag_list(fpl, frag_size)


def test_frag_null_and_too_small():
    assert _ffl(Term("a"), "b c d", 100) == []
    with pytest.raises(ValueError, match="too small"):
        _ffl(Term("a"), "b c d", MIN_FRAG_CHAR_SIZE - 1)


def test_frag_smaller_than_term():
    ffl = _ffl(Term("abcdefghijklmnopqrs"), "abcdefghijklmnopqrs",
               MIN_FRAG_CHAR_SIZE)
    assert [_frag_str(f) for f in ffl] == [
        "subInfos=(abcdefghijklmnopqrs((0,19)))/1.0(0,19)"]


def test_frag_smaller_than_phrase():
    ffl = _ffl(Phrase(["abcdefgh", "jklmnopqrs"]),
               "abcdefgh   jklmnopqrs", MIN_FRAG_CHAR_SIZE)
    assert [_frag_str(f) for f in ffl] == [
        "subInfos=(abcdefghjklmnopqrs((0,21)))/1.0(0,21)"]


def test_frag_1term():
    ffl = _ffl(Term("a"), "a", 100)
    assert [_frag_str(f) for f in ffl] == ["subInfos=(a((0,1)))/1.0(0,100)"]


def test_frag_2terms_1frag():
    ffl = _ffl(Term("a"), "a a", 100)
    assert [_frag_str(f) for f in ffl] == [
        "subInfos=(a((0,1))a((2,3)))/2.0(0,100)"]
    ffl = _ffl(Term("a"), "a b b b b b b b b a", 20)
    assert [_frag_str(f) for f in ffl] == [
        "subInfos=(a((0,1))a((18,19)))/2.0(0,20)"]
    ffl = _ffl(Term("a"), "b b b b a b b b b a", 20)
    assert [_frag_str(f) for f in ffl] == [
        "subInfos=(a((8,9))a((18,19)))/2.0(2,22)"]


def test_frag_2terms_2frags():
    ffl = _ffl(Term("a"), "a b b b b b b b b b b b b b a", 20)
    assert [_frag_str(f) for f in ffl] == [
        "subInfos=(a((0,1)))/1.0(0,20)",
        "subInfos=(a((28,29)))/1.0(22,42)"]
    ffl = _ffl(Term("a"), "a b b b b b b b b b b b b a", 20)
    assert [_frag_str(f) for f in ffl] == [
        "subInfos=(a((0,1)))/1.0(0,20)",
        "subInfos=(a((26,27)))/1.0(20,40)"]
    ffl = _ffl(Term("a"), "a b b b b b b b b b a", 20)
    assert [_frag_str(f) for f in ffl] == [
        "subInfos=(a((0,1)))/1.0(0,20)",
        "subInfos=(a((20,21)))/1.0(20,40)"]


def test_frag_2terms_query():
    q = Bool(should=[Term("a"), Term("b")])
    assert _ffl(q, "c d e", 20) == []
    ffl = _ffl(q, "d b c", 20)
    assert [_frag_str(f) for f in ffl] == ["subInfos=(b((2,3)))/1.0(0,20)"]
    ffl = _ffl(q, "a b c", 20)
    assert [_frag_str(f) for f in ffl] == [
        "subInfos=(a((0,1))b((2,3)))/2.0(0,20)"]


# --- fragments builder (SimpleFragmentsBuilderTest) -------------------------

def test_make_fragment_tags():
    fq = FieldQuery(Term("a"))
    assert highlight_text("a", fq) == ["<b>a</b>"]
    assert highlight_text("a", fq, pre_tags=("[",), post_tags=("]",)) \
        == ["[a]"]


def test_make_fragment_phrase_and_multi():
    fq = FieldQuery(Phrase(["search", "engines"]))
    text = ("Google is the most popular search engine of all; other "
            "search engines use its index.")
    out = highlight_text(text, fq, frag_char_size=40)
    assert out and "<b>search engines</b>" in out[0]
    assert "<b>search engine<" not in out[0]  # phrase, not bare terms


def test_score_order_and_max_frags():
    fq = FieldQuery(Bool(should=[Term("a"), Term("b", boost=3.0)]))
    text = ("a " + "z " * 30 + "b b " + "z " * 30 + "a").strip()
    frags = simple_frag_list(field_phrase_list(
        term_stack(tokenize_with_offsets(text), fq), fq), 20)
    out = make_fragments(text, frags, max_num=2, score_order=True)
    # the b-b fragment (boost 6) outranks the single-a fragments
    assert "<b>b</b>" in out[0]
    assert len(out) == 2


def test_multi_tag_seqnum_coloring():
    """Per-phrase tag selection: tag index = seqnum % len(tags)
    (BaseFragmentsBuilder.getPreTag)."""
    fq = FieldQuery(Bool(should=[Term("a"), Term("b")]))
    out = highlight_text("a b", fq, pre_tags=("<x>", "<y>"),
                         post_tags=("</x>", "</y>"))
    joined = out[0]
    assert ("<x>a</x>" in joined and "<y>b</y>" in joined) or \
           ("<y>a</y>" in joined and "<x>b</x>" in joined)


# --- distributed wrapper -----------------------------------------------------

def test_fvh_highlight_dataframe(spark):
    docs = spark.createDataFrame(
        [("u1", "x y a b z"), ("u2", "no match here"), ("u3", None)],
        "url string, text string")
    hits = spark.createDataFrame([("u1", 1.0), ("u2", 0.5), ("u3", 0.1)],
                                 "url string, score double")
    out = {r["url"]: r["fragments"] for r in fvh_highlight(
        hits, docs, Phrase(["a", "b"]), frag_char_size=18).collect()}
    assert out["u1"] == ["x y <b>a b</b> z"]
    assert out["u2"] == []
    assert out["u3"] == []


def test_hostile_inputs():
    """Ragged display-side inputs: empty/None text, queries with no
    highlightable shape, fragment windows past EOF — never raise."""
    from lucene_spark.queries.ast import MatchAll

    fq = FieldQuery(Term("a"))
    assert highlight_text("", fq) == []
    # fragment window extends past the text end: slice clamps
    assert highlight_text("a", fq, frag_char_size=MIN_FRAG_CHAR_SIZE) \
        == ["<b>a</b>"]
    # no flattenable shape → no terms → no fragments (reference discards)
    fq2 = FieldQuery(MatchAll())
    assert fq2.term_set == set()
    assert highlight_text("a b c", fq2) == []
    # duplicate flat queries dedup; 1-term phrase demotes to term
    fq3 = FieldQuery(Bool(should=[Term("a"), Term("a"), Phrase(["a"])]))
    assert highlight_text("a a", fq3) == ["<b>a</b> <b>a</b>"]
