"""Spell suggestion (contrib spellchecker) and snippet highlighting
(contrib highlighter) — library surfaces over a real index."""

import pytest

from lucene_spark.highlight import highlight, snippet_col
from lucene_spark.indexing import IndexReader
from lucene_spark.queries.planner import Searcher
from lucene_spark.suggest import marked_trigrams, suggest_similar


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    return IndexReader(spark, index_dir)


def test_marked_trigrams():
    assert marked_trigrams("ab") == ["^ab", "ab$"]
    assert marked_trigrams("seven") == ["^se", "sev", "eve", "ven", "en$"]


def test_suggest_corrects_typo(reader):
    rows = suggest_similar(reader.term_dict(), "sevn", n=5).collect()
    assert rows, "expected suggestions for 'sevn'"
    assert rows[0]["term"] == "seven"
    assert rows[0]["dist"] == 1
    # ranking: distance asc, then df desc
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists)


def test_suggest_exact_word_excluded(reader):
    rows = suggest_similar(reader.term_dict(), "seven", n=5).collect()
    assert all(r["term"] != "seven" for r in rows)


@pytest.fixture(scope="module")
def spellgrams(spark, index_dir):
    from lucene_spark.suggest import build_spellgram_index

    return build_spellgram_index(spark, index_dir)


def test_indexed_suggest_matches_on_the_fly(spark, reader, index_dir,
                                            spellgrams):
    from lucene_spark.suggest import suggest_similar_indexed

    for word in ("sevn", "spakr", "fortee"):
        want = [tuple(r) for r in
                suggest_similar(reader.term_dict(), word, n=5).collect()]
        got = [tuple(r) for r in
               suggest_similar_indexed(spark, index_dir, word, n=5).collect()]
        assert got == want, word


def test_indexed_suggest_plan_prunes_on_gram(spark, index_dir, spellgrams):
    """The persisted-gram plan must be a pushed-down In(g, …) scan over
    spellgrams/ — no trigram generate/explode of the dictionary at query
    time (the whole point of the auxiliary index)."""
    from lucene_spark.suggest import suggest_similar_indexed

    plan = suggest_similar_indexed(spark, index_dir, "sevn", n=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "spellgrams" in plan
    assert "Generate" not in plan and "explode" not in plan
    assert "PushedFilters: [" in plan and "In(g, [" in plan


def test_indexed_suggest_fallback_without_artifact(spark, tmp_path, reader,
                                                   index_dir):
    """No spellgrams/ dir → the indexed entry point falls back to the
    on-the-fly dictionary explode with identical results."""
    from lucene_spark.suggest import suggest_similar_indexed

    import shutil

    clone = str(tmp_path / "nospell")
    shutil.copytree(index_dir, clone,
                    ignore=shutil.ignore_patterns("spellgrams"))
    td = reader.term_dict().where(~td_fielded())
    want = [tuple(r) for r in suggest_similar(td, "sevn", n=5).collect()]
    got = [tuple(r) for r in
           suggest_similar_indexed(spark, clone, "sevn", n=5).collect()]
    assert got == want


def td_fielded():
    from pyspark.sql import functions as F

    return F.col("term").contains(":")


def test_highlight_wraps_terms(spark, reader, pages_dir):
    searcher = Searcher(reader)
    top = searcher.search("seven AND forty", k=5, hydrate=True)
    docs = (spark.read.parquet(pages_dir)
            .select("url", "text"))
    out = highlight(top.select("url", "score"), docs,
                    ["seven", "forty"]).collect()
    assert len(out) == 5
    for r in out:
        assert "<b>" in r["snippet"]
        toks = r["snippet"].split(" ")
        assert len(toks) <= 8
        for t in toks:
            if t.startswith("<b>"):
                assert t[3:-4] in ("seven", "forty")


def test_snippet_window_starts_at_first_match(spark):
    df = spark.createDataFrame(
        [("x y z hit a b c d e f g h",), ("no match here",)], "text string")
    rows = df.select(snippet_col(df["text"], ["hit"]).alias("s")).collect()
    # window is clamped so it still spans 8 tokens ending within the doc
    assert rows[0]["s"].split(" ")[0] in ("x", "y", "z", "<b>hit</b>")
    assert "<b>hit</b>" in rows[0]["s"]
    # no match → head window, nothing wrapped
    assert rows[1]["s"] == "no match here"


def test_snippet_normalized_matching(spark):
    """Capitalized / punctuated surface forms must still locate and wrap
    analyzed query terms."""
    df = spark.createDataFrame(
        [("Spark is great. Data wins, really wins.",)], "text string")
    row = df.select(snippet_col(df["text"], ["data", "spark"]).alias("s")) \
        .collect()[0]
    assert "<b>Spark</b>" in row["s"]
    assert "<b>Data</b>" in row["s"]


def test_indexed_suggest_detects_stale_grams(spark, tmp_path):
    """The persisted gram index records the dictionary generation it was
    built from; after an append+merge rewrites term_dict, serving must NOT
    silently suggest from the pre-merge dictionary — it falls back to the
    on-the-fly path until build_spellgram_index is re-run (the reference's
    indexDictionary re-run contract, made safe)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pyarrow as pa
    import pyarrow.parquet as pq
    from conftest import write_pages_files

    from lucene_spark.fixtures import pages_pdf
    from lucene_spark.indexing import build_index, merge_index
    from lucene_spark.streaming.ingest import append_to_index
    from lucene_spark.suggest import (build_spellgram_index,
                                      suggest_similar_indexed)

    src = str(tmp_path / "src")
    write_pages_files(src, 30, 2)
    idx = str(tmp_path / "idx")
    build_index(spark, src, idx, target_docs_per_seg=15)
    merge_index(spark, idx)
    build_spellgram_index(spark, idx)

    # sanity: fresh index serves (and corrects a typo)
    assert suggest_similar_indexed(spark, idx, "sevn", n=3) \
        .collect()[0]["term"] == "seven"

    # append a doc carrying a brand-new word; merge rewrites term_dict
    pdf = pages_pdf(2, start=30)
    pdf["text"] = pdf["text"] + " zzgrobble"
    inc = str(tmp_path / "inc")
    os.makedirs(inc)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(inc, "p.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    append_to_index(spark, inc, idx, target_docs_per_seg=15)

    # stale grams detected -> the new word is reachable immediately
    rows = suggest_similar_indexed(spark, idx, "zzgrobbel", n=3).collect()
    assert rows and rows[0]["term"] == "zzgrobble"

    # re-running the offline build restores the fast path with the new word
    build_spellgram_index(spark, idx)
    rows = suggest_similar_indexed(spark, idx, "zzgrobbel", n=3).collect()
    assert rows and rows[0]["term"] == "zzgrobble"
