"""RAM term dictionary (.tii analog, index/TermInfosReader.java:40) —
the driver-resident snapshot must agree with the distributed dictionary
scan on every probe/enumeration kind, and the size guard must fall back
cleanly to the Spark path."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.indexing import build_index, merge_index  # noqa: E402
from lucene_spark.indexing.reader import IndexReader  # noqa: E402
from lucene_spark.queries.ast import Fuzzy  # noqa: E402
from lucene_spark.queries.planner import Searcher  # noqa: E402

from conftest import write_pages_files  # noqa: E402


@pytest.fixture(scope="module")
def kw_index(spark, tmp_path_factory):
    """Small index WITH keyword fields so ':'-namespaced terms exist."""
    pages = str(tmp_path_factory.mktemp("ram_pages"))
    write_pages_files(pages, 80, 1)
    out = str(tmp_path_factory.mktemp("ram_index"))
    build_index(spark, pages, out, target_docs_per_seg=40,
                keyword_fields=("lang",))
    merge_index(spark, out)
    return out


def _spark_reader(spark, index_dir):
    """A reader FORCED onto the distributed-scan path (guard tripped)."""
    r = IndexReader(spark, index_dir)
    r._ram = None
    return r


def test_ram_dict_loads_and_size_guard(spark, index_dir, monkeypatch):
    r = IndexReader(spark, index_dir)
    ram = r.ram_dict()
    assert ram is not None and len(ram.terms) == r.stats["n_terms"]
    # terms sorted, df positive
    assert ram.terms == sorted(ram.terms)
    assert all(d >= 1 for d in ram.dfs)
    # guard: over-limit dictionaries must NOT load (fallback path)
    import lucene_spark.indexing.reader as rmod

    monkeypatch.setattr(rmod, "RAM_DICT_MAX_BYTES", 0)
    r2 = IndexReader(spark, index_dir)
    assert r2.ram_dict() is None
    # and the fallback still serves correct stats
    some = ram.terms[:3]
    assert r2.doc_freqs(some) == {t: ram.df_of(t) for t in some}


def test_doc_freqs_ram_equals_spark(spark, index_dir):
    r_ram = IndexReader(spark, index_dir)
    r_sp = _spark_reader(spark, index_dir)
    terms = r_ram.ram_dict().terms
    probe = terms[::max(1, len(terms) // 50)] + ["zzz_no_such_term"]
    assert r_ram.doc_freqs(probe) == r_sp.doc_freqs(probe)


@pytest.mark.parametrize("kind,arg", [
    ("prefix", "se"),
    ("prefix", "zzz"),
    ("wildcard", "s*en"),
    ("wildcard", "?even*"),
    ("wildcard", "*teen"),  # no constant prefix → full in-RAM scan
    ("range", ("sat", "sew", True, False)),
    ("range", (None, "cat", True, True)),
    ("range", ("two", None, False, True)),
])
def test_expansion_ram_equals_spark(spark, index_dir, kind, arg):
    r_ram = IndexReader(spark, index_dir)
    r_sp = _spark_reader(spark, index_dir)
    assert r_ram.ram_dict() is not None
    got = r_ram.expand_terms_with_df(kind, arg, 1024)
    want = r_sp.expand_terms_with_df(kind, arg, 1024)
    assert got == want and (kind != "prefix" or arg != "se" or got)


def test_expansion_limit_and_order(spark, index_dir):
    r_ram = IndexReader(spark, index_dir)
    r_sp = _spark_reader(spark, index_dir)
    got = r_ram.expand_terms_with_df("prefix", "s", 5)
    want = r_sp.expand_terms_with_df("prefix", "s", 5)
    assert got == want and len(got) == 5
    assert [t for t, _ in got] == sorted(t for t, _ in got)


def test_fielded_namespace_isolation(spark, kw_index):
    """Unfielded enumeration must skip 'lang:…' terms; fielded prefix must
    stay inside its namespace — on BOTH paths."""
    r_ram = IndexReader(spark, kw_index)
    r_sp = _spark_reader(spark, kw_index)
    assert any(":" in t for t in r_ram.ram_dict().terms)
    for kind, arg in [("prefix", "l"), ("prefix", "lang:"),
                      ("range", ("k", "m", True, False))]:
        got = r_ram.expand_terms_with_df(kind, arg, 1024)
        want = r_sp.expand_terms_with_df(kind, arg, 1024)
        assert got == want
    unfielded = r_ram.expand_terms_with_df("prefix", "l", 1024)
    assert all(":" not in t for t, _ in unfielded)
    fielded = r_ram.expand_terms_with_df("prefix", "lang:", 1024)
    assert fielded and all(t.startswith("lang:") for t, _ in fielded)


@pytest.mark.parametrize("q", [
    Fuzzy("sevem", max_edits=1),
    Fuzzy("sevem", max_edits=2, prefix_length=2),
    Fuzzy("megacorp", min_similarity=0.5),
    Fuzzy("sevem", min_similarity=0.5, prefix_length=2),
    Fuzzy("seventeen", min_similarity=0.6),
    Fuzzy("one", min_similarity=0.5),
    Fuzzy("cat", min_similarity=0.5, prefix_length=3),  # empty query suffix
])
def test_fuzzy_ram_equals_spark(spark, index_dir, q):
    s_ram = Searcher(IndexReader(spark, index_dir))
    s_sp = Searcher(_spark_reader(spark, index_dir))
    assert s_ram.reader.ram_dict() is not None
    assert s_ram._expand_fuzzy_with_df(q) == s_sp._expand_fuzzy_with_df(q)


def test_search_results_identical_across_paths(spark, index_dir):
    """End-to-end: the same queries, RAM-dict planning vs Spark-probe
    planning, must return identical (docid, score) lists."""
    s_ram = Searcher(IndexReader(spark, index_dir))
    s_sp = Searcher(_spark_reader(spark, index_dir))
    for q in ("seven", "seven AND forty", "sev*", "seve?", "sevem~",
              "[sat TO sew]", '"seven forty"'):
        a = [(r["docid"], round(r["score"], 9))
             for r in s_ram.search(q, k=10).collect()]
        b = [(r["docid"], round(r["score"], 9))
             for r in s_sp.search(q, k=10).collect()]
        assert a == b, q
