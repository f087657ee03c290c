"""Degenerate-document robustness: the text/dedup pipeline ops must not
crash — and must still match the DuckDB oracle — on documents with fewer
tokens than the n-gram orders assume (empty text, 1 and 2 words).

Regression anchor: `_shingles` originally inlined
`sequence(0, size(toks)-3)` unguarded; Spark's sequence() runs DESCENDING
when stop < start, so a 2-token doc produced indices [0, -1] and
slice(toks, 0, 3) raised at runtime — the whole dedup op failed on any
corpus containing one short page. The oracle's positional self-join
simply yields no shingle rows for such docs, which is the contract the
engine now follows (CASE guard → array() → explode drops the row).
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

# every queries()/extra_queries() entry that reads ONLY the documents
# table (the tiny corpus written below has no embeddings/events)
_DOC_OPS = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "text_token_count",
    "text_repetition",
    "text_decontaminate",
    "text_sample_mix",
    "text_source_stats",
    "text_dup_ngram_coverage",
]

_TEXTS = [
    "",                                    # 1 token after split: [""]
    "one",                                 # 1 token
    "two words",                           # 2 tokens — the sequence() trap
    "three word doc",                      # exactly one shingle
    "alpha beta gamma delta epsilon",      # normal doc
    "alpha beta gamma delta epsilon",      # exact dup → jaccard pair
    "alpha beta gamma delta zeta",         # near dup of the above
]


@pytest.fixture(scope="module")
def tiny_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tinydocs"))
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(_TEXTS)]
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(d, "documents.parquet")))
    return d


@pytest.fixture(scope="module")
def tiny_duck(tiny_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(tiny_dir, 'documents.parquet')}/*.parquet')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return (sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows),
            [cols[i] for i in order])


@pytest.mark.parametrize("name", _DOC_OPS)
def test_tiny_docs_match_oracle(spark, tiny_dir, tiny_duck, name):
    qs = dict(entrymod.queries())
    qs.update(entrymod.extra_queries())
    oracles = dict(entrymod.oracle_sql())
    oracles.update(entrymod.extra_oracle_sql())
    sdf = qs[name](spark, tiny_dir)
    s_rows, s_cols = _norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = tiny_duck.execute(oracles[name])
    o_rows, o_cols = _norm_rows([d[0] for d in res.description],
                                res.fetchall())
    assert s_cols == o_cols, name
    assert s_rows == o_rows, name


def test_tiny_docs_jaccard_finds_the_dup_pair(spark, tiny_dir):
    """The guard must not throw the baby out: the two 5-token twins are an
    exact-dup pair (jac 1.0) and the near-dup pair shares 2 of 4+4-2
    shingles — only the exact pair clears _JAC_MIN."""
    rows = {(r["a"], r["b"]): r["jac"]
            for r in entrymod.queries()["dedup_ngram_jaccard"](
                spark, tiny_dir).collect()}
    assert rows[(4, 5)] == 1.0
    assert all(a != b for a, b in rows)
