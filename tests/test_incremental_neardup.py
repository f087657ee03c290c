"""Incremental batch near-dup against persisted artifacts: the delta-only
pair set must EXACTLY equal the full-corpus dedup_minhash_lsh over
base∪delta restricted to pairs involving a delta doc — including the
mega-bucket cap decisions and the signature-estimate prefilter — while
touching no base-sized input (only the persisted sigs/sets artifacts)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

from tests.test_random_corpora import _corpus


def _write_docs(pdf, d):
    os.makedirs(d, exist_ok=True)
    pdf = pdf.copy()
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(d, "documents.parquet"))


def test_incremental_equals_full_restricted(spark, tmp_path):
    base_pdf = _corpus(21, "dense", 80)           # collision-dense base
    delta_rows = []
    for i in range(20):
        src = base_pdf.iloc[i * 3 % len(base_pdf)]
        # half the delta: exact clones of base docs; half: fresh text
        text = src["text"] if i % 2 == 0 else f"fresh x{i} y{i} z{i} w{i}"
        delta_rows.append((1000 + i, text, "en", "srcD"))
    delta_pdf = pd.DataFrame(delta_rows,
                             columns=["doc_id", "text", "lang", "source"])

    base_dir = str(tmp_path / "base")
    full_dir = str(tmp_path / "full")
    _write_docs(base_pdf, base_dir)
    _write_docs(pd.concat([base_pdf, delta_pdf], ignore_index=True),
                full_dir)

    # expected: the full-corpus op over base∪delta, delta-involving pairs
    full = entrymod.queries()["dedup_minhash_lsh"](spark, full_dir)
    exp = {tuple(r) for r in full.collect()
           if r["a"] >= 1000 or r["b"] >= 1000}
    assert exp  # the exact clones guarantee a non-trivial pair set

    # incremental: base served from persisted artifacts only
    arts = str(tmp_path / "arts")
    entrymod.build_dedup_artifacts(spark, base_dir, arts)
    try:
        delta_df = spark.createDataFrame(
            delta_pdf[["doc_id", "text"]],
            "doc_id long, text string")
        got = {tuple(r) for r in entrymod.incremental_neardup_pairs(
            spark, base_dir, delta_df).collect()}
    finally:
        entrymod.deregister_dedup_artifacts(base_dir)
    assert got == exp


def test_incremental_requires_artifacts(spark, tmp_path):
    base_dir = str(tmp_path / "nobase")
    _write_docs(_corpus(22, "dense", 10), base_dir)
    delta = spark.createDataFrame([(5000, "a b c d e")],
                                  "doc_id long, text string")
    with pytest.raises(ValueError, match="artifacts"):
        entrymod.incremental_neardup_pairs(spark, base_dir, delta)
