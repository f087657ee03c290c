"""Persisted dedup artifacts: `build_dedup_artifacts` writes the near-dup
support tables once (build-side), and every pipeline op that consumes
them returns EXACTLY the same rows served from parquet as recomputed from
scratch — the production shape where the shingle/signature tables are
index-side outputs, not per-session caches (PLANS.md §14)."""

import os

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# every op that reads the shingle/signature artifacts
_OPS = ["dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_minhash_sig",
        "dedup_cluster", "text_decontaminate", "text_dup_ngram_coverage"]


def _run(spark, name):
    fns = dict(entrymod.queries())
    fns.update(entrymod.extra_queries())
    return [tuple(r) for r in fns[name](spark, SF).collect()]


@pytest.fixture(scope="module")
def baseline(spark):
    """Recomputed-from-scratch results (artifact registry empty)."""
    assert SF not in entrymod._ARTIFACT_DIRS
    return {name: _run(spark, name) for name in _OPS}


def test_artifacts_serve_identical_results(spark, tmp_path, baseline):
    out = str(tmp_path / "artifacts")
    counts = entrymod.build_dedup_artifacts(spark, SF, out)
    try:
        # registry is active and the caches hydrate from the parquet files:
        # the analyzed plan is a bare parquet relation (no Distinct/Generate
        # recompute tree over documents.parquet)
        assert entrymod._ARTIFACT_DIRS[SF] == out
        sh = entrymod._shingles_cached(spark, SF)
        plan = sh._jdf.queryExecution().analyzed().toString()
        assert plan.startswith("Relation") and "parquet" in plan
        for name in _OPS:
            assert _run(spark, name) == baseline[name], name
        # sanity on the manifest counts: capped table is a subset
        assert counts["shingles_capped"] <= counts["shingles"]
        assert counts["sigs"] == counts["full_sets"]
    finally:
        entrymod.deregister_dedup_artifacts(SF)
    assert SF not in entrymod._ARTIFACT_DIRS


def test_register_validates(spark, tmp_path):
    """Registration fails loudly on a missing manifest and on artifacts
    built from a different corpus (stale fingerprint)."""
    import json
    import os

    empty = str(tmp_path / "nothing")
    os.makedirs(empty, exist_ok=True)
    with pytest.raises(ValueError, match="manifest"):
        entrymod.register_dedup_artifacts(SF, empty)
    # a manifest whose fingerprint does not match the current table
    bogus = {"params": {"bucket_cap": entrymod._BUCKET_CAP,
                        "n_minhash": entrymod._N_MINHASH,
                        "jac_min": entrymod._JAC_MIN},
             "counts": {}, "source_fingerprint": "not-the-real-one"}
    with open(os.path.join(empty, "manifest.json"), "w") as f:
        json.dump(bogus, f)
    with pytest.raises(ValueError, match="stale"):
        entrymod.register_dedup_artifacts(SF, empty)
    assert SF not in entrymod._ARTIFACT_DIRS
