"""Randomized-corpus differential testing: the documents-only pipeline
ops must match their DuckDB oracles on corpora the fixed fixtures never
exercise — tiny vocabularies (forcing dense shingle/band collisions),
skewed doc lengths, heavy exact-dup mass, multi-language mixes. Seeds are
fixed (the reference's logged-seed practice, util/LuceneTestCase.java
newRandom) so failures reproduce; each corpus is written once per module
and every op × corpus pair is an independent test case."""

import os
import random

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from tests.test_contract_extras import _norm_rows

# ops under test: everything documents-only with a SQL oracle
_OPS = [
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "text_quality", "text_langid", "text_fingerprint",
    "text_token_count", "text_repetition", "text_decontaminate",
    "text_sample_mix", "text_source_stats", "text_dup_ngram_coverage",
    "dedup_cluster", "text_unigram_logprob", "text_dup_run",
    "text_winnow_fp",
    # round 4: URL + PII ops (synthesized from doc_id + text; the
    # null-injected corpora exercise NULL-text propagation through
    # host_stats' md5 sentinel and pii's count/md5 semantics)
    "text_url_stats", "text_url_dedup", "text_pii_scrub",
    # round-4 continuation: packing (null text → 0 tokens on both sides)
    # and the composed curation verdict (every flag's null semantics ride
    # through the composition)
    "text_pack_sequences", "text_curation_decisions",
]

_VOCABS = {
    # 6-word vocab: near-every doc pair shares shingles — collision-dense
    "dense": "red blue green gold gray pink".split(),
    # 60-word vocab with Zipf-ish draw: the realistic middle
    "zipf": [f"w{i}" for i in range(60)],
}


def _corpus(seed: int, kind: str, n_docs: int):
    rng = random.Random(seed)
    base, _, mod = kind.partition("+")
    vocab = _VOCABS[base]
    rows = []
    for i in range(n_docs):
        if base == "zipf":
            n = rng.randint(1, 40)
            toks = [vocab[min(int(rng.expovariate(0.12)), len(vocab) - 1)]
                    for _ in range(n)]
        else:
            n = rng.randint(1, 12)
            toks = [rng.choice(vocab) for _ in range(n)]
        rows.append((i, " ".join(toks),
                     rng.choice(["en", "es", "zh"]),
                     f"src{rng.randint(0, 3)}"))
    # exact-dup mass: ~20% of docs clone an earlier doc's text
    for i in range(n_docs // 5):
        a = rng.randrange(n_docs)
        b = rng.randrange(n_docs)
        rows[a] = (rows[a][0], rows[b][1], rows[a][2], rows[a][3])
    if mod == "nulls":
        # real crawls carry nulls the fixed fixtures never do: ~10% null
        # text / lang / source (independently) — Spark and DuckDB must
        # agree on the null semantics of every op, not just not-crash
        rows = [(i,
                 None if rng.random() < 0.1 else t,
                 None if rng.random() < 0.1 else lg,
                 None if rng.random() < 0.1 else s)
                for i, t, lg, s in rows]
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])


# CI pins four corpora; offline campaigns override via
# RAND_CORPORA="dense:21:400,zipf+nulls:22:500" (kind[+nulls]:seed:n_docs)
_CORPORA = [("dense", 11, 120), ("dense", 12, 250), ("zipf", 13, 300),
            ("zipf+nulls", 17, 250)]
if os.environ.get("RAND_CORPORA"):
    _CORPORA = [(k, int(s), int(n))
                for k, s, n in (c.split(":") for c in
                                os.environ["RAND_CORPORA"].split(","))]


@pytest.fixture(scope="module", params=_CORPORA,
                ids=[f"{k}-s{s}-n{n}" for k, s, n in _CORPORA])
def corpus_dir(request, tmp_path_factory):
    kind, seed, n = request.param
    pdf = _corpus(seed, kind, n)
    # nullable Int64 when the corpus carries null text (parquet stays int64)
    pdf["n_chars"] = pdf["text"].str.len().astype(
        "Int64" if pdf["text"].isna().any() else "int64")
    d = str(tmp_path_factory.mktemp(f"rand_{kind}_{seed}"))
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    return d


@pytest.fixture(scope="module")
def duck_rand(corpus_dir):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{os.path.join(corpus_dir, 'documents.parquet')}')")
    return con


@pytest.mark.parametrize("name", _OPS)
def test_random_corpus_matches_oracle(spark, corpus_dir, duck_rand, name):
    fns = dict(entrymod.queries())
    fns.update(entrymod.extra_queries())
    sqls = dict(entrymod.oracle_sql())
    sqls.update(entrymod.extra_oracle_sql())
    sdf = fns[name](spark, corpus_dir)
    s_rows, s_cols = _norm_rows(sdf.columns,
                                [tuple(r) for r in sdf.collect()])
    res = duck_rand.execute(sqls[name])
    o_rows, o_cols = _norm_rows([d[0] for d in res.description],
                                res.fetchall())
    assert s_cols == o_cols
    assert len(s_rows) == len(o_rows)
    assert s_rows == o_rows
