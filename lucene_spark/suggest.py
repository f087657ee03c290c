"""Spell suggestion — the reference contrib spellchecker re-expressed.

Reference: contrib/spellchecker/.../SpellChecker.java (n-gram auxiliary
index over dictionary words → candidate OR-query → re-rank by string
distance), LevensteinDistance.java, SuggestWord.java (comparator: distance
score, then docFreq).

Spark-first restatement: the term dictionary IS the word list; candidate
generation is an inverted n-gram join (terms sharing ≥1 boundary-marked
trigram with the query word), then exact edit distance via the JVM-side
`levenshtein` function, ranked (distance asc, df desc, term asc). No
Python in the loop.

Two candidate-generation paths:
- ``build_spellgram_index`` + ``suggest_similar_indexed`` — the PERSISTED
  auxiliary n-gram index (SpellChecker.indexDictionary's offline build,
  contrib/spellchecker/.../SpellChecker.java:330): the boundary-marked
  trigram table is written ONCE, range-partitioned and sorted by gram, so
  each suggestion is a pushed-down ``g IN (…)`` parquet scan — at a 10^8-
  term dictionary the per-query work is a few pruned row groups, not a
  full dictionary explode.
- ``suggest_similar`` — the on-the-fly variant over a term-dict DataFrame
  (explodes the dictionary per call; fine for ad-hoc use, quadratic waste
  if called repeatedly — exactly why the reference persists the gram index).

Pinned rule (shared with the DuckDB oracle): trigrams of "^word$",
candidates within ±max_edits length and ≤max_edits distance.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

_MARK_TRIGRAMS = (
    "transform(sequence(1, length(term)), "
    "i -> substring(concat('^', term, '$'), i, 3))"
)


def marked_trigrams(word: str) -> list[str]:
    m = f"^{word}$"
    return [m[i:i + 3] for i in range(len(m) - 2)]


def _rank_candidates(tg: DataFrame, word: str, n: int,
                     max_edits: int) -> DataFrame:
    """Shared re-rank tail: gram-matched (term, df, g) rows → top-n
    suggestions (SuggestWord comparator: distance asc, df desc, term asc)."""
    grams = marked_trigrams(word)
    return (
        tg.where(F.col("g").isin(grams))
        .select("term", "df").distinct()
        .where((F.abs(F.length("term") - len(word)) <= max_edits)
               & (F.col("term") != word))
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(word))
                    .cast("long"))
        .where(F.col("dist") <= max_edits)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(n)
        .select("term", "dist", "df")
    )


def suggest_similar(term_dict: DataFrame, word: str, n: int = 5,
                    max_edits: int = 2) -> DataFrame:
    """→ DataFrame(term, dist, df): up to n dictionary words similar to
    `word` (SpellChecker.suggestSimilar), exploding the given dictionary
    on the fly. Prefer the persisted-gram path for repeated serving."""
    tg = term_dict.select(
        "term", F.col("df").cast("long").alias("df"),
        F.explode(F.expr(_MARK_TRIGRAMS)).alias("g"))
    return _rank_candidates(tg, word, n, max_edits)


def spellgram_path(index_dir: str) -> str:
    return os.path.join(index_dir, "spellgrams")


def _dict_fingerprint(index_dir: str) -> list:
    """(path, size, mtime_ns) of every term_dict parquet file — the same
    cheap dictionary-generation identity IndexReader.reopen uses."""
    d = os.path.join(index_dir, "term_dict")
    out = []
    if os.path.isdir(d):
        for r, _dirs, names in os.walk(d):
            for nm in sorted(names):
                if nm.endswith(".parquet"):
                    p = os.path.join(r, nm)
                    st = os.stat(p)
                    out.append([p, st.st_size, st.st_mtime_ns])
    return out


def build_spellgram_index(spark: SparkSession, index_dir: str,
                          gram_partitions: int = 8) -> str:
    """Offline auxiliary-index build (SpellChecker.indexDictionary analog,
    contrib/spellchecker/.../SpellChecker.java:330): explode the DEFAULT-
    FIELD dictionary terms into boundary-marked trigrams and persist them
    range-partitioned + sorted by gram. Parquet min/max stats on `g` then
    prune every suggestion query to the few row groups holding its grams —
    the .tii-style two-level seek, but over grams. One corpus-dictionary-
    sized job, run once per index generation (re-run after merges that
    change the dictionary, like the reference re-runs indexDictionary)."""
    import json

    fp = _dict_fingerprint(index_dir)  # BEFORE the job: no lost-update race
    td = spark.read.parquet(os.path.join(index_dir, "term_dict"))
    tg = (td.where(~F.col("term").contains(":"))
          .select("term", F.col("df").cast("long").alias("df"),
                  F.explode(F.expr(_MARK_TRIGRAMS)).alias("g")))
    (tg.repartitionByRange(gram_partitions, "g")
       .sortWithinPartitions("g")
       .write.mode("overwrite").parquet(spellgram_path(index_dir)))
    # record which dictionary generation this aux index was built from, so
    # serving can DETECT staleness instead of silently suggesting from a
    # pre-merge dictionary (the reference leaves re-running indexDictionary
    # to the caller; we keep that contract but make the fast path safe)
    with open(os.path.join(spellgram_path(index_dir), "_dict_fp.json"),
              "w") as f:
        json.dump(fp, f)
    return spellgram_path(index_dir)


def suggest_similar_indexed(spark: SparkSession, index_dir: str, word: str,
                            n: int = 5, max_edits: int = 2) -> DataFrame:
    """Suggestions served from the PERSISTED gram index: a pushed-down
    ``g IN (grams)`` scan over spellgrams/ (no dictionary explode at query
    time) + the shared distance re-rank. Falls back to the on-the-fly path
    (always current, just slower) when the auxiliary index was never built
    OR is STALE — built from a different dictionary generation than the one
    on disk (fingerprint recorded at build time; merges/appends/expunges
    rewrite term_dict and invalidate it, like the reference expects a
    re-run of indexDictionary)."""
    import json

    p = spellgram_path(index_dir)
    fresh = False
    if os.path.isdir(p):
        try:
            with open(os.path.join(p, "_dict_fp.json")) as f:
                fresh = json.load(f) == _dict_fingerprint(index_dir)
        except (OSError, json.JSONDecodeError):
            fresh = False
    if not fresh:
        td = (spark.read.parquet(os.path.join(index_dir, "term_dict"))
              .where(~F.col("term").contains(":")))
        return suggest_similar(td, word, n=n, max_edits=max_edits)
    return _rank_candidates(spark.read.parquet(p), word, n, max_edits)
