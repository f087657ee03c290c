"""Spell suggestion — the reference contrib spellchecker re-expressed.

Reference: contrib/spellchecker/.../SpellChecker.java (n-gram auxiliary
index over dictionary words → candidate OR-query → re-rank by string
distance), LevensteinDistance.java, SuggestWord.java (comparator: distance
score, then docFreq).

Spark-first restatement: the term dictionary IS the word list; candidate
generation is an inverted n-gram join (terms sharing ≥1 boundary-marked
trigram with the query word — the gram index prunes the dictionary scan,
which matters when the dictionary has 10^8 terms), then exact edit
distance via the JVM-side `levenshtein` function, ranked
(distance asc, df desc, term asc). No Python in the loop.

Pinned rule (shared with the DuckDB oracle): trigrams of "^word$",
candidates within ±max_edits length and ≤max_edits distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MARK_TRIGRAMS = (
    "transform(sequence(1, length(term)), "
    "i -> substring(concat('^', term, '$'), i, 3))"
)


def marked_trigrams(word: str) -> list[str]:
    m = f"^{word}$"
    return [m[i:i + 3] for i in range(len(m) - 2)]


def suggest_similar(term_dict: DataFrame, word: str, n: int = 5,
                    max_edits: int = 2) -> DataFrame:
    """→ DataFrame(term, dist, df): up to n dictionary words similar to
    `word` (SpellChecker.suggestSimilar)."""
    grams = marked_trigrams(word)
    tg = term_dict.select(
        "term", F.col("df").cast("long").alias("df"),
        F.explode(F.expr(_MARK_TRIGRAMS)).alias("g"))
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
