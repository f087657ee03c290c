"""Byte-pair-encoding (BPE) subword tokenizer — train + apply, the real
token-counting primitive of a training-data pipeline (the `text_token_count`
contract op approximates subword counts with a regex; this is the actual
algorithm, Sennrich et al. 2016).

Scale design (the part that must survive 100 TB):

- **Training input is the word-frequency table, not the corpus.** The only
  corpus-sized work is one map-side-combinable `groupBy(word).count()`;
  the trainer then runs driver-side over the top-`max_words` rows — the
  bounded-vocabulary practice every production BPE trainer uses (distinct
  words grow ~Heaps-law-sublinearly; the cap makes the collect O(vocab),
  never O(corpus)).
- **Apply is a narrow Arrow-batched pass**: one Pandas UDF over `text`,
  memoizing segmentations per distinct word within each batch (Zipf makes
  the memo hit rate high). No shuffle.

Determinism: merge selection breaks count ties by lexicographically
smallest pair — pinned so the distributed trainer and the single-node
reference (tests/test_bpe.py) produce identical merge lists.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"  # end-of-word marker (Sennrich-style)


# ---------------------------------------------------------------------------
# training (driver-side core over a word-frequency table)
# ---------------------------------------------------------------------------

def train_bpe_from_counts(word_counts: dict[str, int],
                          n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE over {word: count}: start from characters + EOW, merge
    the most frequent adjacent symbol pair n_merges times (ties → lexico-
    graphically smallest pair). Returns the ordered merge list."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (EOW,): c for w, c in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            i, acc = 0, []
            while i < len(sym):
                if (i + 1 < len(sym)
                        and sym[i] == best[0] and sym[i + 1] == best[1]):
                    acc.append(merged)
                    i += 2
                else:
                    acc.append(sym[i])
                    i += 1
            out[tuple(acc)] = out.get(tuple(acc), 0) + c
        vocab = out
    return merges


def word_counts(df: DataFrame, text_col: str = "text",
                max_words: int = 100_000) -> list[tuple[str, int]]:
    """Distributed word-frequency table: ONE partial-agg shuffle, then the
    bounded top-`max_words` head (count desc, word asc — deterministic)
    collected for the driver-side trainer."""
    wc = (df.select(F.explode(F.split(F.coalesce(F.col(text_col),
                                                 F.lit("")), " "))
                    .alias("w"))
          .where(F.col("w") != "")
          .groupBy("w").count()
          .orderBy(F.desc("count"), F.asc("w"))
          .limit(max_words))
    return [(r["w"], int(r["count"])) for r in wc.collect()]


def train_bpe(df: DataFrame, text_col: str = "text", n_merges: int = 100,
              max_words: int = 100_000) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge training."""
    return train_bpe_from_counts(dict(word_counts(df, text_col, max_words)),
                                 n_merges)


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with the trained merges: repeatedly apply the
    LOWEST-rank (earliest-learned) pair present — the standard BPE apply
    order, which reproduces training exactly on seen words."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_token_count_py(text: str | None,
                       ranks: dict[tuple[str, str], int],
                       memo: dict[str, int] | None = None) -> int | None:
    """Single-node token counter (the test reference AND the UDF body)."""
    if text is None:
        return None
    memo = memo if memo is not None else {}
    n = 0
    for w in text.split(" "):
        if not w:
            continue
        if w not in memo:
            memo[w] = len(bpe_segment(w, ranks))
        n += memo[w]
    return n


def with_bpe_token_count(df: DataFrame, merges: list[tuple[str, str]],
                         text_col: str = "text",
                         out_col: str = "bpe_tokens") -> DataFrame:
    """Per-doc BPE token count as an Arrow-batched Pandas UDF — one narrow
    projection, per-batch word memoization, no shuffle."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("long")
    def count_udf(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        return pd.Series([bpe_token_count_py(t, ranks, memo) for t in texts],
                         dtype="Int64")

    return df.withColumn(out_col, count_udf(F.col(text_col)))
