"""contrib FuzzyLikeThisQuery — fuzzify-then-pick-best-terms query.

Reference: contrib/queries/src/java/org/apache/lucene/search/
FuzzyLikeThisQuery.java (mixes FuzzyQuery enumeration with MoreLikeThis
term selection):

  * each (field, text) pair is analyzed; every unique source term is
    fuzzified against the dictionary (FuzzyTermEnum semantics, classic
    length-scaled minSimilarity + prefixLength — FuzzyTermEnum.java:95)
  * per source term, the best MAX_VARIANTS_PER_TERM=50 variants by edit
    similarity are kept (FuzzyLikeThisQuery.java:178 ScoreTermQueue)
  * every variant is scored sim² × idf(df of the SOURCE term) — variants
    deliberately do NOT use their own idf, which would favour rare
    misspellings (class javadoc + rewrite():239); if the source term is
    absent from the index, the average df of all enumerated variants
    stands in (rewrite():229-233)
  * the globally best max_num_terms variants survive
    (ScoreTermQueue(maxNumTerms)); they are grouped per source term into
    coord-free SHOULD groups of constant-score term queries whose boost
    carries the sim²·idf weight (rewrite():266-311 — FuzzyTermQuery
    ignores tf/idf, so each match contributes exactly its boost)

This engine pins idf to the BM25 idf of the north rule (scoring.bm25_idf)
— same seam as the Similarity swap (search/Similarity.java:527). Tie-break
for equal variant scores is term asc (deterministic across engines).

The resolver is engine-agnostic: the Spark planner feeds it a pushed-down
dictionary enumeration, the single-node oracle its in-memory term list —
the "two engines, one truth" pattern (search/TestBoolean2.java:115-240).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable

from ..scoring import bm25_idf, levenshtein as _levenshtein
from .ast import Bool, ConstantScore, Fuzzy, Query, Term

MAX_VARIANTS_PER_TERM = 50  # FuzzyLikeThisQuery.java:58


@dataclass
class FuzzyLikeThis(Query):
    """Unresolved FuzzyLikeThis node. `fields` is [(field, query_text)];
    field "" or "text" is the default (un-namespaced) field. Resolved
    against the dictionary by Searcher.rewrite / the oracle pre-pass into
    a plain Bool tree (see resolve_fuzzy_like_this)."""

    fields: list[tuple[str, str]] = dc_field(default_factory=list)
    max_num_terms: int = 24
    min_similarity: float = 0.5
    prefix_length: int = 0
    boost: float = 1.0

    def terms(self) -> list[str]:
        return []  # terms exist only after dictionary resolution


def fuzzy_similarity(source: str, candidate: str, prefix_length: int) -> float:
    """Classic FuzzyTermEnum similarity (search/FuzzyTermEnum.java:
    129-136,185-216): Levenshtein on the post-prefix suffixes, scaled as
    1 − dist/(prefixLen + min(suffix lens))."""
    pre_len = min(prefix_length, len(source))
    ssuf, csuf = source[pre_len:], candidate[pre_len:]
    n, m = len(ssuf), len(csuf)
    if n == 0:
        return 1.0 - m / pre_len if pre_len else (1.0 if m == 0 else 0.0)
    if m == 0:
        return 1.0 - n / pre_len if pre_len else 0.0
    return 1.0 - _levenshtein(ssuf, csuf) / (pre_len + min(n, m))


def resolve_fuzzy_like_this(
    q: FuzzyLikeThis,
    enumerate_fuzzy: Callable[[Fuzzy], list[tuple[str, int]]],
    df_of: Callable[[str], int],
    N: int,
    analyze_field: Callable[[str, str], list[str]],
) -> Query:
    """Resolve to a Bool tree (the reference rewrite(), FuzzyLikeThisQuery
    .java:254-316). `enumerate_fuzzy` returns [(term, df)] dictionary
    matches for a Fuzzy node; `analyze_field(field, text)` returns the
    analyzed source terms ALREADY namespaced for non-default fields."""
    scored: list[tuple[float, str, str]] = []  # (score, variant, source)
    for fld, text in q.fields:
        seen: set[str] = set()
        for src in analyze_field(fld, text):
            if src in seen:
                continue  # processedTerms guard (addTerms():196)
            seen.add(src)
            fq = Fuzzy(src, prefix_length=q.prefix_length,
                       min_similarity=q.min_similarity)
            pairs = enumerate_fuzzy(fq)
            if not pairs:
                continue
            sims = {t: fuzzy_similarity(src, t, q.prefix_length)
                    for t, _df in pairs}
            top_vars = sorted(pairs, key=lambda p: (-sims[p[0]], p[0]))
            top_vars = top_vars[:MAX_VARIANTS_PER_TERM]
            df_src = df_of(src)
            if df_src == 0:
                # avg df over ALL enumerated variants (rewrite():229-233)
                df_src = max(1, sum(d for _t, d in pairs) // len(pairs))
            idf = float(bm25_idf(N, df_src))
            for t, _df in top_vars:
                scored.append((sims[t] * sims[t] * idf, t, src))
    # global top max_num_terms (ScoreTermQueue(maxNumTerms)); term-asc
    # tie-break pinned for cross-engine determinism
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    top = scored[: q.max_num_terms]
    groups: dict[str, list[tuple[str, float]]] = {}
    order: list[str] = []
    for s, t, src in top:
        if src not in groups:
            groups[src] = []
            order.append(src)
        groups[src].append((t, s))
    shoulds: list[Query] = []
    for src in order:
        clauses: list[Query] = [ConstantScore(Term(t), boost=s)
                                for t, s in groups[src]]
        shoulds.append(clauses[0] if len(clauses) == 1
                       else Bool(should=clauses))
    return Bool(should=shoulds, boost=q.boost)
