"""Synonym query expansion (contrib/wordnet): SynExpand.java:82 `expand`
— analyze the user's words, then OR in each word's synonyms as
boosted SHOULD term clauses — and Syns2Index.java:104's wn_s.pl prolog
parse that defines WHERE synonyms come from (word → union of its
synsets' other words).

The synonym source here is a plain dict (word → iterable of synonyms):
the reference builds an auxiliary Lucene index from the WordNet prolog
dump purely as its lookup structure; a broadcastable dict is the
Spark-side equivalent (query expansion happens driver-side at plan
time, exactly like the reference's query-rewrite — the synonym map
never touches executor data paths). `parse_wordnet_prolog` accepts the
same s(...) line format so a real WordNet dump can feed it.
"""

from __future__ import annotations

from .ast import Bool, Query, Term


def parse_wordnet_prolog(lines) -> dict[str, list[str]]:
    """wn_s.pl `s(synset,num,'word',...)` lines → {word: sorted synonyms}
    with the reference's exact filtering (Syns2Index.java:146-229):
    lowercase, `''` unescaped to `'`, only all-letter words kept (no
    spaces/digits — "don't store things like 'pit bull'"), synonyms =
    union over the word's synsets minus the word itself, sorted (the
    reference accumulates them in a TreeSet)."""
    word2nums: dict[str, set[str]] = {}
    num2words: dict[str, set[str]] = {}
    for line in lines:
        line = line.strip()
        if not line.startswith("s("):
            continue
        body = line[2:]
        num = body[:body.index(",")]
        q1 = body.index("'")
        rest = body[q1 + 1:]
        # the reference takes the LAST quote on the line as the closing
        # one (Syns2Index.java:171 lastIndexOf); '' is an escaped quote
        q2 = rest.rindex("'")
        word = rest[:q2].lower().replace("''", "'")
        if not word.isalpha():
            continue
        word2nums.setdefault(word, set()).add(num)
        num2words.setdefault(num, set()).add(word)
    out: dict[str, list[str]] = {}
    for word, nums in word2nums.items():
        syns: set[str] = set()
        for n in nums:
            syns |= num2words[n]
        syns.discard(word)
        if syns:
            out[word] = sorted(syns)
    return out


def expand_synonyms(query: str, synonyms: dict, analyzer=None,
                    boost: float = 0.9) -> Query:
    """SynExpand.expand (SynExpand.java:82): analyze `query` into unique
    words; the result is ONE flat BooleanQuery of SHOULD clauses — each
    word at boost 1.0, then its synonyms at `boost` (0 → unboosted),
    with a single global dedup set so a synonym equal to a query word or
    to an earlier synonym is added once (the reference's `already`).

    `analyzer`: name or fn(text)->[terms]; default whitespace split
    (this engine's contract analyzer)."""
    if analyzer is None:
        tokens = (query or "").split()
    elif callable(analyzer):
        tokens = analyzer(query or "")
    else:
        from ..analysis import ANALYZERS
        tokens = ANALYZERS[analyzer](query or "")

    already: set[str] = set()
    top: list[str] = []
    for w in tokens:
        if w not in already:
            already.add(w)
            top.append(w)
    clauses: list[Query] = []
    for w in top:
        clauses.append(Term(w))
        for syn in synonyms.get(w, ()):
            if syn in already:
                continue
            already.add(syn)
            clauses.append(Term(syn, boost=boost) if boost > 0
                           else Term(syn))
    return Bool(should=clauses)
