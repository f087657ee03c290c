"""Query AST — the logical plan of the fulltext engine.

Mirrors the reference query-class hierarchy (search/TermQuery.java:32,
BooleanQuery.java:32, PhraseQuery.java:35, PrefixQuery.java:32,
WildcardQuery.java:38, FuzzyQuery.java:38, MatchAllDocsQuery.java:32,
ConstantScoreQuery.java:30, DisjunctionMaxQuery.java:42) as plain
dataclasses. Both the single-node oracle and the Spark planner execute this
same AST — the "two engines, one truth" test pattern
(reference search/TestBoolean2.java:115-240).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    boost: float = 1.0

    def terms(self) -> list[str]:
        """All literal terms mentioned (for stats gathering)."""
        return []


@dataclass
class Term(Query):
    term: str
    boost: float = 1.0

    def terms(self) -> list[str]:
        return [self.term]


@dataclass
class Phrase(Query):
    """Terms + their analyzed positions (stopword holes preserved —
    reference PhraseQuery position gaps, search/PhraseQuery.java:35)."""

    phrase_terms: list[str]
    positions: list[int] | None = None  # defaults to 0..m-1
    slop: int = 0
    boost: float = 1.0

    def terms(self) -> list[str]:
        return list(self.phrase_terms)

    def qpositions(self) -> list[int]:
        return self.positions if self.positions is not None else list(range(len(self.phrase_terms)))


@dataclass
class MultiPhrase(Query):
    """Phrase with term alternatives per slot (reference
    search/MultiPhraseQuery.java:39) — e.g. slots [["app","apps"],["store"]]
    matches "app store" and "apps store". Scored like Phrase with per-slot
    position union; idf = Σ idf over all unique terms (MultiPhraseWeight)."""

    slots: list[list[str]]
    positions: list[int] | None = None  # defaults to 0..m-1
    slop: int = 0
    boost: float = 1.0

    def terms(self) -> list[str]:
        return [t for slot in self.slots for t in slot]

    def qpositions(self) -> list[int]:
        return self.positions if self.positions is not None else list(range(len(self.slots)))


@dataclass
class Bool(Query):
    must: list[Query] = field(default_factory=list)
    should: list[Query] = field(default_factory=list)
    must_not: list[Query] = field(default_factory=list)
    min_should: int = 0  # 0 → 1 if no MUST clauses else 0 (reference BooleanQuery semantics)
    boost: float = 1.0

    def effective_min_should(self) -> int:
        if self.min_should:
            return self.min_should
        return 1 if (self.should and not self.must) else 0

    def terms(self) -> list[str]:
        out: list[str] = []
        for q in self.must + self.should + self.must_not:
            out.extend(q.terms())
        return out


# MultiTermQuery rewrite modes (search/MultiTermQuery.java:63-146):
#   scoring_boolean        — SCORING_BOOLEAN_QUERY_REWRITE: expand to a
#                            scored SHOULD disjunction (this engine's pinned
#                            default — contract/oracle scores depend on it)
#   constant_score_boolean — CONSTANT_SCORE_BOOLEAN_QUERY_REWRITE: same
#                            doc set, uniform score = boost
#   constant_score_filter  — CONSTANT_SCORE_FILTER_REWRITE: doc-set filter,
#                            uniform score = boost; at the plan level the
#                            term predicate pushes into the postings scan
#                            (no driver enumeration, no 1024-clause cap)
#   constant_score_auto    — CONSTANT_SCORE_AUTO_REWRITE_DEFAULT: filter if
#                            enumerated terms ≥ 350 or visited df ≥ 0.1% of
#                            maxDoc, else constant_score_boolean
REWRITE_SCORING = "scoring_boolean"
REWRITE_CONST_BOOL = "constant_score_boolean"
REWRITE_CONST_FILTER = "constant_score_filter"
REWRITE_AUTO = "constant_score_auto"


@dataclass
class Prefix(Query):
    prefix: str
    boost: float = 1.0
    rewrite_method: str = REWRITE_SCORING


@dataclass
class Wildcard(Query):
    pattern: str  # Lucene syntax: * = any run, ? = one char
    boost: float = 1.0
    rewrite_method: str = REWRITE_SCORING


@dataclass
class TermRange(Query):
    """Term range [lo TO hi] / {lo TO hi} (reference search/TermRangeQuery.java:40);
    None bound = open. Rewrites to a scoring boolean disjunction over the
    dictionary slice, like the other MultiTermQueries."""

    lo: str | None
    hi: str | None
    include_lo: bool = True
    include_hi: bool = True
    boost: float = 1.0
    rewrite_method: str = REWRITE_SCORING


@dataclass
class Regexp(Query):
    """Regex term query (reference contrib/regex/.../RegexQuery.java —
    a MultiTermQuery whose FilteredTermEnum matches terms by regex).
    Anchored full-term match, like the reference's RegexTermEnum."""

    pattern: str
    boost: float = 1.0
    rewrite_method: str = REWRITE_SCORING


@dataclass
class Fuzzy(Query):
    term: str
    max_edits: int = 2
    prefix_length: int = 0
    boost: float = 1.0
    rewrite_method: str = REWRITE_SCORING
    # reference FuzzyTermEnum minimumSimilarity semantics
    # (search/FuzzyTermEnum.java:95): when set, a candidate term matches iff
    #   1 - editDist/min(len(term)-prefixLen, len(target)-prefixLen)
    # exceeds this value — the edit budget SCALES with term length instead
    # of being a fixed max_edits
    min_similarity: float | None = None


@dataclass
class MatchAll(Query):
    boost: float = 1.0


@dataclass
class ConstantScore(Query):
    query: "Query" = None  # type: ignore[assignment]
    boost: float = 1.0

    def terms(self) -> list[str]:
        return self.query.terms() if self.query else []


@dataclass
class Boosting(Query):
    """contrib/queries BoostingQuery: matches `match`, but docs ALSO
    matching `context` have their score multiplied by `demote` (typically
    < 1) — the context query contributes no score of its own."""

    match: "Query" = None  # type: ignore[assignment]
    context: "Query" = None  # type: ignore[assignment]
    demote: float = 0.5
    boost: float = 1.0

    def terms(self) -> list[str]:
        return self.match.terms() + self.context.terms()


# --- span family (reference search/spans/; algebra in lucene_spark/spans.py) ---


class SpanQuery(Query):
    """Marker base: evaluates to per-doc (start, end) spans, scored with
    sloppy span frequency (spans/SpanScorer.java)."""


@dataclass
class SpanTerm(SpanQuery):
    """spans/SpanTermQuery.java:28 — one unit span per occurrence."""

    term: str
    boost: float = 1.0

    def terms(self) -> list[str]:
        return [self.term]


@dataclass
class SpanMulti(SpanQuery):
    """spans/SpanMultiTermQueryWrapper: lets a MultiTermQuery
    (Prefix/Wildcard/Fuzzy/Regexp/TermRange) appear inside span clauses.
    Rewrites against the dictionary to a SpanOr of SpanTerms before
    evaluation (planner.rewrite / oracle pre-pass)."""

    query: Query = None  # type: ignore[assignment]
    boost: float = 1.0

    def terms(self) -> list[str]:
        return self.query.terms() if self.query else []


@dataclass
class SpanNear(SpanQuery):
    """spans/SpanNearQuery.java:37 — clauses within `slop` positions,
    in document order when `in_order`."""

    clauses: list[Query] = field(default_factory=list)
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0

    def terms(self) -> list[str]:
        return [t for c in self.clauses for t in c.terms()]


@dataclass
class SpanOr(SpanQuery):
    """spans/SpanOrQuery.java:35 — union of clause spans."""

    clauses: list[Query] = field(default_factory=list)
    boost: float = 1.0

    def terms(self) -> list[str]:
        return [t for c in self.clauses for t in c.terms()]


@dataclass
class SpanNot(SpanQuery):
    """spans/SpanNotQuery.java:31 — include-spans not overlapping exclude."""

    include: Query = None  # type: ignore[assignment]
    exclude: Query = None  # type: ignore[assignment]
    boost: float = 1.0

    def terms(self) -> list[str]:
        return self.include.terms() + self.exclude.terms()


@dataclass
class SpanMask(SpanQuery):
    """spans/FieldMaskingSpanQuery.java — wraps a span clause and reports
    `field` as its field so cross-field span composition (e.g. SpanNear over
    title: + body clauses) is legal. Span enumeration is the inner query's,
    positions taken from the inner terms' own field streams; the reference
    documents mixed-field scoring as undefined and this engine pins it to
    the shared first-term dl rule (queries/kernel.py _dl_map)."""

    inner: Query = None  # type: ignore[assignment]
    field: str = "text"
    boost: float = 1.0

    def terms(self) -> list[str]:
        return self.inner.terms()


@dataclass
class SpanFirst(SpanQuery):
    """spans/SpanFirstQuery.java:32 — match-spans with end ≤ `end`."""

    match: Query = None  # type: ignore[assignment]
    end: int = 1
    boost: float = 1.0

    def terms(self) -> list[str]:
        return self.match.terms()


# --- payload family (reference search/payloads/; lucene_spark/payloads.py) ---


@dataclass
class PayloadTerm(Query):
    """search/payloads/PayloadTermQuery.java:48-142 — a term query whose
    score is multiplied by a PayloadFunction over the payloads at the
    term's matched positions in each doc: score = spanScore ×
    func(payloads) when `include_span_score` (the reference default),
    else func(payloads) alone (PayloadTermQuery.java:135-140; the boost
    lives in the span-score weight, so payload-only scoring ignores it —
    same as the reference, whose queryWeight is part of the span score).
    spanScore here is the engine's BM25 term score (north rule; the
    reference's TF-IDF span score substituted engine-wide). `func` is one
    of 'avg'|'min'|'max' (Average/Min/MaxPayloadFunction); docs where no
    matched position carries a payload score func=1
    (AveragePayloadFunction.java:36)."""

    term: str
    func: str = "avg"
    include_span_score: bool = True
    boost: float = 1.0

    def terms(self) -> list[str]:
        return [self.term]


@dataclass
class PayloadNear(Query):
    """search/payloads/PayloadNearQuery.java:54-200 — SpanNear over TERM
    clauses whose score is multiplied by a PayloadFunction over the
    payloads at every matched clause position of every matching span
    (getPayloads walks all subspans, PayloadNearQuery.java:152-178).
    Span semantics are the engine's deterministic-greedy near matchers
    (payloads.payload_near_matches ≡ spans.py on width-1 clauses); span
    score is BM25 over the sloppy span frequency like every span query
    here."""

    phrase_terms: list[str] = field(default_factory=list)
    slop: int = 0
    in_order: bool = True
    func: str = "avg"
    include_span_score: bool = True
    boost: float = 1.0

    def terms(self) -> list[str]:
        return list(self.phrase_terms)


@dataclass
class DisjunctionMax(Query):
    queries: list[Query] = field(default_factory=list)
    tie_breaker: float = 0.0
    boost: float = 1.0

    def terms(self) -> list[str]:
        out: list[str] = []
        for q in self.queries:
            out.extend(q.terms())
        return out
