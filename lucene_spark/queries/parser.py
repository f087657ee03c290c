"""Mini query parser for the reference query-set syntax.

Subset of the reference QueryParser grammar (queryParser/QueryParser.java:134-139,
QueryParser.jj): ``term``, ``"quoted phrase"``, ``"phrase"~slop``, ``AND / OR /
NOT``, ``+must``, ``-must_not``, ``term^boost``, ``wild*card`` / ``wi?d``,
``fuzzy~`` / ``fuzzy~1``, ``prefix*``, parentheses. Default operator OR
(QueryParser.java:130). Query text is run through the same analyzer as
documents (QueryParser.java:513) — multi-token analysis of one quoted string
yields a PhraseQuery with stopword position holes.

Recursive descent, precedence NOT > AND > OR.
"""

from __future__ import annotations

import re

from ..analysis import (POSITIONAL_ANALYZERS, _ensure_registered, analyze,
                        get_analyzer)
from .ast import (
    Bool,
    ConstantScore,
    DisjunctionMax,
    Fuzzy,
    MatchAll,
    Phrase,
    Prefix,
    Query,
    Term,
    TermRange,
    Wildcard,
)

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<quoted>(?:[A-Za-z_][A-Za-z0-9_]*:)?"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?)
      | (?P<range>[\[\{][^\]\}]*[\]\}](?:\^\d+(?:\.\d+)?)?)
      | (?P<and>AND\b)
      | (?P<or>OR\b)
      | (?P<not>NOT\b)
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<word>[^\s()"+-][^\s()"]*)
    )""",
    re.VERBOSE,
)

# keyword (NOT_ANALYZED) fields — indexed as namespaced terms "field:value"
# (the reference Field.Index.NOT_ANALYZED design, document/Field.java:83);
# query position `field:value` is filter-style: constant score 0 unless an
# explicit ^boost is given (reference FilteredQuery semantics,
# search/FilteredQuery.java:40 — the filter side contributes no score)
KEYWORD_FIELDS = ("lang", "url")


class _Lexer:
    def __init__(self, s: str):
        self.tokens: list[tuple[str, str]] = []
        pos = 0
        while pos < len(s):
            m = _TOKEN_RE.match(s, pos)
            if not m or m.end() == pos:
                break
            pos = m.end()
            kind = m.lastgroup
            if kind:
                self.tokens.append((kind, m.group(kind)))
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> tuple[str, str]:
        t = self.tokens[self.i]
        self.i += 1
        return t


def _split_boost(word: str) -> tuple[str, float]:
    if "^" in word:
        base, _, b = word.rpartition("^")
        try:
            return base, float(b)
        except ValueError:
            return word, 1.0
    return word, 1.0


def _make_fuzzy(term: str, sim: str | None, boost: float) -> Fuzzy:
    """`term~` → classic defaultMinSimilarity 0.5 (search/FuzzyQuery.java:40);
    `term~0.x` → minimumSimilarity (length-scaled FuzzyTermEnum semantics);
    `term~N` (integer ≥ 1) → modern fixed edit budget, capped at 2."""
    if sim is None:
        return Fuzzy(term, min_similarity=0.5, boost=boost)
    f = float(sim)
    if f >= 1:
        return Fuzzy(term, max_edits=min(int(f), 2), boost=boost)
    return Fuzzy(term, min_similarity=f, boost=boost)


# parse-call-scoped date resolution (QueryParser.setDateResolution,
# QueryParser.java:709 getRangeQuery): when set, range endpoints that
# parse as dates resolve to DateTools strings; set per parse_query call
# (try/finally), never leaks across calls
_DATE_RESOLUTION: list = [None]

# the reference uses the locale's lenient SHORT DateFormat; this port
# accepts ISO and the common US/EU slash forms — dates are otherwise
# native columns here (SURVEY §2.2 NumericTokenStream rationale)
_DATE_FORMATS = ("%Y-%m-%d", "%m/%d/%Y", "%d.%m.%Y", "%m/%d/%y")


def _try_parse_date(s: str):
    import datetime as dt

    for f in _DATE_FORMATS:
        try:
            return dt.datetime.strptime(s, f)
        except ValueError:
            continue
    return None


def _range_query(tok: str) -> Query | None:
    m = re.match(
        r"^([\[\{])\s*(\S+)\s+TO\s+(\S+)\s*([\]\}])(?:\^(\d+(?:\.\d+)?))?$", tok)
    if not m:
        return None
    lo = None if m.group(2) == "*" else m.group(2).lower()
    hi = None if m.group(3) == "*" else m.group(3).lower()
    include_lo, include_hi = m.group(1) == "[", m.group(4) == "]"
    res = _DATE_RESOLUTION[0]
    if res is not None and lo is not None and hi is not None:
        # getRangeQuery: both endpoints date-parse → DateTools strings at
        # the configured resolution; an INCLUSIVE upper bound covers the
        # whole day (the reference sets 23:59:59.999 before resolving,
        # QueryParser.java:723-733); parse failure falls through to plain
        # terms (the reference swallows the exception the same way)
        d1, d2 = _try_parse_date(lo), _try_parse_date(hi)
        if d1 is not None and d2 is not None:
            from .datetools import date_to_string

            if include_hi:
                d2 = d2.replace(hour=23, minute=59, second=59,
                                microsecond=999000)
            lo = date_to_string(d1, res)
            hi = date_to_string(d2, res)
    return TermRange(lo, hi, include_lo=include_lo,
                     include_hi=include_hi,
                     boost=float(m.group(5) or 1.0))


def _analyze_pairs(text: str, analyzer: str) -> list[tuple[str, int]]:
    """Run query text through the INDEX's analyzer (QueryParser.java:513:
    getFieldQuery analyzes the query string with the field analyzer)."""
    _ensure_registered(analyzer)
    fn = POSITIONAL_ANALYZERS.get(analyzer)
    if fn is not None:
        return fn(text)
    toks = get_analyzer(analyzer)(text)
    return list(zip(toks, range(len(toks))))


def _word_query(word: str, analyzer: str = "standard",
                fields: tuple = (),
                kw_fields: tuple = KEYWORD_FIELDS) -> Query | None:
    word, boost = _split_boost(word)
    fm = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", word)
    if fm and fm.group(1) in fields:
        # extra ANALYZED field: scored field-scoped query with the field's
        # own namespace (reference multi-field getFieldQuery,
        # QueryParser.java:513). Multiterm syntax stays multiterm — the
        # value must NOT be literalized by the analyzer first.
        af, val = fm.group(1), fm.group(2)
        # per-field analyzer resolution (PerFieldAnalyzerWrapper.java:47):
        # `fields` may be a {field: analyzer} dict; tuple form → index default
        f_analyzer = (fields[af] if isinstance(fields, dict) else analyzer)
        if val.endswith("*") and "*" not in val[:-1] and "?" not in val:
            return Prefix(f"{af}:{val[:-1].lower()}", boost=boost)
        if "*" in val or "?" in val:
            return Wildcard(f"{af}:{val.lower()}", boost=boost)
        fz = re.match(r"^(.+?)~(\d+(?:\.\d+)?)?$", val)
        if fz:
            base, sim = fz.group(1), fz.group(2)
            return _make_fuzzy(f"{af}:{base.lower()}", sim, boost)
        pairs = _analyze_pairs(val, f_analyzer)
        if not pairs:
            return None
        if len(pairs) == 1:
            return Term(f"{af}:{pairs[0][0]}", boost=boost)
        return Phrase([f"{af}:{t}" for t, _ in pairs],
                      [p for _, p in pairs], slop=0, boost=boost)
    if fm and fm.group(1) in kw_fields:
        # explicit ^boost → constant-score that value; bare → pure filter (0)
        const = boost if boost != 1.0 else 0.0
        val = fm.group(2)
        if "*" in val or "?" in val:  # wildcard over keyword values
            return ConstantScore(Wildcard(f"{fm.group(1)}:{val}"),
                                 boost=const)
        return ConstantScore(Term(f"{fm.group(1)}:{val}"), boost=const)
    if fm and fm.group(1) == "text":  # the default analyzed field, explicit
        word = fm.group(2)
    elif fm:
        # UNKNOWN field: the reference QueryParser is schema-free — any
        # field name yields a field-scoped query that matches nothing when
        # the field was never indexed. Falling through to the default
        # field here would return spurious body matches for typo'd or
        # unindexed field names (same rule as _quoted_query).
        af, val = fm.group(1), fm.group(2)
        if val.endswith("*") and "*" not in val[:-1] and "?" not in val:
            return Prefix(f"{af}:{val[:-1].lower()}", boost=boost)
        if "*" in val or "?" in val:
            return Wildcard(f"{af}:{val.lower()}", boost=boost)
        fz = re.match(r"^(.+?)~(\d+(?:\.\d+)?)?$", val)
        if fz:
            return _make_fuzzy(f"{af}:{fz.group(1).lower()}", fz.group(2),
                               boost)
        pairs = _analyze_pairs(val, analyzer)
        if not pairs:
            return None
        if len(pairs) == 1:
            return Term(f"{af}:{pairs[0][0]}", boost=boost)
        return Phrase([f"{af}:{t}" for t, _ in pairs],
                      [p for _, p in pairs], slop=0, boost=boost)
    # fuzzy: trailing ~ or ~n / ~0.x (classic similarity form → edits)
    m = re.match(r"^(.+?)~(\d+(?:\.\d+)?)?$", word)
    if m and not word.endswith("\\~"):
        base, sim = m.group(1), m.group(2)
        if "*" not in base and "?" not in base:
            terms = _analyze_pairs(base, analyzer)
            if terms:
                return _make_fuzzy(terms[0][0], sim, boost)
            return None
    if word == "*:*":
        return MatchAll(boost=boost)
    if word == "*":
        # bare `*` in the default field: the reference REFUSES it
        # (QueryParser.java:956, allowLeadingWildcard=false ParseException);
        # this parser is lenient, but Prefix("") would rewrite to a scoring
        # disjunction over the ENTIRE dictionary — a full-postings traversal
        # at a 10^8-term web dictionary. The user's evident intent is
        # match-everything, which MatchAll serves at zero cost (same uniform
        # score a constant-score rewrite of the all-wildcard would give).
        return MatchAll(boost=boost)
    if word.endswith("*") and "*" not in word[:-1] and "?" not in word:
        return Prefix(word[:-1].lower(), boost=boost)
    if "*" in word or "?" in word:
        return Wildcard(word.lower(), boost=boost)
    pairs = _analyze_pairs(word, analyzer)
    if not pairs:
        return None  # analyzed away (stopword / punctuation)
    if len(pairs) == 1:
        return Term(pairs[0][0], boost=boost)
    return Phrase([t for t, _ in pairs], [p for _, p in pairs], slop=0, boost=boost)


def _quoted_query(tok: str, analyzer: str = "standard",
                  fields: tuple = (),
                  kw_fields: tuple = KEYWORD_FIELDS) -> Query | None:
    m = re.match(r'^(?:([A-Za-z_][A-Za-z0-9_]*):)?"([^"]*)"'
                 r'(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?$', tok)
    assert m
    field, body, slop = m.group(1), m.group(2), int(m.group(3) or 0)
    boost = float(m.group(4) or 1.0)
    if field and field in fields:
        # fielded phrase (QueryParser.java:513 getFieldQuery with a quoted
        # value): analyzed with THAT field's chain, terms namespaced
        f_analyzer = fields[field] if isinstance(fields, dict) else analyzer
        pairs = _analyze_pairs(body, f_analyzer)
        if not pairs:
            return None
        if len(pairs) == 1:
            return Term(f"{field}:{pairs[0][0]}", boost=boost)
        return Phrase([f"{field}:{t}" for t, _ in pairs],
                      [p for _, p in pairs], slop=slop, boost=boost)
    if field and field in kw_fields:
        # quoted keyword value: exact NOT_ANALYZED term (filter semantics,
        # same as the unquoted keyword branch)
        const = boost if boost != 1.0 else 0.0
        return ConstantScore(Term(f"{field}:{body}"), boost=const)
    if field and field != "text":
        # UNKNOWN field: the reference QueryParser is schema-free — any
        # field name builds a field-scoped query that simply matches
        # nothing if the field was never indexed (it must NOT silently
        # fall through to the default field and return body matches)
        pairs = _analyze_pairs(body, analyzer)
        if not pairs:
            return None
        if len(pairs) == 1:
            return Term(f"{field}:{pairs[0][0]}", boost=boost)
        return Phrase([f"{field}:{t}" for t, _ in pairs],
                      [p for _, p in pairs], slop=slop, boost=boost)
    pairs = _analyze_pairs(body, analyzer)
    if not pairs:
        return None
    if len(pairs) == 1:
        return Term(pairs[0][0], boost=boost)
    return Phrase([t for t, _ in pairs], [p for _, p in pairs], slop=slop,
                  boost=boost)


def _parse_atom(lx: _Lexer, analyzer: str, fields: tuple = (),
                kw_fields: tuple = KEYWORD_FIELDS,
                quoted_fn=None) -> tuple[Query | None, str]:
    """→ (query, occur) where occur in {'SHOULD','MUST','MUST_NOT'}.
    `quoted_fn` overrides phrase handling (ComplexPhraseQueryParser routes
    quoted tokens through its embedded-clause pass)."""
    occur = "SHOULD"
    t = lx.peek()
    if t and t[0] in ("plus", "minus", "not"):
        lx.next()
        occur = "MUST" if t[0] == "plus" else "MUST_NOT"
        t = lx.peek()
    if t is None:
        return None, occur
    if t[0] == "lpar":
        lx.next()
        q = _parse_or(lx, analyzer, fields, kw_fields, quoted_fn)
        nxt = lx.peek()
        if nxt and nxt[0] == "rpar":
            lx.next()
        if q is not None:
            # parenthesized groups keep their structure under OR-merge
            # (only BARE +/- runs fold flat, Lucene's flat clause parse)
            q._grouped = True  # type: ignore[attr-defined]
        return q, occur
    if t[0] == "quoted":
        lx.next()
        fn = quoted_fn or _quoted_query
        return fn(t[1], analyzer, fields, kw_fields), occur
    if t[0] == "range":
        lx.next()
        return _range_query(t[1]), occur
    if t[0] == "word":
        lx.next()
        return _word_query(t[1], analyzer, fields, kw_fields), occur
    lx.next()
    return None, occur


def _parse_and(lx: _Lexer, analyzer: str, fields: tuple = (),
               kw_fields: tuple = KEYWORD_FIELDS,
               quoted_fn=None) -> Query | None:
    clauses: list[tuple[Query, str]] = []
    q, occur = _parse_atom(lx, analyzer, fields, kw_fields, quoted_fn)
    if q is not None:
        clauses.append((q, occur))
    while True:
        t = lx.peek()
        if t and t[0] == "and":
            lx.next()
            q, occur = _parse_atom(lx, analyzer, fields, kw_fields, quoted_fn)
            if q is not None:
                clauses.append((q, "MUST" if occur == "SHOULD" else occur))
                # retroactively promote the left neighbour to MUST
                if len(clauses) >= 2 and clauses[-2][1] == "SHOULD":
                    clauses[-2] = (clauses[-2][0], "MUST")
        else:
            break
    if not clauses:
        return None
    if len(clauses) == 1 and clauses[0][1] == "SHOULD":
        return clauses[0][0]
    b = Bool()
    for q, occ in clauses:
        {"MUST": b.must, "SHOULD": b.should, "MUST_NOT": b.must_not}[occ].append(q)
    return b


def _merge_should(parts: list[Query]) -> Query:
    if len(parts) == 1:
        return parts[0]
    b = Bool()
    for p in parts:
        grouped = getattr(p, "_grouped", False)
        if (isinstance(p, Bool) and not p.must and not p.must_not
                and p.boost == 1.0 and not p.min_should):
            b.should.extend(p.should)  # OR is associative — safe to flatten
        elif isinstance(p, Bool) and (p.must_not or p.must) and not grouped:
            # fold bare +/- runs into the enclosing bool (Lucene flat
            # parse: 'x OR y -z' excludes z at the top level); explicit
            # (...) groups stay nested — '(a AND b) OR (c AND d)' must NOT
            # become a four-way conjunction
            b.must.extend(p.must)
            b.should.extend(p.should)
            b.must_not.extend(p.must_not)
        else:
            b.should.append(p)
    return b


def _parse_or(lx: _Lexer, analyzer: str, fields: tuple = (),
              kw_fields: tuple = KEYWORD_FIELDS,
              quoted_fn=None) -> Query | None:
    parts: list[Query] = []
    q = _parse_and(lx, analyzer, fields, kw_fields, quoted_fn)
    if q is not None:
        parts.append(q)
    while True:
        t = lx.peek()
        if t is None or t[0] == "rpar":
            break
        if t[0] == "or":
            lx.next()
            continue
        q = _parse_and(lx, analyzer, fields, kw_fields, quoted_fn)
        if q is None:
            if lx.peek() is t:  # no progress — bail
                lx.next()
            continue
        parts.append(q)
    if not parts:
        return None
    return _merge_should(parts)


def parse_query(s: str, analyzer: str = "standard",
                analyzed_fields: tuple = (),
                keyword_fields: tuple = KEYWORD_FIELDS,
                date_resolution: str | None = None) -> Query:
    """``date_resolution`` ("year".."millisecond"): the
    QueryParser.setDateResolution analog — range endpoints that parse as
    dates resolve to DateTools index strings at that resolution
    (QueryParser.java:709 getRangeQuery); None (default) keeps endpoints
    as plain lowercased terms."""
    _DATE_RESOLUTION[0] = date_resolution
    try:
        lx = _Lexer(s)
        had_tokens = bool(lx.tokens)
        q = _parse_or(lx, analyzer, analyzed_fields, keyword_fields)
    finally:
        _DATE_RESOLUTION[0] = None
    if q is None:
        # blank input → MatchAll (lenient); input that analyzed away entirely
        # (e.g. all stopwords) → empty boolean, matches nothing (reference
        # QueryParser + StopFilter behaviour)
        return Bool() if had_tokens else MatchAll()
    return q


def _expand_fields(q: Query, fields: tuple) -> Query:
    """Rewrite an unscoped term/phrase tree so each leaf searches EVERY
    field in `fields` (default text field = "" prefix; others namespaced),
    combined as a SHOULD disjunction per leaf — the reference
    MultiFieldQueryParser's per-clause expansion
    (queryParser/MultiFieldQueryParser.java)."""
    def ns(field: str, term: str) -> str:
        return term if field == "text" else f"{field}:{term}"

    if isinstance(q, Term) and ":" not in q.term:
        return Bool(should=[Term(ns(f, q.term)) for f in fields],
                    boost=q.boost)
    if isinstance(q, Phrase) and all(":" not in t for t in q.phrase_terms):
        return Bool(should=[
            Phrase([ns(f, t) for t in q.phrase_terms],
                   q.positions, q.slop) for f in fields
        ], boost=q.boost)
    # MultiTermQuery leaves: namespaced patterns enumerate within the
    # field's slice of the dictionary, so per-field copies suffice
    if isinstance(q, Prefix) and ":" not in q.prefix:
        return Bool(should=[Prefix(ns(f, q.prefix)) for f in fields],
                    boost=q.boost)
    if isinstance(q, Wildcard) and ":" not in q.pattern:
        return Bool(should=[Wildcard(ns(f, q.pattern)) for f in fields],
                    boost=q.boost)
    if isinstance(q, Fuzzy) and ":" not in q.term:
        return Bool(should=[
            Fuzzy(ns(f, q.term), q.max_edits, q.prefix_length)
            for f in fields
        ], boost=q.boost)
    if isinstance(q, TermRange) and not any(
            b and ":" in b for b in (q.lo, q.hi)):
        def fr(f: str) -> TermRange:
            if f == "text":
                return TermRange(q.lo, q.hi, q.include_lo, q.include_hi)
            # open bounds must stay INSIDE the field's namespace slice:
            # a bare None would sweep every field's dictionary entries
            lo = f"{f}:{q.lo}" if q.lo is not None else f"{f}:"
            hi = f"{f}:{q.hi}" if q.hi is not None else f"{f}:￿"
            return TermRange(lo, hi,
                             q.include_lo if q.lo is not None else True,
                             q.include_hi if q.hi is not None else True)
        return Bool(should=[fr(f) for f in fields], boost=q.boost)
    if isinstance(q, Bool):
        return Bool(
            must=[_expand_fields(c, fields) for c in q.must],
            should=[_expand_fields(c, fields) for c in q.should],
            must_not=[_expand_fields(c, fields) for c in q.must_not],
            min_should=q.min_should, boost=q.boost)
    if isinstance(q, DisjunctionMax):
        return DisjunctionMax([_expand_fields(c, fields) for c in q.queries],
                              q.tie_breaker, q.boost)
    if isinstance(q, ConstantScore):
        return ConstantScore(_expand_fields(q.query, fields), q.boost)
    return q


def parse_multi_field(s: str, fields: tuple,
                      analyzer: str = "standard") -> Query:
    """MultiFieldQueryParser.parse: the same grammar, every unscoped leaf
    expanded across `fields` (e.g. ("text", "title"))."""
    analyzed = tuple(f for f in fields if f != "text")
    return _expand_fields(parse_query(s, analyzer, analyzed), fields)


# ---------------------------------------------------------------------------
# contrib PrecedenceQueryParser (contrib/misc/.../precedence/
# PrecedenceQueryParser.jj): AND binds TIGHTER than OR —
# ``a AND b OR c`` parses as (+a +b) OR c, where the classic parser's flat
# clause list yields +a +b c. Grammar:
#   Query  ::= Modifier andExpr ( [OR] Modifier andExpr )*
#   andExpr ::= Clause ( AND Modifier Clause )*
# Modifiers before an andExpr apply to the WHOLE group.
# ---------------------------------------------------------------------------


def _prec_clause(lx: _Lexer, analyzer: str, fields: tuple,
                 kw_fields: tuple) -> Query | None:
    """Clause ::= term | "phrase" | range | ( Query ) — NO leading modifier
    (the precedence grammar consumes modifiers at the two boolean levels)."""
    t = lx.peek()
    if t is None:
        return None
    if t[0] == "lpar":
        lx.next()
        q = _prec_query(lx, analyzer, fields, kw_fields)
        nxt = lx.peek()
        if nxt and nxt[0] == "rpar":
            lx.next()
        return q
    if t[0] == "quoted":
        lx.next()
        return _quoted_query(t[1], analyzer, fields, kw_fields)
    if t[0] == "range":
        lx.next()
        return _range_query(t[1])
    if t[0] == "word":
        lx.next()
        return _word_query(t[1], analyzer, fields, kw_fields)
    lx.next()
    return None


def _prec_modifier(lx: _Lexer) -> str:
    t = lx.peek()
    if t and t[0] in ("plus", "minus", "not"):
        lx.next()
        return "MUST" if t[0] == "plus" else "MUST_NOT"
    return "SHOULD"


def _prec_and(lx: _Lexer, analyzer: str, fields: tuple,
              kw_fields: tuple) -> Query | None:
    """andExpression: Clause (AND Modifier Clause)* — AND retroactively
    promotes its left neighbour to MUST (the shared addClause rule)."""
    clauses: list[tuple[Query, str]] = []
    q = _prec_clause(lx, analyzer, fields, kw_fields)
    if q is not None:
        clauses.append((q, "SHOULD"))
    while True:
        t = lx.peek()
        if not (t and t[0] == "and"):
            break
        lx.next()
        occ = _prec_modifier(lx)
        q = _prec_clause(lx, analyzer, fields, kw_fields)
        if q is None:
            continue
        clauses.append((q, "MUST" if occ == "SHOULD" else occ))
        if len(clauses) >= 2 and clauses[-2][1] == "SHOULD":
            clauses[-2] = (clauses[-2][0], "MUST")
    if not clauses:
        return None
    if len(clauses) == 1 and clauses[0][1] == "SHOULD":
        return clauses[0][0]
    b = Bool()
    for q, occ in clauses:
        {"MUST": b.must, "SHOULD": b.should,
         "MUST_NOT": b.must_not}[occ].append(q)
    return b


def _prec_query(lx: _Lexer, analyzer: str, fields: tuple,
                kw_fields: tuple) -> Query | None:
    parts: list[tuple[Query, str]] = []
    while True:
        t = lx.peek()
        if t is None or t[0] == "rpar":
            break
        if t[0] == "or":
            lx.next()
            continue
        occ = _prec_modifier(lx)
        before = lx.i
        q = _prec_and(lx, analyzer, fields, kw_fields)
        if q is None:
            if lx.i == before:  # no progress — bail
                if lx.peek() is None:  # modifier was the LAST token
                    break              # ("NOT" / "+" / "-" alone)
                lx.next()
            continue
        parts.append((q, occ))
    if not parts:
        return None
    if len(parts) == 1 and parts[0][1] == "SHOULD":
        return parts[0][0]
    b = Bool()
    for q, occ in parts:
        # AND-groups stay NESTED under the OR level — the whole point of
        # the precedence grammar (no classic flat-clause folding)
        {"MUST": b.must, "SHOULD": b.should,
         "MUST_NOT": b.must_not}[occ].append(q)
    return b


def parse_precedence(s: str, analyzer: str = "standard",
                     analyzed_fields: tuple = (),
                     keyword_fields: tuple = KEYWORD_FIELDS) -> Query:
    """contrib PrecedenceQueryParser.parse (default operator OR)."""
    lx = _Lexer(s)
    had_tokens = bool(lx.tokens)
    q = _prec_query(lx, analyzer, analyzed_fields, keyword_fields)
    if q is None:
        return Bool() if had_tokens else MatchAll()
    return q


# ---------------------------------------------------------------------------
# contrib ComplexPhraseQueryParser (contrib/misc/.../complexPhrase/
# ComplexPhraseQueryParser.java): phrase bodies may hold embedded clause
# logic — ``"(john jon) smyth~"`` — each phrase slot lifting to a span
# clause (Term → SpanTerm, multi-term → SpanMulti wrapper, (a b) group →
# SpanOr), sequenced by an IN-ORDER SpanNear with the phrase slop. Mixed
# negatives follow the reference rewrite: include = SpanNear(positives,
# slop + numNegatives), exclude = SpanNear(all clauses, slop) → SpanNot.
# ---------------------------------------------------------------------------


def _lift_span(q: Query):
    from .ast import SpanMulti, SpanNot as _SpanNot, SpanOr, SpanTerm

    if isinstance(q, Term):
        return SpanTerm(q.term)
    if isinstance(q, (Prefix, Wildcard, Fuzzy, TermRange)):
        return SpanMulti(q)
    from .ast import Regexp as _Regexp

    if isinstance(q, _Regexp):
        return SpanMulti(q)
    if isinstance(q, Bool):
        # addComplexPhraseClause: ors minus nots
        ors = [_lift_span(c) for c in list(q.should) + list(q.must)]
        nots = [_lift_span(c) for c in q.must_not]
        ors = [c for c in ors if c is not None]
        nots = [c for c in nots if c is not None]
        if not ors:
            return None
        inc = ors[0] if len(ors) == 1 else SpanOr(ors)
        if nots:
            exc = nots[0] if len(nots) == 1 else SpanOr(nots)
            return _SpanNot(inc, exc)
        return inc
    if isinstance(q, Phrase):
        # multi-token analysis of one slot (rare) → ordered exact sub-span
        from .ast import SpanNear as _SpanNear

        return _SpanNear([SpanTerm(t) for t in q.phrase_terms], slop=0,
                         in_order=True)
    return None


def _complex_phrase_body(body: str, slop: int, boost: float, analyzer: str,
                         fields: tuple, kw_fields: tuple) -> Query | None:
    """Phrase-content pass (the parser's pass 2): a flat, ORDER-PRESERVING
    clause sequence with per-clause modifiers, lifted to span clauses."""
    from .ast import SpanNear as _SpanNear, SpanNot as _SpanNot, SpanTerm

    lx = _Lexer(body)
    seq: list[tuple[Query | None, str]] = []
    while lx.peek() is not None:
        q, occ = _parse_atom(lx, analyzer, fields, kw_fields)
        if q is None:
            continue
        seq.append((q, occ))
    if not seq:
        return None
    if len(seq) == 1 and seq[0][1] != "MUST_NOT":
        q = seq[0][0]
        if isinstance(q, Term):  # reference: single TermQuery passes through
            return Term(q.term, boost=boost)
        lifted = _lift_span(q)
        if lifted is not None:
            lifted.boost = boost
            return lifted
        return q
    spans = []
    for q, _occ in seq:
        s = _lift_span(q)
        if s is None:
            # reference inserts an unmatchable dummy so "fred smithe*" with
            # no smithe* terms cannot degrade to matching bare "fred"
            s = SpanTerm("\x00unmatchable")
        spans.append(s)
    negatives = [i for i, (_q, occ) in enumerate(seq) if occ == "MUST_NOT"]
    if not negatives:
        return _SpanNear(spans, slop=slop, in_order=True, boost=boost)
    positives = [s for s, (_q, occ) in zip(spans, seq) if occ != "MUST_NOT"]
    include = (positives[0] if len(positives) == 1
               else _SpanNear(positives, slop=slop + len(negatives),
                              in_order=True))
    exclude = _SpanNear(spans, slop=slop, in_order=True)
    return _SpanNot(include, exclude, boost=boost)


def _complex_quoted_query(tok: str, analyzer: str = "standard",
                          fields: tuple = (),
                          kw_fields: tuple = KEYWORD_FIELDS) -> Query | None:
    m = re.match(r'^(?:([A-Za-z_][A-Za-z0-9_]*):)?"([^"]*)"'
                 r'(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?$', tok)
    assert m
    field, body, slop = m.group(1), m.group(2), int(m.group(3) or 0)
    boost = float(m.group(4) or 1.0)
    # field sensitivity inside complex phrases is the reference's own open
    # TODO (ComplexPhraseQueryParser.java parsePhraseElements comment) —
    # like it, the embedded clauses parse against the default field
    return _complex_phrase_body(body, slop, boost, analyzer, fields,
                                kw_fields)


def parse_complex_phrase(s: str, analyzer: str = "standard",
                         analyzed_fields: tuple = (),
                         keyword_fields: tuple = KEYWORD_FIELDS) -> Query:
    """contrib ComplexPhraseQueryParser.parse: the classic grammar, but
    every quoted phrase may embed clause syntax (wildcards, fuzzies,
    (a b) alternative groups, -negatives) and rewrites to span queries."""
    lx = _Lexer(s)
    had_tokens = bool(lx.tokens)
    # pass 1 = the classic grammar; pass 2 happens per quoted token inside
    # _complex_quoted_query (the reference's two-pass design collapsed:
    # our AST needs no IndexReader to rewrite)
    q = _parse_or(lx, analyzer, analyzed_fields, keyword_fields,
                  quoted_fn=_complex_quoted_query)
    if q is None:
        return Bool() if had_tokens else MatchAll()
    return q
