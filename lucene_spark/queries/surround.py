"""Surround query language — proximity-operator DSL over the span algebra.

Reference: contrib/surround/src/java/org/apache/lucene/queryParser/surround/
(parser/QueryParser.jj grammar; query/DistanceQuery.java maps a distance
operator to SpanNearQuery(clauses, opDistance − 1, ordered) — W ordered,
N unordered, DistanceQuery.java:116; query/SrndPrefixQuery.java and
SrndTruncQuery.java expand against the dictionary inside span clauses via
SpanNearClauseFactory.java).

Grammar (QueryParser.jj:226-400), precedence loosest→tightest:

    query    := fielded (OR fielded)*            — infix OR
    fielded  := (field ':')* andq                — field prefixes distribute
    andq     := notq (AND notq)*
    notq     := nq (NOT nq)*
    nq       := wq ([d]N wq)*                    — unordered distance d (default 1)
    wq       := primary ([d]W primary)*          — ordered distance d
    primary  := '(' query ')' | OP '(' query, query, ... ')' | simple
    OP       := OR | AND | [d]W | [d]N           — prefix (n-ary) form
    simple   := term | term* | tr?nc* | "quoted"   [^weight]

AST mapping: AND/OR/NOT → Bool; [d]W / [d]N → SpanNear(slop=d−1,
in_order = W); terms inside a distance op → SpanTerm, prefix/trunc →
SpanMulti(Prefix/Wildcard) (the SpanNearClauseFactory dictionary
expansion); OR inside a distance op → SpanOr. AND/NOT are illegal inside
distance operators (DistanceQuery.java:48 distanceSubQueryNotAllowed) →
ValueError. Surround does NOT run an analyzer over terms
(query/SrndTermQuery.java uses the literal text); terms are lowercased to
match this engine's lowercasing chains, mirroring the reference's usual
pairing with a lowercasing analyzer at index time.

Field prefixes namespace leaf terms as "field:term" (this engine's
multi-field convention); the default field ("" or "text") stays bare.
Multiple stacked prefixes `a:b:q` OR the query across fields
(query/FieldsQuery.java).
"""

from __future__ import annotations

import re

from .ast import (
    Bool,
    Prefix,
    Query,
    SpanMulti,
    SpanNear,
    SpanOr,
    SpanTerm,
    Term,
    Wildcard,
)

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<colon>:)
      | (?P<carat>\^(?P<weight>\d+(?:\.\d+)?))
      | (?P<quoted>"[^"]*")
      | (?P<word>[^\s(),:^"]+)
    )""",
    re.VERBOSE,
)

_DIST_RE = re.compile(r"^(\d*)([WwNn])$")
MIN_PREFIX = 3  # QueryParser.jj minimumPrefixLength
MIN_TRUNC = 3   # QueryParser.jj minimumCharsInTrunc


def _lex(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m or m.end() == i:
            if s[i:].strip():
                raise ValueError(f"surround: cannot tokenize at {s[i:]!r}")
            break
        i = m.end()
        if m.group("lparen"):
            out.append(("(", "("))
        elif m.group("rparen"):
            out.append((")", ")"))
        elif m.group("comma"):
            out.append((",", ","))
        elif m.group("colon"):
            out.append((":", ":"))
        elif m.group("carat"):
            out.append(("^", m.group("weight")))
        elif m.group("quoted"):
            out.append(("quoted", m.group("quoted")[1:-1]))
        else:
            w = m.group("word")
            u = w.upper()
            if u in ("AND", "OR", "NOT"):
                out.append((u, u))
            elif _DIST_RE.match(w):
                out.append(("dist", w))
            else:
                out.append(("term", w))
    return out


class _P:
    def __init__(self, tokens: list[tuple[str, str]], field: str = ""):
        self.toks = tokens
        self.i = 0
        self.field = field  # current field namespace ('' = default)

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind: str):
        k, v = self.next()
        if k != kind:
            raise ValueError(f"surround: expected {kind}, got {v!r}")
        return v

    # -- leaf construction ------------------------------------------------
    def _ns(self, term: str) -> str:
        return term if self.field in ("", "text") else f"{self.field}:{term}"

    def _leaf(self, text: str, quoted: bool, span: bool) -> Query:
        text = text.lower()
        if not quoted and text.endswith("*") and "*" not in text[:-1] \
                and "?" not in text:
            base = text[:-1]
            if len(base) < MIN_PREFIX:
                raise ValueError(  # QueryParser.jj truncationErrorMessage
                    f"surround: too unrestrictive truncation: {text!r}")
            node: Query = Prefix(self._ns(base))
            return SpanMulti(node) if span else node
        if not quoted and ("*" in text or "?" in text):
            if len(re.sub(r"[*?]", "", text)) < MIN_TRUNC:
                raise ValueError(
                    f"surround: too unrestrictive truncation: {text!r}")
            node = Wildcard(self._ns(text))
            return SpanMulti(node) if span else node
        t = self._ns(text)
        return SpanTerm(t) if span else Term(t)

    # -- productions ------------------------------------------------------
    def parse(self, span: bool = False) -> Query:
        q = self.or_query(span)
        k, _ = self.peek()
        if k is not None:
            raise ValueError(f"surround: trailing input at token {self.i}")
        return q

    def or_query(self, span: bool) -> Query:
        parts = [self.and_query(span)]
        while self.peek()[0] == "OR":
            self.next()
            parts.append(self.and_query(span))
        if len(parts) == 1:
            return parts[0]
        return SpanOr(clauses=parts) if span else Bool(should=parts)

    def and_query(self, span: bool) -> Query:
        parts = [self.not_query(span)]
        while self.peek()[0] == "AND":
            self.next()
            parts.append(self.not_query(span))
        if len(parts) == 1:
            return parts[0]
        if span:  # DistanceQuery.java:48 — AND not allowed inside W/N
            raise ValueError("surround: AND inside a distance operator")
        return Bool(must=parts)

    def not_query(self, span: bool) -> Query:
        first = self.n_query(span)
        rest = []
        while self.peek()[0] == "NOT":
            self.next()
            rest.append(self.n_query(span))
        if not rest:
            return first
        if span:
            raise ValueError("surround: NOT inside a distance operator")
        return Bool(must=[first], must_not=rest)

    def _dist(self, tok: str) -> tuple[int, bool]:
        m = _DIST_RE.match(tok)
        assert m
        d = int(m.group(1) or 1)
        if d < 1:
            raise ValueError(f"surround: distance < 1 in {tok!r}")
        return d, m.group(2).upper() == "W"

    def n_query(self, span: bool) -> Query:
        parts = [self.w_query(span)]
        dists = []
        while self.peek()[0] == "dist" and \
                self.peek()[1][-1].upper() == "N":
            dists.append(self._dist(self.next()[1]))
            parts.append(self.w_query(True))
        return self._fold_distance(parts, dists, span)

    def w_query(self, span: bool) -> Query:
        parts = [self.primary(span)]
        dists = []
        while self.peek()[0] == "dist" and \
                self.peek()[1][-1].upper() == "W":
            dists.append(self._dist(self.next()[1]))
            parts.append(self.primary(True))
        return self._fold_distance(parts, dists, span)

    def _fold_distance(self, parts: list[Query], dists, outer_span: bool) -> Query:
        """Infix a dW b dW c folds to ONE SpanNear over all operands with
        the first operator's distance (the reference's infix DistanceQuery
        collects the whole operator run, QueryParser.jj:325-356)."""
        if not dists:
            return parts[0]
        if len({d for d in dists}) > 1:
            raise ValueError("surround: mixed distances in one operator run")
        d, ordered = dists[0]
        parts = [self._spanify(p) for p in parts]
        return SpanNear(clauses=parts, slop=d - 1, in_order=ordered)

    def _spanify(self, q: Query) -> Query:
        """Re-check that an operand built in non-span context is span-legal
        (first operand of an infix run is parsed before the operator is
        seen) and convert term-level leaves."""
        if isinstance(q, Term):
            return SpanTerm(q.term, boost=q.boost)
        if isinstance(q, (Prefix, Wildcard)):
            return SpanMulti(q)
        if isinstance(q, Bool):
            if q.must or q.must_not or q.min_should:
                raise ValueError(
                    "surround: AND/NOT inside a distance operator")
            return SpanOr(clauses=[self._spanify(c) for c in q.should],
                          boost=q.boost)
        return q  # already a span node

    def primary(self, span: bool) -> Query:
        k, v = self.peek()
        if k == "(":
            self.next()
            q = self.or_query(span)
            self.expect(")")
            return self._weight(q)
        if k in ("OR", "AND") or k == "dist":
            # prefix n-ary operator: OP(q1, q2, ...)
            op = self.next()
            args = self._arg_list(
                span=(op[0] == "dist") or span)
            if op[0] == "OR":
                q = (SpanOr(clauses=[self._spanify(a) for a in args])
                     if span else Bool(should=args))
            elif op[0] == "AND":
                if span:
                    raise ValueError(
                        "surround: AND inside a distance operator")
                q = Bool(must=args)
            else:
                d, ordered = self._dist(op[1])
                q = SpanNear(clauses=[self._spanify(a) for a in args],
                             slop=d - 1, in_order=ordered)
            return self._weight(q)
        if k == "term":
            self.next()
            # field prefix? term ':' ...
            if self.peek()[0] == ":":
                self.next()
                saved = self.field
                self.field = v
                q = self.primary(span)
                self.field = saved
                return q
            return self._weight(self._leaf(v, quoted=False, span=span))
        if k == "quoted":
            self.next()
            return self._weight(self._leaf(v, quoted=True, span=span))
        raise ValueError(f"surround: unexpected token {v!r}")

    def _arg_list(self, span: bool) -> list[Query]:
        self.expect("(")
        args = [self.or_query(span)]
        while self.peek()[0] == ",":
            self.next()
            args.append(self.or_query(span))
        self.expect(")")
        return args

    def _weight(self, q: Query) -> Query:
        if self.peek()[0] == "^":
            q.boost = q.boost * float(self.next()[1])
        return q


def parse_surround(s: str) -> Query:
    """Parse a surround-DSL string into this engine's query AST."""
    return _P(_lex(s)).parse()
