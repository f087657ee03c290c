"""XML query parser — build a query AST from the reference's XML dialect.

Reference: contrib/xml-query-parser/src/java/org/apache/lucene/xmlparser/
(CoreParser.java registers one builder per element tag; extension builders
in builders/ — element shapes taken from the shipped test queries,
contrib/xml-query-parser/src/test/org/apache/lucene/xmlparser/*.xml).

Supported elements (reference builder in parens):

  <TermQuery fieldName=f boost=b>text            (TermQueryBuilder)
  <TermsQuery fieldName=f>free text              (TermsQueryBuilder — analyze
      → SHOULD of TermQuery per token)
  <BooleanQuery fieldName=f><Clause occurs=must|should|mustnot>…
                                                 (BooleanQueryBuilder)
  <DisjunctionMaxQuery tieBreaker=t>…            (DisjunctionMaxQuery…)
  <MatchAllDocsQuery/>                           (MatchAllDocsQueryBuilder)
  <UserQuery>classic query syntax                (UserInputQueryBuilder →
      this engine's parse_query)
  <ConstantScoreQuery boost=b>filter             (ConstantScoreQueryBuilder)
  <FilteredQuery><Query>…</Query><Filter>…</Filter>
                                                 (FilteredQueryBuilder —
      filter folded in as a score-neutral MUST clause)
  <RangeFilter fieldName=f lowerTerm=a upperTerm=b
      includeLower=1 includeUpper=1>             (RangeFilterBuilder)
  <TermsFilter fieldName=f>values                (TermsFilterBuilder)
  <BooleanFilter><Clause occurs=…>filters        (BooleanFilterBuilder)
  <CachedFilter>filter                           (CachedFilterBuilder —
      pass-through; Spark caching subsumes the filter cache)
  <BoostingQuery><Query>…<BoostQuery boost=d>…   (BoostingQueryBuilder —
      demote factor = boost attr of BoostQuery)
  <BoostingTermQuery fieldName=f>term            (BoostingTermBuilder —
      payload scoring is out of scope; maps to a boosted TermQuery)
  <FuzzyLikeThisQuery maxNumTerms=n minSimilarity=s prefixLength=p>
      <Field fieldName=f>text</Field>…           (FuzzyLikeThisQueryBuilder)
  <SpanTerm fieldName=f>t  <SpanOr>  <SpanOrTerms>  <SpanNear slop=s
      inOrder=bool>  <SpanFirst end=n>  <SpanNot><Include><Exclude>
                                                 (builders/Span*Builder)
  <DuplicateFilter fieldName=f keepMode=first|last>
                                                 (DuplicateFilterBuilder) —
      only legal as the Filter of a top-level FilteredQuery; yields an
      XmlDedup wrapper the Searcher routes to search_dedup (one doc per
      key value — a window post-filter, not expressible as a pure AST).

fieldName attributes are inherited by nested elements (the reference
builders read the nearest enclosing fieldName); terms in non-default
fields are namespaced "field:term" per this engine's convention.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass

from ..analysis import get_analyzer
from .ast import (
    Bool,
    Boosting,
    ConstantScore,
    DisjunctionMax,
    MatchAll,
    Query,
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    Term,
    TermRange,
)
from .flt import FuzzyLikeThis
from .parser import parse_query


@dataclass
class XmlDedup:
    """FilteredQuery whose filter is a DuplicateFilter: keep one matching
    doc per `key` value. Routed by Searcher.search_xml → search_dedup."""

    query: Query
    key: str
    keep: str = "first"  # DuplicateFilter KM_USE_FIRST/LAST_OCCURRENCE


_TRUE = ("true", "1", "yes")


def _ns(field: str, term: str) -> str:
    return term if field in ("", "text") else f"{field}:{term}"


def _field(el: ET.Element, inherited: str) -> str:
    return el.get("fieldName", inherited)


def _boost(el: ET.Element, q: Query) -> Query:
    b = el.get("boost")
    if b is not None:
        q.boost = q.boost * float(b)
    return q


def _analyze(text: str, analyzer: str) -> list[str]:
    return get_analyzer(analyzer)(text or "")


def _children(el: ET.Element) -> list[ET.Element]:
    return list(el)


def _text(el: ET.Element) -> str:
    return (el.text or "").strip()


def parse_xml(xml: str | ET.Element, analyzer: str = "whitespace",
              default_field: str = "") -> Query | XmlDedup:
    """Parse an XML query document into the engine AST (or an XmlDedup
    wrapper when a DuplicateFilter is present). `analyzer` names the chain
    used by TermsQuery/SpanOrTerms/UserQuery text analysis."""
    root = ET.fromstring(xml) if isinstance(xml, str) else xml
    if root.tag == "FilteredQuery":
        qel = root.find("Query")
        fel = root.find("Filter")
        if qel is None or fel is None:
            raise ValueError("FilteredQuery needs <Query> and <Filter>")
        dup = fel.find("DuplicateFilter")
        if dup is not None:
            inner = _build(_one(qel), default_field, analyzer)
            keep = (dup.get("keepMode") or "first").lower()
            return XmlDedup(inner, key=dup.get("fieldName", "url"),
                            keep="last" if keep.startswith("l") else "first")
    return _build(root, default_field, analyzer)


def _one(el: ET.Element) -> ET.Element:
    kids = _children(el)
    if len(kids) != 1:
        raise ValueError(f"<{el.tag}> expects exactly one child element")
    return kids[0]


def _build(el: ET.Element, field: str, analyzer: str) -> Query:
    tag = el.tag
    field = _field(el, field)

    if tag == "TermQuery" or tag == "BoostingTermQuery":
        return _boost(el, Term(_ns(field, _text(el))))
    if tag == "TermsQuery":
        toks = _analyze(_text(el), analyzer)
        return _boost(el, Bool(
            should=[Term(_ns(field, t)) for t in toks],
            min_should=int(el.get("minimumNumberShouldMatch", "0"))))
    if tag == "BooleanQuery":
        q = Bool(min_should=int(el.get("minimumNumberShouldMatch", "0")))
        for cl in el.findall("Clause"):
            occurs = (cl.get("occurs") or "should").lower()
            sub = _build(_one(cl), field, analyzer)
            if occurs == "must":
                q.must.append(sub)
            elif occurs in ("mustnot", "must_not"):
                q.must_not.append(sub)
            elif occurs == "filter":
                q.must.append(ConstantScore(sub, boost=0.0))
            else:
                q.should.append(sub)
        return _boost(el, q)
    if tag == "DisjunctionMaxQuery":
        subs = [_build(c, field, analyzer) for c in _children(el)]
        return _boost(el, DisjunctionMax(
            queries=subs, tie_breaker=float(el.get("tieBreaker", "0.0"))))
    if tag == "MatchAllDocsQuery":
        return _boost(el, MatchAll())
    if tag == "UserQuery":
        q = parse_query(_text(el), analyzer=analyzer)
        return _boost(el, q)
    if tag == "ConstantScoreQuery":
        inner = _build(_one(el), field, analyzer)
        q = ConstantScore(inner)
        b = el.get("boost")
        q.boost = float(b) if b is not None else 1.0
        return q
    if tag == "FilteredQuery":
        qel, fel = el.find("Query"), el.find("Filter")
        if qel is None or fel is None:
            raise ValueError("FilteredQuery needs <Query> and <Filter>")
        if fel.find("DuplicateFilter") is not None:
            raise ValueError(
                "DuplicateFilter is only supported at the top level "
                "(use parse_xml + Searcher.search_xml)")
        inner = _build(_one(qel), field, analyzer)
        filt = _build(_one(fel), field, analyzer)
        return _boost(el, Bool(
            must=[inner, ConstantScore(filt, boost=0.0)]))
    if tag in ("RangeFilter", "RangeQuery"):
        lo, hi = el.get("lowerTerm"), el.get("upperTerm")
        return _boost(el, TermRange(
            lo=_ns(field, lo) if lo is not None else None,
            hi=_ns(field, hi) if hi is not None else None,
            include_lo=(el.get("includeLower", "true").lower() in _TRUE),
            include_hi=(el.get("includeUpper", "true").lower() in _TRUE)))
    if tag == "TermsFilter":
        toks = _analyze(_text(el), analyzer)
        return ConstantScore(
            Bool(should=[Term(_ns(field, t)) for t in toks]), boost=0.0)
    if tag == "BooleanFilter":
        q = Bool()
        for cl in el.findall("Clause"):
            occurs = (cl.get("occurs") or "should").lower()
            sub = _build(_one(cl), field, analyzer)
            (q.must if occurs == "must" else
             q.must_not if occurs in ("mustnot", "must_not") else
             q.should).append(sub)
        return ConstantScore(q, boost=0.0)
    if tag == "CachedFilter":
        # per-reader filter cache (CachedFilterBuilder) — Spark/parquet
        # caching subsumes it; semantics are the child's
        return _build(_one(el), field, analyzer)
    if tag == "BoostingQuery":
        qel, bel = el.find("Query"), el.find("BoostQuery")
        if qel is None or bel is None:
            raise ValueError("BoostingQuery needs <Query> and <BoostQuery>")
        return _boost(el, Boosting(
            match=_build(_one(qel), field, analyzer),
            context=_build(_one(bel), field, analyzer),
            demote=float(bel.get("boost", "0.01"))))
    if tag == "FuzzyLikeThisQuery":
        flds = [( _field(f, field), _text(f)) for f in el.findall("Field")]
        return _boost(el, FuzzyLikeThis(
            fields=flds,
            max_num_terms=int(el.get("maxNumTerms", "50")),
            min_similarity=float(el.get("minSimilarity", "0.5")),
            prefix_length=int(el.get("prefixLength", "0"))))
    if tag == "SpanTerm":
        return _boost(el, SpanTerm(_ns(field, _text(el))))
    if tag == "SpanOrTerms":
        toks = _analyze(_text(el), analyzer)
        return _boost(el, SpanOr(
            clauses=[SpanTerm(_ns(field, t)) for t in toks]))
    if tag == "SpanOr":
        return _boost(el, SpanOr(
            clauses=[_build(c, field, analyzer) for c in _children(el)]))
    if tag == "SpanNear":
        return _boost(el, SpanNear(
            clauses=[_build(c, field, analyzer) for c in _children(el)],
            slop=int(el.get("slop", "0")),
            in_order=(el.get("inOrder", "true").lower() in _TRUE)))
    if tag == "SpanFirst":
        return _boost(el, SpanFirst(
            match=_build(_one(el), field, analyzer),
            end=int(el.get("end", "1"))))
    if tag == "SpanNot":
        inc, exc = el.find("Include"), el.find("Exclude")
        if inc is None or exc is None:
            raise ValueError("SpanNot needs <Include> and <Exclude>")
        return _boost(el, SpanNot(
            include=_build(_one(inc), field, analyzer),
            exclude=_build(_one(exc), field, analyzer)))
    if tag == "LikeThisQuery":
        raise ValueError(
            "LikeThisQuery needs index statistics: use "
            "Searcher.more_like_this (contrib MoreLikeThis analog)")
    raise ValueError(f"unknown XML query element <{tag}>")
