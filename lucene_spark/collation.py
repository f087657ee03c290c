"""Index-time collation keys — CollationKeyFilter / CollationKeyAnalyzer.

Reference semantics (cites /root/reference):
- ``src/java/org/apache/lucene/collation/CollationKeyFilter.java:79``:
  each token's text is replaced by its Collator sort key (encoded via
  IndexableBinaryStringTools), so the index's BYTE order over those
  terms equals the collator's order — making TermRangeQuery / prefix
  locale-correct. ``CollationKeyAnalyzer.java`` = KeywordTokenizer →
  CollationKeyFilter (the whole field value becomes ONE key term).
- The contract (CollationKeyFilter.java:43-60): the SAME collator must
  transform query-side range endpoints; keys from different collators
  never mix in one field.

Spark restatement: a collation analyzer producing ``[(key, 0)]`` for the
whole field value, registered like any chain and routed per field via
``field_analyzers`` / ``keyword-style`` usage; TermRange then works
unchanged because the planner's RAM-dict enumeration is plain string
order and the keys ARE collation order. ``collation_range`` builds the
endpoint-transformed query (the reference leaves this to the caller;
here it's a helper).

Deterministic collator: java.text.Collator tailorings are JVM data we
don't ship, so the key function is a self-contained UCA-flavored
three-level key — primary = NFD base letters casefolded (accents and
case ignored), secondary = combining marks, tertiary = case — joined
with \\x01 separators so string comparison orders primary-first.
STATED DEVIATION: no per-locale tailoring tables (e.g. sv 'å' > 'z');
the level structure and the filter contract match the reference.
"""

from __future__ import annotations

import unicodedata

from .analysis import ANALYZERS, POSITIONAL_ANALYZERS

STRENGTHS = ("primary", "secondary", "tertiary")


def collation_key(text: str, strength: str = "tertiary") -> str:
    """Sort key whose plain string order is the collation order at the
    given strength (PRIMARY: accents+case ignored; SECONDARY: accents
    significant; TERTIARY: case significant too — java.text.Collator's
    strength model)."""
    if strength not in STRENGTHS:
        raise ValueError(f"strength must be one of {STRENGTHS}")
    nfd = unicodedata.normalize("NFD", text or "")
    base = []
    marks = []
    for i, ch in enumerate(nfd):
        if unicodedata.combining(ch):
            # secondary weight: mark class + position binds the accent to
            # its letter without disturbing primary order
            marks.append(f"{len(base):04x}{ord(ch):06x}")
        else:
            base.append(ch)
    primary = "".join(base).casefold()
    key = primary
    if strength in ("secondary", "tertiary"):
        key += "\x01" + "".join(marks)
    if strength == "tertiary":
        case = "".join("1" if c.isupper() else "0" for c in base)
        key += "\x01" + case
    return key


def register_collation_analyzer(name: str,
                                strength: str = "tertiary") -> None:
    """Register ``name`` as a CollationKeyAnalyzer: the entire field value
    → one collation-key term at position 0 (KeywordTokenizer →
    CollationKeyFilter). Use via ``field_analyzers={"title": name}`` so
    TermRange over ``title:`` is locale-correct."""
    def chain(text: str):
        if text is None or text == "":
            return []
        return [(collation_key(text, strength), 0)]

    POSITIONAL_ANALYZERS[name] = chain
    ANALYZERS[name] = lambda text: [t for t, _ in chain(text)]


def collation_range(field: str | None, lo: str | None, hi: str | None,
                    include_lo: bool = True, include_hi: bool = True,
                    strength: str = "tertiary"):
    """TermRange with endpoints transformed by the SAME collator the
    field was indexed with — the query-side half of the
    CollationKeyFilter contract."""
    from .queries.ast import TermRange

    def k(v):
        if v is None:
            return None
        key = collation_key(v, strength)
        return f"{field}:{key}" if field else key

    return TermRange(k(lo), k(hi), include_lo, include_hi)
