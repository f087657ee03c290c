"""WikipediaTokenizer — contrib/wikipedia's wiki-markup-aware tokenizer.

Reference semantics (cites /root/reference/contrib/wikipedia/src/java/org/
apache/lucene/wikipedia/analysis/WikipediaTokenizer.java + the JFlex
grammar WikipediaTokenizerImpl.jflex, pinned by WikipediaTokenizerTest):

- Plain text tokenizes with the Standard rules and their angle-bracket
  type names (<ALPHANUM>, <APOSTROPHE>, <NUM>, ...).
- ``[[...]]`` internal links: words typed ``il``; a ``Category:`` /
  ``:Category:`` prefix switches the whole link to ``c`` (prefix
  stripped); ``|`` display text keeps the link's type.
- ``[http(s)://... anchor]`` external links: the URL is ONE token typed
  ``elu``; anchor words are typed ``el`` and the FIRST anchor word shares
  the URL's position (posIncr 0 — the phrase-through-anchor trick the
  test pins).
- Quote runs: ``''италics''`` → ``i``, ``'''bold'''`` → ``b``,
  ``'''''both'''''`` → ``bi``. An embedded ``[[`` ends the styled span
  (the unclosed-italics behavior WikipediaTokenizerTest.testHandwritten
  pins).
- ``==h==`` → ``h``, ``===sh===`` → ``sh``.
- ``<ref>...</ref>`` → ``ci``; every other HTML tag is stripped, its
  contents tokenize as plain text.
- Modes (WikipediaTokenizer.java:85-105): TOKENS_ONLY (default);
  UNTOKENIZED_ONLY / BOTH take an ``untokenized_types`` set — spans of
  those types ALSO emit the raw span slice as one token
  (UNTOKENIZED_TOKEN_FLAG=1), with the first sub-token at posIncr 0 in
  BOTH mode.

Output rows are (term, type, pos_incr, start_offset, end_offset, flags).
Scale shape: a pure per-document Python scanner — index-build use rides
the same Arrow-batched tokenize path as every other chain.
"""

from __future__ import annotations

import re

from .analysis import _RE_SPAN, _RE_SIMPLE, _RE_SIMPLE_CJ, _RULES, _scan_span

# WikipediaTokenizerImpl.jflex:181-187 rule order: NUM before HOST — the one
# tie-break difference from the standard grammar ("3.25" is <NUM> here)
_WIKI_RULES = ([r for r in _RULES if r[0] not in ("HOST", "NUM")]
               + [r for r in _RULES if r[0] == "NUM"]
               + [r for r in _RULES if r[0] == "HOST"])

INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"

TOKENS_ONLY = 0
UNTOKENIZED_ONLY = 1
BOTH = 2
UNTOKENIZED_TOKEN_FLAG = 1  # WikipediaTokenizer.java:107

_RE_URL = re.compile(r"https?://\S+")
_RE_TAG = re.compile(r"<(/?)([A-Za-z][A-Za-z0-9]*)[^>]*>")
_RE_QUOTES = re.compile(r"''+")
_RE_HEAD = re.compile(r"(={2,3})(.*?)\1")
_RE_EXTLINK_OPEN = re.compile(r"\[(?=https?://)")
_RE_REF_CLOSE = re.compile(r"</ref\s*>", re.I)


def _std_typed_offsets(text: str, base: int):
    """Standard-rules scan with char offsets: [(raw, <TYPE>, so, eo)].
    Reuses analysis.py's span finder + exact longest-match scanner."""
    out = []
    for m in _RE_SPAN.finditer(text):
        span, s0 = m.group(), m.start()
        if (span.isascii() and span.isalnum()) or (
                _RE_SIMPLE.match(span) and not _RE_SIMPLE_CJ.search(span)):
            out.append((span, "<ALPHANUM>", base + s0, base + s0 + len(span)))
            continue
        at = 0
        for typ, raw in _scan_span(span, rules=_WIKI_RULES):
            at = span.index(raw, at)
            out.append((raw, f"<{typ}>", base + s0 + at,
                        base + s0 + at + len(raw)))
            at += len(raw)
    return out


def _segments(text: str):
    """Split the raw text into (content, base_offset, type_override,
    span_id) pieces. type_override None = plain; span_id groups the
    tokens of one wiki construct for the untokenized modes."""
    segs = []
    i, n = 0, len(text)
    sid = 0
    balance = 0  # jflex numBalanced: an open ''-run awaiting its closer
    while i < n:
        nxt_link = text.find("[[", i)
        m_url = _RE_EXTLINK_OPEN.search(text, i)
        m_q = _RE_QUOTES.search(text, i)
        m_h = _RE_HEAD.search(text, i)
        m_t = _RE_TAG.search(text, i)
        cands = [(p, k) for p, k in (
            (nxt_link if nxt_link >= 0 else None, "il"),
            (m_url.start() if m_url else None, "el"),
            (m_q.start() if m_q else None, "q"),
            (m_h.start() if m_h else None, "h"),
            (m_t.start() if m_t else None, "t"),
        ) if p is not None]
        if not cands:
            segs.append((text[i:], i, None, None))
            break
        p, kind = min(cands)
        if p > i:
            segs.append((text[i:p], i, None, None))
        sid += 1
        if kind == "il":
            close = text.find("]]", p + 2)
            end = close if close >= 0 else n
            body, b0 = text[p + 2:end], p + 2
            typ = INTERNAL_LINK
            low = body.lower()
            for pre in (":category:", "category:"):
                if low.startswith(pre):
                    typ, body, b0 = CATEGORY, body[len(pre):], b0 + len(pre)
                    break
            segs.append((body.replace("|", " "), b0, typ, sid))
            i = end + 2 if close >= 0 else n
        elif kind == "el":
            close = text.find("]", p + 1)
            end = close if close >= 0 else n
            body = text[p + 1:end]
            mu = _RE_URL.match(body)
            url = mu.group() if mu else body
            segs.append(("\x00URL" + url, p + 1, EXTERNAL_LINK_URL, sid))
            anchor = body[len(url):]
            if anchor.strip():
                segs.append((anchor, p + 1 + len(url), EXTERNAL_LINK, sid))
            i = end + 1 if close >= 0 else n
        elif kind == "q":
            # numBalanced bookkeeping (WikipediaTokenizerImpl.jflex:198):
            # a quote run while "balanced" is a leftover CLOSER — swallow
            # it (the ''[[Category:x]]'' here-is-plain case the reference
            # test pins)
            if balance:
                balance = 0
                i = m_q.end()
                continue
            q = m_q.group()
            typ = {2: ITALICS, 3: BOLD}.get(len(q), BOLD_ITALICS)
            body_start = m_q.end()
            m_close = _RE_QUOTES.search(text, body_start)
            brk = text.find("[[", body_start)
            end = min(x for x in (
                m_close.start() if m_close else n,
                brk if brk >= 0 else n, n))
            body = text[body_start:end]
            segs.append((body, body_start, typ, sid))
            if m_close and m_close.start() == end:
                i = m_close.end()  # cleanly closed, balance stays 0
            else:
                # span broken by [[ (or EOF). If NO styled words were
                # emitted (link right after the quotes —
                # TWO_SINGLE_QUOTES_STATE), the balance stays open and the
                # eventual closing quotes get swallowed; styled words first
                # (STRING state) resets the balance (jflex:289-291).
                balance = 1 if not _RE_SPAN.search(body) else 0
                i = end
        elif kind == "h":
            typ = HEADING if len(m_h.group(1)) == 2 else SUB_HEADING
            segs.append((m_h.group(2), m_h.start(2), typ, sid))
            i = m_h.end()
        else:  # HTML tag
            if m_t.group(2).lower() == "ref" and not m_t.group(1):
                close = _RE_REF_CLOSE.search(text, m_t.end())
                end = close.start() if close else n
                segs.append((text[m_t.end():end], m_t.end(), CITATION, sid))
                i = close.end() if close else n
            else:
                i = m_t.end()  # strip the tag, keep scanning
    return segs


def wikipedia_tokenize_typed(text: str, mode: int = TOKENS_ONLY,
                             untokenized_types: frozenset | set = frozenset()):
    """[(term, type, pos_incr, start_offset, end_offset, flags)]."""
    if mode not in (TOKENS_ONLY, UNTOKENIZED_ONLY, BOTH):
        raise ValueError(f"unknown mode {mode}")
    out = []
    pending_zero = False  # next token shares the previous position
    for body, base, typ, sid in _segments(text or ""):
        if typ == EXTERNAL_LINK_URL:
            url = body[4:]
            out.append((url, EXTERNAL_LINK_URL, 1, base, base + len(url), 0))
            pending_zero = True  # first anchor word rides the URL position
            continue
        toks = _std_typed_offsets(body, base)
        if typ is not None:
            toks = [(t, typ, so, eo) for t, _tt, so, eo in toks]
        else:
            toks = [(t, tt, so, eo) for t, tt, so, eo in toks]
        if not toks:
            continue
        untok = (typ is not None and typ in untokenized_types
                 and mode in (UNTOKENIZED_ONLY, BOTH))
        if untok:
            so, eo = toks[0][2], toks[-1][3]
            out.append((text[so:eo], typ, 1, so, eo,
                        UNTOKENIZED_TOKEN_FLAG))
            if mode == UNTOKENIZED_ONLY:
                pending_zero = False
                continue
            pending_zero = True  # BOTH: first sub-token shares the position
        for t, tt, so, eo in toks:
            inc = 0 if pending_zero else 1
            pending_zero = False
            out.append((t, tt, inc, so, eo, 0))
    return out


def wikipedia_tokenize(text: str):
    """Chain for the analyzer registry: tokenizer → LowerCaseFilter →
    positions from the increments (contrib ships only the tokenizer; the
    lowercase composition is ours, stated). → [(term, position)]."""
    out = []
    pos = -1
    for t, _typ, inc, _so, _eo, _fl in wikipedia_tokenize_typed(text or ""):
        pos += inc
        out.append((t.lower(), pos))
    return out


def register() -> None:
    from .analysis import ANALYZERS, POSITIONAL_ANALYZERS

    POSITIONAL_ANALYZERS["wikipedia"] = wikipedia_tokenize
    ANALYZERS["wikipedia"] = lambda text: [t for t, _ in
                                           wikipedia_tokenize(text)]


register()
