"""HyphenationCompoundWordTokenFilter — pattern-driven compound splitting.

Reference (cites /root/reference/contrib/analyzers/common/src/java/org/
apache/lucene/analysis/compound/):
- ``HyphenationCompoundWordTokenFilter.java:276 decomposeInternal``:
  hyphenate the token (FOP's HyphenationTree — Liang's TeX algorithm over
  a pattern file), then for every PAIR of hyphenation points emit the
  substring when the dictionary contains it (or, genitive-s rule, the
  substring minus its last character), honoring min/max subword sizes and
  onlyLongestMatch per start point; the original token is always kept and
  subwords sit at its position (CompoundWordTokenFilterBase.java:249
  positionIncrement 0).
- ``hyphenation/HyphenationTree.java:323 hyphenate``: classmap-normalized
  word, '.' word markers, per-position max of pattern inter-letter
  values, break where the value is odd within [remainCharCount,
  len - pushCharCount] (the filter passes 1, 1), plus synthetic points 0
  and len. Leading non-letters are skipped; an interior non-letter makes
  the word unhyphenatable (returns None).

The algorithm is Liang's published TeX hyphenation method (Liang 1983,
"Word Hy-phen-a-tion by Com-put-er") — implemented fresh here; the
pattern files are data (the reference's test ships
compound/da_UTF8.xml, Apache-2.0, FOP format), parsed by
``parse_hyphenation_xml``.
"""

from __future__ import annotations

import re


class HyphenationPatterns:
    """Compiled Liang pattern set + character classes + exceptions."""

    def __init__(self, patterns: list[str],
                 classes: list[str] | None = None,
                 exceptions: list[str] | None = None):
        # classmap: raw char → normalized class char (FOP addClass: the
        # FIRST char of a class line is the normalization target). Default
        # when no classes given: any alphabetic char normalizes to lower.
        self.classmap: dict[str, str] | None = None
        if classes:
            self.classmap = {}
            for group in classes:
                if not group:
                    continue
                norm = group[0]
                for ch in group:
                    self.classmap[ch] = norm
        # compile "a1bc2d" → (letters, gap values[len+1])
        self.compiled: dict[str, list[int]] = {}
        for pat in patterns:
            letters: list[str] = []
            values = [0]
            for ch in pat:
                if ch.isdigit():
                    values[-1] = int(ch)
                else:
                    letters.append(ch)
                    values.append(0)
            self.compiled["".join(letters)] = values
        # first-char index for the scan
        self._by_first: dict[str, list[str]] = {}
        for key in self.compiled:
            self._by_first.setdefault(key[0], []).append(key)
        # exceptions: "hy-phen-ated" forms override the algorithm
        self.exceptions: dict[str, list[int]] = {}
        for ex in exceptions or []:
            parts = ex.split("-")
            word = "".join(parts)
            points, acc = [], 0
            for p in parts[:-1]:
                acc += len(p)
                points.append(acc)
            self.exceptions[word] = points

    def _norm(self, ch: str) -> str | None:
        if self.classmap is not None:
            return self.classmap.get(ch)
        return ch.lower() if ch.isalpha() else None

    def hyphenate(self, term: str, remain: int = 1,
                  push: int = 1) -> list[int] | None:
        """Hyphenation points for `term` as indices into it — [0, p1..pk,
        len] — or None when unhyphenatable (too short, interior
        non-letter, or no break point). FOP HyphenationTree.hyphenate
        restated."""
        # normalize; skip leading non-letters, reject interior ones
        ignore_lead = 0
        letters: list[str] = []
        ended = False
        for i, ch in enumerate(term):
            nc = self._norm(ch)
            if nc is None:
                if i == ignore_lead:
                    ignore_lead += 1
                else:
                    ended = True
            else:
                if ended:
                    return None  # letter after an interior non-letter
                letters.append(nc)
        n = len(letters)
        if n < remain + push:
            return None
        norm = "".join(letters)
        if norm in self.exceptions:
            # FOP's exception branch uses a STRICT upper bound (j <
            # len - pushCharCount, HyphenationTree.java:374) where the
            # algorithm branch uses <= — reproduced as-is
            pts = [p for p in self.exceptions[norm]
                   if remain <= p < n - push]
        else:
            w = "." + norm + "."
            vals = [0] * (n + 1)  # gap j = before norm[j]
            for start in range(len(w)):
                for key in self._by_first.get(w[start], ()):
                    if w.startswith(key, start):
                        pv = self.compiled[key]
                        for k, v in enumerate(pv):
                            gap = start + k - 1
                            if 0 <= gap <= n and v > vals[gap]:
                                vals[gap] = v
            pts = [j for j in range(1, n)
                   if (vals[j] & 1) and remain <= j <= n - push]
        if not pts:
            return None
        # synthetic end point is the bare LETTER count (FOP
        # HyphenationTree.java:407 res[k+1]=len — no iIgnoreAtBeginning
        # offset, unlike the interior points), reproduced as-is; for
        # tokens without leading non-letters the two agree
        return [0] + [p + ignore_lead for p in pts] + [n]


_TAG = re.compile(r"<(classes|patterns|exceptions)>(.*?)</\1>", re.S)
_COMMENT = re.compile(r"<!--.*?-->", re.S)


def parse_hyphenation_xml(text: str) -> HyphenationPatterns:
    """Parse the FOP hyphenation-info XML format (the reference's
    compound/hyphenation/PatternParser.java consumes the same files, e.g.
    the test's da_UTF8.xml): whitespace-separated tokens inside
    <classes>, <patterns> and <exceptions>."""
    text = _COMMENT.sub(" ", text)
    classes: list[str] = []
    patterns: list[str] = []
    exceptions: list[str] = []
    for tag, body in _TAG.findall(text):
        body = re.sub(r"<[^>]+>", " ", body)  # nested markup (<hyp/> etc.)
        toks = body.split()
        if tag == "classes":
            classes.extend(toks)
        elif tag == "patterns":
            patterns.extend(toks)
        else:
            exceptions.extend(toks)
    return HyphenationPatterns(patterns, classes or None,
                               exceptions or None)


def make_hyphenation_decomposer(patterns: HyphenationPatterns,
                                dictionary,
                                min_word_size: int = 5,
                                min_subword_size: int = 2,
                                max_subword_size: int = 15,
                                only_longest_match: bool = False):
    """Pairs filter [(term, pos)] → [(term, pos)] — the hyphenation twin
    of make_compound_decomposer: subwords are substrings BETWEEN
    hyphenation points that the dictionary knows (directly, or minus a
    final binding character — decomposeInternal:320-326's genitive-s
    retry), emitted at the original token's position."""
    dic = {w.lower() for w in dictionary}

    def decompose(pairs):
        out = []
        for term, pos in pairs:
            out.append((term, pos))
            if len(term) < min_word_size:
                continue
            hyp = patterns.hyphenate(term, 1, 1)
            if hyp is None:
                continue
            low = term.lower()
            for i in range(len(hyp)):
                start = hyp[i]
                longest = None
                for j in range(1, len(hyp) - i):
                    plen = hyp[i + j] - start
                    if plen > max_subword_size:
                        break
                    if plen < min_subword_size:
                        continue
                    part = None
                    if low[start:start + plen] in dic:
                        part = term[start:start + plen]
                    elif low[start:start + plen - 1] in dic:
                        part = term[start:start + plen - 1]
                    if part is not None:
                        if only_longest_match:
                            if longest is None or len(longest) < len(part):
                                longest = part
                        else:
                            out.append((part, pos))
                if only_longest_match and longest is not None:
                    out.append((longest, pos))
        return out

    return decompose
