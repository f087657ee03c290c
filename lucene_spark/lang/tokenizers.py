"""Per-language tokenizers (contrib analyzers) as pure text→tokens functions.

Reference (cites /root/reference/contrib/analyzers/common/src/java/...):
- cjk/CJKTokenizer.java  → cjk_tokenize (overlapping CJK bigrams + latin runs)
- cn/ChineseTokenizer.java + cn/ChineseFilter.java → chinese_tokenize /
  chinese_filter (unigram CJK, latin runs, digit runs dropped by the filter)
- ar/ArabicLetterTokenizer.java → arabic_letter_tokenize (letters + NSM runs)
- in/IndicTokenizer.java → indic_tokenize (letters + NSM/Cf/Mc runs)
"""

from __future__ import annotations

import unicodedata

_cat = unicodedata.category

_MAX_WORD_LEN = 255


def _cjk_classify(ch: str) -> tuple[str, str]:
    """One char → (class, folded char). Classes: 's' single-byte token char,
    'd' double-byte token char, '-' separator. Mirrors CJKTokenizer's
    branch on UnicodeBlock BASIC_LATIN / HALFWIDTH_AND_FULLWIDTH_FORMS vs
    everything else, including the fullwidth→halfwidth fold (−0xFEE0 for
    U+FF01..U+FF5E)."""
    cp = ord(ch)
    if cp < 0x80 or 0xFF00 <= cp <= 0xFFEF:
        if 0xFF01 <= cp <= 0xFF5E:
            ch = chr(cp - 0xFEE0)
        if ch.isalnum() and ch.isascii() or ch in "_+#":
            return "s", ch.lower()
        # halfwidth katakana etc. remain letters inside the latin branch
        if not ch.isascii() and ch.isalpha():
            return "s", ch.lower()
        return "-", ch
    if ch.isalpha():
        return "d", ch
    return "-", ch


def cjk_tokenize(text: str) -> list[tuple[str, str]]:
    """CJKTokenizer (cjk/CJKTokenizer.java:140 incrementToken):
    → [(type, token)] where type ∈ {"single", "double"}. Latin/digit runs
    (lowercased, fullwidth folded, 255-char split) are one "single" token;
    runs of other letters emit overlapping bigrams ("double"), a length-1
    run emits the lone char."""
    out: list[tuple[str, str]] = []
    run_cls = "-"
    run: list[str] = []

    def flush() -> None:
        if not run:
            return
        if run_cls == "s":
            for i in range(0, len(run), _MAX_WORD_LEN):
                out.append(("single", "".join(run[i:i + _MAX_WORD_LEN])))
        elif run_cls == "d":
            if len(run) == 1:
                out.append(("double", run[0]))
            else:
                for i in range(len(run) - 1):
                    out.append(("double", run[i] + run[i + 1]))
        run.clear()

    for ch in text:
        cls, folded = _cjk_classify(ch)
        if cls != run_cls:
            flush()
            run_cls = cls
        if cls != "-":
            run.append(folded)
    flush()
    return out


def chinese_tokenize(text: str) -> list[str]:
    """ChineseTokenizer (cn/ChineseTokenizer.java:65): digit/upper/lower
    runs become one lowercased token (255-split); each OTHER_LETTER (Lo)
    char is its own token; everything else separates."""
    out: list[str] = []
    run: list[str] = []

    def flush() -> None:
        if run:
            for i in range(0, len(run), _MAX_WORD_LEN):
                out.append("".join(run[i:i + _MAX_WORD_LEN]))
            run.clear()

    for ch in text:
        c = _cat(ch)
        if c in ("Nd", "Ll", "Lu"):
            run.append(ch.lower())
        elif c == "Lo":
            flush()
            out.append(ch)
        else:
            flush()
    flush()
    return out


_CN_STOP = frozenset((
    "and", "are", "as", "at", "be", "but", "by", "for", "if", "in", "into",
    "is", "it", "no", "not", "of", "on", "or", "such", "that", "the",
    "their", "then", "there", "these", "they", "this", "to", "was", "will",
    "with"))


def chinese_filter(tokens: list[str]) -> list[str]:
    """ChineseFilter (cn/ChineseFilter.java:57): drop English stopwords;
    keep cased-letter tokens only when longer than 1 char; keep Lo tokens;
    drop everything else (numbers, 1-letter latin)."""
    out = []
    for t in tokens:
        if t in _CN_STOP:
            continue
        c = _cat(t[0])
        if c in ("Ll", "Lu"):
            if len(t) > 1:
                out.append(t)
        elif c == "Lo":
            out.append(t)
    return out


def _char_run_tokenize(text: str, is_token_char) -> list[str]:
    out: list[str] = []
    run: list[str] = []
    for ch in text:
        if is_token_char(ch):
            run.append(ch)
        elif run:
            out.append("".join(run))
            run.clear()
    if run:
        out.append("".join(run))
    return out


def arabic_letter_tokenize(text: str) -> list[str]:
    """ArabicLetterTokenizer (ar/ArabicLetterTokenizer.java:54): letter
    runs, with non-spacing marks treated as token chars (keeps harakat
    attached for the normalizer to strip)."""
    return _char_run_tokenize(
        text, lambda ch: ch.isalpha() or _cat(ch) == "Mn")


def indic_tokenize(text: str) -> list[str]:
    """IndicTokenizer (in/IndicTokenizer.java:36): letters + non-spacing /
    combining-spacing marks + format chars form tokens."""
    return _char_run_tokenize(
        text, lambda ch: ch.isalpha() or _cat(ch) in ("Mn", "Cf", "Mc"))
