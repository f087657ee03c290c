"""Per-language stemmers and character normalizers (contrib analyzers).

Fresh Python reimplementations of the reference's classic algorithmic
stemmers — term in, term out, pure functions suitable for the Arrow-batched
analysis chains. Each cites its reference source; the notorious quirks of
those implementations (assignment-instead-of-increment counters, discarded
replace results, duplicate rules) are reproduced deliberately, because the
goldens in the reference test suite pin them.

Reference (cites /root/reference/contrib/analyzers/common/src/java/...):
- de/GermanStemmer.java         → german_stem
- fr/FrenchStemmer.java         → french_stem
- nl/DutchStemmer.java          → dutch_stem
- ru/RussianStemmer.java        → russian_stem
- br/BrazilianStemmer.java      → brazilian_stem
- cz/CzechStemmer.java          → czech_stem
- bg/BulgarianStemmer.java      → bulgarian_stem
- hi/HindiStemmer.java          → hindi_stem
- ar/ArabicStemmer.java         → arabic_stem
- ar/ArabicNormalizer.java      → arabic_normalize
- fa/PersianNormalizer.java     → persian_normalize
- hi/HindiNormalizer.java       → hindi_normalize
- el/GreekLowerCaseFilter.java  → greek_lower
- tr/TurkishLowerCaseFilter.java→ turkish_lower
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

_cat = unicodedata.category

# Every stemmer/normalizer here is a pure term→term function over a Zipfian
# token stream, so a per-worker LRU makes the build-side cost per DISTINCT
# term, not per token (the reused PySpark workers keep the cache warm across
# Arrow batches — the same treatment analysis.cached_analyzer gives whole
# texts).
_CACHE = 1 << 16


# ---------------------------------------------------------------------------
# German (de/GermanStemmer.java — the pre-3.1 GermanAnalyzer stemmer,
# goldens: contrib test de/data.txt)
# ---------------------------------------------------------------------------

def _de_substitute(buf: list[str]) -> int:
    """GermanStemmer.substitute: mask doubles/umlauts/digraphs in place.
    Returns substCount. The reference's ``substCount =+ 2`` on the 'sch'
    branch ASSIGNS 2 (a long-standing Java typo) — reproduced."""
    subst = 0
    c = 0
    while c < len(buf):
        ch = buf[c]
        if c > 0 and ch == buf[c - 1]:
            buf[c] = "*"
        elif ch == "ä":
            buf[c] = "a"
        elif ch == "ö":
            buf[c] = "o"
        elif ch == "ü":
            buf[c] = "u"
        elif ch == "ß":
            buf[c] = "s"
            buf.insert(c + 1, "s")
            subst += 1
        if c < len(buf) - 1:
            if (c < len(buf) - 2 and buf[c] == "s" and buf[c + 1] == "c"
                    and buf[c + 2] == "h"):
                buf[c] = "$"
                del buf[c + 1:c + 3]
                subst = 2  # the reference's `substCount =+ 2`
            elif buf[c] == "c" and buf[c + 1] == "h":
                buf[c] = "§"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "e" and buf[c + 1] == "i":
                buf[c] = "%"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "i" and buf[c + 1] == "e":
                buf[c] = "&"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "i" and buf[c + 1] == "g":
                buf[c] = "#"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "s" and buf[c + 1] == "t":
                buf[c] = "!"
                del buf[c + 1]
                subst += 1
        c += 1
    return subst


def _de_strip(buf: list[str], subst: int) -> None:
    while len(buf) > 3:
        n = len(buf)
        if n + subst > 5 and buf[n - 2] + buf[n - 1] == "nd":
            del buf[n - 2:]
        elif n + subst > 4 and buf[n - 2] + buf[n - 1] == "em":
            del buf[n - 2:]
        elif n + subst > 4 and buf[n - 2] + buf[n - 1] == "er":
            del buf[n - 2:]
        elif buf[-1] in "esnt":
            del buf[-1]
        else:
            break


@lru_cache(maxsize=_CACHE)
def german_stem(term: str) -> str:
    """Classic German 'medium' stemmer (de/GermanStemmer.java:38 stem)."""
    term = term.lower()
    if not term.isalpha():
        return term
    buf = list(term)
    subst = _de_substitute(buf)
    _de_strip(buf, subst)
    # optimize(): female plural 'erin*' + irregular z→x
    if len(buf) > 5 and "".join(buf[-5:]) == "erin*":
        del buf[-1]
        _de_strip(buf, subst)
    if buf and buf[-1] == "z":
        buf[-1] = "x"
    # resubstitute()
    c = 0
    while c < len(buf):
        ch = buf[c]
        if ch == "*":
            buf[c] = buf[c - 1]
        elif ch == "$":
            buf[c] = "s"
            buf[c + 1:c + 1] = ["c", "h"]
        elif ch == "§":
            buf[c] = "c"
            buf.insert(c + 1, "h")
        elif ch == "%":
            buf[c] = "e"
            buf.insert(c + 1, "i")
        elif ch == "&":
            buf[c] = "i"
            buf.insert(c + 1, "e")
        elif ch == "#":
            buf[c] = "i"
            buf.insert(c + 1, "g")
        elif ch == "!":
            buf[c] = "s"
            buf.insert(c + 1, "t")
        c += 1
    # removeParticleDenotion(): first inner "gege" → drop the "ge"
    if len(buf) > 4:
        s = "".join(buf)
        for c in range(len(s) - 3):
            if s[c:c + 4] == "gege":
                return s[:c] + s[c + 2:]
    return "".join(buf)


# ---------------------------------------------------------------------------
# French (fr/FrenchStemmer.java — the pre-3.1 FrenchAnalyzer stemmer,
# goldens: TestFrenchAnalyzer.testAnalyzer30)
# ---------------------------------------------------------------------------

_FR_VOWELS = set("aeiouyâàëéêèïîôüùû")


class _FrenchStemmer:
    """Mirrors the reference's mutable StringBuilder + R0/RV/R1/R2 state;
    every mutation re-derives the zones via set_strings (as the Java does)."""

    def __init__(self, term: str):
        self.sb = term
        self.modified = False
        self.suite = False
        self.R0 = self.RV = self.R1 = self.R2 = None

    # --- zones -------------------------------------------------------------
    def set_strings(self) -> None:
        self.R0 = self.sb
        self.RV = self._retrieve_rv(self.sb)
        self.R1 = self._retrieve_r(self.sb)
        self.R2 = self._retrieve_r(self.R1) if self.R1 is not None else None

    @staticmethod
    def _is_vowel(ch: str) -> bool:
        return ch in _FR_VOWELS

    def _retrieve_r(self, s: str | None) -> str | None:
        if s is None:
            return None
        pos = -1
        for c, ch in enumerate(s):
            if self._is_vowel(ch):
                pos = c
                break
        if pos < 0:
            return None
        cons = -1
        for c in range(pos, len(s)):
            if not self._is_vowel(s[c]):
                cons = c
                break
        if cons > -1 and cons + 1 < len(s):
            return s[cons + 1:]
        return None

    def _retrieve_rv(self, s: str) -> str | None:
        if len(s) > 3:
            if self._is_vowel(s[0]) and self._is_vowel(s[1]):
                return s[3:]
            pos = 0
            for c in range(1, len(s)):
                if self._is_vowel(s[c]):
                    pos = c
                    break
            if pos + 1 < len(s):
                return s[pos + 1:]
            return None
        return None

    # --- suffix helpers (each mirrors one Java private method) -------------
    def delete_from(self, source: str | None, suffixes) -> None:
        if source is None:
            return
        for sfx in suffixes:
            if source.endswith(sfx):
                self.sb = self.sb[:len(self.sb) - len(sfx)]
                self.modified = True
                self.set_strings()
                break

    def replace_from(self, source: str | None, suffixes, replace) -> bool:
        if source is None:
            return False
        for sfx in suffixes:
            if source.endswith(sfx):
                self.sb = self.sb[:len(self.sb) - len(sfx)] + replace
                self.modified = True
                self.set_strings()
                return True
        return False

    def delete_but_suffix_from(self, source, suffixes, prefix, without):
        if source is None:
            return
        for sfx in suffixes:
            if source.endswith(prefix + sfx):
                self.sb = self.sb[:len(self.sb) - len(prefix) - len(sfx)]
                self.modified = True
                self.set_strings()
                break
            if without and source.endswith(sfx):
                self.sb = self.sb[:len(self.sb) - len(sfx)]
                self.modified = True
                self.set_strings()
                break

    def delete_but_suffix_from_else_replace(self, source, suffixes, prefix,
                                            without, frm, replace):
        if source is None:
            return
        for sfx in suffixes:
            if source.endswith(prefix + sfx):
                self.sb = self.sb[:len(self.sb) - len(prefix) - len(sfx)]
                self.modified = True
                self.set_strings()
                break
            if frm is not None and frm.endswith(prefix + sfx):
                self.sb = (self.sb[:len(self.sb) - len(prefix) - len(sfx)]
                           + replace)
                self.modified = True
                self.set_strings()
                break
            if without and source.endswith(sfx):
                self.sb = self.sb[:len(self.sb) - len(sfx)]
                self.modified = True
                self.set_strings()
                break

    def delete_from_if_tested_vowel_before_in(self, source, suffixes, vowel,
                                              frm) -> bool:
        if source is None or frm is None:
            return False
        for sfx in suffixes:
            if source.endswith(sfx) and len(sfx) + 1 <= len(frm):
                if self._is_vowel(self.sb[len(self.sb) - len(sfx) - 1]) == vowel:
                    self.sb = self.sb[:len(self.sb) - len(sfx)]
                    self.modified = True
                    self.set_strings()
                    return True
        return False

    def delete_from_if_preceded_in(self, source, suffixes, frm, prefix) -> bool:
        if source is None:
            return False
        for sfx in suffixes:
            if source.endswith(sfx):
                if frm is not None and frm.endswith(prefix + sfx):
                    self.sb = self.sb[:len(self.sb) - len(sfx)]
                    self.set_strings()
                    return True
        return False

    # --- steps ---------------------------------------------------------------
    def step1(self):
        self.delete_from(self.R2, ("ances", "iqUes", "ismes", "ables",
                                   "istes", "ance", "iqUe", "isme", "able",
                                   "iste"))
        self.replace_from(self.R2, ("logies", "logie"), "log")
        self.replace_from(self.R2, ("usions", "utions", "usion", "ution"), "u")
        self.replace_from(self.R2, ("ences", "ence"), "ent")
        search = ("atrices", "ateurs", "ations", "atrice", "ateur", "ation")
        self.delete_but_suffix_from_else_replace(self.R2, search, "ic", True,
                                                 self.R0, "iqU")
        self.delete_but_suffix_from_else_replace(
            self.R2, ("ements", "ement"), "eus", False, self.R0, "eux")
        self.delete_but_suffix_from(self.R2, ("ements", "ement"), "ativ", False)
        self.delete_but_suffix_from(self.R2, ("ements", "ement"), "iv", False)
        self.delete_but_suffix_from(self.R2, ("ements", "ement"), "abl", False)
        self.delete_but_suffix_from(self.R2, ("ements", "ement"), "iqU", False)
        self.delete_from_if_tested_vowel_before_in(
            self.R1, ("issements", "issement"), False, self.R0)
        self.delete_from(self.RV, ("ements", "ement"))
        self.delete_but_suffix_from_else_replace(
            self.R2, ("ités", "ité"), "abil", False, self.R0, "abl")
        self.delete_but_suffix_from_else_replace(
            self.R2, ("ités", "ité"), "ic", False, self.R0, "iqU")
        self.delete_but_suffix_from(self.R2, ("ités", "ité"), "iv", True)
        autre = ("ifs", "ives", "if", "ive")
        self.delete_but_suffix_from_else_replace(self.R2, autre, "icat", False,
                                                 self.R0, "iqU")
        self.delete_but_suffix_from_else_replace(self.R2, autre, "at", True,
                                                 self.R2, "iqU")
        self.replace_from(self.R0, ("eaux",), "eau")
        self.replace_from(self.R1, ("aux",), "al")
        self.delete_but_suffix_from_else_replace(
            self.R2, ("euses", "euse"), "", True, self.R1, "eux")
        self.delete_from(self.R2, ("eux",))
        if self.replace_from(self.RV, ("amment",), "ant"):
            self.suite = True
        if self.replace_from(self.RV, ("emment",), "ent"):
            self.suite = True
        if self.delete_from_if_tested_vowel_before_in(
                self.RV, ("ments", "ment"), True, self.RV):
            self.suite = True

    def step2a(self) -> bool:
        search = ("îmes", "îtes", "iraIent", "irait", "irais", "irai", "iras",
                  "ira", "irent", "iriez", "irez", "irions", "irons", "iront",
                  "issaIent", "issais", "issantes", "issante", "issants",
                  "issant", "issait", "issais", "issions", "issons", "issiez",
                  "issez", "issent", "isses", "isse", "ir", "is", "ît", "it",
                  "ies", "ie", "i")
        return self.delete_from_if_tested_vowel_before_in(self.RV, search,
                                                          False, self.RV)

    def step2b(self):
        self.delete_from(self.RV, ("eraIent", "erais", "erait", "erai",
                                   "eras", "erions", "eriez", "erons",
                                   "eront", "erez", "èrent", "era", "ées",
                                   "iez", "ée", "és", "er", "ez", "é"))
        search = ("assions", "assiez", "assent", "asses", "asse", "aIent",
                  "antes", "aIent", "Aient", "ante", "âmes", "âtes", "ants",
                  "ant", "ait", "aît", "ais", "Ait", "Aît", "Ais", "ât", "as",
                  "ai", "Ai", "a")
        self.delete_but_suffix_from(self.RV, search, "e", True)
        self.delete_from(self.R2, ("ions",))

    def step3(self):
        if self.sb:
            if self.sb[-1] == "Y":
                self.sb = self.sb[:-1] + "i"
                self.set_strings()
            elif self.sb[-1] == "ç":
                self.sb = self.sb[:-1] + "c"
                self.set_strings()

    def step4(self):
        if len(self.sb) > 1 and self.sb[-1] == "s":
            if self.sb[-2] not in "aiouès":
                self.sb = self.sb[:-1]
                self.set_strings()
        if not self.delete_from_if_preceded_in(self.R2, ("ion",), self.RV, "s"):
            self.delete_from_if_preceded_in(self.R2, ("ion",), self.RV, "t")
        self.replace_from(self.RV, ("Ière", "ière", "Ier", "ier"), "i")
        self.delete_from(self.RV, ("e",))
        self.delete_from_if_preceded_in(self.RV, ("ë",), self.R0, "gu")

    def step5(self):
        if self.R0 is not None and (
                self.R0.endswith("enn") or self.R0.endswith("onn")
                or self.R0.endswith("ett") or self.R0.endswith("ell")
                or self.R0.endswith("eill")):
            self.sb = self.sb[:-1]
            self.set_strings()

    def step6(self):
        if self.R0:
            seen_vowel = seen_cons = False
            pos = -1
            for i in range(len(self.R0) - 1, -1, -1):
                ch = self.R0[i]
                if self._is_vowel(ch):
                    if not seen_vowel and ch in "éè":
                        pos = i
                        break
                    seen_vowel = True
                else:
                    if seen_vowel:
                        break
                    seen_cons = True
            if pos > -1 and seen_cons and not seen_vowel:
                self.sb = self.sb[:pos] + "e" + self.sb[pos + 1:]


def _fr_treat_vowels(term: str) -> str:
    buf = list(term)
    n = len(buf)
    isv = _FrenchStemmer._is_vowel
    for c in range(n):
        ch = buf[c]
        if c == 0:
            if n > 1 and ch == "y" and isv(buf[1]):
                buf[0] = "Y"
        elif c == n - 1:
            if ch == "u" and buf[c - 1] == "q":
                buf[c] = "U"
            if ch == "y" and isv(buf[c - 1]):
                buf[c] = "Y"
        else:
            if ch == "u":
                if buf[c - 1] == "q":
                    buf[c] = "U"
                elif isv(buf[c - 1]) and isv(buf[c + 1]):
                    buf[c] = "U"
            if ch == "i" and isv(buf[c - 1]) and isv(buf[c + 1]):
                buf[c] = "I"
            if ch == "y" and (isv(buf[c - 1]) or isv(buf[c + 1])):
                buf[c] = "Y"
    return "".join(buf)


def _fr_stemmable(term: str) -> bool:
    """isStemmable: letters only, at most one uppercase and only at pos 0."""
    upper = False
    first = -1
    for c, ch in enumerate(term):
        if not ch.isalpha():
            return False
        if ch.isupper():
            if upper:
                return False
            first = c
            upper = True
    return first <= 0


@lru_cache(maxsize=_CACHE)
def french_stem(term: str) -> str:
    """Classic French stemmer (fr/FrenchStemmer.java:60 stem)."""
    if not _fr_stemmable(term):
        return term
    st = _FrenchStemmer(_fr_treat_vowels(term.lower()))
    st.set_strings()
    st.step1()
    if not st.modified or st.suite:
        if st.RV is not None:
            st.suite = st.step2a()
            if not st.suite:
                st.step2b()
    if st.modified or st.suite:
        st.step3()
    else:
        st.step4()
    st.step5()
    st.step6()
    return st.sb


# ---------------------------------------------------------------------------
# Dutch (nl/DutchStemmer.java — pre-3.1 DutchAnalyzer stemmer)
# ---------------------------------------------------------------------------

_NL_VOWELS = set("eaoiuyè")


def _nl_get_r(buf: list[str], start: int) -> int:
    if start == 0:
        start = 1
    i = start
    while i < len(buf):
        if buf[i] not in _NL_VOWELS and buf[i - 1] in _NL_VOWELS:
            return i + 1
        i += 1
    return i + 1


def _nl_undouble(buf: list[str], end: int | None = None) -> None:
    if end is None:
        end = len(buf)
    s = "".join(buf[:end])
    if s[-2:] in ("kk", "tt", "dd", "nn", "mm", "ff"):
        del buf[end - 1]


def _nl_valid_en(buf: list[str], idx: int) -> bool:
    c = buf[idx]
    if c in _NL_VOWELS:
        return False
    if c == "m" and buf[idx - 2] == "g" and buf[idx - 1] == "e":
        return False
    return True


def _nl_en_ending(buf: list[str], r1: int) -> bool:
    for end in ("ene", "en"):
        s = "".join(buf)
        idx = len(s) - len(end)
        if s.endswith(end) and idx >= r1 and _nl_valid_en(buf, idx - 1):
            del buf[idx:idx + len(end)]
            _nl_undouble(buf, idx)
            return True
    return False


@lru_cache(maxsize=_CACHE)
def dutch_stem(term: str) -> str:
    """Classic Dutch stemmer (nl/DutchStemmer.java:37 stem)."""
    term = term.lower()
    if not term.isalpha():
        return term
    buf = list(term)
    # substitute(): fold the accented vowels the reference folds
    sub = {"ä": "a", "á": "a", "ë": "e", "é": "e", "ü": "u", "ú": "u",
           "ï": "i", "ö": "o", "ó": "o"}
    for i, ch in enumerate(buf):
        buf[i] = sub.get(ch, ch)
    # storeYandI()
    if buf[0] == "y":
        buf[0] = "Y"
    last = len(buf) - 1
    for i in range(1, last):
        if buf[i] == "i":
            if buf[i - 1] in _NL_VOWELS and buf[i + 1] in _NL_VOWELS:
                buf[i] = "I"
        elif buf[i] == "y":
            if buf[i - 1] in _NL_VOWELS:
                buf[i] = "Y"
    if last > 0 and buf[last] == "y" and buf[last - 1] in _NL_VOWELS:
        buf[last] = "Y"

    r1 = max(3, _nl_get_r(buf, 0))

    # step1
    if r1 < len(buf):
        s = "".join(buf)
        if s.endswith("heden"):
            region = s[r1:].replace("heden", "heid")
            buf[:] = list(s[:r1] + region)
        elif not _nl_en_ending(buf, r1):
            idx = len(s) - 2
            if (s.endswith("se") and idx >= r1
                    and buf[idx - 1] not in _NL_VOWELS and buf[idx - 1] != "j"):
                del buf[idx:idx + 2]
            else:
                idx = len(s) - 1
                if (s.endswith("s") and idx >= r1
                        and buf[idx - 1] not in _NL_VOWELS
                        and buf[idx - 1] != "j"):
                    del buf[idx]

    # step2
    removed_e = False
    if r1 < len(buf):
        idx = len(buf) - 1
        if idx >= r1 and buf[idx] == "e" and buf[idx - 1] not in _NL_VOWELS:
            del buf[idx]
            _nl_undouble(buf)
            removed_e = True

    r2 = _nl_get_r(buf, r1)

    # step3a
    if r2 < len(buf):
        s = "".join(buf)
        idx = len(s) - 4
        if s.endswith("heid") and idx >= r2 and buf[idx - 1] != "c":
            del buf[idx:idx + 4]
            _nl_en_ending(buf, r1)

    # step3b
    if r2 < len(buf):
        s = "".join(buf)
        if (s.endswith("end") or s.endswith("ing")) and len(s) - 3 >= r2:
            idx = len(s) - 3
            del buf[idx:idx + 3]
            if buf[idx - 2] == "i" and buf[idx - 1] == "g":
                if buf[idx - 3] != "e" and idx - 2 >= r2:
                    del buf[idx - 2:idx]
            else:
                _nl_undouble(buf, idx)
        elif s.endswith("ig") and len(s) - 2 >= r2:
            if buf[len(s) - 3] != "e":
                del buf[len(s) - 2:]
        elif s.endswith("lijk") and len(s) - 4 >= r2:
            del buf[len(s) - 4:]
            # re-run step2
            if r1 < len(buf):
                idx = len(buf) - 1
                if (idx >= r1 and buf[idx] == "e"
                        and buf[idx - 1] not in _NL_VOWELS):
                    del buf[idx]
                    _nl_undouble(buf)
                    removed_e = True
        elif s.endswith("baar") and len(s) - 4 >= r2:
            del buf[len(s) - 4:]
        elif s.endswith("bar") and len(s) - 3 >= r2:
            if removed_e:
                del buf[len(s) - 3:]

    # step4: undouble vowel cVVd → cVd
    if len(buf) >= 4:
        c, v1, v2, d = buf[-4], buf[-3], buf[-2], buf[-1]
        if (v1 == v2 and d != "I" and v1 != "i" and v1 in _NL_VOWELS
                and d not in _NL_VOWELS and c not in _NL_VOWELS):
            del buf[-2]

    return "".join(buf).replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Russian (ru/RussianStemmer.java — pre-3.1 RussianAnalyzer stemmer,
# goldens: contrib test ru/wordsUTF8.txt → ru/stemsUTF8.txt)
# ---------------------------------------------------------------------------

_RU_VOWELS = set("аеиоуыэюя")

_RU_PERF_GERUND_1 = ("в", "вши", "вшись")
_RU_PERF_GERUND_1_PRED = ("а", "я")
_RU_PERF_GERUND_2 = ("ив", "ыв", "ивши", "ывши", "ившись", "ывшись")
_RU_ADJECTIVE = ("ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им",
                 "ым", "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею",
                 "ими", "ыми", "его", "ого", "ему", "ому")
_RU_PARTICIPLE_1 = ("щ", "ем", "нн", "вш", "ющ")
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_PARTICIPLE_1_PRED = ("а", "я")
_RU_REFLEXIVE = ("ся", "сь")
_RU_VERB_1 = ("й", "л", "н", "ло", "но", "ет", "ют", "ла", "на", "ли", "ем",
              "ны", "ете", "йте", "ть", "ешь", "нно")
_RU_VERB_2 = ("ю", "ую", "ен", "ей", "ят", "уй", "ил", "ыл", "им", "ым",
              "ит", "ыт", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
              "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ейте",
              "уйте")
_RU_VERB_1_PRED = ("а", "я")
_RU_NOUN = ("а", "у", "й", "о", "у", "е", "ы", "и", "ь", "я", "ев", "ов",
            "ие", "ье", "ях", "ию", "еи", "ии", "ей", "ой", "ем", "ам", "ом",
            "ах", "ью", "ия", "ья", "ий", "ям", "ями", "ами", "ией", "иям",
            "ием", "иях", "иями")
_RU_SUPERLATIVE = ("ейш", "ейше")
_RU_DERIVATIONAL = ("ост", "ость")


def _ru_find_ending(zone: list[str], start: int, endings) -> int:
    """findEnding: scan the ending class LAST to FIRST, match backwards at
    `start`; skipped when start < len(ending)-1 (reference off-by-one kept)."""
    for ending in reversed(endings):
        m = len(ending)
        if start < m - 1:
            continue
        if start - m + 1 >= 0 and "".join(zone[start - m + 1:start + 1]) == ending:
            return m
    return 0


def _ru_remove(zone: list[str], endings) -> bool:
    n = _ru_find_ending(zone, len(zone) - 1, endings)
    if n:
        del zone[len(zone) - n:]
        return True
    return False


def _ru_remove_pred(zone: list[str], endings, preds) -> bool:
    n = _ru_find_ending(zone, len(zone) - 1, endings)
    if not n:
        return False
    p = _ru_find_ending(zone, len(zone) - n - 1, preds)
    if not p:
        return False
    del zone[len(zone) - n:]
    return True


@lru_cache(maxsize=_CACHE)
def russian_stem(word: str) -> str:
    """Classic Russian stemmer (ru/RussianStemmer.java:230 stem)."""
    # markPositions (with the reference's ++i-in-the-guard semantics)
    rv = r2 = 0
    n = len(word)
    i = 0
    while i < n and word[i] not in _RU_VOWELS:
        i += 1
    i += 1
    if n - 1 >= i:
        rv = i
        while i < n and word[i] in _RU_VOWELS:
            i += 1
        i += 1
        if n - 1 >= i:
            while i < n and word[i] not in _RU_VOWELS:
                i += 1
            i += 1
            if n - 1 >= i:
                while i < n and word[i] in _RU_VOWELS:
                    i += 1
                i += 1
                if n - 1 >= i:
                    r2 = i
    if rv == 0:
        return word
    zone = list(word[rv:])
    if not _ru_remove_pred(zone, _RU_PERF_GERUND_1, _RU_PERF_GERUND_1_PRED) \
            and not _ru_remove(zone, _RU_PERF_GERUND_2):
        _ru_remove(zone, _RU_REFLEXIVE)
        if _ru_remove(zone, _RU_ADJECTIVE):
            if not _ru_remove_pred(zone, _RU_PARTICIPLE_1,
                                   _RU_PARTICIPLE_1_PRED):
                _ru_remove(zone, _RU_PARTICIPLE_2)
        elif not (_ru_remove_pred(zone, _RU_VERB_1, _RU_VERB_1_PRED)
                  or _ru_remove(zone, _RU_VERB_2)):
            _ru_remove(zone, _RU_NOUN)
    if zone and zone[-1] == "и":
        del zone[-1]
    # derivational
    d = _ru_find_ending(zone, len(zone) - 1, _RU_DERIVATIONAL)
    if d and r2 - rv <= len(zone) - d:
        del zone[len(zone) - d:]
    _ru_remove(zone, _RU_SUPERLATIVE)
    if _ru_find_ending(zone, len(zone) - 1, ("нн",)):
        del zone[-1]
    if zone and zone[-1] == "ь":
        del zone[-1]
    return word[:rv] + "".join(zone)


# ---------------------------------------------------------------------------
# Brazilian Portuguese (br/BrazilianStemmer.java — data-driven suffix
# cascade; goldens: TestBrazilianStemmer)
# ---------------------------------------------------------------------------

_BR_VOWELS = set("aeiou")
_BR_FOLD = {"á": "a", "â": "a", "ã": "a", "é": "e", "ê": "e", "í": "i",
            "ó": "o", "ô": "o", "õ": "o", "ú": "u", "ü": "u", "ç": "c",
            "ñ": "n"}
_BR_PUNCT = set("\"'-,;.?!")

# step1 ordered rules: (min CT length, suffix, condition zone, action).
# action: ("rm",) remove · ("rp", repl) replace · ("rp!", repl) the
# reference DISCARDS the replace result (the 'logias' bug — CT unchanged,
# but the rule still claims the step). "iras"/"ira" carry the extra
# suffixPreceded(CT, sfx, "e") test and match in RV.
_BR_STEP1 = (
    (0, "uciones", "R2", ("rp", "u"), None),
    (6, "imentos", "R2", ("rm",), None), (6, "amentos", "R2", ("rm",), None),
    (6, "adores", "R2", ("rm",), None), (6, "adoras", "R2", ("rm",), None),
    (6, "logias", "R2", ("rp!", "log"), None),
    (6, "encias", "R2", ("rp", "ente"), None),
    (6, "amente", "R1", ("rm",), None), (6, "idades", "R2", ("rm",), None),
    (5, "acoes", "R2", ("rm",), None), (5, "imento", "R2", ("rm",), None),
    (5, "amento", "R2", ("rm",), None), (5, "adora", "R2", ("rm",), None),
    (5, "ismos", "R2", ("rm",), None), (5, "istas", "R2", ("rm",), None),
    (5, "logia", "R2", ("rp", "log"), None),
    (5, "ucion", "R2", ("rp", "u"), None),
    (5, "encia", "R2", ("rp", "ente"), None),
    (5, "mente", "R2", ("rm",), None), (5, "idade", "R2", ("rm",), None),
    (4, "acao", "R2", ("rm",), None), (4, "ezas", "R2", ("rm",), None),
    (4, "icos", "R2", ("rm",), None), (4, "icas", "R2", ("rm",), None),
    (4, "ismo", "R2", ("rm",), None), (4, "avel", "R2", ("rm",), None),
    (4, "ivel", "R2", ("rm",), None), (4, "ista", "R2", ("rm",), None),
    (4, "osos", "R2", ("rm",), None), (4, "osas", "R2", ("rm",), None),
    (4, "ador", "R2", ("rm",), None), (4, "ivas", "R2", ("rm",), None),
    (4, "ivos", "R2", ("rm",), None),
    (4, "iras", "RV", ("rp", "ir"), "e"),
    (3, "eza", "R2", ("rm",), None), (3, "ico", "R2", ("rm",), None),
    (3, "ica", "R2", ("rm",), None), (3, "oso", "R2", ("rm",), None),
    (3, "osa", "R2", ("rm",), None), (3, "iva", "R2", ("rm",), None),
    (3, "ivo", "R2", ("rm",), None),
    (3, "ira", "RV", ("rp", "ir"), "e"),
)

# step2 ordered rules: (min RV length, suffix, removed-text). The reference's
# "ira"→removeSuffix(CT,"ava") quirk (CT unchanged, rule still fires) and the
# duplicate "iu" rule are kept verbatim.
_BR_STEP2 = tuple(
    (n, sfx, sfx) for n, group in (
        (7, ("issemos", "essemos", "assemos", "ariamos", "eriamos",
             "iriamos")),
        (6, ("iremos", "eremos", "aremos", "avamos", "iramos", "eramos",
             "aramos", "asseis", "esseis", "isseis", "arieis", "erieis",
             "irieis")),
        (5, ("irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
             "asses", "esses", "isses", "astes", "assem", "essem", "issem",
             "ardes", "erdes", "irdes", "ariam", "eriam", "iriam", "arias",
             "erias", "irias", "estes", "istes", "areis", "aveis")),
        (4, ("aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
             "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
             "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao",
             "irao", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
             "eres", "ires", "ados", "idos", "amos", "emos", "imos", "iras",
             "ieis")),
    ) for sfx in group
) + tuple(
    (3, sfx, ("ava" if sfx == "ira_QUIRK" else sfx))
    for sfx in ("ada", "ida", "ara", "era")
) + (
    (3, "ira", "ava"),  # the reference removes "ava" here — a no-op quirk
) + tuple(
    (3, sfx, sfx) for sfx in ("iam", "ado", "ido", "ias", "ais", "eis",
                              "ira", "ear")
) + tuple(
    (2, sfx, sfx) for sfx in ("ia", "ei", "am", "em", "ar", "er", "ir", "as",
                              "es", "is", "eu", "iu", "iu", "ou")
)


def _br_get_r1(value: str | None) -> str | None:
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i and value[j] not in _BR_VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and value[j] in _BR_VOWELS:
        j += 1
    if not j < i:
        return None
    return value[j + 1:]


def _br_get_rv(value: str | None) -> str | None:
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and value[1] not in _BR_VOWELS:
        j = 2
        while j < i and value[j] not in _BR_VOWELS:
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 1 and value[0] in _BR_VOWELS and value[1] in _BR_VOWELS:
        j = 2
        while j < i and value[j] in _BR_VOWELS:
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 2:
        return value[3:]
    return None


@lru_cache(maxsize=_CACHE)
def brazilian_stem(term: str) -> str | None:
    """Classic Brazilian stemmer (br/BrazilianStemmer.java:36 stem).
    Returns None for non-indexable terms (len<3 or len>=30 after
    normalization) — the stem filter keeps the original then."""
    ct = "".join(_BR_FOLD.get(c, c) for c in term.lower())
    if len(ct) >= 2 and ct[0] in _BR_PUNCT:
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in _BR_PUNCT:
        ct = ct[:-1]
    if not (2 < len(ct) < 30):
        return None
    if not ct.isalpha():
        return ct
    r1 = _br_get_r1(ct)
    r2 = _br_get_r1(r1)
    rv = _br_get_rv(ct)

    def ends(z: str | None, sfx: str) -> bool:
        return z is not None and z.endswith(sfx)

    altered = False
    # step1: suffix must close BOTH the term and its zone; ordered cascade
    # under CT-length guards, first hit wins
    for min_len, sfx, zone_name, action, preceded in _BR_STEP1:
        if min_len and len(ct) < min_len:
            continue
        zone = {"R1": r1, "R2": r2, "RV": rv}[zone_name]
        if not (ends(ct, sfx) and ends(zone, sfx)):
            continue
        if preceded is not None and not ct[:len(ct) - len(sfx)].endswith(preceded):
            continue
        if action[0] == "rm":
            ct = ct[:len(ct) - len(sfx)]
        elif action[0] == "rp":
            ct = ct[:len(ct) - len(sfx)] + action[1]
        # "rp!": result discarded (reference bug), ct unchanged
        altered = True
        break
    # step2
    if not altered and rv is not None:
        for min_len, sfx, rm in _BR_STEP2:
            if len(rv) >= min_len and rv.endswith(sfx):
                if ct.endswith(rm):
                    ct = ct[:len(ct) - len(rm)]
                altered = True
                break
    if altered:
        # step3: -ci
        if ends(rv, "i") and ends(rv[:-1] if rv else None, "c") \
                and ct.endswith("i"):
            ct = ct[:-1]
    else:
        # step4
        if rv is not None:
            for sfx in ("os", "a", "i", "o"):
                if rv.endswith(sfx):
                    ct = (ct[:len(ct) - len(sfx)]
                          if ct.endswith(sfx) else ct)
                    break
    # step5
    if rv is not None and rv.endswith("e"):
        if rv[:-1].endswith("gu"):
            if ct.endswith("e"):
                ct = ct[:-1]
            if ct.endswith("u"):
                ct = ct[:-1]
        elif rv[:-1].endswith("ci"):
            if ct.endswith("e"):
                ct = ct[:-1]
            if ct.endswith("i"):
                ct = ct[:-1]
        elif ct.endswith("e"):
            ct = ct[:-1]
    return ct


# ---------------------------------------------------------------------------
# Czech (cz/CzechStemmer.java — light stemmer; goldens: TestCzechStemmer)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=_CACHE)
def czech_stem(term: str) -> str:
    """Czech light stemmer (cz/CzechStemmer.java:33 stem): case endings →
    possessives → normalize. Operates on the already-lowercased token."""
    s = list(term)

    def ends(sfx: str) -> bool:
        return "".join(s).endswith(sfx)

    # removeCase
    n = len(s)
    if n > 7 and ends("atech"):
        del s[n - 5:]
    elif n > 6 and (ends("ětem") or ends("etem") or ends("atům")):
        del s[n - 4:]
    elif n > 5 and (ends("ech") or ends("ich") or ends("ích") or ends("ého")
                    or ends("ěmi") or ends("emi") or ends("ému")
                    or ends("ěte") or ends("ete") or ends("ěti")
                    or ends("eti") or ends("ího") or ends("iho")
                    or ends("ími") or ends("ímu") or ends("imu")
                    or ends("ách") or ends("ata") or ends("aty")
                    or ends("ých") or ends("ama") or ends("ami")
                    or ends("ové") or ends("ovi") or ends("ými")):
        del s[n - 3:]
    elif n > 4 and (ends("em") or ends("es") or ends("ém") or ends("ím")
                    or ends("ům") or ends("at") or ends("ám") or ends("os")
                    or ends("us") or ends("ým") or ends("mi") or ends("ou")):
        del s[n - 2:]
    elif n > 3 and s[-1] in "aeiouůyáéíýě":
        del s[-1]
    # removePossessives
    n = len(s)
    if n > 5 and ("".join(s).endswith("ov") or "".join(s).endswith("in")
                  or "".join(s).endswith("ův")):
        del s[n - 2:]
    # normalize
    if len(s) >= 2:
        tail2 = s[-2] + s[-1]
        if tail2 == "čt":
            s[-2:] = ["c", "k"]
            return "".join(s)
        if tail2 == "št":
            s[-2:] = ["s", "k"]
            return "".join(s)
    if s and s[-1] in "cč":
        s[-1] = "k"
        return "".join(s)
    if s and s[-1] in "zž":
        s[-1] = "h"
        return "".join(s)
    if len(s) > 1 and s[-2] == "e":
        s[-2] = s[-1]
        del s[-1]
        return "".join(s)
    if len(s) > 2 and s[-2] == "ů":
        s[-2] = "o"
    return "".join(s)


# ---------------------------------------------------------------------------
# Bulgarian (bg/BulgarianStemmer.java — light stemmer)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=_CACHE)
def bulgarian_stem(term: str) -> str:
    """Bulgarian light stemmer (bg/BulgarianStemmer.java:28 stem)."""
    s = list(term)
    if len(s) < 4:
        return term

    def ends(sfx: str) -> bool:
        return "".join(s).endswith(sfx)

    if len(s) > 5 and ends("ища"):
        return "".join(s[:-3])
    # removeArticle
    if len(s) > 6 and ends("ият"):
        del s[-3:]
    elif len(s) > 5 and (ends("ът") or ends("то") or ends("те") or ends("та")
                         or ends("ия")):
        del s[-2:]
    elif len(s) > 4 and ends("ят"):
        del s[-2:]
    # removePlural
    n = len(s)
    if n > 6 and ends("овци"):
        del s[-3:]
    elif n > 6 and ends("ове"):
        del s[-3:]
    elif n > 6 and ends("еве"):
        s[-3] = "й"
        del s[-2:]
    elif n > 5 and ends("ища"):
        del s[-3:]
    elif n > 5 and ends("та"):
        del s[-2:]
    elif n > 5 and ends("ци"):
        s[-2] = "к"
        del s[-1]
    elif n > 5 and ends("зи"):
        s[-2] = "г"
        del s[-1]
    elif n > 5 and s[-3] == "е" and s[-1] == "и":
        s[-3] = "я"
        del s[-1]
    elif n > 4 and ends("си"):
        s[-2] = "х"
        del s[-1]
    elif n > 4 and ends("и"):
        del s[-1]
    if len(s) > 3:
        if ends("я"):
            del s[-1]
        if ends("а") or ends("о") or ends("е"):
            del s[-1]
    if len(s) > 4 and ends("ен"):
        s[-2] = "н"
        del s[-1]
    if len(s) > 5 and s[-2] == "ъ":
        s[-2] = s[-1]
        del s[-1]
    return "".join(s)


# ---------------------------------------------------------------------------
# Hindi (hi/HindiStemmer.java + hi/HindiNormalizer.java)
# ---------------------------------------------------------------------------

_HI_SUFFIXES = (
    (6, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")),
    (5, ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां")),
    (4, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं")),
    (3, ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
         "ता", "ाँ", "ां", "ों", "ें")),
    (2, ("ो", "े", "ू", "ु", "ी", "ि", "ा")),
)


@lru_cache(maxsize=_CACHE)
def hindi_stem(term: str) -> str:
    """Hindi light stemmer (hi/HindiStemmer.java:25 stem)."""
    n = len(term)
    for extra, suffixes in _HI_SUFFIXES:
        if n > extra:
            for sfx in suffixes:
                if term.endswith(sfx):
                    return term[:n - len(sfx)]
    return term


_HI_MAP = {
    "ँ": "ं", "ऩ": "न", "ऱ": "र",
    "ऴ": "ळ", "क़": "क", "ख़": "ख",
    "ग़": "ग", "ज़": "ज", "ड़": "ड",
    "ढ़": "ढ", "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े", "ॉ": "ो",
    "ॊ": "ो", "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ", "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ", "ऐ": "ए",
    "औ": "ओ", "ी": "ि", "ू": "ु",
    "ॄ": "ृ", "ॣ": "ॢ", "ै": "े",
    "ौ": "ो",
}
_HI_DELETE = {"़", "‍", "‌", "्"}


@lru_cache(maxsize=_CACHE)
def hindi_normalize(term: str) -> str:
    """Hindi orthographic normalization (hi/HindiNormalizer.java:41)."""
    out: list[str] = []
    i = 0
    while i < len(term):
        ch = term[i]
        if ch == "न" and i + 1 < len(term) and term[i + 1] == "्":
            out.append("ं")
            i += 2
            continue
        if ch in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_MAP.get(ch, ch))
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# Indic composed-form normalization (in/IndicNormalizer.java) — 9 scripts,
# each a 0x80-codepoint block; the table rewrites decomposed vowel/nukta
# sequences to their composed letter. Rows: (ch0, ch1, ch2|-1|0xFF=ZWJ,
# composed, script-flag mask), offsets relative to the script base.
# ---------------------------------------------------------------------------

_IN_SCRIPTS = (  # (flag, block base) — block covers base..base+0x7F
    (1, 0x0900), (2, 0x0980), (4, 0x0A00), (8, 0x0A80), (16, 0x0B00),
    (32, 0x0B80), (64, 0x0C00), (128, 0x0C80), (256, 0x0D00))
_DEV, _BEN, _GUR, _GUJ, _ORI, _TAM, _TEL, _KAN, _MAL = (
    1, 2, 4, 8, 16, 32, 64, 128, 256)
_IN_DECOMP = (
    (0x05, 0x3E, 0x45, 0x11, _DEV | _GUJ),
    (0x05, 0x3E, 0x46, 0x12, _DEV),
    (0x05, 0x3E, 0x47, 0x13, _DEV | _GUJ),
    (0x05, 0x3E, 0x48, 0x14, _DEV | _GUJ),
    (0x05, 0x3E, -1, 0x06, _DEV | _BEN | _GUR | _GUJ | _ORI),
    (0x05, 0x45, -1, 0x72, _DEV),
    (0x05, 0x45, -1, 0x0D, _GUJ),
    (0x05, 0x46, -1, 0x04, _DEV),
    (0x05, 0x47, -1, 0x0F, _GUJ),
    (0x05, 0x48, -1, 0x10, _GUR | _GUJ),
    (0x05, 0x49, -1, 0x11, _DEV | _GUJ),
    (0x05, 0x4A, -1, 0x12, _DEV),
    (0x05, 0x4B, -1, 0x13, _DEV | _GUJ),
    (0x05, 0x4C, -1, 0x14, _DEV | _GUR | _GUJ),
    (0x06, 0x45, -1, 0x11, _DEV | _GUJ),
    (0x06, 0x46, -1, 0x12, _DEV),
    (0x06, 0x47, -1, 0x13, _DEV | _GUJ),
    (0x06, 0x48, -1, 0x14, _DEV | _GUJ),
    (0x07, 0x57, -1, 0x08, _MAL),
    (0x09, 0x41, -1, 0x0A, _DEV),
    (0x09, 0x57, -1, 0x0A, _TAM | _MAL),
    (0x0E, 0x46, -1, 0x10, _MAL),
    (0x0F, 0x45, -1, 0x0D, _DEV),
    (0x0F, 0x46, -1, 0x0E, _DEV),
    (0x0F, 0x47, -1, 0x10, _DEV),
    (0x0F, 0x57, -1, 0x10, _ORI),
    (0x12, 0x3E, -1, 0x13, _MAL),
    (0x12, 0x4C, -1, 0x14, _TEL | _KAN),
    (0x12, 0x55, -1, 0x13, _TEL),
    (0x12, 0x57, -1, 0x14, _TAM | _MAL),
    (0x13, 0x57, -1, 0x14, _ORI),
    (0x15, 0x3C, -1, 0x58, _DEV),
    (0x16, 0x3C, -1, 0x59, _DEV | _GUR),
    (0x17, 0x3C, -1, 0x5A, _DEV | _GUR),
    (0x1C, 0x3C, -1, 0x5B, _DEV | _GUR),
    (0x21, 0x3C, -1, 0x5C, _DEV | _BEN | _ORI),
    (0x22, 0x3C, -1, 0x5D, _DEV | _BEN | _ORI),
    (0x23, 0x4D, 0xFF, 0x7A, _MAL),
    (0x24, 0x4D, 0xFF, 0x4E, _BEN),
    (0x28, 0x3C, -1, 0x29, _DEV),
    (0x28, 0x4D, 0xFF, 0x7B, _MAL),
    (0x2B, 0x3C, -1, 0x5E, _DEV | _GUR),
    (0x2F, 0x3C, -1, 0x5F, _DEV | _BEN),
    (0x2C, 0x41, 0x41, 0x0B, _TEL),
    (0x30, 0x3C, -1, 0x31, _DEV),
    (0x30, 0x4D, 0xFF, 0x7C, _MAL),
    (0x32, 0x4D, 0xFF, 0x7D, _MAL),
    (0x33, 0x3C, -1, 0x34, _DEV),
    (0x33, 0x4D, 0xFF, 0x7E, _MAL),
    (0x35, 0x41, -1, 0x2E, _TEL),
    (0x3E, 0x45, -1, 0x49, _DEV | _GUJ),
    (0x3E, 0x46, -1, 0x4A, _DEV),
    (0x3E, 0x47, -1, 0x4B, _DEV | _GUJ),
    (0x3E, 0x48, -1, 0x4C, _DEV | _GUJ),
    (0x3F, 0x55, -1, 0x40, _KAN),
    (0x41, 0x41, -1, 0x42, _GUR),
    (0x46, 0x3E, -1, 0x4A, _TAM | _MAL),
    (0x46, 0x42, 0x55, 0x4B, _KAN),
    (0x46, 0x42, -1, 0x4A, _KAN),
    (0x46, 0x46, -1, 0x48, _MAL),
    (0x46, 0x55, -1, 0x47, _TEL | _KAN),
    (0x46, 0x56, -1, 0x48, _TEL | _KAN),
    (0x46, 0x57, -1, 0x4C, _TAM | _MAL),
    (0x47, 0x3E, -1, 0x4B, _BEN | _ORI | _TAM | _MAL),
    (0x47, 0x57, -1, 0x4C, _BEN | _ORI),
    (0x4A, 0x55, -1, 0x4B, _KAN),
    (0x72, 0x3F, -1, 0x07, _GUR),
    (0x72, 0x40, -1, 0x08, _GUR),
    (0x72, 0x47, -1, 0x0F, _GUR),
    (0x73, 0x41, -1, 0x09, _GUR),
    (0x73, 0x42, -1, 0x0A, _GUR),
    (0x73, 0x4B, -1, 0x13, _GUR),
)


def _in_script(cp: int) -> tuple[int, int] | None:
    for flag, base in _IN_SCRIPTS:
        if base <= cp <= base + 0x7F:
            return flag, base
    return None


@lru_cache(maxsize=_CACHE)
def indic_normalize(term: str) -> str:
    """Indic composed-form normalization (in/IndicNormalizer.java:236
    normalize): scan left-to-right, composing one decomposed sequence per
    position in place (the scan then moves past the composed char, as the
    reference's in-place array walk does)."""
    buf = list(term)
    i = 0
    while i < len(buf):
        sd = _in_script(ord(buf[i]))
        if sd is not None:
            flag, base = sd
            ch0 = ord(buf[i]) - base
            if i + 1 < len(buf):
                nxt = ord(buf[i + 1])
                if _in_script(nxt) == sd:
                    ch1 = nxt - base
                    ch2 = -1
                    if i + 2 < len(buf):
                        c2 = buf[i + 2]
                        if c2 == "‍":
                            ch2 = 0xFF
                        elif _in_script(ord(c2)) == sd:
                            ch2 = ord(c2) - base
                    for d0, d1, d2, comp, flags in _IN_DECOMP:
                        if d0 == ch0 and flags & flag:
                            if d1 == ch1 and (d2 < 0 or d2 == ch2):
                                buf[i] = chr(base + comp)
                                del buf[i + 1]
                                if d2 >= 0:
                                    del buf[i + 1]
                                break
        i += 1
    return "".join(buf)


# ---------------------------------------------------------------------------
# Arabic (ar/ArabicNormalizer.java + ar/ArabicStemmer.java)
# ---------------------------------------------------------------------------

_AR_ALEF = "ا"
_AR_MAP = {"آ": _AR_ALEF, "أ": _AR_ALEF, "إ": _AR_ALEF,
           "ى": "ي", "ة": "ه"}
_AR_DELETE = set("ـًٌٍَُِّْ")


@lru_cache(maxsize=_CACHE)
def arabic_normalize(term: str) -> str:
    """Arabic normalization (ar/ArabicNormalizer.java:59 normalize)."""
    return "".join(_AR_MAP.get(c, c) for c in term if c not in _AR_DELETE)


_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


@lru_cache(maxsize=_CACHE)
def arabic_stem(term: str) -> str:
    """Arabic light stemmer (ar/ArabicStemmer.java:62 stem): one prefix
    strip (wa- needs len≥4, others len≥prefix+2), then EVERY matching
    suffix strips in order while ≥2 chars remain after it."""
    for p in _AR_PREFIXES:
        if term.startswith(p):
            if len(p) == 1 and len(term) < 4:
                continue
            if len(p) > 1 and len(term) < len(p) + 2:
                continue
            term = term[len(p):]
            break
    for s in _AR_SUFFIXES:
        if term.endswith(s) and len(term) >= len(s) + 2:
            term = term[:len(term) - len(s)]
    return term


# ---------------------------------------------------------------------------
# Persian (fa/PersianNormalizer.java)
# ---------------------------------------------------------------------------

_FA_MAP = {"ی": "ي", "ے": "ي", "ک": "ك",
           "ۀ": "ه", "ہ": "ه"}


@lru_cache(maxsize=_CACHE)
def persian_normalize(term: str) -> str:
    """Persian normalization (fa/PersianNormalizer.java:46 normalize)."""
    return "".join(_FA_MAP.get(c, c) for c in term if c != "ٔ")


# ---------------------------------------------------------------------------
# Greek + Turkish lowercase (el/GreekLowerCaseFilter.java,
# tr/TurkishLowerCaseFilter.java)
# ---------------------------------------------------------------------------

_EL_MAP = {
    "ς": "σ",
    "Ά": "α", "ά": "α",
    "Έ": "ε", "έ": "ε",
    "Ή": "η", "ή": "η",
    "Ί": "ι", "Ϊ": "ι", "ί": "ι",
    "ϊ": "ι", "ΐ": "ι",
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ",
    "ϋ": "υ", "ΰ": "υ",
    "Ό": "ο", "ό": "ο",
    "Ώ": "ω", "ώ": "ω",
    "΢": "ς",
}


@lru_cache(maxsize=_CACHE)
def greek_lower(term: str) -> str:
    """Greek lowercase + diacritic fold + final-sigma normalization
    (el/GreekLowerCaseFilter.java:56 lowerCase)."""
    return "".join(_EL_MAP.get(c, c.lower()) for c in term)


@lru_cache(maxsize=_CACHE)
def turkish_lower(term: str) -> str:
    """Turkish-aware lowercase (tr/TurkishLowerCaseFilter.java:45):
    I → ı (dotless) unless followed by combining-dot-above (→ i, dot
    consumed); combining dots after I are removed."""
    out: list[str] = []
    i = 0
    n = len(term)
    i_or_after = False
    while i < n:
        ch = term[i]
        i_or_after = ch == "I" or (i_or_after and _cat(ch) == "Mn")
        if i_or_after:
            if ch == "̇":
                i += 1
                continue
            if ch == "I":
                # dotted if a combining-dot-above follows before any
                # non-mark character
                j = i + 1
                before_dot = False
                while j < n and _cat(term[j]) == "Mn":
                    if term[j] == "̇":
                        before_dot = True
                        break
                    j += 1
                if before_dot:
                    out.append("i")
                else:
                    out.append("ı")
                    i_or_after = False
                i += 1
                continue
        # Java Character.toLowerCase('İ' U+0130) is the bare 'i' (Python's
        # str.lower would add a combining dot — the locale-free Java rule
        # is what the reference applies)
        out.append("i" if ch == "İ" else ch.lower())
        i += 1
    return "".join(out)
