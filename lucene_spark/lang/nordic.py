"""Snowball Danish / Norwegian / Swedish / Finnish stemmers.

The reference's SnowballAnalyzer (contrib/analyzers/common/.../snowball/
SnowballAnalyzer.java:76 createComponents: StandardTokenizer →
StandardFilter → LowerCase → Stop → SnowballFilter) dispatches to the
generated tartarus classes (org/tartarus/snowball/ext/DanishStemmer.java,
NorwegianStemmer.java, SwedishStemmer.java, FinnishStemmer.java). These are
fresh Python implementations from the PUBLISHED Snowball algorithm
definitions (snowballstem.org — the same specifications the generated Java
encodes), gated by curated vectors in tests/test_lang_nordic.py.

Shared convention: R1/R2 are indices into the word computed ONCE from the
original form (suffix deletions only ever shorten the tail, so the indices
stay valid — exactly the snowball cursor model); "suffix in R1" means the
suffix starts at an index >= r1.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# Scandinavian trio (shared region rule: R1 start is at least 3)
# ---------------------------------------------------------------------------

_DA_VOWELS = set("aeiouyæåø")
_NO_VOWELS = set("aeiouyæåø")
_SV_VOWELS = set("aeiouyäåö")


def _r1_min3(w: str, vowels: set) -> int:
    """R1 = after the first non-vowel following a vowel, adjusted so the
    region before it holds at least 3 letters (the da/no/sv rule)."""
    n = len(w)
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    r1 = i + 1 if i < n else n
    return max(r1, min(3, n))


def _longest_in_r1(w: str, r1: int, suffixes) -> str | None:
    best = None
    for s in suffixes:
        if (w.endswith(s) and len(w) - len(s) >= r1
                and (best is None or len(s) > len(best))):
            best = s
    return best


_DA_S1 = ("erendes", "erende", "hedens", "erens", "erets", "ethed",
          "erede", "heden", "heder", "endes", "ernes", "ered", "ende",
          "erne", "eren", "erer", "heds", "enes", "eres", "eret", "hed",
          "ene", "ere", "ens", "ers", "ets", "en", "er", "es", "et", "e")
_DA_S_ENDING = set("abcdfghjklmnoprtvyzå")
_DA_S2 = ("gd", "dt", "gt", "kt")
_DA_S3 = ("elig", "lig", "els", "ig")


@lru_cache(maxsize=1 << 16)
def danish_stem(word: str) -> str:
    w = word
    r1 = _r1_min3(w, _DA_VOWELS)
    # step 1: longest suffix in R1 (delete), or s after a valid s-ending
    s = _longest_in_r1(w, r1, _DA_S1)
    if s is not None:
        w = w[: -len(s)]
    elif (w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2
          and w[-2] in _DA_S_ENDING):
        w = w[:-1]
    # step 2: consonant-pair suffixes lose their last letter
    if _longest_in_r1(w, r1, _DA_S2) is not None:
        w = w[:-1]
    # step 3: igst loses st; then ig/lig/elig/els delete + repeat step 2;
    # løst → løs
    if w.endswith("igst"):
        w = w[:-2]
    s = _longest_in_r1(w, r1, _DA_S3 + ("løst",))
    if s == "løst":  # → løs (ext/DanishStemmer.java a_2 case 2)
        w = w[:-1]
    elif s is not None:
        w = w[: -len(s)]
        if _longest_in_r1(w, r1, _DA_S2) is not None:
            w = w[:-1]
    # step 4: undouble a final double consonant whose last letter is in R1
    if (len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS
            and len(w) - 1 >= r1):
        w = w[:-1]
    return w


_NO_S1_DELETE = ("hetenes", "hetene", "hetens", "heten", "heter",
                 "hetens", "endes", "enes", "edes", "ande", "ende",
                 "ane", "ene", "ede", "het", "ast", "ens", "ers", "ets",
                 "en", "ar", "er", "as", "es", "et", "a", "e")
_NO_S1_ER = ("erte", "ert")
_NO_S_ENDING = set("bcdfghjlmnoprtvyz")
_NO_S2 = ("dt", "vt")
_NO_S3 = ("hetslov", "slov", "elov", "elig", "eleg", "lov", "lig",
          "eig", "leg", "els", "ig")


@lru_cache(maxsize=1 << 16)
def norwegian_stem(word: str) -> str:
    w = word
    r1 = _r1_min3(w, _NO_VOWELS)
    # step 1: longest among delete-list ∪ {erte, ert → er} ∪ {s}
    best, action = None, None
    for s in _NO_S1_DELETE:
        if (w.endswith(s) and len(w) - len(s) >= r1
                and (best is None or len(s) > len(best))):
            best, action = s, "del"
    for s in _NO_S1_ER:
        if (w.endswith(s) and len(w) - len(s) >= r1
                and (best is None or len(s) > len(best))):
            best, action = s, "er"
    if (best is None or len(best) < 1) and w.endswith("s") \
            and len(w) - 1 >= r1:
        # s: valid s-ending = one of b c d f g h j l m n o p r t v y z,
        # or k not preceded by a vowel
        prev = w[-2] if len(w) >= 2 else ""
        prev2 = w[-3] if len(w) >= 3 else ""
        if prev in _NO_S_ENDING or (prev == "k"
                                    and prev2 not in _NO_VOWELS):
            best, action = "s", "del"
    if best is not None:
        w = w[: -len(best)] + ("er" if action == "er" else "")
    # step 2
    if _longest_in_r1(w, r1, _NO_S2) is not None:
        w = w[:-1]
    # step 3
    s = _longest_in_r1(w, r1, _NO_S3)
    if s is not None:
        w = w[: -len(s)]
    return w


_SV_S1 = ("heterna", "hetens", "anden", "heten", "heter", "arnas",
          "ernas", "ornas", "arens", "andet", "andes", "arna", "erna",
          "orna", "ande", "arne", "aste", "aren", "ades", "erns", "ade",
          "are", "ern", "ens", "het", "ast", "ad", "en", "ar", "er",
          "or", "as", "es", "at", "a", "e")
_SV_S_ENDING = set("bcdfghjklmnoprtvy")
_SV_S2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_S3_DELETE = ("lig", "els", "ig")


@lru_cache(maxsize=1 << 16)
def swedish_stem(word: str) -> str:
    w = word
    r1 = _r1_min3(w, _SV_VOWELS)
    s = _longest_in_r1(w, r1, _SV_S1)
    if s is not None:
        w = w[: -len(s)]
    elif (w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2
          and w[-2] in _SV_S_ENDING):
        w = w[:-1]
    if _longest_in_r1(w, r1, _SV_S2) is not None:
        w = w[:-1]
    # step 3: longest among lig ig els (delete), löst→lös, fullt→full
    best = _longest_in_r1(w, r1, _SV_S3_DELETE + ("löst", "fullt"))
    if best in _SV_S3_DELETE:
        w = w[: -len(best)]
    elif best is not None:  # löst / fullt drop the final t
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Finnish
# ---------------------------------------------------------------------------

_FI_VOWELS = set("aeiouyäö")
_FI_LONG_V = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_CONSONANTS = set("bcdfghjklmnpqrstvwxz")


def _fi_regions(w: str) -> tuple[int, int]:
    n = len(w)
    i = 0
    while i < n and w[i] not in _FI_VOWELS:
        i += 1
    while i < n and w[i] in _FI_VOWELS:
        i += 1
    r1 = i + 1 if i < n else n
    i = r1
    while i < n and w[i] not in _FI_VOWELS:
        i += 1
    while i < n and w[i] in _FI_VOWELS:
        i += 1
    r2 = i + 1 if i < n else n
    return r1, r2


_FI_S1_PART = ("kaan", "kään", "kin", "han", "hän", "ko", "kö",
               "pa", "pä")
_FI_S2_NSA = ("nsa", "nsä", "mme", "nne")
_FI_V2 = set("aeiouäö")  # g_V2 — no y
# a_6 in longest-first match order; kind: VI/LONG = routine condition
# (among-level, falls back), hXn/e/cv = switch condition (aborts),
# n = action 7, None = plain delete
_FI_S3_AMONG = (
    ("seen", "LONG"), ("siin", "VI"), ("tten", "VI"),
    ("han", "hXn"), ("hen", "hXn"), ("hin", "hXn"), ("hon", "hXn"),
    ("hun", "hXn"), ("hyn", "hXn"), ("hän", "hXn"), ("hön", "hXn"),
    ("den", "VI"),
    ("tta", "e"), ("ttä", "e"),
    ("ssa", None), ("ssä", None), ("sta", None), ("stä", None),
    ("lla", None), ("llä", None), ("lta", None), ("ltä", None),
    ("lle", None), ("ksi", None), ("ine", None),
    ("na", None), ("nä", None), ("ta", None), ("tä", None),
    ("a", "cv"), ("ä", "cv"), ("n", "n"),
)
_FI_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
           "hun": "u", "hyn": "y", "hän": "ä", "hön": "ö"}
_FI_S4_MP = ("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
_FI_S4_DEL = ("impi", "impa", "impä", "immi", "imma", "immä",
              "eja", "ejä")


@lru_cache(maxsize=1 << 16)
def finnish_stem(word: str) -> str:  # noqa: C901 — the algorithm IS long
    w = word
    r1, r2 = _fi_regions(w)

    def in_r1(s: str) -> bool:
        return w.endswith(s) and len(w) - len(s) >= r1

    def in_r2(s: str) -> bool:
        return w.endswith(s) and len(w) - len(s) >= r2

    # step 1: particles — longest in R1
    s = _longest_in_r1(w, r1, _FI_S1_PART)
    if s is not None:
        pre = w[-len(s) - 1] if len(w) > len(s) else ""
        if pre == "n" or pre == "t" or pre in _FI_VOWELS:
            w = w[: -len(s)]
    elif in_r2("sti"):
        w = w[:-3]

    # step 2: possessives — longest in R1
    if in_r1("nsa") or in_r1("nsä") or in_r1("mme") or in_r1("nne"):
        w = w[:-3]
    elif in_r1("si"):
        if len(w) < 3 or w[-3] != "k":
            w = w[:-2]
    elif in_r1("ni"):
        w = w[:-2]
        if w.endswith("kse"):
            w = w[:-1] + "i"
    elif in_r1("an"):
        if w[:-2].endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
            w = w[:-2]
    elif in_r1("än"):
        if w[:-2].endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
            w = w[:-2]
    elif in_r1("en"):
        if w[:-2].endswith(("lle", "ine")):
            w = w[:-2]

    # step 3: cases — the generated automaton's among semantics
    # (ext/FinnishStemmer.java a_6 + r_case_ending): entries with a
    # ROUTINE condition fall back to a shorter entry when it fails (the
    # parent chain lands on the bare "n", action 7); switch-style
    # conditions (hXn vowel, tta/ttä 'e', a/ä cv) abort the whole routine
    # with no fallback. REFERENCE QUIRK reproduced deliberately: r_VI and
    # r_LONG are PRIVATE methods invoked reflectively by
    # SnowballProgram.find_among_b (SnowballProgram.java:394-404) without
    # setAccessible — the invoke throws IllegalAccessException, the catch
    # maps it to false, so den/seen/tten/siin NEVER delete in the
    # reference build and always take the "n" fallback. Golden outputs
    # from driving the reference's generated classes pin this
    # (tests/test_lang_nordic.py; same declared-quirk policy as
    # stemmers.py).
    step3 = False
    chosen = None
    for s, kind in _FI_S3_AMONG:
        if not in_r1(s):
            continue
        pre = w[: -len(s)]
        if kind in ("VI", "LONG"):
            continue  # reference quirk: condition always "fails"
        chosen = (s, kind, pre)
        break
    if chosen is not None:
        s, kind, pre = chosen
        if kind == "hXn":
            if pre.endswith(_FI_HXN[s]):
                w, step3 = pre, True
        elif kind == "e":
            if pre.endswith("e"):
                w, step3 = pre, True
        elif kind == "cv":
            if (len(pre) >= 2 and pre[-1] in _FI_VOWELS
                    and pre[-2] not in _FI_VOWELS):
                w, step3 = pre, True
        elif kind == "n":
            w, step3 = pre, True
            if w.endswith(_FI_LONG_V) or w.endswith("ie"):
                w = w[:-1]
        else:  # plain delete (incl. VI/LONG entries whose condition held)
            w, step3 = pre, True

    # step 4: other endings — longest in R2
    best = None
    for s in _FI_S4_MP + _FI_S4_DEL:
        if in_r2(s) and (best is None or len(s) > len(best)):
            best = s
    if best is not None:
        if best in _FI_S4_MP:
            if not w[: -len(best)].endswith("po"):
                w = w[: -len(best)]
        else:
            w = w[: -len(best)]

    # step 5: plurals (r_i_plural / r_t_plural — the preceding vowel of a
    # deleted 't' must itself sit in R1, in_grouping_b under the p1 limit)
    if step3:
        if (w.endswith("i") or w.endswith("j")) and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if (w.endswith("t") and len(w) - 1 >= r1 and len(w) >= 2
                and w[-2] in _FI_VOWELS and len(w) - 2 >= r1):
            w = w[:-1]
            if w.endswith("imma") and len(w) - 4 >= r2:
                w = w[:-4]
            elif (w.endswith("mma") and len(w) - 3 >= r2
                  and not w[:-3].endswith("po")):
                w = w[:-3]

    # step 6: tidying (each substep a snowball `do`)
    # a) R1 ends LV → delete last letter
    if len(w) - 2 >= r1 and w.endswith(_FI_LONG_V):
        w = w[:-1]
    # b) R1 ends cX (c any non-vowel, X in g_AEI = a e i ä) → delete X
    if (len(w) - 2 >= r1 and len(w) >= 2 and w[-1] in "aeiä"
            and w[-2] not in _FI_VOWELS):
        w = w[:-1]
    # c) R1 ends oj / uj → delete last letter
    if len(w) - 2 >= r1 and (w.endswith("oj") or w.endswith("uj")):
        w = w[:-1]
    # d) R1 ends jo → delete last letter
    if len(w) - 2 >= r1 and w.endswith("jo"):
        w = w[:-1]
    # e) word ends double consonant + zero or more vowels → remove the
    # second consonant of the pair
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and w[i] not in _FI_VOWELS and w[i] == w[i - 1]:
        w = w[:i] + w[i + 1:]
    return w
