"""Snowball Spanish stemmer — the algorithm the reference's SpanishAnalyzer
applies (es/SpanishAnalyzer.java:106 createComponents → tartarus snowball
SpanishStemmer), reimplemented from the published Snowball definition
(snowballstem.org "Spanish stemming algorithm"; the reference ships only the
generated Java). Reference parity gate: TestSpanishAnalyzer.testBasics
(chicana/chicano → chican, "los" stopped) plus the curated vectors in
tests/test_lang.py derived by hand from the published rules.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = set("aeiouáéíóúü")

_PRONOUNS = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
             "me", "se", "la", "le", "lo")
_PRON_PRE_ACCENT = {"iéndo": "iendo", "ándo": "ando", "ár": "ar",
                    "ér": "er", "ír": "ir"}
_PRON_PRE_PLAIN = ("ando", "iendo", "ar", "er", "ir")

# step 1: (suffixes, zone, action) — longest match across ALL groups wins,
# then only that group's action applies (snowball among semantics)
_S1_DELETE_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa")
_S1_ADOR = ("aciones", "adoras", "adores", "ancias", "adora", "ación",
            "antes", "ancia", "ador", "ante")
_S1_LOGIA = ("logías", "logía")
_S1_UCION = ("uciones", "ución")
_S1_ENCIA = ("encias", "encia")
_S1_IDAD = ("idades", "idad")
_S1_IVA = ("ivas", "ivos", "iva", "ivo")

_S2A = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
        "ya", "ye", "yo", "yó")

_S2B_GU = ("emos", "éis", "en", "es")
_S2B = (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré",
    "erían", "erías", "erán", "erás", "eríais", "ería", "eréis",
    "eríamos", "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
    "iríamos", "iremos", "irá", "iré",
    "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id",
    "ase", "iese", "aste", "iste", "an", "aban", "ían", "aran",
    "ieran", "asen", "iesen", "aron", "ieron", "ado", "ido", "ando",
    "iendo", "ió", "ar", "er", "ir", "as", "abas", "adas", "idas",
    "ías", "aras", "ieras", "ases", "ieses", "ís", "áis", "abais",
    "íais", "arais", "ierais", "aseis", "ieseis", "asteis", "isteis",
    "ados", "idos", "amos", "ábamos", "íamos", "imos", "áramos",
    "iéramos", "iésemos", "ásemos")

_S3_DELETE = ("os", "a", "o", "á", "í", "ó")

_ACCENT_FOLD = str.maketrans("áéíóú", "aeiou")


def _regions(w: str) -> tuple[int, int, int]:
    """→ (r1, r2, rv) start indices per the snowball definitions."""
    n = len(w)
    # R1: after the first non-vowel following a vowel
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    r1 = i + 1 if i < n else n
    # R2: same rule applied from R1
    i = r1
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    r2 = i + 1 if i < n else n
    # RV
    if n < 3:
        rv = n
    elif w[1] not in _VOWELS:
        # second letter a consonant: after the next following vowel
        i = 2
        while i < n and w[i] not in _VOWELS:
            i += 1
        rv = i + 1 if i < n else n
    elif w[0] in _VOWELS and w[1] in _VOWELS:
        # first two letters vowels: after the next following consonant
        i = 2
        while i < n and w[i] in _VOWELS:
            i += 1
        rv = i + 1 if i < n else n
    else:
        # consonant-vowel: after the third letter
        rv = 3
    return r1, r2, rv


def _longest(w: str, suffixes) -> str | None:
    best = None
    for s in suffixes:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


@lru_cache(maxsize=1 << 16)
def spanish_stem(word: str) -> str:
    w = word
    r1, r2, rv = _regions(w)

    def in_r2(sfx: str) -> bool:
        return len(w) - len(sfx) >= r2

    def in_r1(sfx: str) -> bool:
        return len(w) - len(sfx) >= r1

    def in_rv(sfx: str) -> bool:
        return len(w) - len(sfx) >= rv

    # --- step 0: attached pronoun ---------------------------------------
    pron = _longest(w, _PRONOUNS)
    if pron:
        base = w[:len(w) - len(pron)]
        rv_base = base[rv:]
        done = False
        for acc, plain in _PRON_PRE_ACCENT.items():
            if base.endswith(acc) and rv_base.endswith(acc):
                w = base[:len(base) - len(acc)] + plain
                done = True
                break
        if not done:
            for p in _PRON_PRE_PLAIN:
                if base.endswith(p) and rv_base.endswith(p):
                    w = base
                    done = True
                    break
        if not done and base.endswith("yendo") and rv_base.endswith("yendo") \
                and base[:len(base) - 5].endswith("u"):
            w = base
        # regions are positions in the ORIGINAL word; they stay valid
        # (snowball keeps the same limits after deletion at the end)

    # --- step 1: standard suffixes (one longest match over all groups) ---
    step1_removed = False
    all_s1 = (_S1_DELETE_R2 + _S1_ADOR + _S1_LOGIA + _S1_UCION + _S1_ENCIA
              + ("amente", "mente") + _S1_IDAD + _S1_IVA)
    m = _longest(w, all_s1)
    if m is not None:
        if m in _S1_LOGIA:
            if in_r2(m):
                w = w[:len(w) - len(m)] + "log"
                step1_removed = True
        elif m in _S1_UCION:
            if in_r2(m):
                w = w[:len(w) - len(m)] + "u"
                step1_removed = True
        elif m in _S1_ENCIA:
            if in_r2(m):
                w = w[:len(w) - len(m)] + "ente"
                step1_removed = True
        elif m == "amente":
            if in_r1(m):
                w = w[:len(w) - len(m)]
                step1_removed = True
                # if preceded by iv, delete if in R2 (then at likewise);
                # otherwise os/ic/ad delete if in R2
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for p in ("os", "ic", "ad"):
                        if w.endswith(p) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif m == "mente":
            if in_r2(m):
                w = w[:len(w) - len(m)]
                step1_removed = True
                for p in ("ante", "able", "ible"):
                    if w.endswith(p) and len(w) - len(p) >= r2:
                        w = w[:len(w) - len(p)]
                        break
        elif m in _S1_IDAD:
            if in_r2(m):
                w = w[:len(w) - len(m)]
                step1_removed = True
                for p in ("abil", "ic", "iv"):
                    if w.endswith(p) and len(w) - len(p) >= r2:
                        w = w[:len(w) - len(p)]
                        break
        elif m in _S1_IVA:
            if in_r2(m):
                w = w[:len(w) - len(m)]
                step1_removed = True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif m in _S1_ADOR:
            if in_r2(m):
                w = w[:len(w) - len(m)]
                step1_removed = True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        else:  # plain delete-if-R2 group
            if in_r2(m):
                w = w[:len(w) - len(m)]
                step1_removed = True

    # --- step 2a: verb suffixes beginning y (only if step 1 removed
    # nothing); requires a preceding u (the u need not be in RV) ----------
    step2a_removed = False
    if not step1_removed:
        m = _longest(w, _S2A)
        if m is not None and in_rv(m) \
                and w[:len(w) - len(m)].endswith("u"):
            w = w[:len(w) - len(m)]
            step2a_removed = True

    # --- step 2b: other verb suffixes (only if 2a removed nothing) -------
    if not step1_removed and not step2a_removed:
        m = _longest(w, _S2B_GU + _S2B)
        if m is not None and in_rv(m):
            w = w[:len(w) - len(m)]
            if m in _S2B_GU and w.endswith("gu"):
                w = w[:-1]  # the u need not be in RV

    # --- step 3: residual suffix -----------------------------------------
    m = _longest(w, _S3_DELETE + ("e", "é"))
    if m is not None:
        if m in ("e", "é"):
            if in_rv(m):
                w = w[:len(w) - 1]
                if w.endswith("gu") and len(w) - 1 >= rv:
                    w = w[:-1]
        elif in_rv(m):
            w = w[:len(w) - len(m)]

    return w.translate(_ACCENT_FOLD)
