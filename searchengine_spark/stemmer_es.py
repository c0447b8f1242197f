"""Spanish Snowball stemmer, implemented from the published algorithm
description (snowballstem.org/algorithms/spanish/stemmer.html — public
specification; no code copied from any library).

The reference engine stems via nltk's SnowballStemmer with any
``--language`` it supports (/root/reference/src/models/tokenizer.py:59-70);
this module removes the nltk dependency for Spanish the same way
stemmer.py does for English. tokenizer._make_stemmer still prefers nltk
when the environment has a working one (exact reference parity);
tests/test_stemmer_langs.py carries hand-traced golden vectors from the
algorithm description plus an nltk cross-check that auto-activates when
nltk is importable.

Structure per the spec: RV/R1/R2 regions; step 0 (attached pronoun, with
the accent-removal (a)-forms); step 1 (standard suffixes, longest-match
across all groups); step 2a (y-verb suffixes after u) gated on step 1
doing nothing; step 2b (other verb suffixes, with the ``gu``->``g``
adjustment for en/es/éis/emos); step 3 (residual vowel suffixes);
final acute-accent removal.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouáéíóúü")
_DEACCENT = str.maketrans("áéíóú", "aeiou")

_PRONOUNS = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_PRE_B = ("iendo", "ando", "ar", "er", "ir")

# step 1: (suffix, group) — longest match across the whole table wins
_STEP1 = sorted(
    [(s, "del_r2") for s in (
        "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
        "ables", "ibles", "istas", "icos", "icas", "osos", "osas", "anza",
        "ico", "ica", "ismo", "able", "ible", "ista", "oso", "osa",
    )]
    + [(s, "ador") for s in (
        "aciones", "adoras", "adores", "ancias", "ación", "adora", "ador",
        "antes", "ancia", "ante",
    )]
    + [("logías", "log"), ("logía", "log")]
    + [("uciones", "u"), ("ución", "u")]
    + [("encias", "ente"), ("encia", "ente")]
    + [("amente", "amente"), ("mente", "mente")]
    + [("idades", "idad"), ("idad", "idad")]
    + [(s, "iv") for s in ("ivas", "ivos", "iva", "ivo")],
    key=lambda t: -len(t[0]),
)

_STEP2A = sorted(
    ("ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas", "yes",
     "yais", "yamos"),
    key=len, reverse=True,
)

_STEP2B_GU = ("en", "es", "éis", "emos")
_STEP2B = sorted(
    _STEP2B_GU + (
        "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
        "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán", "erás",
        "eríais", "ería", "eréis", "eríamos", "eremos", "erá", "eré",
        "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
        "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida", "ía", "ara",
        "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste", "an",
        "aban", "ían", "aran", "ieran", "asen", "iesen", "aron", "ieron",
        "ado", "ido", "ando", "iendo", "ió", "ar", "er", "ir", "as", "abas",
        "adas", "idas", "ías", "aras", "ieras", "ases", "ieses", "ís",
        "áis", "abais", "íais", "arais", "ierais", "aseis", "ieseis",
        "asteis", "isteis", "ados", "idos", "amos", "ábamos", "íamos",
        "imos", "áramos", "iéramos", "iésemos", "ásemos",
    ),
    key=len, reverse=True,
)


def _r_start(word: str, begin: int) -> int:
    for i in range(begin, len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            return i + 2
    return len(word)


def _rv(word: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _VOWELS:
        for i in range(2, n):
            if word[i] in _VOWELS:
                return i + 1
        return n
    if word[0] in _VOWELS and word[1] in _VOWELS:
        for i in range(2, n):
            if word[i] not in _VOWELS:
                return i + 1
        return n
    return 3


def _step0(word: str, rv: int) -> str:
    for p in _PRONOUNS:
        if not word.endswith(p):
            continue
        base = word[: -len(p)]
        for pre in _PRE_A:  # accented forms: delete pronoun, drop accent
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                return base[: -len(pre)] + pre.translate(_DEACCENT)
        for pre in _PRE_B:
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                return base
        # (c) yendo in RV, preceded by u (the u may be outside RV)
        if base.endswith("yendo") and len(base) - 5 >= rv and base[:-5].endswith("u"):
            return base
        break  # longest pronoun found; conditions failed -> stop
    return word


def _try_del(word: str, sufs, region: int) -> str:
    """Delete the longest of ``sufs`` whose start lies in ``region``."""
    for s in sufs:
        if word.endswith(s) and len(word) - len(s) >= region:
            return word[: -len(s)]
    return word


def _step1(word: str, r1: int, r2: int) -> tuple[str, bool]:
    for suf, group in _STEP1:
        if not word.endswith(suf):
            continue
        start = len(word) - len(suf)
        if group == "del_r2":
            if start >= r2:
                return word[:start], True
        elif group == "ador":
            if start >= r2:
                w = word[:start]
                return _try_del(w, ("ic",), r2), True
        elif group in ("log", "u", "ente"):
            if start >= r2:
                return word[:start] + group, True
        elif group == "amente":
            if start >= r1:
                w = word[:start]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    w2 = _try_del(w, ("at",), r2)
                    return w2, True
                return _try_del(w, ("os", "ic", "ad"), r2), True
        elif group == "mente":
            if start >= r2:
                w = word[:start]
                return _try_del(w, ("ante", "able", "ible"), r2), True
        elif group == "idad":
            if start >= r2:
                w = word[:start]
                return _try_del(w, ("abil", "ic", "iv"), r2), True
        elif group == "iv":
            if start >= r2:
                w = word[:start]
                return _try_del(w, ("at",), r2), True
        return word, False  # longest suffix matched but region test failed
    return word, False


def _step2a(word: str, rv: int) -> tuple[str, bool]:
    # the verb-suffix search is LIMITED to RV (spec: "longest among the
    # following suffixes in RV"): a match extending before RV is not a
    # match at all, and SHORTER in-RV suffixes must still be tried —
    # unlike step 1, whose longest whole-word match fails with no fallback
    for suf in _STEP2A:
        if word.endswith(suf):
            start = len(word) - len(suf)
            if start < rv:
                continue  # crosses the RV boundary -> keep scanning
            if word[:start].endswith("u"):
                return word[:start], True
            return word, False  # matched in RV; the u condition failed
    return word, False


def _step2b(word: str, rv: int) -> str:
    for suf in _STEP2B:
        if word.endswith(suf):
            start = len(word) - len(suf)
            if start < rv:
                continue  # RV-limited match (see _step2a)
            w = word[:start]
            if suf in _STEP2B_GU and w.endswith("gu"):
                w = w[:-1]  # the gu need not be in RV
            return w
    return word


def _step3(word: str, rv: int) -> str:
    for suf in ("os", "a", "o", "á", "í", "ó"):
        if word.endswith(suf):
            if len(word) - len(suf) >= rv:
                return word[: -len(suf)]
            return word
    for suf in ("e", "é"):
        if word.endswith(suf):
            if len(word) - 1 >= rv:
                w = word[:-1]
                # u of a trailing gu deleted only when it lies in RV
                if w.endswith("gu") and len(w) - 1 >= rv:
                    w = w[:-1]
                return w
            return word
    return word


def stem_spanish(word: str) -> str:
    """Stem one lowercase Spanish word (Snowball spanish)."""
    if len(word) <= 2:
        return word.translate(_DEACCENT)
    rv = _rv(word)
    r1 = _r_start(word, 0)
    r2 = _r_start(word, r1)

    word = _step0(word, rv)
    word, altered1 = _step1(word, r1, r2)
    if not altered1:
        word, altered2a = _step2a(word, rv)
        if not altered2a:
            word = _step2b(word, rv)
    word = _step3(word, rv)
    return word.translate(_DEACCENT)


class SpanishStemmer:
    """Minimal interface twin of nltk's SnowballStemmer for spanish."""

    def stem(self, word: str) -> str:
        return stem_spanish(word)
