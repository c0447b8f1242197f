"""Italian Snowball stemmer, implemented from the published algorithm
description (snowballstem.org/algorithms/italian/stemmer.html — public
specification; no code copied from any library).

Same role as the other vendored stemmers: nltk-free ``--language
italian``; tokenizer._make_stemmer prefers a working nltk when present.

Structure per the spec: prelude replaces acute accents with grave and
upper-cases u after q plus u/i between vowels (marking them consonants);
RV/R1/R2 as in Spanish; step 0 (attached pronoun after a gerund or
infinitive, with the ar/er/ir -> +e replacement); step 1 (standard
suffixes, longest match, with the amento/imento RV quirk); step 2 (verb
suffixes in RV, only if step 1 removed nothing); step 3a (final vowel,
then a preceding i, in RV); step 3b (ch/gh -> c/g in RV); postlude
lowers the markers.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouàèìòù")
_ACUTE_TO_GRAVE = str.maketrans("áéíóú", "àèìòù")
_POSTLUDE = str.maketrans({"U": "u", "I": "i"})

_PRONOUNS = sorted(
    (
        "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
        "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
        "mela", "mele", "meli", "melo", "mene",
        "tela", "tele", "teli", "telo", "tene",
        "cela", "cele", "celi", "celo", "cene",
        "vela", "vele", "veli", "velo", "vene",
    ),
    key=len, reverse=True,
)

_STEP1 = sorted(
    [(s, "del_r2") for s in (
        "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
        "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
        "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
        "ose", "mente", "atrice", "atrici", "ante", "anti",
    )]
    + [(s, "azione") for s in ("azione", "azioni", "atore", "atori")]
    + [("logia", "log"), ("logie", "log")]
    + [(s, "u") for s in ("uzione", "uzioni", "usione", "usioni")]
    + [("enza", "ente"), ("enze", "ente")]
    + [(s, "del_rv") for s in ("amento", "amenti", "imento", "imenti")]
    + [("amente", "amente")]
    + [("ità", "ita")]
    + [(s, "iv") for s in ("ivo", "ivi", "iva", "ive")],
    key=lambda t: -len(t[0]),
)

_STEP2 = sorted(
    (
        "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
        "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
        "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
        "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
        "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
        "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
        "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
        "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
        "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
        "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
        "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute",
        "uti", "uto", "ar", "ir",
    ),
    key=len, reverse=True,
)


def _prelude(word: str) -> str:
    word = word.translate(_ACUTE_TO_GRAVE)
    out = list(word)
    # the scan reads the MUTATED left context (Snowball's `repeat goto`
    # rewrites as it walks): in 'quia' the u is marked first, so the i is
    # no longer intervocalic ('qUia', not 'qUIa') — region computation
    # diverges otherwise
    for i in range(1, len(out)):
        c = out[i]
        if c == "u" and out[i - 1] == "q":
            out[i] = "U"
        elif (
            c in ("u", "i")
            and out[i - 1] in _VOWELS
            and i + 1 < len(out)
            and out[i + 1] in _VOWELS
        ):
            out[i] = c.upper()
    return "".join(out)


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


def _try_del(word: str, sufs, region: int) -> str:
    for s in sufs:
        if word.endswith(s) and len(word) - len(s) >= region:
            return word[: -len(s)]
    return word


def _step0(word: str, rv: int) -> str:
    for p in _PRONOUNS:
        if not word.endswith(p):
            continue
        base = word[: -len(p)]
        for pre in ("ando", "endo"):
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                return base
        for pre in ("ar", "er", "ir"):
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                return base + "e"
        break  # longest pronoun found; conditions failed -> stop
    return word


def _step1(word: str, r1: int, r2: int, rv: int) -> tuple[str, bool]:
    for suf, group in _STEP1:
        if not word.endswith(suf):
            continue
        start = len(word) - len(suf)
        if group == "del_r2":
            if start >= r2:
                return word[:start], True
        elif group == "azione":
            if start >= r2:
                return _try_del(word[:start], ("ic",), r2), True
        elif group in ("log", "u", "ente"):
            if start >= r2:
                return word[:start] + group, True
        elif group == "del_rv":
            if start >= rv:
                return word[:start], True
        elif group == "amente":
            if start >= r1:
                w = word[:start]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    return _try_del(w[:-2], ("at",), r2), True
                return _try_del(w, ("os", "ic", "ad"), r2), True
        elif group == "ita":
            if start >= r2:
                w = word[:start]
                return _try_del(w, ("abil", "ic", "iv"), r2), True
        elif group == "iv":
            if start >= r2:
                w = word[:start]
                if w.endswith("at") and len(w) - 2 >= r2:
                    return _try_del(w[:-2], ("ic",), r2), True
                return w, True
        return word, False  # longest suffix matched but region test failed
    return word, False


def _step2(word: str, rv: int) -> str:
    # verb-suffix matching is LIMITED to RV (spec: "longest among the
    # following suffixes in RV"): a match crossing the RV boundary is no
    # match — fall through to shorter in-RV suffixes (e.g. 'lavano':
    # 'avano' starts before RV, the in-RV 'ano' must still fire -> 'lav')
    for suf in _STEP2:
        if word.endswith(suf):
            start = len(word) - len(suf)
            if start < rv:
                continue
            return word[:start]
    return word


def _step3a(word: str, rv: int) -> str:
    for suf in ("a", "e", "i", "o", "à", "è", "ì", "ò"):
        if word.endswith(suf):
            if len(word) - 1 >= rv:
                word = word[:-1]
                if word.endswith("i") and len(word) - 1 >= rv:
                    word = word[:-1]
            return word
    return word


def _step3b(word: str, rv: int) -> str:
    for suf, rep in (("ch", "c"), ("gh", "g")):
        if word.endswith(suf) and len(word) - len(suf) >= rv:
            return word[: -len(suf)] + rep
    return word


def stem_italian(word: str) -> str:
    """Stem one lowercase Italian word (Snowball italian)."""
    if len(word) <= 2:
        return word.translate(_ACUTE_TO_GRAVE)
    word = _prelude(word)
    rv = _rv(word)
    r1 = _r_start(word, 0)
    r2 = _r_start(word, r1)

    word = _step0(word, rv)
    word, altered = _step1(word, r1, r2, rv)
    if not altered:
        word = _step2(word, rv)
    word = _step3a(word, rv)
    word = _step3b(word, rv)
    return word.translate(_POSTLUDE)


class ItalianStemmer:
    """Minimal interface twin of nltk's SnowballStemmer for italian."""

    def stem(self, word: str) -> str:
        return stem_italian(word)
