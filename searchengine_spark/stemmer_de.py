"""German Snowball stemmer, implemented from the published algorithm
description (snowballstem.org/algorithms/german/stemmer.html — public
specification; no code copied from any library).

Same role as the other vendored stemmers (stemmer.py, stemmer_es.py,
stemmer_fr.py, stemmer_pt.py): nltk-free ``--language german`` support;
tokenizer._make_stemmer still prefers a working nltk when present.

Structure per the spec: prelude replaces ß with ss and upper-cases u/y
between vowels (marking them as consonants for region computation); R1/R2
standard, with R1's start moved so at least 3 letters precede it; step 1
(e/em/en/ern/er/es, s after a valid s-ending, with the niss→nis
adjustment); step 2 (en/er/est, st after a valid st-ending preceded by ≥3
letters); step 3 (d-suffixes end/ung/ig/ik/isch/lich/heit/keit with their
chained deletions); postlude lowers the markers and removes umlauts.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = frozenset("bdfghkmnt")
_POSTLUDE = str.maketrans({"ä": "a", "ö": "o", "ü": "u", "U": "u", "Y": "y"})


def _prelude(word: str) -> str:
    word = word.replace("ß", "ss")
    out = list(word)
    for i in range(1, len(word) - 1):
        if word[i] in ("u", "y") and word[i - 1] in _VOWELS and word[i + 1] in _VOWELS:
            out[i] = word[i].upper()
    return "".join(out)


def _r_start(word: str, begin: int) -> int:
    for i in range(begin, len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            return i + 2
    return len(word)


def _step1(word: str, r1: int) -> str:
    for suf in ("ern", "em", "er"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                return word[: -len(suf)]
            return word
    for suf in ("en", "es", "e"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                w = word[: -len(suf)]
                if w.endswith("niss"):  # bedürfnissen -> bedürfnis
                    w = w[:-1]
                return w
            return word
    if word.endswith("s"):
        if len(word) - 1 >= r1 and len(word) >= 2 and word[-2] in _S_ENDING:
            return word[:-1]
    return word


def _step2(word: str, r1: int) -> str:
    for suf in ("est", "en", "er"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                return word[: -len(suf)]
            return word
    if word.endswith("st"):
        if len(word) - 2 >= r1 and len(word) >= 6 and word[-3] in _ST_ENDING:
            return word[:-2]
    return word


def _step3(word: str, r1: int, r2: int) -> str:
    for suf in ("end", "ung"):
        if word.endswith(suf):
            if len(word) - 3 >= r2:
                w = word[:-3]
                if (
                    w.endswith("ig")
                    and len(w) - 2 >= r2
                    and not w[:-2].endswith("e")
                ):
                    w = w[:-2]
                return w
            return word
    for suf in ("isch", "ik", "ig"):
        if word.endswith(suf):
            start = len(word) - len(suf)
            if start >= r2 and not word[:start].endswith("e"):
                return word[:start]
            return word
    for suf in ("lich", "heit"):
        if word.endswith(suf):
            if len(word) - 4 >= r2:
                w = word[:-4]
                for pre in ("er", "en"):
                    if w.endswith(pre) and len(w) - 2 >= r1:
                        return w[:-2]
                return w
            return word
    if word.endswith("keit"):
        if len(word) - 4 >= r2:
            w = word[:-4]
            for pre in ("lich", "ig"):
                if w.endswith(pre) and len(w) - len(pre) >= r2:
                    return w[: -len(pre)]
            return w
    return word


def stem_german(word: str) -> str:
    """Stem one lowercase German word (Snowball german)."""
    # the ss-replacement happens BEFORE the short-word return: 'aß' is a
    # real 2-char token that must come out 'ass' like the full pipeline
    word = word.replace("ß", "ss")
    if len(word) <= 2:
        return word.translate(_POSTLUDE)
    word = _prelude(word)
    r1 = _r_start(word, 0)
    r1 = max(r1, 3)  # at least 3 letters before R1
    r2 = _r_start(word, _r_start(word, 0))

    word = _step1(word, r1)
    word = _step2(word, r1)
    word = _step3(word, r1, r2)
    return word.translate(_POSTLUDE)


class GermanStemmer:
    """Minimal interface twin of nltk's SnowballStemmer for german."""

    def stem(self, word: str) -> str:
        return stem_german(word)
