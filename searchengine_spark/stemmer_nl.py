"""Dutch Snowball stemmer, implemented from the published algorithm
description (snowballstem.org/algorithms/dutch/stemmer.html — public
specification; no code copied from any library).

Same role as the other vendored stemmers (stemmer.py, stemmer_es.py,
stemmer_fr.py, stemmer_pt.py, stemmer_de.py, stemmer_it.py): nltk-free
``--language dutch`` support; tokenizer._make_stemmer still prefers a
working nltk when present.

Structure per the spec: prelude removes umlaut/acute accents and marks
consonantal i/y as upper case (initial y, y after a vowel, i between
vowels); R1/R2 standard with R1's start moved so at least 3 letters
precede it; step 1 (heden->heid, en/ene after a valid en-ending with
undoubling, s/se after a valid s-ending); step 2 (final e after a
non-vowel, with undoubling, recording e_found); step 3a (heid when not
preceded by c, then an en-ending pass); step 3b (d-suffixes end/ing with
the chained ig deletion, ig, lijk + step-2 repeat, baar, bar gated on
e_found); step 4 (undouble vowel in a CVD ending); postlude lowers the
I/Y markers.

Suffix search inside each step is longest-match-wins with NO fallback to
a shorter suffix when the longest match's conditions fail (Snowball
``among`` semantics) — see e.g. 'gene', where the failing 'ene' rule must
not fall back to 'e'.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyè")
_ACCENTS = str.maketrans({
    "ä": "a", "ë": "e", "ï": "i", "ö": "o", "ü": "u",
    "á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u",
})
_POSTLUDE = str.maketrans({"I": "i", "Y": "y"})


def _prelude(word: str) -> str:
    word = word.translate(_ACCENTS)
    out = list(word)
    if out and out[0] == "y":
        out[0] = "Y"
    for i in range(1, len(out)):
        if word[i - 1] not in _VOWELS:
            continue
        if word[i] == "y":
            out[i] = "Y"
        elif word[i] == "i" and i + 1 < len(word) and word[i + 1] in _VOWELS:
            out[i] = "I"
    return "".join(out)


def _r_start(word: str, begin: int) -> int:
    for i in range(begin, len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            return i + 2
    return len(word)


def _undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def _valid_en_ending(stem: str) -> bool:
    """non-vowel before the suffix, and the stem must not end 'gem'."""
    return (
        bool(stem)
        and stem[-1] not in _VOWELS
        and not stem.endswith("gem")
    )


def _step1(word: str, r1: int) -> str:
    if word.endswith("heden"):
        if len(word) - 5 >= r1:
            return word[:-5] + "heid"
        return word
    for suf in ("ene", "en"):
        if word.endswith(suf):
            stem = word[: -len(suf)]
            if len(stem) >= r1 and _valid_en_ending(stem):
                return _undouble(stem)
            return word
    for suf in ("se", "s"):
        if word.endswith(suf):
            stem = word[: -len(suf)]
            if len(stem) >= r1 and stem and stem[-1] not in _VOWELS and stem[-1] != "j":
                return stem
            return word
    return word


def _step2(word: str, r1: int):
    """-> (word, e_found)."""
    if word.endswith("e") and len(word) - 1 >= r1 and len(word) >= 2 and word[-2] not in _VOWELS:
        return _undouble(word[:-1]), True
    return word, False


def _step3a(word: str, r1: int, r2: int) -> str:
    if word.endswith("heid") and len(word) - 4 >= r2 and not word.endswith("cheid"):
        word = word[:-4]
        if word.endswith("en"):
            stem = word[:-2]
            if len(stem) >= r1 and _valid_en_ending(stem):
                word = _undouble(stem)
    return word


def _step3b(word: str, r1: int, r2: int, e_found: bool) -> str:
    for suf in ("end", "ing"):
        if word.endswith(suf):
            if len(word) - 3 >= r2:
                word = word[:-3]
                if (
                    word.endswith("ig")
                    and len(word) - 2 >= r2
                    and not word.endswith("eig")
                ):
                    word = word[:-2]
                else:
                    word = _undouble(word)
            return word
    if word.endswith("lijk"):
        if len(word) - 4 >= r2:
            word, _ = _step2(word[:-4], r1)
        return word
    if word.endswith("baar"):
        if len(word) - 4 >= r2:
            word = word[:-4]
        return word
    if word.endswith("bar"):
        if len(word) - 3 >= r2 and e_found:
            word = word[:-3]
        return word
    if word.endswith("ig") and len(word) - 2 >= r2 and not word.endswith("eig"):
        return word[:-2]
    return word


def _step4(word: str) -> str:
    """undouble vowel: ...C vv D with C non-vowel, D a non-vowel other
    than I, vv a double a/e/o/u -> drop one of the pair."""
    if len(word) >= 4:
        c, v1, v2, d = word[-4], word[-3], word[-2], word[-1]
        if (
            c not in _VOWELS
            and d not in _VOWELS
            and d != "I"
            and v1 == v2
            and v1 in "aeou"
        ):
            return word[:-2] + word[-1]
    return word


def stem_dutch(word: str) -> str:
    word = word.lower()
    if not word:
        return word
    word = _prelude(word)
    r1_raw = _r_start(word, 0)
    r1 = max(r1_raw, 3)  # at least 3 letters before R1
    r2 = _r_start(word, r1_raw)  # R2 continues from the UNadjusted R1
    word = _step1(word, r1)
    word, e_found = _step2(word, r1)
    word = _step3a(word, r1, r2)
    word = _step3b(word, r1, r2, e_found)
    word = _step4(word)
    return word.translate(_POSTLUDE)


class DutchStemmer:
    """Duck-typed like nltk's SnowballStemmer (a .stem method)."""

    def stem(self, word: str) -> str:
        return stem_dutch(word)
