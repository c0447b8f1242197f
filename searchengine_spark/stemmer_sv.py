"""Swedish Snowball stemmer, implemented from the published algorithm
description (snowballstem.org/algorithms/swedish/stemmer.html — public
specification; no code copied from any library).

The reference engine stems via nltk's SnowballStemmer with any
``--language`` it supports (/root/reference/src/models/tokenizer.py:59-70);
this module removes the nltk dependency for Swedish the same way
stemmer.py does for English. tokenizer._make_stemmer still prefers nltk
when the environment has a working one (exact reference parity);
tests/test_stemmer_langs.py carries hand-traced golden vectors from the
algorithm description plus an nltk cross-check that auto-activates when
nltk is importable.

Structure per the spec: R1 (with the "at least 3 letters before R1"
adjustment); step 1 (a-list longest-match delete in R1, or s-delete
after a valid s-ending); step 2 (shorten a double consonant from the
dd/gd/nn/dt/gt/kt/tt list in R1 by one letter); step 3 (lig/ig/els
delete in R1; löst->lös, fullt->full).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäåö")

#: step 1 list (a): longest match in R1 -> delete
_STEP1A = sorted(
    (
        "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
        "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
        "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas",
        "es", "ades", "andes", "ens", "arens", "hetens", "erns",
        "at", "andet", "het", "ast",
    ),
    key=len, reverse=True,
)

#: valid s-endings for the step 1 (b) rule: delete a final s only when
#: the letter before it is one of these
_S_ENDING = frozenset("bcdfghjklmnoprtvy")

_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")

_STEP3_DEL = ("lig", "ig", "els")


def _r1(word: str) -> int:
    """Start index of R1: after the first non-vowel following a vowel —
    adjusted so at least 3 letters precede it (the spec's Scandinavian
    tweak)."""
    r1 = len(word)
    for i in range(1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    return max(r1, min(3, len(word)))


def stem_swedish(word: str) -> str:
    word = word.lower()
    if len(word) <= 3:
        return word
    r1 = _r1(word)

    # ---- step 1 ----------------------------------------------------
    in_r1 = word[r1:]
    for suf in _STEP1A:
        if in_r1.endswith(suf):
            word = word[: len(word) - len(suf)]
            break
    else:
        if in_r1.endswith("s") and len(word) >= 2 \
                and word[-2] in _S_ENDING:
            word = word[:-1]

    # ---- step 2: shorten a listed double-ending by one letter ------
    if word[r1:].endswith(_STEP2):
        word = word[:-1]

    # ---- step 3 ----------------------------------------------------
    in_r1 = word[r1:]
    for suf in _STEP3_DEL:
        if in_r1.endswith(suf):
            word = word[: len(word) - len(suf)]
            return word
    if in_r1.endswith("löst"):
        word = word[:-1]
    elif in_r1.endswith("fullt"):
        word = word[:-1]
    return word


class SwedishStemmer:
    """Duck-typed like nltk's SnowballStemmer (a .stem method)."""

    def stem(self, word: str) -> str:
        return stem_swedish(word)
