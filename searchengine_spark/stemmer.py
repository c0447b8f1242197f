"""English Snowball stemmer ("Porter2"), implemented from the published
algorithm description (M.F. Porter, snowballstem.org/algorithms/english/
stemmer.html — public specification; no code copied from any library).

The reference engine stems via nltk's SnowballStemmer
(/root/reference/src/models/tokenizer.py:59-70, ``--language english`` is
the reference README's documented default run). nltk is not installable in
this sandbox, so this module provides the same published algorithm as a
dependency-free implementation; tokenizer._make_stemmer uses nltk when the
environment has it (exact reference parity) and falls back to this for
English otherwise. tests/test_stemmer.py carries golden vectors from the
algorithm description plus an nltk cross-check that auto-activates when
nltk is importable.

Algorithm reproduced faithfully, including the documented special cases:
exceptional forms (skis->ski, dying->die, ...), invariants (news, sky,
...), the step-1a stop list (inning, proceed, ...), the gener-/commun-/
arsen- R1 overrides, and words of <= 2 letters left unchanged.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_VALID = frozenset("cdeghkmnrt")

_SPECIAL = {
    "skis": "ski", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe",
    "atlas": "atlas", "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXC_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2 = (  # longest first; (suffix, replacement)
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
)

_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ful", ""), ("ness", ""), ("ative", ""),
)

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _r_start(word: str, begin: int) -> int:
    """Start of the region after the first non-vowel that follows a vowel,
    scanning from ``begin``; len(word) if none."""
    for i in range(begin, len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            return i + 2
    return len(word)


def _regions(word: str) -> tuple[int, int]:
    if word.startswith(("gener", "commun", "arsen")):
        r1 = 6 if word.startswith("commun") else 5
    else:
        r1 = _r_start(word, 0)
    return r1, _r_start(word, r1)


def _ends_short_syllable(word: str) -> bool:
    if len(word) == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if len(word) >= 3:
        return (
            word[-3] not in _VOWELS
            and word[-2] in _VOWELS
            and word[-1] not in _VOWELS
            and word[-1] not in "wxY"
        )
    return False


def _is_short(word: str) -> bool:
    r1, _ = _regions(word)
    return r1 >= len(word) and _ends_short_syllable(word)


def _contains_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


def stem_english(word: str) -> str:
    """Stem one lowercase word (Porter2). Input is expected lowercase (the
    tokenizer lowercases before stemming, like the reference)."""
    if word.startswith("'"):
        word = word[1:]
    if len(word) <= 2:
        return word
    if word in _SPECIAL:
        return _SPECIAL[word]

    # prelude: mark consonant-y as Y (initial y, or y after a vowel)
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    # step 0: 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXC_1A:
        return word

    # step 1b
    r1, r2 = _regions(word)
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if word.endswith(suf):
            if suf in ("eed", "eedly"):
                if len(word) - len(suf) >= r1:
                    word = word[: -len(suf)] + "ee"
            else:
                stem = word[: -len(suf)]
                if _contains_vowel(stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word):
                        word += "e"
            break

    # step 1c: y -> i after a non-vowel that is not the word's first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # step 2 (suffix must lie in R1; longest match wins, no fallback)
    r1, r2 = _regions(word)
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_VALID:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 3 (in R1; 'ative' additionally requires R2)
    r1, r2 = _regions(word)
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 4 (in R2; 'ion' only after s/t)
    r1, r2 = _regions(word)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    r1, r2 = _regions(word)
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


class EnglishStemmer:
    """Minimal interface twin of nltk's SnowballStemmer for english."""

    def stem(self, word: str) -> str:
        return stem_english(word)
