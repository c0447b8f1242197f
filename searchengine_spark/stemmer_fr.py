"""French Snowball stemmer, implemented from the published algorithm
description (snowballstem.org/algorithms/french/stemmer.html — public
specification; no code copied from any library).

Same role as stemmer.py (english) and stemmer_es.py (spanish):
dependency-free fallback for the reference's nltk SnowballStemmer
(/root/reference/src/models/tokenizer.py:59-70); nltk still wins when a
working one is importable. Implements the algorithm generation nltk's
SnowballStemmer carries (no ë/Hï handling, which later spec revisions
added) so the cross-check in tests/test_stemmer_langs.py holds when nltk
is present.

Shape per the spec: prelude marks non-vocalic u/i/y as U/I/Y (and u after
q as U); RV/R1/R2 regions; step 1 standard-suffix removal (longest match
across all groups); steps 2a/2b verb suffixes (gated on step 1's outcome,
all tests inside RV); step 3 (Y->i, ç->c) when the word changed, else
step 4 (residual s, ion/ier/ière/e); step 5 un-doubles enn/onn/ett/ell/
eill; step 6 un-accents é/è before final non-vowels; postlude lowers the
marker letters.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyâàëéêèïîôûù")


def _prelude(word: str) -> str:
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        if c in "ui" and 0 < i < n - 1:
            if chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
                chars[i] = c.upper()
                continue
        if c == "y":
            if (i > 0 and chars[i - 1] in _VOWELS) or (
                i < n - 1 and chars[i + 1] in _VOWELS
            ):
                chars[i] = "Y"
                continue
        if c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _r_start(word: str, begin: int) -> int:
    for i in range(begin, len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            return i + 2
    return len(word)


def _rv(word: str) -> int:
    n = len(word)
    if n >= 3 and word[:3] in ("par", "col", "tap"):
        return 3
    if n >= 2 and word[0] in _VOWELS and word[1] in _VOWELS:
        return min(3, n)
    # region after the first vowel not at the beginning of the word
    for i in range(1, n):
        if word[i] in _VOWELS:
            return i + 1
    return n


_STEP1 = sorted(
    [(s, "del_r2") for s in (
        "ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe",
        "isme", "able", "iste", "eux",
    )]
    + [(s, "ateur") for s in (
        "atrices", "ateurs", "ations", "atrice", "ateur", "ation",
    )]
    + [("logies", "log"), ("logie", "log")]
    + [(s, "u") for s in ("usions", "utions", "usion", "ution")]
    + [("ences", "ent"), ("ence", "ent")]
    + [("ements", "ement"), ("ement", "ement")]
    + [("ités", "ité"), ("ité", "ité")]
    + [(s, "if") for s in ("ives", "ifs", "ive", "if")]
    + [("eaux", "eaux")]
    + [("aux", "aux")]
    + [("euses", "euse"), ("euse", "euse")]
    + [("issements", "issement"), ("issement", "issement")]
    + [("amment", "amment"), ("emment", "emment")]
    + [("ments", "ment"), ("ment", "ment")],
    key=lambda t: -len(t[0]),
)

_MENT_SUFFIXES = frozenset(("amment", "emment", "ment", "ments"))

_STEP2A = sorted(
    ("îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
     "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
     "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
     "issant", "issante", "issantes", "issants", "isse", "issent",
     "isses", "issez", "issiez", "issions", "issons", "it"),
    key=len, reverse=True,
)

_STEP2B_DEL = (
    "é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
    "erais", "erait", "eras", "erez", "eriez", "erions", "erons", "eront",
    "ez", "iez",
)
_STEP2B_E = (
    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant", "ante",
    "antes", "ants", "as", "asse", "assent", "asses", "assiez", "assions",
)
_STEP2B = sorted(
    [("ions", "ions")] + [(s, "del") for s in _STEP2B_DEL]
    + [(s, "a") for s in _STEP2B_E],
    key=lambda t: -len(t[0]),
)


def _try_del(word: str, sufs, region: int) -> str:
    for s in sufs:
        if word.endswith(s) and len(word) - len(s) >= region:
            return word[: -len(s)]
    return word


def _step1(word: str, r1: int, r2: int, rv: int) -> tuple[str, bool, bool]:
    """-> (word, altered, ment_found)."""
    for suf, group in _STEP1:
        if not word.endswith(suf):
            continue
        start = len(word) - len(suf)
        ment = suf in _MENT_SUFFIXES
        if group == "del_r2":
            if start >= r2:
                return word[:start], True, ment
        elif group == "ateur":
            if start >= r2:
                w = word[:start]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                return w, True, ment
        elif group in ("log", "u", "ent"):
            if start >= r2:
                return word[:start] + group, True, ment
        elif group == "ement":
            if start >= rv:
                w = word[:start]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif w.endswith("eus"):
                    if len(w) - 3 >= r2:
                        w = w[:-3]
                    elif len(w) - 3 >= r1:
                        w = w[:-3] + "eux"
                elif w.endswith(("abl", "iqU")) and len(w) - 3 >= r2:
                    w = w[:-3]
                elif w.endswith(("ièr", "Ièr")) and len(w) - 3 >= rv:
                    w = w[:-3] + "i"
                return w, True, ment
        elif group == "ité":
            if start >= r2:
                w = word[:start]
                if w.endswith("abil"):
                    w = w[:-4] if len(w) - 4 >= r2 else w[:-4] + "abl"
                elif w.endswith("ic"):
                    w = w[:-2] if len(w) - 2 >= r2 else w[:-2] + "iqU"
                elif w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                return w, True, ment
        elif group == "if":
            if start >= r2:
                w = word[:start]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        w = w[:-2] if len(w) - 2 >= r2 else w[:-2] + "iqU"
                return w, True, ment
        elif group == "eaux":
            return word[:-1], True, ment  # eaux -> eau
        elif group == "aux":
            if start >= r1:
                return word[:start] + "al", True, ment
        elif group == "euse":
            if start >= r2:
                return word[:start], True, ment
            if start >= r1:
                return word[:start] + "eux", True, ment
        elif group == "issement":
            if start >= r1 and start > 0 and word[start - 1] not in _VOWELS:
                return word[:start], True, ment
        elif group == "amment":
            if start >= rv:
                return word[:start] + "ant", True, ment
        elif group == "emment":
            if start >= rv:
                return word[:start] + "ent", True, ment
        elif group == "ment":
            if start >= 1 and word[start - 1] in _VOWELS and start - 1 >= rv:
                return word[:start], True, ment
        return word, False, ment  # longest suffix matched; test failed
    return word, False, False


def _step2a(word: str, rv: int) -> tuple[str, bool]:
    # verb-suffix matching is LIMITED to RV (spec: "longest among ... in
    # RV"): an over-the-boundary match is no match — fall through to
    # shorter suffixes (unlike step 1's no-fallback longest-match)
    for suf in _STEP2A:
        if word.endswith(suf):
            start = len(word) - len(suf)
            if start < rv:
                continue
            if start >= 1 and word[start - 1] not in _VOWELS and start - 1 >= rv:
                return word[:start], True
            return word, False  # matched in RV; non-vowel condition failed
    return word, False


def _step2b(word: str, r2: int, rv: int) -> tuple[str, bool]:
    for suf, group in _STEP2B:
        if not word.endswith(suf):
            continue
        start = len(word) - len(suf)
        if start < rv:
            continue  # RV-limited match (see _step2a)
        if group == "ions":
            if start >= r2:
                return word[:start], True
            return word, False
        if group == "del":
            return word[:start], True
        # group "a": delete; a preceding e (in RV) goes too
        w = word[:start]
        if w.endswith("e") and len(w) - 1 >= rv:
            w = w[:-1]
        return w, True
    return word, False


def stem_french(word: str) -> str:
    """Stem one lowercase French word (Snowball french)."""
    if len(word) <= 2:
        return word
    word = _prelude(word)
    rv = _rv(word)
    r1 = _r_start(word, 0)
    r2 = _r_start(word, r1)

    word, altered, ment_found = _step1(word, r1, r2, rv)
    did_2a = False
    if not altered or ment_found:
        word, altered_2a = _step2a(word, rv)
        did_2a = True
        if not altered_2a:
            word, altered_2b = _step2b(word, r2, rv)
            altered = altered_2b
        else:
            altered = True
    if altered:
        # step 3
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # step 4: residual s
        if word.endswith("s") and len(word) >= 2 and word[-2] not in "aiouès":
            word = word[:-1]
        # residual suffixes, inside RV
        if word.endswith("ion") and len(word) - 3 >= rv:
            start = len(word) - 3
            if start >= r2 and start >= 1 and word[start - 1] in "st" \
                    and start - 1 >= rv:
                word = word[:start]
        else:
            for suf in ("ière", "Ière", "ier", "Ier"):
                if word.endswith(suf) and len(word) - len(suf) >= rv:
                    word = word[: -len(suf)] + "i"
                    break
            else:
                if word.endswith("e") and len(word) - 1 >= rv:
                    word = word[:-1]
                elif word.endswith("ë") and len(word) - 1 >= rv \
                        and word[:-1].endswith("gu"):
                    word = word[:-1]

    # step 5: un-double
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        word = word[:-1]
    # step 6: un-accent é/è before final non-vowels
    i = len(word) - 1
    seen_nonvowel = False
    while i >= 0:
        c = word[i]
        if c in "éè":
            if seen_nonvowel:
                word = word[:i] + "e" + word[i + 1:]
            break
        if c in _VOWELS:
            break
        seen_nonvowel = True
        i -= 1
    return word.lower()


class FrenchStemmer:
    """Minimal interface twin of nltk's SnowballStemmer for french."""

    def stem(self, word: str) -> str:
        return stem_french(word)
