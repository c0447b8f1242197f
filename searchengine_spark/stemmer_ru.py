"""Russian Snowball stemmer, implemented from the published algorithm
description (snowballstem.org/algorithms/russian/stemmer.html — public
specification; no code copied from any library).

The reference engine stems via nltk's SnowballStemmer with any
``--language`` it supports (/root/reference/src/models/tokenizer.py:59-70);
this module removes the nltk dependency for Russian the same way
stemmer.py does for English. tokenizer._make_stemmer still prefers nltk
when the environment has a working one (exact reference parity);
tests/test_stemmer_langs.py carries hand-traced golden vectors from the
algorithm description plus an nltk cross-check that auto-activates when
nltk is importable.

Structure per the spec (all steps operate inside RV; R2 gates only the
derivational step):

- ё is mapped to е up front (the spec's preliminary remark).
- RV = the region after the first vowel; R1 after the first
  non-vowel-following-a-vowel; R2 the same within R1.
- step 1: PERFECTIVE GERUND (group 1 endings require a preceding а/я
  which STAYS on the stem); if none, drop a REFLEXIVE ending (ся/сь)
  then try ADJECTIVAL (ADJECTIVE, optionally preceded by a PARTICIPLE
  — group-1 participles again а/я-gated), else VERB (same two-group
  а/я split), else NOUN.
- step 2: drop a final и.
- step 3: drop DERIVATIONAL ост/ость when it lies in R2.
- step 4: undouble нн; or drop a SUPERLATIVE ейш/ейше then undouble
  нн; or drop a final ь.
"""

from __future__ import annotations

_VOWELS = frozenset("аеиоуыэюя")

# ---- ending tables (each sorted longest-first for the longest-match
# rule). Group-1 entries list the BARE ending; the preceding а/я is a
# condition, not part of the removal.

_PERF_GERUND_1 = ("вшись", "вши", "в")
_PERF_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")

_ADJECTIVE = sorted(
    ("ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой",
     "ем", "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых",
     "ею", "ою", "ую", "юю", "ая", "яя"),
    key=len, reverse=True,
)

_PARTICIPLE_1 = sorted(("ем", "нн", "вш", "ющ", "щ"), key=len, reverse=True)
_PARTICIPLE_2 = sorted(("ивш", "ывш", "ующ"), key=len, reverse=True)

_REFLEXIVE = ("ся", "сь")

_VERB_1 = sorted(
    ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
     "ет", "ют", "ны", "ть", "ешь", "нно"),
    key=len, reverse=True,
)
_VERB_2 = sorted(
    ("ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
     "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
     "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю"),
    key=len, reverse=True,
)

_NOUN = sorted(
    ("а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
     "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
     "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
     "ью", "ю", "ия", "ья", "я"),
    key=len, reverse=True,
)

_SUPERLATIVE = ("ейше", "ейш")
_DERIVATIONAL = ("ость", "ост")


def _regions(word: str) -> tuple[int, int]:
    """-> (rv, r2) start indexes."""
    n = len(word)
    rv = n
    for i, ch in enumerate(word):
        if ch in _VOWELS:
            rv = i + 1
            break
    r1 = n
    for i in range(1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _drop_grouped(word: str, rv: int, group1, group2) -> "str | None":
    """Longest match over group1 (а/я-preceded, the vowel stays) and
    group2 endings within RV; None when nothing fired."""
    best = None  # (removed_len, new_word)
    in_rv = word[rv:]
    for suf in group1:
        if in_rv.endswith(suf):
            pre = len(word) - len(suf) - 1
            if pre >= rv and word[pre] in "ая":
                if best is None or len(suf) > best[0]:
                    best = (len(suf), word[: len(word) - len(suf)])
    for suf in group2:
        if in_rv.endswith(suf):
            if best is None or len(suf) > best[0]:
                best = (len(suf), word[: len(word) - len(suf)])
    return best[1] if best else None


def stem_russian(word: str) -> str:
    word = word.lower().replace("ё", "е")
    rv, r2 = _regions(word)
    if rv >= len(word):
        return word

    # ---- step 1 ----------------------------------------------------
    got = _drop_grouped(word, rv, _PERF_GERUND_1, _PERF_GERUND_2)
    if got is not None:
        word = got
    else:
        for suf in _REFLEXIVE:
            if word[rv:].endswith(suf):
                word = word[: len(word) - len(suf)]
                break
        done = False
        in_rv = word[rv:]
        for suf in _ADJECTIVE:
            if in_rv.endswith(suf):
                word = word[: len(word) - len(suf)]
                # optionally strip a preceding participle (group-1
                # а/я-gated; the vowel stays on the stem)
                got = _drop_grouped(word, rv, _PARTICIPLE_1, _PARTICIPLE_2)
                if got is not None:
                    word = got
                done = True
                break
        if not done:
            got = _drop_grouped(word, rv, _VERB_1, _VERB_2)
            if got is not None:
                word = got
                done = True
        if not done:
            in_rv = word[rv:]
            for suf in _NOUN:
                if in_rv.endswith(suf):
                    word = word[: len(word) - len(suf)]
                    break

    # ---- step 2: final и -------------------------------------------
    if word[rv:].endswith("и"):
        word = word[:-1]

    # ---- step 3: derivational (R2-gated) ---------------------------
    for suf in _DERIVATIONAL:
        if word[r2:].endswith(suf):
            word = word[: len(word) - len(suf)]
            break

    # ---- step 4 ----------------------------------------------------
    if word[rv:].endswith("нн"):
        word = word[:-1]
    else:
        dropped = False
        for suf in _SUPERLATIVE:
            if word[rv:].endswith(suf):
                word = word[: len(word) - len(suf)]
                dropped = True
                break
        if dropped and word[rv:].endswith("нн"):
            word = word[:-1]
        elif not dropped and word[rv:].endswith("ь"):
            word = word[:-1]
    return word


class RussianStemmer:
    """Duck-typed like nltk's SnowballStemmer (a .stem method)."""

    def stem(self, word: str) -> str:
        return stem_russian(word)
