"""Portuguese Snowball stemmer, implemented from the published algorithm
description (snowballstem.org/algorithms/portuguese/stemmer.html — public
specification; no code copied from any library).

Same role as stemmer_es.py / stemmer_fr.py: the reference stems via nltk's
SnowballStemmer for any ``--language`` it supports
(/root/reference/src/models/tokenizer.py:59-70); this removes the nltk
dependency for Portuguese. tokenizer._make_stemmer still prefers a working
nltk when present (exact reference parity); tests/test_stemmer_langs.py
carries hand-traced golden vectors plus the auto-activating nltk
cross-check.

Structure per the spec: prelude maps the nasalised vowels ã/õ to the
two-character forms a~/o~ (the tilde then acts as a consonant for region
computation); RV/R1/R2 regions as in Spanish; step 1 (standard suffixes,
longest match); step 2 (verb suffixes, only if step 1 removed nothing);
step 3 (i after c, if step 1 or 2 altered); step 4 (residual suffix, if
neither altered); step 5 (final e/é/ê with the gu/ci adjustment, or
ç -> c); postlude restores ã/õ. Unlike Spanish, accents are NOT removed.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouáéíóúâêô")

# step 1: (suffix, group) — longest match across the whole table wins
_STEP1 = sorted(
    [(s, "del_r2") for s in (
        "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
        "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
        "amento", "amentos", "imento", "imentos", "adora", "ador",
        "aça~o", "adoras", "adores", "aço~es", "ante", "antes", "ância",
    )]
    + [("logia", "log"), ("logias", "log")]
    + [("uça~o", "u"), ("uço~es", "u")]
    + [("ência", "ente"), ("ências", "ente")]
    + [("amente", "amente"), ("mente", "mente")]
    + [("idade", "idad"), ("idades", "idad")]
    + [(s, "iv") for s in ("iva", "ivo", "ivas", "ivos")]
    + [("ira", "ira"), ("iras", "ira")],
    key=lambda t: -len(t[0]),
)

_STEP2 = sorted(
    (
        "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
        "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
        "iste", "ei", "arei", "erei", "irei", "am", "ado", "ido", "ando",
        "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as",
        "adas", "idas", "ias", "arias", "erias", "irias", "arás", "aras",
        "erás", "eras", "irás", "avas", "es", "ardes", "erdes", "irdes",
        "ares", "eres", "ires", "asses", "esses", "isses", "astes",
        "estes", "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis",
        "iríeis", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
        "ásseis", "ésseis", "ísseis", "áveis", "íamos", "aríamos",
        "eríamos", "iríamos", "áramos", "éramos", "íramos", "ávamos",
        "emos", "aremos", "eremos", "iremos", "ássemos", "êssemos",
        "íssemos", "imos", "armos", "ermos", "irmos", "amos", "aram",
        "eram", "iram", "avam", "em", "arem", "erem", "irem", "assem",
        # NB the published list genuinely ends "... eu iu ou ira iras":
        # unaccented ira/iras are the pluperfect forms (partira), symmetric
        # with the listed ara/era/aras/eras; step 1's "ira preceded by e ->
        # ir" rewrite handles the -eira noun family BEFORE step 2 runs
        "essem", "issem", "eu", "iu", "ou", "ira", "iras",
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


def _try_del(word: str, sufs, region: int) -> str:
    for s in sufs:
        if word.endswith(s) and len(word) - len(s) >= region:
            return word[: -len(s)]
    return word


def _step1(word: str, r1: int, r2: int, rv: int) -> tuple[str, bool]:
    for suf, group in _STEP1:
        if not word.endswith(suf):
            continue
        start = len(word) - len(suf)
        if group == "del_r2":
            if start >= r2:
                return word[:start], True
        elif group in ("log", "u", "ente"):
            if start >= r2:
                return word[:start] + group, True
        elif group == "amente":
            if start >= r1:
                w = word[:start]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    return _try_del(w[:-2], ("at",), r2), True
                return _try_del(w, ("os", "ic", "ad"), r2), True
        elif group == "mente":
            if start >= r2:
                w = word[:start]
                return _try_del(w, ("ante", "avel", "ível"), r2), True
        elif group == "idad":
            if start >= r2:
                w = word[:start]
                return _try_del(w, ("abil", "ic", "iv"), r2), True
        elif group == "iv":
            if start >= r2:
                w = word[:start]
                return _try_del(w, ("at",), r2), True
        elif group == "ira":
            # replace with ir if in RV and preceded by 'e'
            if start >= rv and start >= 1 and word[start - 1] == "e":
                return word[:start] + "ir", True
        return word, False  # longest suffix matched but conditions failed
    return word, False


def _step2(word: str, rv: int) -> tuple[str, bool]:
    # verb-suffix matching is LIMITED to RV (spec: "longest among the
    # following suffixes in RV"): a match crossing the RV boundary is no
    # match — fall through to shorter in-RV suffixes (e.g. 'lavam': 'avam'
    # starts before RV, the in-RV 'am' must still fire -> 'lav')
    for suf in _STEP2:
        if word.endswith(suf):
            start = len(word) - len(suf)
            if start < rv:
                continue
            return word[:start], True
    return word, False


def _step5(word: str, rv: int) -> str:
    for suf in ("e", "é", "ê"):
        if word.endswith(suf):
            if len(word) - 1 >= rv:
                w = word[:-1]
                # gu/ci adjustment: drop the u/i when it lies in RV
                if (w.endswith("gu") or w.endswith("ci")) and len(w) - 1 >= rv:
                    w = w[:-1]
                return w
            return word
    if word.endswith("ç"):
        return word[:-1] + "c"
    return word


def stem_portuguese(word: str) -> str:
    """Stem one lowercase Portuguese word (Snowball portuguese)."""
    if len(word) <= 2:
        return word
    word = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv(word)
    r1 = _r_start(word, 0)
    r2 = _r_start(word, r1)

    word, altered = _step1(word, r1, r2, rv)
    if not altered:
        word, altered = _step2(word, rv)
    if altered:
        # step 3: i after c, in RV
        if word.endswith("i") and len(word) - 1 >= rv and word[:-1].endswith("c"):
            word = word[:-1]
    else:
        # step 4: residual suffix
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if word.endswith(suf):
                if len(word) - len(suf) >= rv:
                    word = word[: -len(suf)]
                break
    word = _step5(word, rv)
    return word.replace("a~", "ã").replace("o~", "õ")


class PortugueseStemmer:
    """Minimal interface twin of nltk's SnowballStemmer for portuguese."""

    def stem(self, word: str) -> str:
        return stem_portuguese(word)
