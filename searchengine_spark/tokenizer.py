"""Tokenizer with exact parity to the reference tokenizer.

Reference semantics (src/models/tokenizer.py:41-72):
  1. every char in ``string.punctuation`` -> single space (tokenizer.py:49)
  2. lowercase (tokenizer.py:50)
  3. ``re.findall(r'\\S+|\\t|\\n')`` — note tabs/newlines survive step 1 and
     become *standalone tokens* (tokenizer.py:51)
  4. if min_token_length is not None: keep ``len(tok) >= min_token_length``
     (tokenizer.py:53-54; NB ``0 != None`` so 0 still runs the filter)
  5. if stop_words: exact match drop, post-lowercase (tokenizer.py:56-57)
  6. if stem_lang: Snowball stem with a per-instance memo dict
     (tokenizer.py:59-70)

Two implementations, asserted identical in tests/test_tokenizer.py:

- :func:`tokenize_text` / :func:`tokenize_pandas_udf` — pure Python / Arrow
  pandas UDF, char-identical to the reference for every input (the parity
  path used by the correctness gates).
- :func:`tokenize_col` — native Column expression (translate + lower + split
  + filter), JVM-side / codegen'd, used in the hot indexing path. Identical
  to the parity path whenever ``min_token_length >= 2`` (the tab/newline
  standalone tokens of step 3 are length-1, so the length filter erases the
  only observable difference); it refuses smaller min lengths.

Stemming requires nltk (import-gated); the sandbox gate runs stem_lang=None.
"""

from __future__ import annotations

import re
import string
from dataclasses import dataclass, field
from typing import Iterable, List, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

PUNCTUATION = string.punctuation  # !"#$%&'()*+,-./:;<=>?@[\]^_`{|}~  (32 chars)
_PUNCT_TO_SPACE = str.maketrans({c: " " for c in PUNCTUATION})
_TOKEN_RE = re.compile(r"\S+|\t|\n")

# Regex char-class equivalent of string.punctuation, usable in Spark SQL
# regexp_replace AND DuckDB regexp_replace (tested identical in
# tests/test_entry_contract.py). `]` `\` `^` `-` escaped for class position.
PUNCT_CLASS = r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""


@dataclass(frozen=True)
class TokenizerConfig:
    """Mirror of the reference Tokenizer ctor (src/models/tokenizer.py:18-39)."""

    min_token_length: Optional[int] = None
    stop_words: Optional[frozenset] = None
    stem_lang: Optional[str] = None

    @staticmethod
    def load_stop_words(path: str) -> frozenset:
        # reference: file.read().split("\n") — keeps the trailing '' entry;
        # harmless since tokens are never empty (src/models/tokenizer.py:35-37)
        with open(path) as fh:
            return frozenset(fh.read().split("\n"))

    def to_manifest(self) -> dict:
        # the full (sorted) stop-word list is persisted so a search job can
        # reconstruct the EXACT build-time tokenizer from the manifest alone
        # (jobs/search.py defaults to it; flag/build mismatch silently skews
        # results otherwise)
        return {
            "min_token_length": self.min_token_length,
            "n_stop_words": len(self.stop_words) if self.stop_words else 0,
            "stop_words": sorted(self.stop_words) if self.stop_words else None,
            "stem_lang": self.stem_lang,
        }

    @staticmethod
    def from_manifest(m: dict) -> "TokenizerConfig":
        sw = m.get("stop_words")
        if sw is None and m.get("n_stop_words", 0) > 0:
            # pre-round-2 manifest: the build used a stop list but only its
            # COUNT was persisted. Reconstructing a stop-word-free tokenizer
            # would silently skew query tokenization vs the build (ADVICE
            # r02) — fail loudly instead.
            raise ValueError(
                f"manifest records n_stop_words={m['n_stop_words']} but no "
                "'stop_words' list (index built before the list was "
                "persisted); pass the original stop-word file explicitly "
                "instead of relying on the manifest"
            )
        return TokenizerConfig(
            min_token_length=m.get("min_token_length"),
            stop_words=frozenset(sw) if sw is not None else None,
            stem_lang=m.get("stem_lang"),
        )


import functools


@functools.lru_cache(maxsize=None)  # stemmers are stateless; nltk's ctor +
# probe are expensive enough to dominate per-row callers otherwise
def _make_stemmer(lang: str):
    """nltk's SnowballStemmer when available (exact reference parity —
    the reference stems through nltk, src/models/tokenizer.py:59-70);
    otherwise the vendored from-spec Snowball implementations: english
    (Porter2, stemmer.py), spanish (stemmer_es.py), french
    (stemmer_fr.py), portuguese (stemmer_pt.py), german (stemmer_de.py),
    italian (stemmer_it.py), dutch (stemmer_nl.py)."""
    try:
        from nltk.stem.snowball import SnowballStemmer  # type: ignore

        st = SnowballStemmer(language=lang)
        st.stem("test")  # probe: a stubbed/broken nltk fails here, not later
        return st
    except Exception as exc:
        if lang == "english":
            from .stemmer import EnglishStemmer

            return EnglishStemmer()
        if lang == "spanish":
            from .stemmer_es import SpanishStemmer

            return SpanishStemmer()
        if lang == "french":
            from .stemmer_fr import FrenchStemmer

            return FrenchStemmer()
        if lang == "portuguese":
            from .stemmer_pt import PortugueseStemmer

            return PortugueseStemmer()
        if lang == "german":
            from .stemmer_de import GermanStemmer

            return GermanStemmer()
        if lang == "italian":
            from .stemmer_it import ItalianStemmer

            return ItalianStemmer()
        if lang == "dutch":
            from .stemmer_nl import DutchStemmer

            return DutchStemmer()
        if lang == "swedish":
            from .stemmer_sv import SwedishStemmer

            return SwedishStemmer()
        if lang == "russian":
            from .stemmer_ru import RussianStemmer

            return RussianStemmer()
        raise ImportError(
            f"stem_lang={lang!r} requires a working nltk (not installed); "
            "vendored fallbacks cover english/spanish/french/portuguese/"
            "german/italian/dutch/swedish/russian (stemmer.py, "
            "stemmer_{es,fr,pt,de,it,nl,sv,ru}.py)"
        ) from exc


def tokenize_text(text: str, cfg: TokenizerConfig, _memo: Optional[dict] = None) -> List[str]:
    """Reference-identical tokenize of one string (src/models/tokenizer.py:41-72)."""
    lowered = text.translate(_PUNCT_TO_SPACE).lower()
    tokens: Iterable[str] = _TOKEN_RE.findall(lowered)
    if cfg.min_token_length is not None:
        m = cfg.min_token_length
        tokens = (t for t in tokens if len(t) >= m)
    if cfg.stop_words is not None:
        sw = cfg.stop_words
        tokens = (t for t in tokens if t not in sw)
    if cfg.stem_lang is not None:
        stemmer = _make_stemmer(cfg.stem_lang)
        memo = _memo if _memo is not None else {}
        out = []
        for t in tokens:
            s = memo.get(t)
            if s is None:
                s = stemmer.stem(t)
                memo[t] = s
            out.append(s)
        return out
    return list(tokens)


def tokenize_pandas_udf(cfg: TokenizerConfig):
    """Arrow-batched pandas UDF: text -> array<string> (the parity path).

    The stemmer memo dict is per-batch-iterator (matches the reference's
    per-process memo, src/models/tokenizer.py:59-70, amortizing Snowball).
    """
    min_len = cfg.min_token_length
    stop_words = cfg.stop_words
    stem_lang = cfg.stem_lang

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tokenize(texts: pd.Series) -> pd.Series:
        memo: dict = {}
        stemmer = _make_stemmer(stem_lang) if stem_lang is not None else None

        def one(text):
            if text is None:
                return []
            lowered = text.translate(_PUNCT_TO_SPACE).lower()
            toks = _TOKEN_RE.findall(lowered)
            if min_len is not None:
                toks = [t for t in toks if len(t) >= min_len]
            if stop_words is not None:
                toks = [t for t in toks if t not in stop_words]
            if stemmer is not None:
                out = []
                for t in toks:
                    s = memo.get(t)
                    if s is None:
                        s = stemmer.stem(t)
                        memo[t] = s
                    out.append(s)
                return out
            return toks

        return texts.map(one)

    return _tokenize


def tokenize_col(col: Column, cfg: TokenizerConfig) -> Column:
    """Native Column tokenizer (JVM-side, whole-stage-codegen'd).

    translate(punct->space) -> lower -> split(\\s+) -> filter(len/stop-words).
    Equals the parity path for min_token_length >= 2 (see module docstring).
    Stays entirely inside Catalyst: no Python in the hot indexing path.
    """
    if cfg.stem_lang is not None:
        raise ValueError("native tokenizer does not stem; use tokenize_pandas_udf")
    if cfg.min_token_length is None or cfg.min_token_length < 2:
        raise ValueError(
            "native tokenizer requires min_token_length >= 2 (tab/newline "
            "standalone-token parity); use tokenize_pandas_udf below that"
        )
    cleaned = F.lower(F.translate(col, PUNCTUATION, " " * len(PUNCTUATION)))
    # Java \s is ASCII-only; the parity contract is Python's \S+ (reference
    # tokenizer.py:50), whose whitespace set is Unicode White_Space plus
    # U+001C-001F. (?U) makes Java \s match White_Space; the class adds the
    # four separator controls. Without this, 'foo bar' indexes as ONE
    # token while the Python query path sees two — silent recall loss.
    toks = F.split(cleaned, r"(?U)[\s\x1c-\x1f]+")
    m = cfg.min_token_length
    if cfg.stop_words:
        sw = sorted(cfg.stop_words)
        # isin over a >10-element list compiles to Catalyst InSet (hash set)
        pred = lambda t: (F.length(t) >= m) & ~t.isin(*sw)  # noqa: E731
    else:
        pred = lambda t: F.length(t) >= m  # noqa: E731
    return F.filter(toks, pred)


def tokens_column(col: Column, cfg: TokenizerConfig) -> Column:
    """Pick the fastest implementation that is exact for ``cfg``."""
    if cfg.stem_lang is None and cfg.min_token_length is not None and cfg.min_token_length >= 2:
        return tokenize_col(col, cfg)
    return tokenize_pandas_udf(cfg)(col)
