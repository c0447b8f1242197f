"""Regexp term queries — the ES ``regexp`` / Lucene ``query_string``
``/pattern/`` analog, answered by dictionary expansion + the
weighted-term WAND seam (the wildcard machinery's general sibling,
query/wildcard.py).

Syntax: a whitespace-delimited query word wrapped in ``/`` slashes
(``/pend(ing|ed)/``) is a regexp PATTERN; everything else is the
ordinary positive query. Parsing happens on the RAW query string like
negation/wildcards (the tokenize chain maps punctuation to spaces, so
slashes and metacharacters would silently vanish).

Semantics (ES regexp-query contract; gated in tests/test_regexp.py):

- patterns match the ENTIRE term (ES: "the pattern must match the whole
  string" — Lucene regexps are implicitly anchored). We anchor as
  ``^(?:pat)$`` for Spark ``rlike`` and Python; the oracle uses
  DuckDB's ``regexp_full_match``. Explicit ``^``/``$`` anchors are
  therefore REFUSED (outside character classes) — they'd be redundant
  at best and engine-divergent at worst.
- patterns match the INDEX DICTIONARY (normalized/stemmed term space)
  and are not analyzed, only lowercased — the multi-term-query contract
  wildcards already pin.
- each pattern expands to at most ``max_expansions`` live terms
  (df desc, term asc — the deterministic ranking every expansion
  surface here uses); expansions join the query's unique-term list at
  weight 1.0 and score ordinary BM25 OR (Lucene ``scoring_boolean``).
- the supported syntax is the documented Java∩Python∩RE2 COMMON SUBSET
  — literals, ``.``, ``[...]``/``[^...]`` classes, ``(?:...)``/
  ``(...)`` groups, ``|``, ``*``/``+``/``?``/``{m,n}`` quantifiers
  (greedy or lazy), and ``\\``-escaped punctuation. Constructs whose
  meaning DIVERGES across engines are refused up front: ``\\d``/
  ``\\w``/``\\s``/``\\b`` (ASCII in Java, Unicode in Python),
  backreferences and lookaround (absent in RE2). Refusing loudly is
  the cross-engine-arithmetic discipline applied to regex dialects.
- scale guard: expansion pushes the pattern's LITERAL PREFIX into the
  term_stats scan (``StringStartsWith`` row-group pruning over the
  term-sorted layout — the sorted-dictionary scan Lucene does with its
  term automaton). A pattern with NO literal prefix (``/.*ing/``,
  ``/(a|b)c/``) is a full dictionary scan and is refused unless
  ``allow_leading_wildcard=True`` — the same default-closed guard the
  wildcard surface has.

No reference counterpart (the reference matches exact terms only).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig

_WORDS = re.compile(r"\S+")

DEFAULT_MAX_EXPANSIONS = 50

#: metacharacters that end a literal prefix (anything that is not a
#: plain self-matching character)
_META = set(".[](){}|*+?\\")
_QUANT = set("*+?{")


def is_regexp_word(word: str) -> bool:
    """A query word is a regexp pattern iff it is ``/pat/`` (len >= 3)."""
    return len(word) >= 3 and word.startswith("/") and word.endswith("/")


def split_regexps(query: str) -> Tuple[str, List[str]]:
    """Raw query -> (positive query string, lowercased inner patterns).

    ``"solo /gui.*/"`` -> ``("solo", ["gui.*"])``. A bare ``/`` or
    ``//`` is punctuation, not a pattern."""
    pos: List[str] = []
    pats: List[str] = []
    for w in _WORDS.findall(query):
        if w.startswith("-/") and is_regexp_word(w[1:]):
            raise ValueError(
                f"negated regexp {w!r} is unsupported — exclusion "
                "never expands (the negation contract)")
        if is_regexp_word(w):
            pats.append(w[1:-1].lower())
        else:
            pos.append(w)
    return " ".join(pos), pats


def validate_regexp(pattern: str) -> None:
    """Refuse anything outside the Java∩Python∩RE2 common subset (module
    docstring) — loud refusal beats silent cross-engine divergence."""
    if not pattern:
        raise ValueError("empty regexp pattern")
    in_class = False
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            if i + 1 >= len(pattern):
                raise ValueError(f"{pattern!r}: trailing backslash")
            nxt = pattern[i + 1]
            if nxt.isalnum() or not nxt.isascii():
                raise ValueError(
                    f"{pattern!r}: \\{nxt} is engine-divergent (Java is "
                    "ASCII where Python is Unicode; RE2 lacks "
                    "backreferences) — only \\-escaped ASCII punctuation "
                    "is portable")
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        else:
            if c == "[":
                in_class = True
            elif c in "^$":
                raise ValueError(
                    f"{pattern!r}: explicit {c!r} anchor — regexp term "
                    "queries match the whole term already (ES contract)")
            elif c == "(" and pattern[i + 1: i + 2] == "?":
                if pattern[i + 1: i + 3] != "?:":
                    raise ValueError(
                        f"{pattern!r}: (?... group — lookaround/flags/"
                        "named groups are not in the RE2∩Java∩Python "
                        "subset (plain (...) and (?:...) are)")
        i += 1
    if in_class:
        raise ValueError(f"{pattern!r}: unterminated character class")
    try:
        re.compile(pattern)
    except re.error as e:
        raise ValueError(f"invalid regexp {pattern!r}: {e}") from e


def regexp_literal_prefix(pattern: str) -> str:
    """Longest LITERAL prefix every match must start with — the
    ``StringStartsWith`` pushdown key. Stops at the first metacharacter;
    a character directly followed by a quantifier is excluded (in
    ``abc*`` only ``ab`` is guaranteed); any top-level alternation
    voids the prefix entirely (``ab|cd`` matches ``cd...``)."""
    depth = 0
    in_class = False
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif c == "|" and depth == 0:
            return ""
        i += 1
    prefix: List[str] = []
    for j, c in enumerate(pattern):
        if c in _META:
            break
        if pattern[j + 1: j + 2] in _QUANT:
            break
        prefix.append(c)
    return "".join(prefix)


def anchored(pattern: str) -> str:
    """``^(?:pat)$`` — whole-term match for ``rlike`` / Python ``re``
    (DuckDB's ``regexp_full_match`` is the same language)."""
    return f"^(?:{pattern})$"


def _check_regexps(patterns: Sequence[str], allow_leading_wildcard: bool) -> None:
    for p in patterns:
        validate_regexp(p)
        if not allow_leading_wildcard and not regexp_literal_prefix(p):
            raise ValueError(
                f"regexp {p!r} has no literal prefix — a full dictionary "
                "scan; pass allow_leading_wildcard=True to permit it")


def expand_regexps(
    term_stats: DataFrame,
    patterns: Sequence[str],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    allow_leading_wildcard: bool = False,
) -> Dict[str, List[str]]:
    """{pattern: matching terms} from the term_stats sidecar — ONE
    bounded Spark job for the whole batch (per pattern a pushed-prefix
    scan + anchored ``rlike`` + df-ranked LIMIT; at most
    ``len(patterns) x max_expansions`` rows return). Only live terms
    (df > 0) expand."""
    pats = list(dict.fromkeys(patterns))
    _check_regexps(pats, allow_leading_wildcard)
    if not pats:
        return {}
    frames = []
    for i, p in enumerate(pats):
        f = term_stats.filter(F.col("df") > 0)
        prefix = regexp_literal_prefix(p)
        if prefix:
            f = f.filter(F.col("term").startswith(prefix))
        f = (
            f.filter(F.col("term").rlike(anchored(p)))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select(F.lit(i).alias("pat_id"), "term")
        )
        frames.append(f)
    uni = frames[0]
    for f in frames[1:]:
        uni = uni.unionByName(f)
    out: Dict[str, List[str]] = {p: [] for p in pats}
    rows = sorted((r["pat_id"], r["term"]) for r in uni.collect())
    for pid, term in rows:
        out[pats[pid]].append(term)
    return out


def expand_regexps_local(
    dictionary: Dict[str, int],
    patterns: Sequence[str],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    allow_leading_wildcard: bool = False,
) -> Dict[str, List[str]]:
    """The in-memory twin over a {term: live df} dictionary (preload
    serving tier / federation-global dictionary). Identical selection:
    df desc, term asc, LIMIT; df <= 0 never expands."""
    pats = list(dict.fromkeys(patterns))
    _check_regexps(pats, allow_leading_wildcard)
    out: Dict[str, List[str]] = {}
    for p in pats:
        rx = re.compile(p)
        prefix = regexp_literal_prefix(p)
        hits = [
            (term, df) for term, df in dictionary.items()
            if df > 0 and term.startswith(prefix) and rx.fullmatch(term)
        ]
        hits.sort(key=lambda td: (-td[1], td[0]))
        out[p] = [t for t, _ in hits[:max_expansions]]
    return out


def parse_regexp_batch(
    raw_queries: Sequence[str], cfg: TokenizerConfig
) -> Tuple[List[str], List[List[str]], List[str]]:
    """Batch convenience: raw queries -> (positive queries,
    patterns-per-query, unique patterns across the batch)."""
    pos: List[str] = []
    per_q: List[List[str]] = []
    for q in raw_queries:
        p, pats = split_regexps(q)
        pos.append(p)
        per_q.append(pats)
    uniq = list(dict.fromkeys(p for pats in per_q for p in pats))
    return pos, per_q, uniq


def bm25_regexp_packed_batch(
    pidx,
    raw_queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    allow_leading_wildcard: bool = False,
    **wand_kwargs,
) -> DataFrame:
    """Distributed regexp retrieval over one packed index: parse -> one
    bounded expansion job -> the standard single-exchange WAND batch
    with ``query_terms`` (the wildcard seam exactly — expansion lists
    merge duplicate-free via wildcard_query_terms)."""
    from .wand import bm25_topk_packed_batch
    from .wildcard import wildcard_query_terms

    pos, per_q, uniq = parse_regexp_batch(raw_queries, cfg)
    exp = expand_regexps(
        pidx.term_stats, uniq, max_expansions=max_expansions,
        allow_leading_wildcard=allow_leading_wildcard,
    )
    terms = wildcard_query_terms(pos, cfg, exp, per_q)
    return bm25_topk_packed_batch(
        pidx, pos, cfg, k=k, query_terms=terms, **wand_kwargs
    )


def bm25_regexp_federated(
    shards,
    raw_queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    allow_leading_wildcard: bool = False,
    **fed_kwargs,
) -> DataFrame:
    """Federated twin: patterns expand ONCE against the federation-global
    dictionary (df summed over disjoint shard corpora — the merged
    index's selection exactly), then every shard scores the identical
    expanded query."""
    from .federated import _global_dictionary, bm25_topk_federated
    from .wildcard import wildcard_query_terms

    pos, per_q, uniq = parse_regexp_batch(raw_queries, cfg)
    exp = expand_regexps(
        _global_dictionary(shards), uniq, max_expansions=max_expansions,
        allow_leading_wildcard=allow_leading_wildcard,
    )
    terms = wildcard_query_terms(pos, cfg, exp, per_q)
    return bm25_topk_federated(
        shards, pos, cfg, k=k, query_terms=terms, **fed_kwargs
    )
