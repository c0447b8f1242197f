"""Wildcard term queries — the ES ``wildcard`` / Lucene ``te*t`` query
analog, answered by dictionary expansion + the weighted-term WAND seam.

Syntax: a whitespace-delimited query word containing ``*`` (any run of
characters, including empty) or ``?`` (exactly one character) is a
wildcard PATTERN; everything else is the ordinary positive query.
Parsing happens on the RAW query string, exactly like negation
(query/negation.py): the tokenize chain maps punctuation to spaces
(reference tokenizer.py:41-72), so a ``*`` surviving to tokenization
would silently vanish and the pattern would degrade to its literal
fragments.

Semantics (the Lucene ``scoring_boolean`` rewrite; gated in
tests/test_wildcard.py):

- patterns match the INDEX DICTIONARY — the normalized/stemmed term
  space — and are NOT analyzed themselves (ES contract: "wildcard
  queries are not analyzed"); the pattern is only lowercased. A user
  searching a stemmed index patterns against stems, the same contract
  ES multi-term queries have.
- each pattern expands to at most ``max_expansions`` matching terms
  (default 50), selected by live df desc then term asc — the same
  deterministic ranking dictionary auto-complete uses
  (``wand.suggest_terms``); ES's ``top_terms_N`` rewrite analog. The
  cap is load-bearing at scale: ``e*`` on a 10^9-term dictionary must
  not become a 10^8-term disjunction.
- expanded terms join the query's term list at weight 1.0 and score
  ordinary BM25 OR (the ``scoring_boolean`` rewrite) — duplicate-free,
  preserving the reference's unique-terms quirk; an expansion already
  present as an explicit term adds nothing.
- a pattern matching nothing contributes nothing (OR semantics); a
  query whose every word is a matchless pattern returns nothing.
- a LEADING wildcard (``*ism``, ``?at``) forces a full dictionary scan
  (no prefix pushdown) and is refused unless
  ``allow_leading_wildcard=True`` — the ES ``query_string`` guard,
  default-closed here because the scan is O(vocabulary).

Expansion cost model: one bounded job over the tiny term_stats sidecar
per batch — per pattern a pushed ``StringStartsWith`` scan on the
literal prefix (row-group pruned like suggest/fuzzy) + an anchored
regex filter + a df-ranked LIMIT; the union across a batch's patterns
returns at most ``patterns x max_expansions`` rows. The preload
serving tier (``LocalSearcher``) expands from its in-memory dictionary
with zero Spark jobs; federations expand against the federation-global
dictionary so every shard scores the identical expanded query.

No reference counterpart (the reference matches exact terms only).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig, tokenize_text

_WORDS = re.compile(r"\S+")
_WILD = ("*", "?")

DEFAULT_MAX_EXPANSIONS = 50


def is_pattern(word: str) -> bool:
    """A word is a wildcard pattern iff it contains ``*`` or ``?``."""
    return any(c in word for c in _WILD)


def split_wildcards(query: str) -> Tuple[str, List[str]]:
    """Raw query -> (positive query string, lowercased patterns).

    ``"gui* solo"`` -> ``("solo", ["gui*"])``. A bare ``"*"`` or ``"?"``
    is punctuation, not a pattern (stays in the positive part, where the
    tokenize chain drops it)."""
    pos: List[str] = []
    pats: List[str] = []
    for w in _WORDS.findall(query):
        if len(w) > 1 and is_pattern(w):
            if w.startswith("-"):
                raise ValueError(
                    f"negated wildcard {w!r} is unsupported — exclusion "
                    "never expands (the negation contract, query/negation.py)"
                )
            pats.append(w.lower())
        else:
            pos.append(w)
    return " ".join(pos), pats


def pattern_prefix(pattern: str) -> str:
    """Literal prefix before the first wildcard char (may be empty)."""
    for i, c in enumerate(pattern):
        if c in _WILD:
            return pattern[:i]
    return pattern


def pattern_regex(pattern: str) -> str:
    """Anchored regex for the pattern — valid and IDENTICAL in meaning
    under Python ``re`` and Java ``Pattern`` (``rlike``): literals are
    escaped char-by-char with a backslash, ``*`` -> ``.*``,
    ``?`` -> ``.``."""
    parts: List[str] = []
    for c in pattern:
        if c == "*":
            parts.append(".*")
        elif c == "?":
            parts.append(".")
        elif c.isalnum() and c.isascii():
            parts.append(c)
        else:
            parts.append("\\" + c)
    return "^" + "".join(parts) + "$"


def pattern_like(pattern: str) -> str:
    """ANSI-SQL LIKE translation (``*``->``%``, ``?``->``_``), literal
    ``%``/``_``/``\\`` escaped with ``\\`` — pair with ``ESCAPE '\\'``.
    Used by the DuckDB oracle to replicate expansion exactly."""
    parts: List[str] = []
    for c in pattern:
        if c == "*":
            parts.append("%")
        elif c == "?":
            parts.append("_")
        elif c in ("%", "_", "\\"):
            parts.append("\\" + c)
        else:
            parts.append(c)
    return "".join(parts)


def _check_patterns(patterns: Sequence[str], allow_leading_wildcard: bool) -> None:
    for p in patterns:
        if not is_pattern(p):
            raise ValueError(f"{p!r} contains no wildcard — pass it as a plain term")
        if not allow_leading_wildcard and not pattern_prefix(p):
            raise ValueError(
                f"pattern {p!r} has a leading wildcard — a full dictionary "
                "scan; pass allow_leading_wildcard=True to permit it"
            )


def expand_patterns(
    term_stats: DataFrame,
    patterns: Sequence[str],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    allow_leading_wildcard: bool = False,
) -> Dict[str, List[str]]:
    """{pattern: matching terms} from the term_stats sidecar — ONE
    bounded Spark job for the whole batch (a union of per-pattern
    pushed-prefix + regex + df-ranked-LIMIT scans; at most
    ``len(patterns) x max_expansions`` rows come back). Only live terms
    (df > 0) expand, like suggest — a fully tombstoned term never
    resurrects through a wildcard."""
    pats = list(dict.fromkeys(patterns))
    _check_patterns(pats, allow_leading_wildcard)
    if not pats:
        return {}
    frames = []
    for i, p in enumerate(pats):
        f = term_stats.filter(F.col("df") > 0)
        prefix = pattern_prefix(p)
        if prefix:
            f = f.filter(F.col("term").startswith(prefix))
        f = (
            f.filter(F.col("term").rlike(pattern_regex(p)))
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


def expand_patterns_local(
    dictionary: Dict[str, int],
    patterns: Sequence[str],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    allow_leading_wildcard: bool = False,
) -> Dict[str, List[str]]:
    """The in-memory twin of :func:`expand_patterns` over a
    {term: live df} dictionary (the preload serving tier / the
    federation-global dictionary). Identical selection: df desc, term
    asc, LIMIT ``max_expansions``; df <= 0 terms never expand."""
    pats = list(dict.fromkeys(patterns))
    _check_patterns(pats, allow_leading_wildcard)
    out: Dict[str, List[str]] = {}
    for p in pats:
        rx = re.compile(pattern_regex(p))
        prefix = pattern_prefix(p)
        hits = [
            (term, df) for term, df in dictionary.items()
            if df > 0 and term.startswith(prefix) and rx.match(term)
        ]
        hits.sort(key=lambda td: (-td[1], td[0]))
        out[p] = [t for t, _ in hits[:max_expansions]]
    return out


def wildcard_query_terms(
    queries: Sequence[str],
    cfg: TokenizerConfig,
    expansions: Dict[str, List[str]],
    patterns_per_query: Sequence[Sequence[str]],
) -> List[List[str]]:
    """Per-query duplicate-free term lists for the weighted-term WAND
    seam (``query_terms=`` on ``bm25_topk_packed_batch`` /
    ``bm25_topk_federated``): the positive words tokenize through the
    normal chain, then each of the query's patterns appends its
    expansion terms (first-seen order preserved; expansions already
    present add nothing — the unique-terms quirk holds)."""
    if len(queries) != len(patterns_per_query):
        raise ValueError(
            f"{len(queries)} positive queries vs {len(patterns_per_query)} "
            "pattern lists — parse with split_wildcards per query"
        )
    terms: List[List[str]] = []
    for q, pats in zip(queries, patterns_per_query):
        expanded = list(dict.fromkeys(tokenize_text(q, cfg)))
        for p in pats:
            if p not in expansions:
                raise KeyError(f"pattern {p!r} was not expanded — pass every "
                               "parsed pattern to expand_patterns first")
            for t in expansions[p]:
                if t not in expanded:
                    expanded.append(t)
        terms.append(expanded)
    return terms


def parse_wildcard_batch(
    raw_queries: Sequence[str], cfg: TokenizerConfig
) -> Tuple[List[str], List[List[str]], List[str]]:
    """Batch convenience: raw queries -> (positive queries,
    patterns-per-query, unique patterns across the batch)."""
    pos: List[str] = []
    per_q: List[List[str]] = []
    for q in raw_queries:
        p, pats = split_wildcards(q)
        pos.append(p)
        per_q.append(pats)
    uniq = list(dict.fromkeys(p for pats in per_q for p in pats))
    return pos, per_q, uniq


def bm25_wildcard_packed_batch(
    pidx,
    raw_queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    allow_leading_wildcard: bool = False,
    **wand_kwargs,
) -> DataFrame:
    """Distributed wildcard retrieval over one packed index: parse ->
    one bounded expansion job -> the standard single-exchange WAND batch
    with ``query_terms``. Extra kwargs pass through to
    ``bm25_topk_packed_batch`` (round_dp, doc_filter, offset, ...)."""
    from .wand import bm25_topk_packed_batch

    pos, per_q, uniq = parse_wildcard_batch(raw_queries, cfg)
    exp = expand_patterns(
        pidx.term_stats, uniq, max_expansions=max_expansions,
        allow_leading_wildcard=allow_leading_wildcard,
    )
    terms = wildcard_query_terms(pos, cfg, exp, per_q)
    return bm25_topk_packed_batch(
        pidx, pos, cfg, k=k, query_terms=terms, **wand_kwargs
    )


def bm25_wildcard_federated(
    shards,
    raw_queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    allow_leading_wildcard: bool = False,
    **fed_kwargs,
) -> DataFrame:
    """Federated twin: patterns expand ONCE against the federation-global
    dictionary (df summed over the disjoint shard corpora — the merged
    index's selection exactly), then every shard scores the identical
    expanded query via ``bm25_topk_federated(query_terms=...)``."""
    from .federated import _global_dictionary, bm25_topk_federated

    pos, per_q, uniq = parse_wildcard_batch(raw_queries, cfg)
    exp = expand_patterns(
        _global_dictionary(shards), uniq, max_expansions=max_expansions,
        allow_leading_wildcard=allow_leading_wildcard,
    )
    terms = wildcard_query_terms(pos, cfg, exp, per_q)
    return bm25_topk_federated(
        shards, pos, cfg, k=k, query_terms=terms, **fed_kwargs
    )
