"""ES fuzzy QUERY — ``word~``, ``word~1``, ``word~2`` (Lucene
FuzzyQuery / the query_string tilde syntax), answered by dictionary
expansion + the weighted-term WAND seam.

This is the EXPANSION retrieval mode, distinct from ``--fuzzy``
correction (query/fuzzy.py correct_terms): correction REWRITES an OOV
word to its best neighbor; the fuzzy query keeps the word AND matches
every dictionary term within the edit budget — the ES semantics where
"quikc~" finds quick, quince and quiche at once.

Syntax: a whitespace-delimited query word ending in ``~`` (AUTO
fuzziness — the ES ladder per analyzed term), ``~1`` or ``~2`` is a
fuzzy word; ``~0`` degrades to the plain term. Parsing happens on the
RAW query string exactly like wildcard/regexp (the tokenize chain maps
nothing to ``~`` — it is punctuation and would vanish); the word ITSELF
then analyzes through the normal chain (ES analyzes the fuzzy term
before matching — a stemmed index fuzzies over stems), and must yield
exactly one token (loud refusal otherwise, the span_term discipline).

Semantics (gated in tests/test_fuzzyquery.py):

- each fuzzy word expands against the INDEX DICTIONARY to at most
  ``max_expansions`` terms within its budget, selected by distance ASC
  then live-df DESC then term ASC (the Lucene top_terms selection with
  our deterministic tiebreak; the exact term is distance 0 and always
  survives the cap first);
- expansions join the query's term list at weight 1.0 and score
  ordinary BM25 OR (the scoring_boolean rewrite, same as
  wildcard/regexp — duplicate-free, the unique-terms quirk holds);
- a fuzzy word with no in-budget neighbor contributes nothing (OR);
- expansion cost: ONE bounded job over the term_stats sidecar for the
  whole batch (the SymSpell deletes machinery of query/fuzzy.py — the
  dictionary side prunes by length band before the variants explode).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame

from ..tokenizer import TokenizerConfig, tokenize_text
from .fuzzy import auto_fuzziness, fuzzy_candidates

DEFAULT_MAX_EXPANSIONS = 50

_FUZZ_RE = re.compile(r"^(.+?)~([012]?)$")


def is_fuzzy_word(word: str) -> bool:
    return bool(_FUZZ_RE.match(word))


def split_fuzzy(query: str) -> Tuple[str, List[Tuple[str, int | None]]]:
    """RAW query -> (positive remainder, [(word_text, budget)]) where
    budget None means AUTO (resolved per ANALYZED term downstream)."""
    pos, specs = [], []
    for w in query.split():
        m = _FUZZ_RE.match(w)
        if m:
            b = m.group(2)
            specs.append((m.group(1), int(b) if b else None))
        else:
            pos.append(w)
    return " ".join(pos), specs


def parse_fuzzy_batch(
    raw_queries: Sequence[str], cfg: TokenizerConfig
) -> Tuple[List[str], List[List[Tuple[str, int]]], List[Tuple[str, int]]]:
    """-> (positive queries, per-query [(term, budget)], unique specs).
    The fuzzy word analyzes through the chain (one token required);
    AUTO resolves on the analyzed term."""
    pos_qs: List[str] = []
    per_q: List[List[Tuple[str, int]]] = []
    uniq: Dict[Tuple[str, int], None] = {}
    for q in raw_queries:
        pos, specs = split_fuzzy(q)
        resolved: List[Tuple[str, int]] = []
        for word, b in specs:
            toks = list(dict.fromkeys(tokenize_text(word, cfg)))
            if len(toks) != 1:
                raise ValueError(
                    f"fuzzy word must analyze to exactly one term, got "
                    f"{toks!r} from {word!r}"
                )
            t = toks[0]
            budget = auto_fuzziness(t) if b is None else int(b)
            resolved.append((t, budget))
            uniq[(t, budget)] = None
        pos_qs.append(pos)
        per_q.append(resolved)
    return pos_qs, per_q, list(uniq)


def expand_fuzzy(
    dictionary: DataFrame,
    specs: Sequence[Tuple[str, int]],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> Dict[Tuple[str, int], List[str]]:
    """{(term, budget): expansion terms} — per budget tier one bounded
    ``fuzzy_candidates`` job (distance asc / df desc / term asc, LIMIT
    ``max_expansions``); budget 0 maps to the plain term."""
    out: Dict[Tuple[str, int], List[str]] = {}
    by_budget: Dict[int, List[str]] = {}
    for t, b in dict.fromkeys(specs):
        if b == 0:
            out[(t, 0)] = [t]
        else:
            by_budget.setdefault(int(b), []).append(t)
    for b, words in sorted(by_budget.items()):
        rows = fuzzy_candidates(
            dictionary, words, k=max_expansions, max_edits=b
        ).collect()
        got: Dict[str, List[Tuple[int, str]]] = {w: [] for w in words}
        for r in rows:
            got[r["qterm"]].append((int(r["rank"]), r["term"]))
        for w in words:
            out[(w, b)] = [t for _, t in sorted(got[w])]
    return out


def fuzzy_query_terms(
    pos_queries: Sequence[str],
    cfg: TokenizerConfig,
    expansions: Dict[Tuple[str, int], List[str]],
    per_q: Sequence[Sequence[Tuple[str, int]]],
) -> List[List[str]]:
    """Per-query duplicate-free term lists for the ``query_terms`` seam
    (first-seen order; expansions already present add nothing)."""
    terms: List[List[str]] = []
    for q, specs in zip(pos_queries, per_q):
        merged = list(dict.fromkeys(tokenize_text(q, cfg)))
        seen = set(merged)
        for spec in specs:
            for t in expansions.get(spec, []):
                if t not in seen:
                    merged.append(t)
                    seen.add(t)
        terms.append(merged)
    return terms


def bm25_fuzzyq_packed_batch(
    pidx,
    raw_queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    **wand_kwargs,
) -> DataFrame:
    """Distributed fuzzy-query retrieval over one packed index: parse ->
    one bounded expansion job per budget tier -> the standard
    single-exchange WAND batch with ``query_terms`` (the wildcard seam
    exactly)."""
    from .wand import bm25_topk_packed_batch

    pos, per_q, uniq = parse_fuzzy_batch(raw_queries, cfg)
    exp = expand_fuzzy(pidx.term_stats, uniq, max_expansions=max_expansions)
    terms = fuzzy_query_terms(pos, cfg, exp, per_q)
    return bm25_topk_packed_batch(
        pidx, pos, cfg, k=k, query_terms=terms, **wand_kwargs
    )
