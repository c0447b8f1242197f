"""Negated query terms — the ES bool ``must_not`` / web-search ``-term``
analog, shared by every serving tier.

Syntax: a whitespace-delimited word starting with ``-`` (and longer than
the bare dash) negates; everything else is the positive query. Parsing
happens on the RAW query string — the tokenize chain maps punctuation to
spaces (reference tokenizer.py:41-72), so a ``-`` surviving to
tokenization would silently become a positive term. Negated words then
pass through the SAME tokenize chain as the query (min-length, stop
words, stemmer), so ``-Running`` excludes the stemmed term a stemmed
index stores, and ``-the`` on a stop-worded index is a no-op (you cannot
exclude what was never indexed).

Semantics (gated in tests/test_negation.py):

- ranked retrieval (bm25 / bm25_and): docs containing ANY negated term
  are dropped BEFORE the top-k heap — the result is the true top-k of
  the excluded corpus, not a post-filtered hole-y list. Negation can
  only LOWER a chunk's achievable score, so block-max pruning bounds
  stay safe unchanged.
- boolean retrieval: set difference after the AND/OR combine.
- a term both positive and negated in one query: the negation wins
  (ES ``must_not`` contract) — matching docs are excluded, the term
  contributes no score.
- negated terms absent from the index exclude nothing (no fuzzy
  rewriting of negations — "exclude things LIKE this" is not a
  contract anyone expects from ``-typo``).

Exclusion is CHUNK-LOCAL, which is what lets it ride the single-exchange
WAND plan: a doc's postings for every term live in the same chunk id
(chunk = doc_id // chunk_docs, indexing/packed.py), so fanning negated
terms' chunk rows into the same scorer group and masking decoded doc ids
there is exact — per shard, per chunk, no extra exchange. No reference
counterpart (the reference serves AND/OR/ranked-OR only).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from ..tokenizer import TokenizerConfig, tokenize_text

_WORDS = re.compile(r"\S+")


def split_negations(query: str) -> Tuple[str, List[str]]:
    """Raw query -> (positive query string, raw negated words).

    ``"apple -banana pie"`` -> ``("apple pie", ["banana"])``. A bare
    ``"-"`` is punctuation, not a negation (stays in the positive part,
    where the tokenize chain drops it)."""
    pos: List[str] = []
    neg: List[str] = []
    for w in _WORDS.findall(query):
        if len(w) > 1 and w.startswith("-"):
            neg.append(w[1:])
        else:
            pos.append(w)
    return " ".join(pos), neg


def negated_terms(words: Sequence[str], cfg: TokenizerConfig) -> List[str]:
    """Normalize raw negated words through the query tokenize chain ->
    unique term list (order-preserving). A word may normalize to several
    terms (punctuation inside it) — each excludes — or to none (stop
    word / too short — dropped, the no-op contract)."""
    out: List[str] = []
    for w in words:
        for t in tokenize_text(w, cfg):
            if t not in out:
                out.append(t)
    return out


def parse_negated_queries(
    queries: Sequence[str], cfg: TokenizerConfig
) -> Tuple[List[str], Dict[int, List[str]]]:
    """Batch form: raw queries (possibly carrying ``-term`` words) ->
    (positive query strings, {query_id: normalized negated terms}) — the
    shapes ``bm25_topk_packed_batch(queries=…, exclude_terms=…)`` and its
    boolean/federated twins take. Queries without negations are
    untouched and absent from the dict."""
    pos_queries: List[str] = []
    excludes: Dict[int, List[str]] = {}
    for qid, q in enumerate(queries):
        pos, neg = split_negations(q)
        pos_queries.append(pos)
        if neg:
            terms = negated_terms(neg, cfg)
            if terms:
                excludes[qid] = terms
    return pos_queries, excludes
