"""Query-string term boosts — the ES ``query_string`` ``term^2.5``
syntax: a caret suffix on a query word multiplies that term's score
contribution, riding the SAME weighted-term seam synonym expansion uses
(``term_weights`` in query/wand.py: weights fold into idf BEFORE the
per-chunk block-max bounds, so pruning stays exact at any weight —
including 0, which keeps the term matching OR-wise while contributing
nothing, exactly ES ``^0``).

Parsing happens on the RAW query (like ``-term`` negation — the
tokenize chain maps ``^`` to a space, so it must be split off first):
``word^W`` with W a non-negative float; the word then normalizes
through the full query tokenize chain, and if it yields several terms
(inner punctuation) each carries W. A term boosted twice keeps the
LAST weight (deterministic; ES would sum the duplicated clauses — the
engine-wide unique-terms quirk, documented deviation). A bare ``^`` or
a malformed weight is NOT a boost — the word passes through untouched
(tokenization then strips the caret), never a hard error mid-query.

No reference counterpart; semantics follow the Lucene/ES query-string
boost.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from ..tokenizer import TokenizerConfig, tokenize_text

_WORDS = re.compile(r"\S+")
_BOOST = re.compile(r"^(?P<word>.+)\^(?P<w>\d+(?:\.\d+)?)$")


def split_boosts(query: str) -> Tuple[str, List[Tuple[str, float]]]:
    """Raw query -> (query with carets stripped, [(raw word, weight)]).
    Unboosted words keep weight-less (absent) entries."""
    clean: List[str] = []
    boosted: List[Tuple[str, float]] = []
    for w in _WORDS.findall(query):
        m = _BOOST.match(w)
        if m:
            clean.append(m.group("word"))
            boosted.append((m.group("word"), float(m.group("w"))))
        else:
            clean.append(w)
    return " ".join(clean), boosted


def parse_boosted_queries(
    queries: Sequence[str], cfg: TokenizerConfig
) -> Tuple[List[str], Dict[int, Dict[str, float]]]:
    """Batch form: raw queries (possibly carrying ``word^W``) ->
    (caret-stripped query strings, {query_id: {term: weight}}) — the
    shapes ``bm25_topk_packed_batch(queries=…, term_weights=…)`` and its
    federated twin take. Queries without boosts are untouched and absent
    from the dict; a boosted word that normalizes to nothing (stop word
    / too short) boosts nothing (the no-op contract negation has)."""
    out_q: List[str] = []
    weights: Dict[int, Dict[str, float]] = {}
    for qid, raw in enumerate(queries):
        clean, boosted = split_boosts(raw)
        out_q.append(clean)
        wmap: Dict[str, float] = {}
        for word, w in boosted:
            for t in tokenize_text(word, cfg):
                wmap[t] = w  # duplicate boost: last wins (module docstring)
        if wmap:
            weights[qid] = wmap
    return out_q, weights
