"""Query-time synonym expansion (the ES synonym-token-filter analog,
applied at query time so the index never needs rebuilding when the
synonym dictionary changes).

Expansion semantics (documented contract, gated in
tests/test_synonyms.py):

- each normalized query term additionally retrieves its synonyms at
  ``weight`` (default 1.0 — ES's equal-footing synonym contract;
  lower it for "related term" soft expansion a la Rocchio's beta);
- synonym entries pass through the SAME tokenize chain as queries
  (min-length, stop words, stemmer), so the mapping operates in
  normalized term space — a dictionary written against surface forms
  works unchanged on a stemmed index;
- a synonym that is already one of the query's own terms keeps weight
  1.0 (an explicit term is never down-weighted);
- expansion preserves BM25's unique-terms quirk (duplicate-free term
  lists) and rides the weighted-term WAND seam
  (``query_terms``/``term_weights``), so it works identically on the
  single packed index and on ``--shards`` federations.

File format (one rule per line; ``#`` comments):

    term => synonym1, synonym2
    term: synonym1, synonym2
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from ..tokenizer import TokenizerConfig, tokenize_text


def parse_synonyms(text: str) -> Dict[str, List[str]]:
    """Parse the rule file format -> {surface term: [surface synonyms]}.
    Later rules for the same term EXTEND earlier ones."""
    out: Dict[str, List[str]] = {}
    for ln, raw in enumerate(text.splitlines(), 1):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
        elif ":" in line:
            lhs, rhs = line.split(":", 1)
        else:
            raise ValueError(f"synonyms line {ln}: expected 'term => a, b' "
                             f"or 'term: a, b', got {raw!r}")
        lhs = lhs.strip()
        if not lhs:
            raise ValueError(f"synonyms line {ln}: empty left-hand term")
        syns = [s.strip() for s in rhs.split(",") if s.strip()]
        out.setdefault(lhs, []).extend(syns)
    return out


def load_synonyms(path: str) -> Dict[str, List[str]]:
    with open(path) as fh:
        return parse_synonyms(fh.read())


def normalize_synonyms(
    synonyms: Dict[str, Sequence[str]], cfg: TokenizerConfig
) -> Dict[str, List[str]]:
    """Run both sides of every rule through the query tokenize chain.
    LHS terms must normalize to exactly ONE token (phrase synonyms are
    not supported — loud error, not silent misrouting); RHS entries may
    normalize to several tokens (each joins the expansion) or to none
    (stop words / too short — dropped). Rules whose LHS normalizes away
    entirely are dropped: they can never match a query term."""
    out: Dict[str, List[str]] = {}
    for lhs, rhs in synonyms.items():
        toks = tokenize_text(lhs, cfg)
        if not toks:
            continue
        if len(toks) > 1:
            raise ValueError(
                f"synonym LHS {lhs!r} tokenizes to {toks} — phrase "
                f"synonyms are not supported"
            )
        exp: List[str] = []
        for s in rhs:
            exp.extend(tokenize_text(s, cfg))
        merged = out.setdefault(toks[0], [])
        merged.extend(t for t in exp if t not in merged and t != toks[0])
    return {k: v for k, v in out.items() if v}


def expand_query_terms(
    queries: Sequence[str],
    cfg: TokenizerConfig,
    synonyms: Dict[str, Sequence[str]],
    weight: float = 1.0,
) -> Tuple[List[List[str]], Dict[int, Dict[str, float]]]:
    """-> (query_terms, term_weights) for the weighted-term WAND seam
    (``bm25_topk_packed_batch`` / ``bm25_topk_federated``). Original
    terms ride at implicit weight 1.0; added synonyms at ``weight``;
    a synonym already present as an original term stays at 1.0."""
    norm = normalize_synonyms(synonyms, cfg)
    terms: List[List[str]] = []
    weights: Dict[int, Dict[str, float]] = {}
    for qid, q in enumerate(queries):
        orig = list(dict.fromkeys(tokenize_text(q, cfg)))
        expanded = list(orig)
        for t in orig:
            for s in norm.get(t, ()):
                if s not in expanded:
                    expanded.append(s)
                    if weight != 1.0:
                        weights.setdefault(qid, {})[s] = float(weight)
        terms.append(expanded)
    return terms, weights
