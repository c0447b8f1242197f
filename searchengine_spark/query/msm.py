"""ES/Lucene ``minimum_should_match`` value syntax — the full spec
grammar, not just a bare integer (Lucene's MinShouldMatchParser /
Solr "min number should match" spec, which ES inherits):

- ``3``      positive integer: at least 3 clauses;
- ``-2``     negative integer: all but 2 — ``n - 2``;
- ``"75%"``  percentage: ``floor(n * 75 / 100)`` (the spec rounds DOWN);
- ``"-25%"`` negative percentage: all but floor(n * 25 / 100);
- ``"3<90%"`` conditional: if ``n <= 3`` ALL clauses are required,
  otherwise the sub-spec (here 90%) applies;
- ``"2<-25% 9<-3"`` multiple conditionals, space-separated: the
  applicable sub-spec is the one of the LAST clause whose bound is
  exceeded (Solr's SolrPluginUtils.calculateMinShouldMatch walk:
  initialize result = n, then for each clause in order — if
  ``n <= bound`` stop, else result = resolve(sub-spec)). Spaces around
  ``<`` are tolerated, like Solr's spaceAroundLessThan normalization.

Resolution is per query (n = that query's unique analyzed term count —
the engine-wide unique-terms quirk), so one spec string fans out to a
{query_id: int} map the scorers consume. The spec's clamp rule is
kept: a computed value below 1 becomes 1 (plain OR — a floor of zero
would match the whole corpus), and a value above n is left as-is (an
unreachable floor matches nothing — the boolquery contract, and what
ES does for minimum_should_match > optional clause count; a documented
deviation from Solr's trailing min(result, n) clamp)."""

from __future__ import annotations

import re
from typing import Dict, Sequence

from ..tokenizer import TokenizerConfig, tokenize_text

_SPEC = re.compile(r"^\s*(-?\d+)(%?)\s*$")
_LT_WS = re.compile(r"\s*<\s*")


def _resolve_simple(spec: str, n_terms: int) -> int:
    """One non-conditional spec (integer / percentage) -> raw value,
    unclamped."""
    m = _SPEC.match(spec)
    if not m:
        raise ValueError(
            f"bad minimum_should_match spec {spec!r} — want an "
            "integer, a negative integer, a [-]percentage like '75%', "
            "or conditional clause(s) like '3<90%' / '2<-25% 9<-3'")
    num, pct = int(m.group(1)), bool(m.group(2))
    if not pct:
        return num if num >= 0 else n_terms + num
    if num >= 0:
        return n_terms * num // 100
    return n_terms - (n_terms * (-num) // 100)


def resolve_min_should_match(spec, n_terms: int) -> int:
    """One query's resolved integer floor per the Lucene value spec."""
    if isinstance(spec, int):
        value = spec if spec >= 0 else n_terms + spec
        return max(1, value)
    s = str(spec).strip()
    if "<" in s:
        # conditional spec(s) — the Solr calculateMinShouldMatch walk
        value = n_terms  # below every bound -> all clauses required
        for clause in _LT_WS.sub("<", s).split():
            parts = clause.split("<")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"bad conditional minimum_should_match clause "
                    f"{clause!r} — want BOUND<SPEC, e.g. '3<90%'")
            try:
                bound = int(parts[0])
            except ValueError:
                raise ValueError(
                    f"bad conditional minimum_should_match bound in "
                    f"{clause!r} — the value before '<' must be an "
                    f"integer") from None
            if n_terms <= bound:
                break
            value = _resolve_simple(parts[1], n_terms)
        return max(1, value)
    return max(1, _resolve_simple(s, n_terms))


def msm_map(
    spec,
    queries: Sequence[str],
    cfg: TokenizerConfig,
) -> Dict[int, int]:
    """{query_id: resolved floor} for a batch — one spec, per-query n."""
    out = {}
    for qid, q in enumerate(queries):
        n = len(dict.fromkeys(tokenize_text(q, cfg)))
        out[qid] = resolve_min_should_match(spec, max(n, 1))
    return out
