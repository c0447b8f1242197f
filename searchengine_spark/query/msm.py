"""ES/Lucene ``minimum_should_match`` value syntax — the full spec
grammar, not just a bare integer (Lucene's MinShouldMatchParser /
Solr "min number should match" spec, which ES inherits):

- ``3``      positive integer: at least 3 clauses;
- ``-2``     negative integer: all but 2 — ``n - 2``;
- ``"75%"``  percentage: ``floor(n * 75 / 100)`` (the spec rounds DOWN);
- ``"-25%"`` negative percentage: all but floor(n * 25 / 100).

Resolution is per query (n = that query's unique analyzed term count —
the engine-wide unique-terms quirk), so one spec string fans out to a
{query_id: int} map the scorers consume. The spec's clamp rule is
kept: a computed value below 1 becomes 1 (plain OR — a floor of zero
would match the whole corpus), and a value above n is left as-is (an
unreachable floor matches nothing — the boolquery contract, and what
ES does for minimum_should_match > optional clause count)."""

from __future__ import annotations

import re
from typing import Dict, Sequence

from ..tokenizer import TokenizerConfig, tokenize_text

_SPEC = re.compile(r"^\s*(-?\d+)(%?)\s*$")


def resolve_min_should_match(spec, n_terms: int) -> int:
    """One query's resolved integer floor per the Lucene value spec."""
    if isinstance(spec, int):
        value = spec if spec >= 0 else n_terms + spec
    else:
        m = _SPEC.match(str(spec))
        if not m:
            raise ValueError(
                f"bad minimum_should_match spec {spec!r} — want an "
                "integer, a negative integer, or a [-]percentage like "
                "'75%' (the conditional '3<90%' form is not supported)")
        num, pct = int(m.group(1)), bool(m.group(2))
        if not pct:
            value = num if num >= 0 else n_terms + num
        elif num >= 0:
            value = n_terms * num // 100
        else:
            value = n_terms - (n_terms * (-num) // 100)
    return max(1, value)


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
