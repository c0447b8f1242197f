"""Query-cost circuit breaker — the ES circuit-breaker /
``search.max_buckets`` idea applied to retrieval cost: estimate a
query's postings work BEFORE running it, and refuse the request when it
exceeds a budget, instead of letting one degenerate query (every term a
stop-word-like high-df term) monopolize the cluster.

The estimate is exact and nearly free: the work a scoring pass does is
proportional to the postings it decodes, which is Σ df over the query's
terms — and df sits in the term_stats sidecar (small, broadcastable;
the same pruned point-lookup the idf closure already does, wand.py Q2).
OOV terms cost 0. The estimate is an upper bound for WAND (pruning
skips chunks) and exact for score-all surfaces — which is precisely
when a breaker matters.

ES semantics kept: the breaker trips the whole REQUEST (a batch with
one over-budget query refuses loudly, listing per-query costs) — a
silent partial answer is how a dashboard ends up lying. No reference
counterpart; pytest-gated (tests/test_cost.py)."""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig, tokenize_text


def estimate_query_cost(
    pidx,
    queries: Sequence[str],
    cfg: TokenizerConfig,
) -> List[Dict]:
    """-> per query: {"query", "terms": {term: df}, "cost": Σ df}.
    One bounded term_stats point-scan for the whole batch."""
    per_q = [list(dict.fromkeys(tokenize_text(q, cfg))) for q in queries]
    all_terms = sorted({t for ts in per_q for t in ts})
    dfs: Dict[str, int] = {}
    if all_terms:
        rows = (
            pidx.term_stats.filter(F.col("term").isin(all_terms))
            .select("term", "df").collect()
        )
        dfs = {r["term"]: int(r["df"]) for r in rows}
    out = []
    for q, terms in zip(queries, per_q):
        tcosts = {t: dfs.get(t, 0) for t in terms}
        out.append({"query": q, "terms": tcosts,
                    "cost": sum(tcosts.values())})
    return out


class CostBudgetExceeded(RuntimeError):
    """Raised when any query in the batch exceeds the postings budget;
    carries the full per-query estimate for the refusal message."""

    def __init__(self, estimates: List[Dict], budget: int):
        self.estimates = estimates
        self.budget = budget
        over = [e for e in estimates if e["cost"] > budget]
        worst = max(over, key=lambda e: e["cost"])
        super().__init__(
            f"{len(over)} quer{'y' if len(over) == 1 else 'ies'} exceed "
            f"the postings budget {budget} (worst: {worst['query']!r} at "
            f"{worst['cost']}) — raise --max-query-cost or narrow the query")


def check_cost_budget(
    pidx,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    budget: int,
) -> List[Dict]:
    """Trip the breaker (raise :class:`CostBudgetExceeded`) when any
    query's estimated postings cost exceeds ``budget``; otherwise return
    the estimates (callers may log them)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    est = estimate_query_cost(pidx, queries, cfg)
    if any(e["cost"] > budget for e in est):
        raise CostBudgetExceeded(est, budget)
    return est
