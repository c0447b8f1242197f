"""Relevance-evaluation metrics, formula-identical to the reference.

Reference: src/efficiency.py:41-91 (Efficiency.calculate_stats /
query_thoughput). Quirks kept for comparable reporting (SURVEY.md Q9):
- NDCG's DCG uses 2^(engine score) - 1 over the RESULT scores while iDCG
  uses 2^grade - 1 over the relevance file's rows IN FILE ORDER
  (efficiency.py:66-78) — not a textbook NDCG; reproduced verbatim.
- throughput counter adds len(results) per query (efficiency.py:45).

Plain-Python over collected top-k rows (query batches are tiny); a
DataFrame variant would only matter for millions of queries.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from statistics import mean, median
from typing import Dict, List, Sequence, Tuple


def parse_relevance_file(path: str) -> Dict[str, List[Tuple[str, int]]]:
    """Parse the reference's queries.relevance.txt format: 'Q:<query>'
    header + 'docid\\tgrade' lines (efficiency.py:28-39)."""
    out: Dict[str, List[Tuple[str, int]]] = {}
    cur: List[Tuple[str, int]] = []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("Q:"):
                cur = []
                out[line[2:]] = cur
            else:
                doc, grade = line.split("\t")
                cur.append((doc, int(grade)))
    return out


@dataclass
class EvalStats:
    reference_results: Dict[str, List[Tuple[str, int]]]
    counter: int = 0
    search_times: List[float] = field(default_factory=list)
    precisions: Dict[str, float] = field(default_factory=dict)
    recalls: Dict[str, float] = field(default_factory=dict)
    fscores: Dict[str, float] = field(default_factory=dict)
    ndcg: Dict[str, float] = field(default_factory=dict)

    def add(self, query: str, results: Sequence[Tuple[object, float]], search_time: float | None = None) -> None:
        self.counter += len(results)  # quirky throughput counter (efficiency.py:45)
        if search_time is not None:
            self.search_times.append(search_time)
        reference = self.reference_results.get(query)
        if not reference:
            # no entry OR an empty one (a 'Q:' header with no doc lines):
            # recall would divide by len([]) — nothing to evaluate against
            return
        ref_ids = [str(r[0]) for r in reference]
        relevant = sum(1 for doc_id, _ in results if str(doc_id) in ref_ids)
        recall = relevant / len(reference)
        precision = relevant / len(results) if results else 0.0
        f_score = 0.0
        if recall + precision > 0:
            f_score = 2 * (precision * recall) / (precision + recall)
        self.precisions[query] = precision
        self.recalls[query] = recall
        self.fscores[query] = f_score
        dcg = sum(
            (2 ** score - 1) / math.log2(i + 2) for i, (_, score) in enumerate(results)
        )
        idcg = sum(
            (2 ** float(g) - 1) / math.log2(i + 2) for i, (_, g) in enumerate(reference)
        )
        self.ndcg[query] = dcg / idcg if idcg else 0.0

    def query_throughput(self) -> float:
        return self.counter / sum(self.search_times)

    def mean_precision(self) -> float:
        return mean(self.precisions.values())

    def mean_latency(self) -> float:
        return mean(self.search_times)

    def median_latency(self) -> float:
        return median(self.search_times)

    def summary(self) -> str:
        """Reference Efficiency.__str__ analog (efficiency.py:89-91):
        per-query precision/recall/fscore/ndcg + throughput, one string."""
        parts = [
            f"precision: {self.precisions}",
            f"recall: {self.recalls}",
            f"fscore: {self.fscores}",
        ]
        if self.search_times:
            parts.append(f"query_throughput: {self.query_throughput():.2f}")
            parts.append(f"median_latency_s: {self.median_latency():.4f}")
        parts.append(f"ndcg: {self.ndcg}")
        return "\n".join(parts)


def rank_eval(
    results,
    ratings,
    ext_cols: Sequence[str],
    k: int = 10,
    relevant_grade: int = 1,
):
    """-> (query_id, n_returned, n_rel_ret, n_rel_total,
    first_rel_rank): ES ``_rank_eval`` API analog as a DataFrame
    operator — per query, the EXACT count numerators of the classic
    rated-retrieval metrics over the top-``k`` of a resolved result
    frame (``rank`` column = retrieval order) against a ratings frame
    (query_id, <ext_cols...>, grade). A document is relevant when
    ``grade >= relevant_grade`` (the ES relevant_rating_threshold).
    The floats derive client-side from exact integers (the repo's
    no-float-ratio rule): precision@k = n_rel_ret/n_returned, recall@k
    = n_rel_ret/n_rel_total, MRR = 1/first_rel_rank (NULL
    first_rel_rank = no relevant doc returned — the reciprocal rank is
    0). Unlike the reference-quirk :class:`EvalStats` (plain Python,
    formula-identical to src/efficiency.py:41-91), this one is
    distributed: a query batch of millions evaluates as one bounded
    join + two partial-aggregable groupBys — corpus size never
    appears (ratings tables are human-rated, inherently small; the
    results side is queries x k). Queries with no result rows emit
    nothing (the frame is results-driven, like every result-set
    aggregation here)."""
    from pyspark.sql import functions as F

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    need = ["query_id", *ext_cols, "grade"]
    missing = [c for c in need if c not in ratings.columns]
    if missing:
        raise ValueError(f"ratings frame lacks columns {missing}")
    if "rank" not in results.columns:
        raise ValueError("results frame lacks a 'rank' column")
    g = F.col("grade") >= relevant_grade
    topk = (results.filter(F.col("rank") <= k)
            .select("query_id", *ext_cols, "rank"))
    j = topk.join(ratings.select(*need), ["query_id", *ext_cols], "left")
    per_q = j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_returned"),
        F.sum(F.when(g, 1).otherwise(0)).cast("long").alias("n_rel_ret"),
        F.min(F.when(g, F.col("rank"))).cast("long")
        .alias("first_rel_rank"),
    )
    totals = (
        ratings.filter(g).groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rel_total"))
    )
    return (
        per_q.join(totals, "query_id", "left")
        .select(
            "query_id", "n_returned", "n_rel_ret",
            F.coalesce("n_rel_total", F.lit(0).cast("long"))
            .alias("n_rel_total"),
            "first_rel_rank",
        )
        .orderBy("query_id")
    )
