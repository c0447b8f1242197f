"""ES ``match_bool_prefix`` — the bool_prefix member of the
search-as-you-type family (the sibling of query/phrase.py's
``phrase_prefix``): the analyzed query's every term but the last becomes
an ordinary scoring term clause, the LAST becomes a prefix query, and
the whole thing is a bool ``should`` (OR — a doc matching only the
prefix still ranks). Unlike phrase_prefix, terms may match anywhere in
any order — no positions are read at all, which is why ES recommends
bool_prefix for cheap completion.

Scoring contract:

- full terms score ordinary BM25 (the engine's OR scorer; query-term
  multiplicity ignored — the engine-wide unique-terms quirk);
- the prefix clause contributes a CONSTANT 1.0 to every doc containing
  at least one dictionary expansion of the prefix — the Lucene
  ``CONSTANT_SCORE_BLENDED``/constant-score rewrite every multi-term
  query defaults to inside ES (a prefix over thousands of terms never
  sums per-expansion idf);
- expansions come from the term_stats dictionary: live terms starting
  with the prefix, df DESC then term ASC, capped at ``max_expansions``
  (the wildcard family's deterministic cap — query/wildcard.py);
- ties rank by rounded score then doc_id (repo-wide policy).

Composition (both pieces already gated): the full-term side is
bm25_scores_packed_batch's score-all surface (a top-k cut there would
drop docs that only match the prefix), the prefix side is
boolean_search_packed OR over the expansions with the ``query_terms``
bypass (expansions are already analyzed — re-tokenizing would re-stem),
then ONE outer join on (query_id, doc_id) and a per-query rank window.

No reference counterpart; semantics follow the Elasticsearch
match_bool_prefix query.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig, tokenize_text
from .wildcard import DEFAULT_MAX_EXPANSIONS, expand_patterns


def split_bool_prefix(query: str, cfg: TokenizerConfig) -> tuple[list, str]:
    """(full_terms, prefix): analyzed terms except the last occurrence-
    position token, which is the prefix-in-progress. The prefix is NOT
    deduplicated away from the full terms (ES keeps both clauses when
    the user re-types a word they already used)."""
    toks = tokenize_text(query, cfg)
    if not toks:
        return [], ""
    return list(dict.fromkeys(toks[:-1])), toks[-1]


def match_bool_prefix_topk(
    pidx,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    round_dp: int | None = None,
) -> DataFrame:
    """-> (query_id, doc_id, score, rank): ES match_bool_prefix over the
    packed index, one batch plan for every query."""
    from .wand import bm25_scores_packed_batch, boolean_search_packed

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    split = [split_bool_prefix(q, cfg) for q in queries]
    prefixes = list(dict.fromkeys(p for _, p in split if p))
    expanded = expand_patterns(
        pidx.term_stats, [p + "*" for p in prefixes],
        max_expansions=max_expansions,
    ) if prefixes else {}
    exp_of = {p: expanded.get(p + "*", []) for p in prefixes}

    term_lists = [full for full, _ in split]
    scores = bm25_scores_packed_batch(
        pidx, list(queries), cfg, round_dp=None, query_terms=term_lists)

    exp_lists = [exp_of.get(p, []) if p else [] for _, p in split]
    pref = boolean_search_packed(
        pidx, list(queries), cfg, op="or", query_terms=exp_lists,
    ).select("query_id", "doc_id", F.lit(1.0).alias("pref"))

    combined = (
        scores.select("query_id", "doc_id", "score")
        .join(pref, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id", "doc_id",
            (F.coalesce(F.col("score"), F.lit(0.0))
             + F.coalesce(F.col("pref"), F.lit(0.0))).alias("score"),
        )
    )
    if round_dp is not None:
        combined = combined.withColumn("score", F.round("score", round_dp))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (
        combined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
