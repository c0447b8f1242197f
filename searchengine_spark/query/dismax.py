"""dis_max — the ES ``dis_max`` compound query: a doc matching several
subqueries scores its BEST subquery, plus ``tie_breaker`` times each of
the others (tie_breaker=0 is pure best-of, 1.0 degenerates to the
bool-should sum).

    score(doc) = max_i s_i(doc) + tie_breaker * (sum_i s_i(doc) - max)

Implementation is a composition over the score-all surface
(query/wand.py ``bm25_scores_packed_batch``): every (user query,
subquery) pair becomes one synthetic query id in a single flat-scorer
batch (ONE pushed scan + ONE exchange for the whole dis_max batch, not
one per subquery), then a map-side-combinable groupBy over
(user query, doc) computes max and sum as native aggregates, and the
row_number window cuts top-k. Score-all rather than WAND because a
doc's dis_max score needs EVERY subquery's score for it — a per-sub
top-k cut would mis-score docs ranking high in one sub and mid in
another (the same no-early-termination argument as field collapse).

No reference counterpart; semantics follow the ES dis_max contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..indexing.packed import PackedIndex
from ..tokenizer import TokenizerConfig, tokenize_text


def dismax_topk_packed(
    pidx: PackedIndex,
    query_groups: Sequence[Sequence[str]],
    cfg: TokenizerConfig,
    k: int = 10,
    tie_breaker: float = 0.0,
    round_dp: int | None = None,
) -> DataFrame:
    """Top-k per user query -> (query_id, doc_id, score, rank).

    ``query_groups``: one list of subquery STRINGS per user query (each
    subquery is an ordinary BM25 OR query over its tokens). A doc's
    score is its best subquery score plus ``tie_breaker`` in [0, 1]
    times each other subquery's score; rounding (``round_dp``) applies
    to the COMBINED score — the ranking contract every surface here
    uses. Duplicate subqueries within a group are collapsed (scoring
    one twice would double its tie_breaker contribution)."""
    if not 0.0 <= float(tie_breaker) <= 1.0:
        raise ValueError(
            f"tie_breaker must be in [0, 1], got {tie_breaker}"
        )
    flat, terms = _tokenize_groups(query_groups, cfg)
    spark = pidx.spark
    out_schema = ("query_id int, doc_id long, score double, rank int")
    if not flat:
        return spark.createDataFrame([], out_schema)

    from .wand import bm25_scores_packed_batch

    # one flat-scorer batch over ALL (user query, sub) pairs — raw
    # (unrounded) sub scores; rounding belongs to the combined score
    scores = bm25_scores_packed_batch(
        pidx, [""] * len(flat), cfg, query_terms=terms
    )
    return _combine(scores, flat, float(tie_breaker), round_dp, k)


def _tokenize_groups(query_groups, cfg):
    """-> (flat user-qids, per-synthetic-qid token lists) with per-group
    dedup — shared by both tiers."""
    flat: list = []
    terms: list = []
    for uq, subs in enumerate(query_groups):
        if not subs:
            raise ValueError(f"query group {uq} has no subqueries")
        seen: set = set()
        for sub in subs:
            toks = tuple(dict.fromkeys(tokenize_text(sub, cfg)))
            if not toks or toks in seen:
                continue
            seen.add(toks)
            flat.append(uq)
            terms.append(list(toks))
    return flat, terms


def dismax_topk_federated(
    shards,
    query_groups: Sequence[Sequence[str]],
    cfg: TokenizerConfig,
    k: int = 10,
    tie_breaker: float = 0.0,
    round_dp: int | None = None,
) -> DataFrame:
    """Federated dis_max -> (query_id, doc_id, score, rank) with doc_id
    in the federation namespace. EXACT: per-(user, sub, doc) scores come
    from the federated score-all surface (federation-global idf, shard-
    local dl_norm — the dfs_query_then_fetch contract), and a doc lives
    in one shard, so the max/sum combine over the unioned scores is the
    global one. One pushed per-shard scan union + one exchange for the
    whole batch, like the packed path."""
    if not 0.0 <= float(tie_breaker) <= 1.0:
        raise ValueError(
            f"tie_breaker must be in [0, 1], got {tie_breaker}"
        )
    flat, terms = _tokenize_groups(query_groups, cfg)
    spark = shards[0].spark
    if not flat:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, score double, rank int")
    from .federated import bm25_scores_federated

    scores = bm25_scores_federated(
        shards, [""] * len(flat), cfg, query_terms=terms
    )
    return _combine(scores, flat, float(tie_breaker), round_dp, k)


def _combine(scores: DataFrame, flat, tie: float, round_dp, k) -> DataFrame:
    sub_to_user = F.create_map(
        *[x for i, uq in enumerate(flat) for x in (F.lit(i), F.lit(uq))]
    )
    per_sub = scores.select(
        sub_to_user[F.col("query_id")].alias("query_id"),
        "doc_id",
        "score",
    )
    combined = (
        per_sub.groupBy("query_id", "doc_id")
        .agg(F.max("score").alias("smax"), F.sum("score").alias("ssum"))
        .select(
            "query_id",
            "doc_id",
            (F.col("smax")
             + F.lit(tie) * (F.col("ssum") - F.col("smax"))).alias("score"),
        )
    )
    if round_dp is not None:
        combined = combined.withColumn("score", F.round("score", round_dp))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        combined.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
