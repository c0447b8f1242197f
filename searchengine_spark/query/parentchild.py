"""Parent-child retrieval over conversation transcripts — the ES
join-field queries (``has_child`` / ``has_parent``) mapped onto the
corpus's NATURAL join: parent = conversation, child = turn. The
reference (and our index) scores turns; these operators move between
the two levels:

- :func:`has_child_topk` — "find CONVERSATIONS whose turns match the
  query": per-turn BM25 rides the score-all surface (a top-k cut would
  drop a conversation whose many mid-scoring turns sum high), then one
  partial-aggregable groupBy(conv) combines per ES ``score_mode``
  (max / sum / min / avg — max is ES's default) with the ES
  ``min_children`` / ``max_children`` bounds (a conversation must have
  between so-many and so-many matching turns to qualify).
- :func:`has_parent_doc_filter` — "find TURNS whose conversation
  satisfies a parent-level predicate": parent properties live in (or
  derive from) a conversation-level table; the filter resolves to a
  doc_filter frame that the ordinary attribute-filtered retrieval seam
  consumes (BEFORE the top-k heap — the filter_doc_ids contract).

Scoring contract (gated in tests/test_parentchild.py): per-turn scores
are rounded (round_dp) BEFORE the combine — the serving surface's own
rounding — and the combined score is re-rounded, ranked (score desc,
conv_id asc). ``avg`` divides the rounded sum by the matching-turn
count and FLOOR-TRUNCATES at round_dp (documented: ES computes avg on
unrounded floats; ours re-derives from the same rounded per-turn
scores both engines see — and because that quotient can land exactly
on a decimal tie, it takes the house floor-truncation policy for
tie-prone divisions rather than round(), which splits across
engines).

No reference counterpart; semantics follow the Elasticsearch
has_child / has_parent queries (join field type).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig

SCORE_MODES = ("max", "sum", "min", "avg")


def has_child_grouped(
    pidx,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: Optional[int] = None,
    round_dp: int = 6,
    parent_col: str = "conv_id",
) -> DataFrame:
    """-> (query_id, conv_id, score, n_matching): the qualifying parent
    set with combined scores, UNRANKED — the score-all surface the
    ranked :func:`has_child_topk` and the federated merge both cut.
    The groupBy is partial-aggregable (map-side combine), so the one
    exchange is parent-count-bounded."""
    from .wand import bm25_scores_packed_batch

    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    if max_children is not None and max_children < min_children:
        raise ValueError("max_children must be >= min_children")
    if parent_col not in pidx.docmap.columns:
        raise ValueError(f"docmap lacks parent column {parent_col!r}")
    scores = bm25_scores_packed_batch(
        pidx, list(queries), cfg, round_dp=round_dp)
    turns = scores.join(pidx.docmap.select("doc_id", parent_col), "doc_id")
    combine = {
        "max": F.max("score"), "sum": F.sum("score"),
        "min": F.min("score"), "avg": F.sum("score"),
    }[score_mode]
    grouped = turns.groupBy("query_id", parent_col).agg(
        combine.alias("_s"),
        F.count(F.lit(1)).cast("long").alias("n_matching"),
    )
    if score_mode == "avg":
        # avg divides a round_dp-multiple sum by an integer count: the
        # quotient can land EXACTLY on a decimal tie (x.xxxxxx5), where
        # Spark round (HALF_UP) disagrees with DuckDB/Python — so the
        # re-round is floor-truncation, the house policy for tie-prone
        # divisions (CLAUDE.md). The other modes re-round a value that
        # is already a round_dp multiple, where round() is exact.
        scale = F.lit(float(10 ** round_dp))
        grouped = grouped.withColumn(
            "score",
            F.floor(F.col("_s") / F.col("n_matching") * scale) / scale)
    else:
        grouped = grouped.withColumn("score", F.round("_s", round_dp))
    grouped = grouped.filter(F.col("n_matching") >= min_children)
    if max_children is not None:
        grouped = grouped.filter(F.col("n_matching") <= max_children)
    return grouped.select("query_id", parent_col, "score", "n_matching")


def has_child_topk(
    pidx,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: Optional[int] = None,
    k: int = 10,
    round_dp: int = 6,
    parent_col: str = "conv_id",
) -> DataFrame:
    """-> (query_id, conv_id, score, n_matching, rank): conversations
    ranked by their matching turns' combined BM25."""
    grouped = has_child_grouped(
        pidx, queries, cfg, score_mode=score_mode,
        min_children=min_children, max_children=max_children,
        round_dp=round_dp, parent_col=parent_col)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(parent_col))
    return (
        grouped.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", parent_col, "score", "n_matching", "rank")
    )


def has_parent_doc_filter(
    pidx,
    parent_attrs: DataFrame,
    predicate: str,
    parent_col: str = "conv_id",
) -> DataFrame:
    """-> (doc_id) frame of turns whose PARENT satisfies ``predicate``
    (a Spark SQL expression over the parent-level table) — feed it to
    any retrieval's ``doc_filter`` seam. ``parent_attrs`` carries one
    row per parent (conv_id + parent properties)."""
    if parent_col not in parent_attrs.columns:
        raise ValueError(f"parent_attrs lacks {parent_col!r}")
    if parent_col not in pidx.docmap.columns:
        raise ValueError(f"docmap lacks parent column {parent_col!r}")
    parents = parent_attrs.filter(F.expr(predicate)).select(parent_col)
    return pidx.docmap.join(
        F.broadcast(parents.distinct()), parent_col).select("doc_id")


def conversation_stats(pidx, parent_col: str = "conv_id") -> DataFrame:
    """-> (conv_id, n_turns, first_turn, last_turn): derived parent
    properties from the docmap alone — the parent table many
    has_parent predicates need (length/recency-class filters) without
    any extra source scan."""
    return pidx.docmap.groupBy(parent_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.min("turn_idx").cast("long").alias("first_turn"),
        F.max("turn_idx").cast("long").alias("last_turn"),
    )


def has_child_inner_hits(
    pidx,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: Optional[int] = None,
    k: int = 10,
    n_inner: int = 3,
    round_dp: int = 6,
    parent_col: str = "conv_id",
) -> DataFrame:
    """ES has_child ``inner_hits`` -> (query_id, conv_id, group_rank,
    hit_rank, doc_id, score): each top-``k`` conversation (the
    :func:`has_child_topk` ranking) carries its best ``n_inner``
    matching turns by per-turn score (doc_id ties) — from the SAME
    score-all pass, one extra bounded window (the collapse.inner_hits
    shape applied to the parent join)."""
    from .wand import bm25_scores_packed_batch

    if n_inner < 1:
        raise ValueError(f"n_inner must be >= 1, got {n_inner}")
    parents = has_child_topk(
        pidx, queries, cfg, score_mode=score_mode,
        min_children=min_children, max_children=max_children, k=k,
        round_dp=round_dp, parent_col=parent_col)
    scores = bm25_scores_packed_batch(
        pidx, list(queries), cfg, round_dp=round_dp)
    turns = scores.join(pidx.docmap.select("doc_id", parent_col), "doc_id")
    joined = turns.join(
        F.broadcast(parents.select(
            "query_id", parent_col,
            F.col("rank").alias("group_rank"))),
        ["query_id", parent_col],
    )
    w = Window.partitionBy("query_id", parent_col).orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("hit_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("hit_rank") <= n_inner)
        .select("query_id", parent_col, "group_rank", "hit_rank",
                "doc_id", "score")
    )


def children_terms_agg(
    pidx,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    attrs: DataFrame,
    value_col: str,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: Optional[int] = None,
    size: int = 10,
    round_dp: int = 6,
    parent_col: str = "conv_id",
) -> DataFrame:
    """ES ``children`` aggregation -> (query_id, value, n, rank): step
    from the query's QUALIFYING PARENTS (the has_child conversation
    set) down to ALL their child turns and bucket a child attribute —
    the join-field mirror of has_child (which steps child->parent to
    rank; this steps parent->children to aggregate). ES's children agg
    covers every child of the bucketed parents, matched or not — so
    counts run over the conversations' WHOLE turn sets, not just
    matching turns.

    ``attrs`` carries the child-level attribute keyed by the index's
    external id columns (order_cols minus doc_id — the facets
    contract); NULL values skip (the NULLs-drop rule); top-``size``
    buckets per query by (count desc, value asc).

    Plan: the qualifying-parent frame is conversation-bounded; one hash
    join to the docmap on parent_col, one join to the pruned attrs
    scan, one partial-aggregable groupBy, one rank<=size window
    (WindowGroupLimit)."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    ext = [c for c in pidx.manifest["order_cols"] if c != "doc_id"]
    missing = [c for c in ext + [value_col] if c not in attrs.columns]
    if missing:
        raise ValueError(f"attrs table lacks columns {missing}")
    if value_col in ext:
        raise ValueError(
            f"value_col {value_col!r} is one of the external id columns "
            f"{ext} — bucket an attribute, not the join key")
    parents = has_child_grouped(
        pidx, queries, cfg, score_mode=score_mode,
        min_children=min_children, max_children=max_children,
        round_dp=round_dp, parent_col=parent_col,
    ).select("query_id", parent_col)
    docmap = pidx.docmap
    mask = pidx.delete_mask()
    if mask is not None:
        # tombstoned turns never count (the delete-aware serving
        # contract — the scoring pass above already masks them at
        # decode; the docmap walk must match). The tombstone set is a
        # tiny sidecar — broadcast anti-join.
        dele = pidx.spark.createDataFrame(
            [(int(d),) for d in mask.arr], "doc_id long")
        docmap = docmap.join(F.broadcast(dele), "doc_id", "left_anti")
    turns = docmap.select(parent_col, *ext).join(parents, parent_col)
    vals = (
        turns.join(attrs.select(*ext, value_col), ext)
        .filter(F.col(value_col).isNotNull())
        .groupBy("query_id", F.col(value_col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n"), F.asc("value"))
    return (
        vals.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= size)
        .select("query_id", "value", "n", "rank")
    )
