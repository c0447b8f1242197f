"""Field collapse — the ES ``collapse`` analog: top-k GROUPS per query
(one result per conversation instead of one per turn), each group
represented by its best-scoring doc.

Semantics (ES collapse on a keyword field, BM25-sorted):

- group score = the group's MAX doc score (rounded when ``round_dp`` is
  set — the repo's cross-engine ranking contract);
- the group's representative doc = the smallest doc_id among the docs
  achieving that max (the same doc_id-asc tie-break every ranked
  surface here uses);
- groups rank (score desc, representative doc_id asc), cut at k.

Plan shape: collapse is inherently a score-ALL operation — any doc
could be its group's max, so a top-k candidate cut before the group
aggregation would silently drop groups (ES pays the same cost: collapse
disables early-termination there too). The pipeline is the score-all
WAND surface (``bm25_scores_packed_batch``: pushed ``In(term,…)`` scan,
literal-map fan-out, ONE (query_id, chunk) exchange, per-task pandas
frames bounded by chunk_docs), then a doc_id join to the PRUNED docmap
view for the collapse key (exchange sized by the matched-doc count —
the one inherent collapse cost), then a map-side-combinable
max(struct(score, -doc_id)) per (query, group) — partial aggregation
keeps the shuffle at one row per (query, group, partition) — and a
row_number window cut to k (the repo's established final-rank shape;
input is one row per matched GROUP, already aggregated).

No reference counterpart (the reference serves flat ranked lists only);
semantics follow Elasticsearch's documented collapse contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..indexing.packed import PackedIndex
from ..tokenizer import TokenizerConfig


def collapse_topk_packed(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    group_col: str | None = None,
    round_dp: int | None = None,
    conjunctive: bool = False,
    exclude_terms: dict | None = None,
    min_should_match: int | None = None,
) -> DataFrame:
    """Top-k collapsed groups per query -> (query_id, <group_col>,
    doc_id, score, rank) where doc_id is the group's best hit.

    ``group_col`` names one of the index's external-id columns
    (``order_cols``; default = the first one, conv_id for transcripts).
    Collapsing on the leading order col is the natural grouping the
    docID assignment already clusters by — the docmap join is
    range-friendly — but any order col works.

    ``conjunctive`` / ``exclude_terms``: the bm25_and / must_not
    contracts, applied per DOC before the group max (an excluded turn
    cannot represent its conversation; a conversation whose only
    matches are excluded vanishes) — the ES post_filter-before-collapse
    ordering."""
    ext = [c for c in pidx.manifest["order_cols"] if c != "doc_id"]
    if not ext:
        raise ValueError(
            "collapse needs external-id columns to group by, but the "
            "index was built with order_cols=('doc_id',) only"
        )
    group_col = group_col or ext[0]
    if group_col not in ext:
        raise ValueError(
            f"group_col {group_col!r} is not one of the index's external "
            f"columns {ext}"
        )
    from .wand import bm25_scores_packed_batch

    scores = bm25_scores_packed_batch(
        pidx, queries, cfg, round_dp=round_dp, conjunctive=conjunctive,
        exclude_terms=exclude_terms, min_should_match=min_should_match,
    )
    return _collapse_from_scores(
        scores, pidx.docmap.select("doc_id", group_col), group_col, k
    )


def collapse_topk_federated(
    shards,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    group_col: str | None = None,
    round_dp: int | None = None,
    conjunctive: bool = False,
    exclude_terms: dict | None = None,
    min_should_match: int | None = None,
) -> DataFrame:
    """Federated field collapse -> (query_id, <group_col>, doc_id,
    score, rank) with doc_id in the federation namespace — EXACT for
    groups that SPAN shards too: the per-doc score-all surface
    (``bm25_scores_federated``: federation-global idf, shard-local
    dl_norm, per-base tombstone decoders) unions before the group max,
    so a conversation split across shards aggregates to one group with
    its true best hit (max over per-shard maxima IS the global max;
    hash-sharded builds never split conversations, but adopted /
    hand-assembled federations may). The docmap join unions the shards'
    pruned docmap views with base-shifted ids — same one-exchange shape
    as the single-index path."""
    from .federated import _check_compat, _doc_bases, bm25_scores_federated

    _check_compat(shards)
    manifests = [s.manifest["order_cols"] for s in shards]
    if any(m != manifests[0] for m in manifests):
        raise ValueError(
            f"shards disagree on order_cols: {manifests} — collapse needs "
            "one shared external-id schema"
        )
    ext = [c for c in manifests[0] if c != "doc_id"]
    if not ext:
        raise ValueError(
            "collapse needs external-id columns to group by, but the "
            "shards were built with order_cols=('doc_id',) only"
        )
    group_col = group_col or ext[0]
    if group_col not in ext:
        raise ValueError(
            f"group_col {group_col!r} is not one of the shards' external "
            f"columns {ext}"
        )
    scores = bm25_scores_federated(
        shards, queries, cfg, round_dp=round_dp, conjunctive=conjunctive,
        exclude_terms=exclude_terms, min_should_match=min_should_match,
    )
    from functools import reduce as _reduce

    docmap = _reduce(
        DataFrame.unionByName,
        [
            s.docmap.select(
                (F.col("doc_id").cast("long") + F.lit(base)).alias("doc_id"),
                group_col,
            )
            for s, base in zip(shards, _doc_bases(shards))
        ],
    )
    return _collapse_from_scores(scores, docmap, group_col, k)


def collapse_inner_hits_packed(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    n_inner: int = 3,
    group_col: str | None = None,
    round_dp: int | None = None,
    conjunctive: bool = False,
    exclude_terms: dict | None = None,
    min_should_match: int | None = None,
) -> DataFrame:
    """ES collapse WITH ``inner_hits``: for each of the query's top-k
    collapsed groups, its best ``n_inner`` hits -> (query_id,
    <group_col>, group_rank, doc_id, score, hit_rank). Group order and
    representatives match :func:`collapse_topk_packed` exactly (group
    score = max hit, rep = smallest doc among the max achievers — the
    hit_rank=1 row IS the representative); hits order (score desc,
    doc_id asc) within the group.

    Single pass over the score-all surface: one per-(query, group)
    window cut to n_inner (pushed down as a per-partition heap), the
    hit_rank=1 rows re-ranked into the top-k groups (queries x groups
    rows), then a broadcast semi of that bounded group list — the
    matched set is never window-ed twice."""
    if n_inner < 1:
        raise ValueError(f"n_inner must be >= 1, got {n_inner}")
    ext = [c for c in pidx.manifest["order_cols"] if c != "doc_id"]
    if not ext:
        raise ValueError(
            "collapse needs external-id columns to group by, but the "
            "index was built with order_cols=('doc_id',) only"
        )
    group_col = group_col or ext[0]
    if group_col not in ext:
        raise ValueError(
            f"group_col {group_col!r} is not one of the index's external "
            f"columns {ext}"
        )
    from .wand import bm25_scores_packed_batch

    scores = bm25_scores_packed_batch(
        pidx, queries, cfg, round_dp=round_dp, conjunctive=conjunctive,
        exclude_terms=exclude_terms, min_should_match=min_should_match,
    )
    keyed = scores.join(pidx.docmap.select("doc_id", group_col), "doc_id")
    wh = Window.partitionBy("query_id", group_col).orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    inner = keyed.withColumn(
        "hit_rank", F.row_number().over(wh).cast("int")
    ).filter(F.col("hit_rank") <= n_inner)
    wg = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    groups = (
        inner.filter(F.col("hit_rank") == 1)
        .withColumn("group_rank", F.row_number().over(wg).cast("int"))
        .filter(F.col("group_rank") <= k)
        .select("query_id", group_col, "group_rank")
    )
    return (
        inner.join(F.broadcast(groups), ["query_id", group_col])
        .select("query_id", group_col, "group_rank", "doc_id", "score",
                "hit_rank")
    )


def _collapse_from_scores(
    scores: DataFrame, docmap: DataFrame, group_col: str, k: int
) -> DataFrame:
    """(query_id, doc_id, score) x (doc_id -> group) -> ranked collapsed
    groups. The argmax under (score desc, doc_id asc) is ONE associative
    max: struct orders lexicographically, so max(struct(score,
    -doc_id)) is the best score with the SMALLEST doc_id among its
    achievers — map-side combinable, no window over raw docs; the
    row_number window sees one row per matched GROUP."""
    keyed = scores.join(docmap, "doc_id")
    best = keyed.groupBy("query_id", group_col).agg(
        F.max(
            F.struct(
                F.col("score"),
                (-F.col("doc_id")).alias("nid"),
            )
        ).alias("b")
    )
    rep = best.select(
        "query_id",
        group_col,
        (-F.col("b.nid")).cast("long").alias("doc_id"),
        F.col("b.score").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        rep.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
