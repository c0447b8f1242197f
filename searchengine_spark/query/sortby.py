"""Attribute-sorted retrieval — the ES ``sort`` clause: result order
comes from an ATTRIBUTE of the matched documents, not the relevance
score (``sort: [{"ts": "desc"}, "_score"]`` — newest-first search,
price-ordered listings, audit views).

Semantics (the ES contract; gated in tests/test_sortby.py):

- the query still decides WHICH docs match (BM25 OR — every doc
  containing any query term; ``conjunctive=True`` = every term), the
  sort decides their ORDER. Sorting the top-k-by-score window instead
  would be wrong — the attribute-best doc may rank 10,001st by score —
  so the matched set is the score-all surface, never a WAND cut.
- order: sort column asc/desc, then ``_score`` desc as the secondary
  (the ES default tiebreak when ``_score`` trails the sort spec), then
  doc_id asc (total, deterministic).
- docs with NO attribute value (NULL, or the external id absent from
  the attrs table — LEFT join) sort per ``missing``: ``"last"`` (the
  ES ``_last`` default) or ``"first"``. They are MATCHES and must
  appear, not drop — a sorted view that silently hides unpriced
  listings is a data bug.
- attributes live in the lakehouse table, not the index (the
  filter/facet/aggregation contract — the index stays a text index).

Plan shape: the standard single-exchange score-all batch, one bounded
docmap resolve join, one join to the pruned attrs scan, then a rank<=k
window Spark pushes down as WindowGroupLimit — a per-partition top-k
heap on the sort key, never a full sort of the matched set. That is
the honest cost of sort-by-attribute at scale (ES pays the same: every
shard heaps its matches by the sort key); comparisons only, so nothing
drifts cross-engine.

No reference counterpart (the reference ranks by score only).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..indexing.packed import PackedIndex
from ..tokenizer import TokenizerConfig

MISSING = ("last", "first")


def _sort_key(ascending: bool, missing: str):
    key = F.col("sort_value")
    if ascending:
        return key.asc_nulls_last() if missing == "last" else key.asc_nulls_first()
    return key.desc_nulls_last() if missing == "last" else key.desc_nulls_first()


def sort_by_attr_packed(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    attrs: DataFrame | None,
    sort_col: str,
    k: int = 10,
    ascending: bool = False,
    missing: str = "last",
    conjunctive: bool = False,
    round_dp: int | None = None,
    exclude_terms: dict | None = None,
) -> DataFrame:
    """Top-k per query by ATTRIBUTE order -> (query_id, doc_id,
    *ext_cols, sort_value, score, rank).

    ``attrs``: the attribute table keyed by the index's external id
    columns (order_cols), carrying ``sort_col`` — OR ``None`` to serve
    ``sort_col`` from the index's ``doc_attrs`` sidecar
    (indexing/attrs.py): the sort value attaches to the score-all
    surface by a zero-exchange broadcast chunk join, and the docmap
    resolve moves AFTER the top-k cut (k rows instead of the matched
    set) — the scale path; the lakehouse join is the flexible path for
    ad-hoc columns. Both produce bit-identical results (gated in
    tests/test_sortby.py). ``round_dp`` rounds the secondary score
    before it tiebreaks (the rounded-ranking contract every surface
    here uses)."""
    if missing not in MISSING:
        raise ValueError(f"missing must be one of {MISSING}, got {missing!r}")
    ext_cols = [c for c in pidx.manifest["order_cols"] if c != "doc_id"]
    if attrs is not None:
        need = ext_cols + [sort_col]
        lacks = [c for c in need if c not in attrs.columns]
        if lacks:
            raise ValueError(f"attrs table lacks columns {lacks}")

    from .wand import bm25_scores_packed_batch

    scores = bm25_scores_packed_batch(
        pidx, list(queries), cfg, conjunctive=conjunctive,
        exclude_terms=exclude_terms)
    if round_dp is not None:
        scores = scores.withColumn("score", F.round("score", round_dp))
    w = Window.partitionBy("query_id").orderBy(
        _sort_key(ascending, missing), F.col("score").desc(),
        F.col("doc_id").asc())
    if attrs is None:
        from ..indexing.attrs import attach_attr

        valued = attach_attr(pidx, scores, sort_col, alias="sort_value")
        cut = (
            valued.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
        )
        return cut.join(pidx.docmap, "doc_id").select(
            "query_id", "doc_id", *ext_cols, "sort_value", "score", "rank")
    resolved = scores.join(pidx.docmap, "doc_id").select(
        "query_id", "doc_id", *ext_cols, "score")
    joined = resolved.join(
        attrs.select(*ext_cols, F.col(sort_col).alias("sort_value")),
        ext_cols, "left")
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", *ext_cols, "sort_value", "score",
                "rank")
    )


def sort_by_attr_federated(
    shards,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    attrs: DataFrame,
    sort_col: str,
    k: int = 10,
    ascending: bool = False,
    missing: str = "last",
    conjunctive: bool = False,
    round_dp: int | None = None,
    exclude_terms: dict | None = None,
) -> DataFrame:
    """Federated ES sort -> (query_id, doc_id, *ext_cols, sort_value,
    score, rank) with doc_id in the federation namespace — EXACT on any
    shard set: the matched set is the federated score-all surface
    (``bm25_scores_federated``: federation-global idf, shard-local
    dl_norm, per-base tombstone decoders — the dfs_query_then_fetch
    contract), resolved through the shards' base-shifted docmap views,
    then the SAME one-attrs-join + rank<=k WindowGroupLimit window as
    the single-index path (collapse_topk_federated's shape applied to
    the sort clause). Secondary-score ties are the rounded federated
    scores, so the order is deterministic across gathers."""
    from functools import reduce as _reduce

    from .federated import _check_compat, _doc_bases, bm25_scores_federated

    if missing not in MISSING:
        raise ValueError(f"missing must be one of {MISSING}, got {missing!r}")
    _check_compat(shards)
    manifests = [s.manifest["order_cols"] for s in shards]
    if any(m != manifests[0] for m in manifests):
        raise ValueError(
            f"shards disagree on order_cols: {manifests} — sort needs "
            "one shared external-id schema")
    ext_cols = [c for c in manifests[0] if c != "doc_id"]
    lacks = [c for c in ext_cols + [sort_col] if c not in attrs.columns]
    if lacks:
        raise ValueError(f"attrs table lacks columns {lacks}")
    scores = bm25_scores_federated(
        shards, list(queries), cfg, round_dp=round_dp,
        conjunctive=conjunctive, exclude_terms=exclude_terms)
    docmap = _reduce(
        DataFrame.unionByName,
        [
            s.docmap.select(
                (F.col("doc_id").cast("long") + F.lit(base)).alias("doc_id"),
                *ext_cols,
            )
            for s, base in zip(shards, _doc_bases(shards))
        ],
    )
    resolved = scores.join(docmap, "doc_id").select(
        "query_id", "doc_id", *ext_cols, "score")
    joined = resolved.join(
        attrs.select(*ext_cols, F.col(sort_col).alias("sort_value")),
        ext_cols, "left")
    w = Window.partitionBy("query_id").orderBy(
        _sort_key(ascending, missing), F.col("score").desc(),
        F.col("doc_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", *ext_cols, "sort_value", "score",
                "rank")
    )
