"""Faceted search: ES terms-aggregation analog over retrieval results.

Given any RESOLVED result frame (``resolve_docs`` /
``resolve_docs_federated`` output, ranked or boolean) and the attribute
table keyed by the index's external ids, count the top-k attribute
values per facet column per query — the "drill-down sidebar" every
search UI hangs off the result set. Attributes deliberately live in the
source table, not the index (the same contract ``filter_doc_ids`` has,
wand.py): the index stays an inverted text index, the lakehouse table
stays the attribute store.

Plan shape (the 100-TB question): ONE exchange joining the hit set to
the attrs scan on the external key (sized by the result set — for
ranked retrieval that is queries x k rows, broadcast-sized; boolean
sets ride an ordinary shuffled join), then ONE partial-aggregable
groupBy over (query, facet, value) — the melt to (facet, value) pairs
is a zero-exchange generator — and a final window over the already-
aggregated (bounded: distinct values per facet) counts. Facet columns
are projected, so the attrs scan prunes to key + facet columns.

No reference counterpart (reference serves ranked lists only); the
semantics follow Elasticsearch terms aggregations: per facet column,
buckets are (value, doc count) sorted count-desc then value-asc
(deterministic tie), NULL attribute values are skipped (ES "missing"
buckets are opt-in), and a doc counts once per query regardless of its
score or rank.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def facet_counts(
    results: DataFrame,
    attrs: DataFrame,
    facet_cols: Sequence[str],
    ext_cols: Sequence[str],
    k: int = 10,
) -> DataFrame:
    """-> (query_id, facet, value, n, rank): top-``k`` values per facet
    per query over the result set.

    ``results``: any frame carrying ``query_id`` + the external-id
    columns (``ext_cols``, the index's order_cols). ``attrs``: the
    source/attribute table carrying ``ext_cols`` + every ``facet_cols``
    entry. Values are counted as strings (one uniform melt for mixed
    column types); NULLs are skipped."""
    if not facet_cols:
        raise ValueError("facet_cols must name at least one column")
    missing = [c for c in list(ext_cols) + list(facet_cols)
               if c not in attrs.columns]
    if missing:
        raise ValueError(f"attrs table lacks columns {missing}")
    hits = results.select("query_id", *ext_cols)
    joined = hits.join(attrs.select(*ext_cols, *facet_cols), list(ext_cols))

    melt = []
    for c in facet_cols:
        melt.extend([F.lit(c), F.col(c).cast("string")])
    pairs = joined.select(
        "query_id",
        F.explode(F.create_map(*melt)).alias("facet", "value"),
    ).filter(F.col("value").isNotNull())

    counts = pairs.groupBy("query_id", "facet", "value").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("query_id", "facet").orderBy(
        F.desc("n"), F.asc("value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "facet", "value", "n", "rank")
    )


def top_hits(
    results: DataFrame,
    attrs: DataFrame,
    facet_cols: Sequence[str],
    ext_cols: Sequence[str],
    n: int = 3,
) -> DataFrame:
    """-> (query_id, facet, value, hit_rank, *ext_cols, score): the ES
    ``top_hits`` sub-aggregation — for every (facet, value) bucket a
    query's result set touches, its best ``n`` hits in the RETRIEVAL'S
    OWN order (score desc, retrieval rank asc, external ids asc as the
    boolean-set fallback where rank is the constant 0). This is the
    "show 3 examples under each drill-down value" UI block; the bucket
    fan-out is a zero-exchange melt, and the window runs over the
    already-bounded hit set (queries x k rows for ranked retrieval) —
    corpus size never appears. NULL attribute values are skipped (ES
    ``missing`` is opt-in)."""
    if not facet_cols:
        raise ValueError("facet_cols must name at least one column")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    missing = [c for c in list(ext_cols) + list(facet_cols)
               if c not in attrs.columns]
    if missing:
        raise ValueError(f"attrs table lacks columns {missing}")
    keep = ["query_id", *ext_cols]
    has_score = "score" in results.columns
    has_rank = "rank" in results.columns
    if has_score:
        keep.append("score")
    if has_rank:
        keep.append("rank")
    hits = results.select(*keep)
    joined = hits.join(attrs.select(*ext_cols, *facet_cols), list(ext_cols))
    melt = []
    for c in facet_cols:
        melt.extend([F.lit(c), F.col(c).cast("string")])
    pairs = joined.select(
        *keep,
        F.explode(F.create_map(*melt)).alias("facet", "value"),
    ).filter(F.col("value").isNotNull())
    order = []
    if has_score:
        order.append(F.col("score").desc())
    if has_rank:
        order.append(F.col("rank").asc())
    order.extend(F.col(c).asc() for c in ext_cols)
    w = Window.partitionBy("query_id", "facet", "value").orderBy(*order)
    out_cols = ["query_id", "facet", "value", "hit_rank", *ext_cols]
    if has_score:
        out_cols.append("score")
    return (
        pairs.withColumn("hit_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("hit_rank") <= n)
        .select(*out_cols)
        .orderBy("query_id", "facet", "value", "hit_rank")
    )
