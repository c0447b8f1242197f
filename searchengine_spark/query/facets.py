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


def shard_of(key: "F.Column", n_shards: int) -> "F.Column":
    """The repo-wide cross-engine shard hash (indexing/shards.py:52-60):
    top 60 bits of md5 of the stringified key, mod n_shards — DuckDB
    twin ``('0x' || substr(md5(k), 1, 15))::BIGINT % N``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
        .cast("long") % n_shards
    ).cast("int")


def approx_terms_agg(
    pairs: DataFrame,
    n_shards: int,
    shard_size: int,
    shard_key: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """ES distributed terms aggregation with its documented shard
    approximation -> (query_id, facet, value, n, err, rank): each shard
    returns only its local top-``shard_size`` buckets, the coordinator
    merges those bounded lists, and every returned bucket carries
    ``doc_count_error_upper_bound`` (``err``) — the exact worst-case
    undercount given which shards did not report the value.

    This is the ES semantics, not a new invention (terms-aggregation
    docs, "Document count error" / ``shard_size``): a shard that was
    TRUNCATED (had more distinct values than shard_size) may be hiding
    any unreported value with up to its last-returned bucket's count;
    a shard that returned everything hides nothing. So for a merged
    bucket, ``err = Σ last_returned(s)`` over truncated shards ``s``
    that did not report the value, and the ES guarantee gated in
    tests/test_approx_facets.py holds: ``n <= true count <= n + err``.

    ``pairs``: one row per (query_id, facet, value, doc) — the melted
    doc/value incidence (facet_counts' internal shape, or any exploded
    token/value table; rows must be doc-distinct for doc counts).
    Sharding is the repo's deterministic md5-mod over ``shard_key``
    (cross-engine, so the DuckDB oracle replays the exact shard split).

    Plan shape (the 1000-shard question): the per-shard count is ONE
    partial-aggregable groupBy; the shard-local cut is a window over
    (query, facet, shard) — each group bounded by that shard's distinct
    values; everything after operates on <= n_shards x shard_size rows
    per (query, facet) — the bounded coordinator gather that is the
    whole POINT of the ES design (the merge cost is fixed by the knobs,
    not by the value-space size)."""
    if n_shards < 1 or shard_size < 1:
        raise ValueError("n_shards and shard_size must be >= 1")
    shards = pairs.withColumn("shard", shard_of(F.col(shard_key), n_shards))
    counts = shards.groupBy("query_id", "facet", "shard", "value").agg(
        F.count(F.lit(1)).alias("n"))
    wsh = Window.partitionBy("query_id", "facet", "shard").orderBy(
        F.desc("n"), F.asc("value"))
    ranked = counts.withColumn("rn", F.row_number().over(wsh))
    # per-shard truncation floor: the last RETURNED count when the shard
    # had more buckets than shard_size, else 0 (ES: an exhaustive shard
    # contributes no error)
    trunc = (
        ranked.groupBy("query_id", "facet", "shard")
        .agg(
            F.max("rn").alias("n_buckets"),
            F.min(F.when(F.col("rn") <= shard_size, F.col("n"))).alias("last_n"),
        )
        .withColumn(
            "trunc",
            F.when(F.col("n_buckets") > shard_size, F.col("last_n"))
            .otherwise(F.lit(0)).cast("long"),
        )
        .select("query_id", "facet", "shard", "trunc")
    )
    total_trunc = trunc.groupBy("query_id", "facet").agg(
        F.sum("trunc").alias("total_trunc"))
    kept = ranked.filter(F.col("rn") <= shard_size).join(
        trunc, ["query_id", "facet", "shard"])
    merged = kept.groupBy("query_id", "facet", "value").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("trunc").alias("returned_trunc"),
    )
    wq = Window.partitionBy("query_id", "facet").orderBy(
        F.desc("n"), F.asc("value"))
    return (
        merged.join(total_trunc, ["query_id", "facet"])
        .withColumn(
            "err", (F.col("total_trunc") - F.col("returned_trunc")).cast("long"))
        .withColumn("rank", F.row_number().over(wq).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "facet", "value", "n", "err", "rank")
    )


def approx_facet_counts(
    results: DataFrame,
    attrs: DataFrame,
    facet_cols: Sequence[str],
    ext_cols: Sequence[str],
    n_shards: int,
    shard_size: int,
    k: int = 10,
) -> DataFrame:
    """facet_counts' shard-approximate sibling: the same melt over the
    result set's attribute rows, routed through :func:`approx_terms_agg`
    (sharded on the first external id column). Output adds ``err`` —
    each bucket's ES doc_count_error_upper_bound."""
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
        "query_id", F.col(list(ext_cols)[0]).alias("_shard_key"),
        F.explode(F.create_map(*melt)).alias("facet", "value"),
    ).filter(F.col("value").isNotNull())
    return approx_terms_agg(
        pairs, n_shards, shard_size, shard_key="_shard_key", k=k)
