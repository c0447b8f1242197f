"""Pinned results — the ES ``pinned`` query: editorially promote
specific documents to the TOP in a given order, organic relevance
below ("sponsored result", "canonical doc first", merchandising).

Contract (ES pinned; gated in tests/test_pinned.py):

- pinned ids occupy ranks 1..p in the GIVEN order, regardless of
  relevance; organic results follow from rank p+1, EXCLUDING the
  pinned ids (a doc never appears twice);
- a pinned id absent from the corpus is skipped silently (the ES
  contract — editorial lists outlive deletions);
- a pinned doc that also matches organically shows its organic score
  (the left-join nicety); one that doesn't carries score NULL — it was
  promoted, not scored;
- the same pin list applies to every query in the batch (the
  editorial-list shape; per-query pins are a dict away but the CLI
  contract is one list).

Plan shape: the standard WAND batch fetches k + |pins| organic hits
(enough to fill rank p+1..k after exclusion — never a score-all), the
pin list is a |pins|-row literal frame broadcast against the docmap,
and one bounded window renumbers the union. Everything added is
pin-list-sized.

No reference counterpart; semantics follow the ES pinned query.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..indexing.packed import PackedIndex
from ..tokenizer import TokenizerConfig


def pinned_topk_packed(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    pins: Sequence,
    k: int = 10,
    round_dp: int | None = None,
    **wand_kwargs,
) -> DataFrame:
    """-> (query_id, doc_id, *ext_cols, score, pinned, rank). ``pins``:
    ordered external ids — scalars when the index has one external
    column, tuples matching ``order_cols`` otherwise. Extra kwargs pass
    to ``bm25_topk_packed_batch`` (conjunctive, exclude_terms, ...)."""
    ext_cols = [c for c in pidx.manifest["order_cols"] if c != "doc_id"]
    if not ext_cols:
        raise ValueError("pinned results need external-id columns")
    pin_rows = []
    for pos, p in enumerate(pins):
        tup = (p,) if not isinstance(p, (tuple, list)) else tuple(p)
        if len(tup) != len(ext_cols):
            raise ValueError(
                f"pin {p!r} wants {len(ext_cols)} external-id values "
                f"({ext_cols})")
        pin_rows.append((pos,) + tup)
    if not pin_rows:
        raise ValueError("pins must name at least one document")
    if len({r[1:] for r in pin_rows}) != len(pin_rows):
        raise ValueError("pins must be distinct")
    spark = pidx.spark

    from .wand import bm25_topk_packed_batch, resolve_docs

    organic = resolve_docs(pidx, bm25_topk_packed_batch(
        pidx, list(queries), cfg, k=k + len(pin_rows), round_dp=round_dp,
        **wand_kwargs))
    pin_df = spark.createDataFrame(
        pin_rows,
        schema=["_pos"] + ext_cols,
    )
    # pins arrive as whatever the caller typed (the CLI passes strings);
    # cast to the docmap's own column types so the join never mismatches
    dm_types = dict(pidx.docmap.dtypes)
    for c in ext_cols:
        pin_df = pin_df.withColumn(c, F.col(c).cast(dm_types[c]))
    # pins exist iff in the docmap (unknown ids skip); broadcast —
    # pin-list-sized
    pinned_docs = F.broadcast(pin_df).join(pidx.docmap, ext_cols)
    qids = spark.createDataFrame(
        [(i,) for i in range(len(queries))], "query_id int")
    pinned_all = qids.crossJoin(pinned_docs)
    # a pinned doc that also matched shows its organic score
    org_scores = organic.select("query_id", "doc_id",
                                F.col("score").alias("_oscore"))
    pinned_rows = (
        pinned_all.join(org_scores, ["query_id", "doc_id"], "left")
        .select(
            "query_id", "doc_id", *ext_cols,
            F.col("_oscore").alias("score"),
            F.lit(True).alias("pinned"),
            F.lit(0).alias("_tier"),
            F.col("_pos").alias("_ord"),
        )
    )
    organic_rows = (
        organic.join(
            F.broadcast(pin_df.select(*ext_cols)), ext_cols, "left_anti")
        .select(
            "query_id", "doc_id", *ext_cols, "score",
            F.lit(False).alias("pinned"),
            F.lit(1).alias("_tier"),
            F.col("rank").cast("long").alias("_ord"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_tier").asc(), F.col("_ord").asc(), F.col("doc_id").asc())
    return (
        pinned_rows.unionByName(organic_rows)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", *ext_cols, "score", "pinned", "rank")
    )
