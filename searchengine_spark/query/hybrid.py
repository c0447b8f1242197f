"""Hybrid lexical + vector retrieval with reciprocal-rank fusion — the
Elasticsearch 8.x ``rrf`` retriever analog (Cormack, Clarke & Buettcher,
SIGIR 2009: "Reciprocal Rank Fusion outperforms Condorcet and individual
rank learning methods").

Composition, not a new engine: the text ranking is the packed index's
BM25 WAND batch (query/wand.py), the vector ranking is the embedding
family's cosine top-k (textops/similarity.py — brute for the exact
baseline, IVF for the partition-pruned scale path), and the fusion is
pure rank arithmetic over the two BOUNDED candidate frames
(queries x n_candidates rows each — broadcast-sized by construction, so
the fuse costs ONE small exchange regardless of corpus size).

Fusion contract (gated in tests/test_hybrid.py):

- per ranking system, a doc's contribution is ``scale // (k_rrf + rank)``
  with INTEGER division (rank 1-based within its system) — the classic
  RRF 1/(k+r) in exact integer micro-units, following the repo's
  cross-engine float protocol (CLAUDE.md): integer division of two
  BIGINTs is bit-identical in Spark, DuckDB and Python, while a float
  1/(k+r) sum depends on summation order. ``k_rrf=60`` (the paper's
  and ES's default), ``scale=1_000_000``.
- ``rrf_score`` = SUM of contributions over the systems that ranked the
  doc (absent from a system = contributes 0, the standard convention);
  ties rank by doc_id asc — the repo-wide deterministic tie-break.
- fusion sees only each system's TOP-``n_candidates`` (ES ``rank_window_size``):
  a doc outside both windows cannot appear, the documented
  window-not-corpus semantics every RRF implementation has.

No reference counterpart (the reference is text-only; this is the
LLM-pipeline bridge between its BM25 surface and the embedding ops the
north star adds).
"""

from __future__ import annotations

from functools import reduce
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig

DEFAULT_K_RRF = 60
DEFAULT_SCALE = 1_000_000


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    k_rrf: int = DEFAULT_K_RRF,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Fuse N (query_id, doc_id, rank) candidate frames ->
    (query_id, doc_id, rrf_score, rank): top-``k`` per query by
    ``SUM(scale // (k_rrf + rank))`` (exact BIGINT arithmetic), doc_id-asc
    ties. Inputs are bounded candidate lists (queries x window rows), so
    the plan is one union + one small hash aggregate + one bounded
    window — corpus size never appears."""
    if not rankings:
        raise ValueError("pass at least one ranking frame")
    if k_rrf < 0 or scale <= 0:
        raise ValueError(f"k_rrf must be >= 0 and scale > 0, got {k_rrf}/{scale}")
    parts = [r.select("query_id", "doc_id", "rank") for r in rankings]
    uni = reduce(DataFrame.unionByName, parts)
    contrib = F.expr(f"{int(scale)}L div ({int(k_rrf)}L + rank)")
    fused = (
        uni.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").cast("long").alias("rrf_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf_score",
                F.col("rank").cast("long").alias("rank"))
    )


def linear_fuse(
    rankings: Sequence[DataFrame],
    weights: Optional[Sequence[float]] = None,
    k: int = 10,
) -> DataFrame:
    """ES 8.16 ``linear`` retriever with the ``minmax`` normalizer ->
    (query_id, doc_id, linear_score, rank): fuse N (query_id, doc_id,
    score) candidate frames by weighted sum of per-system minmax-
    normalized scores, in the repo's exact integer protocol.

    Arithmetic (all BIGINT after one rounding of the 6dp score to
    micro-units — exact, scores are 6dp multiples):

    - per (system, query): ``norm_micro = (s - min) * 1e6 div
      (max - min)`` over that system's candidate window (0..1e6). A
      degenerate system (max == min for a query) normalizes to 1e6 for
      all its docs — documented choice, deterministic.
    - contribution = ``w_micro * norm_micro div 1e6``; ``linear_score``
      = BIGINT sum over systems that ranked the doc (absent = 0, the
      ES convention). Ties rank doc_id asc.

    Like RRF, fusion sees only each system's candidate window
    (rank_window_size semantics): bounded frames, one union + two
    bounded windows + one small aggregate — corpus size never
    appears."""
    if not rankings:
        raise ValueError("pass at least one ranking frame")
    ws = [1.0] * len(rankings) if weights is None else list(weights)
    if len(ws) != len(rankings):
        raise ValueError(
            f"{len(ws)} weights vs {len(rankings)} ranking frames")
    if any(w < 0 for w in ws):
        raise ValueError(f"weights must be >= 0, got {ws}")
    parts = []
    for i, (r, w) in enumerate(zip(rankings, ws)):
        wm = int(round(w * 1_000_000))
        sm = F.round(F.col("score") * F.lit(1_000_000.0), 0).cast("long")
        parts.append(r.select(
            "query_id", "doc_id", sm.alias("sm"),
            F.lit(i).alias("sys"), F.lit(wm).cast("long").alias("wm")))
    uni = reduce(DataFrame.unionByName, parts)
    wq = Window.partitionBy("sys", "query_id")
    normed = (
        uni.withColumn("mn", F.min("sm").over(wq))
        .withColumn("mx", F.max("sm").over(wq))
        .withColumn(
            "norm",
            F.when(F.col("mx") == F.col("mn"),
                   F.lit(1_000_000).cast("long"))
            .otherwise(F.expr("(sm - mn) * 1000000 div (mx - mn)")),
        )
    )
    fused = (
        normed.select(
            "query_id", "doc_id",
            F.expr("wm * norm div 1000000").alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").cast("long").alias("linear_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("linear_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "linear_score",
                F.col("rank").cast("long").alias("rank"))
    )


def cosine_candidates(
    embeddings: DataFrame,
    query_vecs: Sequence[Sequence[float]],
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query brute cosine top-``n_candidates`` ->
    (query_id, doc_id, cosine, rank). The exact vector baseline; swap in
    ``ivf_topk_indexed`` output (renamed to this shape) for the
    partition-pruned scale path — ``hybrid_topk`` accepts any
    (query_id, doc_id, rank) frame via ``vector_candidates``."""
    from ..textops.similarity import cosine_topk

    frames: List[DataFrame] = []
    for qid, vec in enumerate(query_vecs):
        top = cosine_topk(embeddings, list(vec), k=n_candidates,
                          id_col=id_col, vec_col=vec_col)
        frames.append(top.select(
            F.lit(qid).alias("query_id"),
            F.col(id_col).cast("long").alias("doc_id"),
            "cosine",
        ))
    uni = reduce(DataFrame.unionByName, frames)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("doc_id")
    )
    return uni.withColumn("rank", F.row_number().over(w))


def hybrid_topk(
    pidx,
    embeddings: DataFrame,
    queries: Sequence[str],
    query_vecs: Sequence[Sequence[float]],
    cfg: TokenizerConfig,
    k: int = 10,
    n_candidates: int = 50,
    k_rrf: int = DEFAULT_K_RRF,
    scale: int = DEFAULT_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vector_candidates: Optional[DataFrame] = None,
    **wand_kwargs,
) -> DataFrame:
    """Hybrid BM25 + cosine retrieval -> (query_id, doc_id, rrf_score,
    rank): each query runs BOTH systems to their top-``n_candidates``
    (text: the single-exchange WAND batch; vector: brute cosine, or any
    prebuilt (query_id, doc_id, rank) frame via ``vector_candidates`` —
    e.g. the IVF index's partition-pruned top-k), then RRF-fuses.

    doc_id namespaces must align: the packed index's single external id
    column must be the embedding table's ``id_col`` (the
    documents/embeddings testdata contract). Indexes with compound
    external ids are refused — fuse on your own join key instead.
    Extra kwargs reach ``bm25_topk_packed_batch`` (exhaustive,
    doc_filter, ...)."""
    from .wand import bm25_topk_packed_batch, resolve_docs

    if len(queries) != len(query_vecs) and vector_candidates is None:
        raise ValueError(
            f"{len(queries)} text queries vs {len(query_vecs)} query "
            "vectors — hybrid queries are (text, vector) pairs"
        )
    ext = [c for c in pidx.manifest["order_cols"] if c != "doc_id"]
    if len(ext) != 1:
        raise ValueError(
            f"hybrid fusion needs a single external id column to join the "
            f"embedding namespace; this index has order_cols={ext} — "
            "resolve + fuse with rrf_fuse on your own key instead"
        )
    topk = bm25_topk_packed_batch(
        pidx, queries, cfg, k=n_candidates, round_dp=6, **wand_kwargs
    )
    text = resolve_docs(pidx, topk).select(
        "query_id",
        F.col(ext[0]).cast("long").alias("doc_id"),
        F.col("rank").cast("int").alias("rank"),
    )
    vec = vector_candidates if vector_candidates is not None else (
        cosine_candidates(embeddings, query_vecs, n_candidates=n_candidates,
                          id_col=id_col, vec_col=vec_col)
    )
    return rrf_fuse([text, vec], k=k, k_rrf=k_rrf, scale=scale)
