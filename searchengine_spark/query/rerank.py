"""Retrieve-then-rerank — the two-stage ranking stack every modern
search deployment runs (BM25/hybrid recall stage -> expensive scorer
over the top-N window only): candidates from the packed WAND batch,
doc texts fetched with ONE pruned semi-join (the snippet/PRF pattern —
sized by queries x n_candidates, never the corpus), then a pluggable
Arrow-batched pair scorer re-ranks the window.

The scorer seam is where a real cross-encoder goes (load the model once
per executor inside the pandas function, score (query, doc) pairs per
Arrow batch — the standard Spark model-inference shape; no model ships
in this container). The DEFAULT scorer is not a stub, though: exact
token-set Jaccard in integer micro-units —
``floor(1e6 * |q ∩ d| / |q ∪ d|)`` over the engine's tokenize chain —
a real lexical reranker (query coverage beats BM25's saturation on some
queries) whose arithmetic is integer-exact and therefore
DuckDB-oracle-gated end-to-end, the same bar every other operator here
meets. A learned scorer slots in without touching the plumbing.

Rank contract: (rr_score desc, doc_id asc), scores BIGINT micro-units;
docs outside the candidate window never appear (window-not-corpus, the
rerank contract). No reference counterpart.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tokenizer import TokenizerConfig, tokenize_text

RR_SCALE = 1_000_000

# scorer contract: (query_text, list of doc_texts) -> list of BIGINT
# scores (micro-units or any integer scale — only the order matters)
Scorer = Callable[[str, List[str]], List[int]]


def jaccard_scorer(cfg: TokenizerConfig) -> Scorer:
    """The default lexical reranker: exact-integer token-set Jaccard
    (floor(RR_SCALE * |inter| / |union|); empty-union pairs score 0)."""

    def score(qtext: str, dtexts: List[str]) -> List[int]:
        q = set(tokenize_text(qtext, cfg))
        out = []
        for d in dtexts:
            dt = set(tokenize_text(d or "", cfg))
            union = len(q | dt)
            out.append(0 if union == 0 else
                       (RR_SCALE * len(q & dt)) // union)
        return out

    return score


_RR_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("rr_score", T.LongType(), False),
    ]
)


def rerank_topk(
    pidx,
    source: DataFrame,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    n_candidates: int = 50,
    scorer: Scorer | None = None,
    text_col: str = "text",
    **wand_kwargs,
) -> DataFrame:
    """-> (query_id, doc_id, rr_score, rank): BM25 top-``n_candidates``
    per query, texts fetched from ``source`` (the lakehouse table
    carrying the index's single external id column + ``text_col``) via
    one pruned join, re-scored by ``scorer`` (default
    :func:`jaccard_scorer`) in Arrow batches, top-``k`` by
    (rr_score desc, doc_id asc). Extra kwargs reach the WAND batch."""
    from .wand import bm25_topk_packed_batch, resolve_docs

    if n_candidates < k:
        raise ValueError(f"n_candidates ({n_candidates}) must be >= k ({k})")
    ext = [c for c in pidx.manifest["order_cols"] if c != "doc_id"]
    if len(ext) != 1:
        raise ValueError(
            f"rerank needs a single external id column to join the source "
            f"table; this index has order_cols={ext}"
        )
    if text_col not in source.columns or ext[0] not in source.columns:
        raise ValueError(f"source table lacks {ext[0]!r}/{text_col!r}")
    score_fn = scorer if scorer is not None else jaccard_scorer(cfg)
    qtexts = {i: q for i, q in enumerate(queries)}

    topk = bm25_topk_packed_batch(
        pidx, queries, cfg, k=n_candidates, round_dp=6, **wand_kwargs
    )
    hits = resolve_docs(pidx, topk).select(
        "query_id", F.col(ext[0]).cast("long").alias("doc_id")
    )
    pairs = hits.join(
        source.select(F.col(ext[0]).cast("long").alias("doc_id"),
                      F.col(text_col).alias("_se_text")),
        "doc_id",
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int32"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "rr_score": pd.Series([], dtype="int64")})
        qid = int(pdf["query_id"].iloc[0])
        scores = score_fn(qtexts[qid], list(pdf["_se_text"]))
        return pd.DataFrame(
            {"query_id": qid, "doc_id": pdf["doc_id"].astype("int64"),
             "rr_score": pd.Series(scores, dtype="int64")})

    scored = pairs.groupBy("query_id").applyInPandas(
        score_group, schema=_RR_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rr_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rr_score", "rank")
    )
