"""Exhaustive BM25 scorer — the exact path the rank-identical gate uses.

Reference scoring loop (src/models/rankers/bm25.py:34-57):

    score[doc] = sum over *unique* query terms t present in the index of
        idf_t * tf_dt*(k+1) / (tf_dt + k*(1 - b + b*dl_norm_d))

with idf_t = round(ln(N/df_t), 3) (bm25.py:105-106, read back from the
'.tiny' sidecar at query time) and dl_norm_d = round(dl_d/avgdl, 3)
(bm25.py:76-81, read back from the footer). Both roundings are therefore
part of the score contract (SURVEY.md §2.6.1) and our inputs are the stored
``term_stats.idf`` / ``doc_lengths.dl_norm`` columns.

Quirks reproduced:
- query-term multiplicity ignored (bm25.py:44-53 computes counts then
  overwrites the loop variable — effectively set-of-terms; SURVEY.md §2.6.2);
- OR semantics: union of postings across terms, no intersection (§2.6.3);
- ties: deterministic (score desc, doc_id asc) on both engines (§2.6.6).

Plan shape: broadcast the tiny query-term side into the index join (the
reference's RAF binary-search point lookup, src/models/index.py:93-131, is
exactly what a broadcast-join + term-partitioned scan pruning gives), then
join dl_norm and aggregate by doc. Top-k compiles to TakeOrderedAndProject
(per-partition heap + driver merge — no global sort).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..indexing.build import Bm25Params, IndexTables
from ..tokenizer import TokenizerConfig, tokenize_text


def _tf_saturation(tf, dl_norm, params: Bm25Params):
    k, b = float(params.k), float(params.b)
    return (tf * (k + 1.0)) / (tf + k * (1.0 - b + b * dl_norm))


def bm25_score_terms(
    it: IndexTables,
    terms: Sequence[str],
    params: Bm25Params = Bm25Params(),
) -> DataFrame:
    """Score every matching doc for a pre-tokenized query. Returns
    (doc_id, score), unordered (OR semantics over unique terms)."""
    spark = it.index.sparkSession
    uniq = list(dict.fromkeys(terms))  # multiplicity ignored (bm25.py:53)
    qdf = spark.createDataFrame([(t,) for t in uniq] or [("",)], "term string")
    if not uniq:
        qdf = qdf.limit(0)
    matched = it.index.join(F.broadcast(qdf), "term", "inner")
    matched = matched.join(F.broadcast(it.term_stats.select("term", "idf")), "term")
    scored = matched.join(it.doc_lengths.select("doc_id", "dl_norm"), "doc_id")
    contrib = F.col("idf") * _tf_saturation(
        F.col("tf").cast("double"), F.col("dl_norm"), params
    )
    return scored.groupBy("doc_id").agg(F.sum(contrib).alias("score"))


def bm25_topk(
    it: IndexTables,
    query: str,
    cfg: TokenizerConfig,
    k: int = 10,
    params: Bm25Params = Bm25Params(),
) -> DataFrame:
    """Top-k (doc_id, score) for one query string; deterministic tie-break
    (score desc, doc_id asc) — policy SURVEY.md §2.6.6."""
    terms = tokenize_text(query, cfg)  # query tokenized like docs (searcher.py:41-42)
    scores = bm25_score_terms(it, terms, params)
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_topk_batch(
    it: IndexTables,
    queries: List[str],
    cfg: TokenizerConfig,
    k: int = 10,
    params: Bm25Params = Bm25Params(),
) -> DataFrame:
    """All queries in one plan: (query_id, doc_id, score, rank), rank<=k.

    One broadcast join for every query's terms at once; per-query top-k via
    a window partitioned by query_id (parallel across queries — unlike a
    global window, this scales with the query batch).
    """
    spark = it.index.sparkSession
    rows = []
    for qid, q in enumerate(queries):
        for t in dict.fromkeys(tokenize_text(q, cfg)):
            rows.append((qid, t))
    qdf = spark.createDataFrame(rows or [(0, "")], "query_id int, term string")
    if not rows:
        qdf = qdf.limit(0)
    matched = it.index.join(F.broadcast(qdf), "term", "inner")
    matched = matched.join(F.broadcast(it.term_stats.select("term", "idf")), "term")
    scored = matched.join(it.doc_lengths.select("doc_id", "dl_norm"), "doc_id")
    contrib = F.col("idf") * _tf_saturation(
        F.col("tf").cast("double"), F.col("dl_norm"), params
    )
    agg = scored.groupBy("query_id", "doc_id").agg(F.sum(contrib).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return agg.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
