"""Pseudo-relevance feedback (Rocchio) and more-like-this retrieval.

Classic IR capabilities the reference never exposes (its query surface is
single-pass ranking, src/searcher.py) but which its positional/statistics
machinery makes one composition away — both are standard literature:

- **PRF / Rocchio expansion** (Rocchio 1971; MRS Ch. 9.1.1): run the
  query, treat the top-``r`` docs as relevant, add the ``m`` highest-
  weighted terms of that feedback set to the query at a reduced weight
  ``beta``, re-rank. Expansion-term weight is the Rocchio centroid mass
  w(t) = Σ_{d∈R} (1 + ln tf_{t,d}) · idf_t — the lnc·idf vector sum over
  the feedback docs, using the index's stored 3-dp idf.
- **More-like-this** (the Lucene MLT analog): use a DOCUMENT as the
  query — its top-``m`` terms by (1 + ln tf)·idf — and rank the corpus
  against them, excluding the source doc itself.

Spark shape: the feedback/source docs' term vectors come from the docs
stage's STORED tokens (pidx.doc_tokens(), pruned scan semi-joined to the
bounded doc set — tokenization never re-runs), the per-(query, term)
weight aggregation is one small shuffle bounded by r·|queries|·avgdl
rows, and the final retrieval rides the weighted-query WAND path
(term_weights fold into idf before the chunk bounds, so block-max
pruning stays exact). Cross-engine determinism: expansion terms are
ranked by their weight ROUNDED to 6 dp with term-asc tie-break (the same
policy every oracle entry uses for scores); ``beta`` defaults to 0.5 —
exactly representable, so the weighted score arithmetic is reproducible
in DuckDB to the last ulp modulo summation order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import window as W

from ..indexing.packed import PackedIndex
from ..tokenizer import TokenizerConfig, tokenize_text
from .wand import bm25_topk_packed_batch


def _expansion_weights(
    pidx: PackedIndex, fb: DataFrame, exclude: DataFrame
) -> DataFrame:
    """(query_id, doc_id) feedback pairs -> (query_id, term, weight):
    Rocchio centroid mass Σ_d (1 + ln tf) · idf over the feedback docs,
    minus the ``exclude`` (query_id, term) pairs (the original query
    terms for PRF; the empty set for MLT)."""
    toks = pidx.doc_tokens().join(
        F.broadcast(fb.select("query_id", "doc_id")), "doc_id"
    )
    tf = (
        toks.select("query_id", "doc_id", F.explode("tokens").alias("term"))
        .groupBy("query_id", "doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = (
        tf.withColumn("tf_w", F.lit(1.0) + F.log(F.col("tf").cast("double")))
        .groupBy("query_id", "term")
        .agg(F.sum("tf_w").alias("tf_mass"))
        .join(pidx.term_stats.select("term", "idf"), "term")
        .select(
            "query_id", "term",
            (F.col("tf_mass") * F.col("idf")).alias("weight"),
        )
    )
    return w.join(exclude, ["query_id", "term"], "left_anti")


def _top_m_terms(weights: DataFrame, m: int) -> DataFrame:
    """Top-``m`` expansion terms per query by (round(weight, 6) desc,
    term asc) — the deterministic cross-engine ordering."""
    win = W.Window.partitionBy("query_id").orderBy(
        F.round(F.col("weight"), 6).desc(), F.col("term").asc()
    )
    return (
        weights.withColumn("erank", F.row_number().over(win))
        .filter(F.col("erank") <= m)
        .select("query_id", "term", F.round("weight", 6).alias("weight"),
                "erank")
    )


def prf_expansion_terms(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    r: int = 5,
    m: int = 5,
    round_dp: int | None = 6,
) -> DataFrame:
    """-> (query_id, term, weight, erank): the ``m`` expansion terms PRF
    would add per query (feedback set = rounded-rank top-``r``), original
    query terms excluded. Exposed separately so the expansion choice
    itself is inspectable (and oracle-gateable)."""
    base = bm25_topk_packed_batch(pidx, queries, cfg, k=r, round_dp=round_dp)
    orig = pidx.spark.createDataFrame(
        [(qid, t) for qid, q in enumerate(queries)
         for t in dict.fromkeys(tokenize_text(q, cfg))],
        "query_id int, term string",
    )
    return _top_m_terms(_expansion_weights(pidx, base, orig), m)


def prf_bm25_topk_packed_batch(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    r: int = 5,
    m: int = 5,
    beta: float = 0.5,
    round_dp: int | None = None,
    exhaustive: bool = False,
) -> DataFrame:
    """Rocchio-expanded BM25 top-k -> (query_id, doc_id, score, rank).

    score(q, d) = Σ_{t∈q} idf·tfsat + beta · Σ_{t∈exp(q)} idf·tfsat —
    the binary-Rocchio reweighting (original terms at 1, expansion terms
    at ``beta``), riding the weighted-term WAND path. Two retrieval
    passes total (the PRF minimum): feedback ranking, then expanded
    ranking; the expansion selection between them is one bounded shuffle.
    The feedback cut always uses rounded-rank ordering (round_dp 6) so
    the expansion set — and therefore the final ranking — is
    deterministic across engines and retries."""
    exp = prf_expansion_terms(pidx, queries, cfg, r=r, m=m).collect()
    orig_terms = [list(dict.fromkeys(tokenize_text(q, cfg))) for q in queries]
    terms = [list(t) for t in orig_terms]
    weights: dict[int, dict[str, float]] = {}
    for row in exp:
        qid = int(row["query_id"])
        terms[qid].append(row["term"])
        weights.setdefault(qid, {})[row["term"]] = float(beta)
    return bm25_topk_packed_batch(
        pidx, queries, cfg, k=k, round_dp=round_dp, exhaustive=exhaustive,
        query_terms=terms, term_weights=weights or None,
    )


def more_like_this_packed(
    pidx: PackedIndex,
    doc_ids: Sequence[int],
    k: int = 10,
    m: int = 10,
    round_dp: int | None = None,
    exhaustive: bool = False,
) -> DataFrame:
    """Lucene MoreLikeThis analog -> (query_id, doc_id, score, rank),
    where query_id i corresponds to ``doc_ids[i]``. The source doc's
    top-``m`` terms by (1 + ln tf)·idf (rounded-6dp desc, term asc)
    become an unweighted BM25 query; the source doc itself is excluded
    from the results (rank re-numbered over the survivors, so callers
    still get k rows when available)."""
    spark = pidx.spark
    if not doc_ids:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, score double, rank int"
        )
    fb = spark.createDataFrame(
        [(i, int(d)) for i, d in enumerate(doc_ids)],
        "query_id int, doc_id long",
    )
    empty = spark.createDataFrame([], "query_id int, term string")
    top = _top_m_terms(_expansion_weights(pidx, fb, empty), m).collect()
    terms: list[list[str]] = [[] for _ in doc_ids]
    for row in top:
        terms[int(row["query_id"])].append(row["term"])
    out = bm25_topk_packed_batch(
        pidx, ["" for _ in doc_ids], None, k=k + 1, round_dp=round_dp,
        exhaustive=exhaustive, query_terms=terms,
    )
    src = F.create_map(
        *[x for i, d in enumerate(doc_ids) for x in (F.lit(i), F.lit(int(d)))]
    )
    kept = out.filter(F.col("doc_id") != src[F.col("query_id")])
    win = W.Window.partitionBy("query_id").orderBy(
        F.col("rank").asc()
    )
    return (
        kept.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
    )
