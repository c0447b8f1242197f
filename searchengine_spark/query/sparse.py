"""ES ``sparse_vector`` / ``text_expansion`` query — learned-sparse
retrieval serving (the ELSER/SPLADE-family surface: documents carry a
sparse {token: weight} map produced by a model, the query is expanded
to its own {token: weight} map, and the score is the dot product
Σ_t w_q(t)·w_d(t), served from an inverted index over the tokens).

The engine stays model-agnostic (no ML runtime in this container —
weights arrive as data, exactly how ES ingests ELSER output as a
``sparse_vector`` field): the index is a term-range-partitioned parquet
table of (term, doc_id, weight_micro) with weights in INTEGER
micro-units (the repo's cross-engine float protocol — the model's
floats are floored to micro once at ingest, after which every engine
agrees bit-for-bit and the driver oracle hash-gates retrieval).

Plan shape (the 100-TB question): the query's terms push into the scan
as an ``In(term, …)`` row-group filter over the term-sorted layout
(plan-gated — the WAND dictionary-pruning story, applied to a weighted
table); query weights ride a LITERAL map fan-out, not a join (the
join-free scoring contract, wand.py Q2); one partial-aggregable
groupBy(doc) sums the products; the top-k is a rank window per query
(bounded by matched docs). Zero Python in the hot path — the whole
plan is native codegen.

No reference counterpart; semantics follow the Elasticsearch
sparse_vector query (weighted-OR: a doc matching ANY query token
scores; missing tokens contribute 0).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SPARSE_SCHEMA = "term string, doc_id bigint, weight_micro bigint"


def build_sparse_index(
    pairs: DataFrame,
    path: str,
    n_partitions: int = 32,
) -> None:
    """Write (term, doc_id, weight_micro) as a term-range-partitioned,
    term-sorted parquet layout — the same physical idea as the packed
    index's dictionary ordering, so query-term pruning is a pushed scan
    filter. ``weight_micro`` must already be integer micro-units."""
    missing = [c for c in ("term", "doc_id", "weight_micro")
               if c not in pairs.columns]
    if missing:
        raise ValueError(f"pairs table lacks columns {missing}")
    (
        pairs.select("term", F.col("doc_id").cast("long"),
                     F.col("weight_micro").cast("long"))
        .repartitionByRange(n_partitions, "term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").parquet(path)
    )


def sparse_topk_batch(
    spark: SparkSession,
    path: str,
    query_weights: Sequence[Dict[str, int]],
    k: int = 10,
) -> DataFrame:
    """-> (query_id, doc_id, score_micro2, rank): ES sparse_vector
    retrieval for a batch of {term: weight_micro} queries off a
    :func:`build_sparse_index` layout. ``score_micro2`` is the exact
    BIGINT Σ w_q·w_d in micro² units (divide by 1e12 client-side for
    the float score — the exact-arithmetic discipline every aggregation
    here follows); rank by score desc then doc_id."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for qid, qw in enumerate(query_weights):
        for t, w in qw.items():
            if not isinstance(w, int):
                raise ValueError(
                    f"query {qid} term {t!r}: weights must be integer "
                    f"micro-units (floor(w * 1e6)), got {type(w).__name__}")
    all_terms = sorted({t for qw in query_weights for t in qw})
    if not all_terms:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, score_micro2 long, rank long")
    scan = spark.read.parquet(path).filter(F.col("term").isin(all_terms))
    # literal (term -> weight) map per query, fanned out join-free; a
    # term absent from a query contributes NULL -> filtered
    frames = []
    for qid, qw in enumerate(query_weights):
        if not qw:
            continue
        entries = [x for t, w in sorted(qw.items())
                   for x in (F.lit(t), F.lit(int(w)))]
        frames.append(
            scan.withColumn("_qw", F.create_map(*entries)[F.col("term")])
            .filter(F.col("_qw").isNotNull())
            .select(F.lit(qid).alias("query_id"), "doc_id",
                    (F.col("weight_micro") * F.col("_qw")).alias("_prod"))
        )
    uni = frames[0]
    for f in frames[1:]:
        uni = uni.unionByName(f)
    scored = uni.groupBy("query_id", "doc_id").agg(
        F.sum("_prod").cast("long").alias("score_micro2"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro2"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_micro2", "rank")
    )


def expand_text_deterministic(
    terms: Sequence[str], salt: str = "elser"
) -> Dict[str, int]:
    """A DETERMINISTIC stand-in for a learned query-expansion model
    (the real ELSER/SPLADE checkpoint cannot run in this container —
    same honesty contract as the multimodal decode stubs): weight each
    term by an md5-derived integer in [0.5e6, 1.5e6). Lets every tier
    and the oracle exercise the weighted-retrieval machinery with
    realistic-looking, cross-engine-reproducible weights."""
    import hashlib

    out = {}
    for t in dict.fromkeys(terms):
        h = int(hashlib.md5(f"{salt}|{t}".encode()).hexdigest()[:15], 16)
        out[t] = 500_000 + h % 1_000_000
    return out
