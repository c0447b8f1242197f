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

Token pruning (the ES 8.15 ``prune`` / ``pruning_config`` option —
THE scale lever for learned-sparse retrieval, whose cost is dominated
by a few fat low-signal tokens): a query token is pruned when it is
BOTH frequent (df more than ``tokens_freq_ratio_threshold`` x the
average df — ES default 5) AND weak (query weight under
``tokens_weight_threshold`` x the query's average weight — ES default
0.4, here in micro-units: 400_000). The decisions are exact integer
arithmetic (df·n_terms > ratio·total_postings cross-multiplication;
micro-unit weight compare), reproduced verbatim by the driver oracle.
With ``rescore=True`` (ES ``only_score_pruned_tokens`` analog), the
pruned query retrieves a candidate page of ``k x rescore_mult`` docs
and the FULL query re-scores exactly those candidates — bounded exact
rescore, the two-phase pattern the SQ8/PQ vector paths already use.

The index layout carries a dictionary-sized stats sidecar for the
pruning decisions: ``<path>/postings`` (term-range-partitioned pairs),
``<path>/term_stats`` (term, df, max_weight_micro) and
``<path>/manifest.json`` (n_terms, total_postings).

No reference counterpart; semantics follow the Elasticsearch
sparse_vector query (weighted-OR: a doc matching ANY query token
scores; missing tokens contribute 0) and its pruning_config.
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
    chunk_docs: int = 65536,
) -> dict:
    """Write (term, doc_id, weight_micro) as a term-range-partitioned,
    term-sorted parquet layout under ``<path>/postings`` — the same
    physical idea as the packed index's dictionary ordering, so
    query-term pruning is a pushed scan filter — plus the
    ``<path>/term_stats`` sidecar (term, df, max_weight_micro), the
    ``<path>/chunk_stats`` block-max sidecar (term, chunk,
    max_weight_micro with chunk = doc_id // chunk_docs — what
    :func:`sparse_topk_blockmax_batch` prunes with) and
    ``<path>/manifest.json`` corpus aggregates that the ES
    pruning_config decisions read. ``weight_micro`` must already be
    integer micro-units. Returns the manifest dict."""
    import json as _json

    from ..indexing import fsio

    missing = [c for c in ("term", "doc_id", "weight_micro")
               if c not in pairs.columns]
    if missing:
        raise ValueError(f"pairs table lacks columns {missing}")
    if chunk_docs < 1:
        raise ValueError(f"chunk_docs must be >= 1, got {chunk_docs}")
    clean = pairs.select("term", F.col("doc_id").cast("long"),
                         F.col("weight_micro").cast("long"))
    (
        clean.repartitionByRange(n_partitions, "term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").parquet(fsio.join(path, "postings"))
    )
    spark = pairs.sparkSession
    stats = spark.read.parquet(fsio.join(path, "postings")).groupBy(
        "term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.max("weight_micro").cast("long").alias("max_weight_micro"),
    )
    stats.write.mode("overwrite").parquet(fsio.join(path, "term_stats"))
    (
        spark.read.parquet(fsio.join(path, "postings"))
        .groupBy(
            "term",
            (F.col("doc_id") / F.lit(chunk_docs)).cast("long").alias("chunk"),
        )
        .agg(F.max("weight_micro").cast("long").alias("max_weight_micro"))
        .write.mode("overwrite").parquet(fsio.join(path, "chunk_stats"))
    )
    agg = spark.read.parquet(fsio.join(path, "term_stats")).agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("df").alias("total")
    ).collect()[0]
    manifest = {"format": "searchengine_spark.sparse/1",
                "n_terms": int(agg["n_terms"] or 0),
                "total_postings": int(agg["total"] or 0),
                "chunk_docs": int(chunk_docs)}
    # fsio (Hadoop FS), never open(): the layout must serve from
    # file:// / hdfs:// / s3a:// URIs like every other index sidecar
    fsio.write_text(spark, fsio.join(path, "manifest.json"),
                    _json.dumps(manifest))
    return manifest


def _postings_path(spark: SparkSession, path: str) -> str:
    from ..indexing import fsio

    sub = fsio.join(path, "postings")
    return sub if fsio.exists(spark, sub) else path  # pre-sidecar layouts


def prune_query_tokens(
    query_weights: Dict[str, int],
    dfs: Dict[str, int],
    n_terms: int,
    total_postings: int,
    freq_ratio_threshold: int = 5,
    weight_threshold_micro: int = 400_000,
) -> "tuple[Dict[str, int], Dict[str, int]]":
    """-> (kept, pruned): the ES pruning_config decision in exact
    integer arithmetic. A token is pruned when BOTH hold:

    - frequent: ``df * n_terms > freq_ratio_threshold * total_postings``
      (df > ratio x average df, cross-multiplied — no division);
    - weak: ``weight_micro * 1_000_000 < weight_threshold_micro *
      avg_query_weight_micro`` where avg is the integer floor mean of
      the query's weights.

    OOV tokens (df 0) are never 'frequent', so they are kept (they cost
    nothing anyway)."""
    if not query_weights:
        return {}, {}
    avg_qw = sum(query_weights.values()) // len(query_weights)
    kept, pruned = {}, {}
    for t, w in query_weights.items():
        df = dfs.get(t, 0)
        frequent = df * n_terms > freq_ratio_threshold * total_postings
        weak = w * 1_000_000 < weight_threshold_micro * avg_qw
        (pruned if frequent and weak else kept)[t] = w
    return kept, pruned


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
    scan = spark.read.parquet(_postings_path(spark, path)).filter(
        F.col("term").isin(all_terms))
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


def sparse_topk_blockmax_batch(
    spark: SparkSession,
    path: str,
    query_weights: Sequence[Dict[str, int]],
    k: int = 10,
    seed_chunks: int = 4,
) -> DataFrame:
    """Block-max sparse top-k -> (query_id, doc_id, score_micro2, rank)
    — bit-identical to :func:`sparse_topk_batch` (gated in
    tests/test_sparse.py) but the scoring exchange only carries
    postings from chunks that can still make the page.

    The native-SQL WAND: per (query, chunk) the exact BIGINT bound
    ``ub = Σ_t qw_t · max_weight(t, chunk)`` comes from the
    dictionary-scale chunk_stats sidecar (n_chunks = n_docs/chunk_docs
    rows per matched term — 128 rows per term at 8.4M docs). Two
    phases, no iteration (SQL has no shared heap):

    1. SEED: score exactly the top ``seed_chunks`` chunks per query by
       ub; the kth seed score θ is a LOWER bound of the true kth score
       (seed docs ⊆ all docs).
    2. PRUNE: every chunk with ub < θ is dropped — any doc there
       scores ≤ ub < θ ≤ true-kth, so it cannot enter the page (ties
       keep their chunks: the cut is strict <). The surviving chunks
       re-score exactly.

    Queries whose seed page holds fewer than k docs keep every chunk
    (θ undefined — no pruning, plain exact scoring). Query weights
    must be NON-NEGATIVE: a negative weight would flip max_weight into
    a lower bound and break the skip rule (the wand.py qweights
    refusal, same argument)."""
    import json as _json

    from ..indexing import fsio

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if seed_chunks < 1:
        raise ValueError(f"seed_chunks must be >= 1, got {seed_chunks}")
    for qid, qw in enumerate(query_weights):
        for t, w in qw.items():
            if not isinstance(w, int):
                raise ValueError(
                    f"query {qid} term {t!r}: weights must be integer "
                    f"micro-units (floor(w * 1e6)), got {type(w).__name__}")
            if w < 0:
                raise ValueError(
                    f"query {qid} term {t!r}: block-max needs "
                    f"non-negative query weights (got {w}) — a negative "
                    "weight breaks the chunk upper bound; use "
                    "sparse_topk_batch")
    man_path = fsio.join(path, "manifest.json")
    cs_path = fsio.join(path, "chunk_stats")
    if not (fsio.exists(spark, man_path) and fsio.exists(spark, cs_path)):
        raise ValueError(
            f"{path}: no chunk_stats sidecar — block-max needs a "
            "build_sparse_index layout with chunk stats (rebuild); "
            "pre-sidecar layouts serve sparse_topk_batch")
    man = _json.loads(fsio.read_text(spark, man_path))
    chunk_docs = int(man["chunk_docs"])
    out_schema = "query_id int, doc_id long, score_micro2 long, rank long"
    all_terms = sorted({t for qw in query_weights for t in qw})
    if not all_terms:
        return spark.createDataFrame([], out_schema)

    def _fan_out(frame: DataFrame, value_col, out_name: str) -> DataFrame:
        frames = []
        for qid, qw in enumerate(query_weights):
            if not qw:
                continue
            entries = [x for t, w in sorted(qw.items())
                       for x in (F.lit(t), F.lit(int(w)))]
            frames.append(
                frame.withColumn("_qw", F.create_map(*entries)[F.col("term")])
                .filter(F.col("_qw").isNotNull())
                .select(F.lit(qid).alias("query_id"), "*")
                .withColumn(out_name, value_col * F.col("_qw"))
                .drop("_qw", "term")
            )
        if not frames:
            return None
        uni = frames[0]
        for f in frames[1:]:
            uni = uni.unionByName(f)
        return uni

    # per-(query, chunk) exact upper bound off the tiny sidecar
    cs = spark.read.parquet(cs_path).filter(F.col("term").isin(all_terms))
    ub_rows = _fan_out(cs, F.col("max_weight_micro"), "_c")
    if ub_rows is None:
        return spark.createDataFrame([], out_schema)
    ub = ub_rows.groupBy("query_id", "chunk").agg(
        F.sum("_c").cast("long").alias("_ub"))

    scan = spark.read.parquet(_postings_path(spark, path)).filter(
        F.col("term").isin(all_terms))
    scored_rows = _fan_out(
        scan.withColumn(
            "chunk", (F.col("doc_id") / F.lit(chunk_docs)).cast("long")),
        F.col("weight_micro"), "_prod").drop("weight_micro")

    wq = Window.partitionBy("query_id")
    seed = (
        ub.withColumn(
            "_r",
            F.row_number().over(wq.orderBy(F.desc("_ub"), F.asc("chunk"))))
        .filter(F.col("_r") <= seed_chunks)
        .select("query_id", "chunk")
    )
    rank_w = wq.orderBy(F.desc("score_micro2"), F.asc("doc_id"))
    phase1 = (
        scored_rows.join(F.broadcast(seed), ["query_id", "chunk"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_prod").cast("long").alias("score_micro2"))
        .withColumn("_r", F.row_number().over(rank_w))
    )
    # θ exists only when the seed produced a FULL page of k docs
    theta = (
        phase1.filter(F.col("_r") == k)
        .select("query_id", F.col("score_micro2").alias("_theta"))
    )
    live = (
        ub.join(F.broadcast(theta), "query_id", "left")
        .filter(F.col("_theta").isNull() | (F.col("_ub") >= F.col("_theta")))
        .select("query_id", "chunk")
    )
    # live is chunk-count-bounded (never doc-count); AQE broadcasts it
    # when small instead of a forced driver collect at 10^12-doc scale
    return (
        scored_rows.join(live, ["query_id", "chunk"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_prod").cast("long").alias("score_micro2"))
        .withColumn("rank", F.row_number().over(rank_w).cast("long"))
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


def sparse_topk_pruned_batch(
    spark: SparkSession,
    path: str,
    query_weights: Sequence[Dict[str, int]],
    k: int = 10,
    freq_ratio_threshold: int = 5,
    weight_threshold_micro: int = 400_000,
    rescore: bool = True,
    rescore_mult: int = 3,
) -> DataFrame:
    """ES sparse_vector with ``pruning_config`` -> (query_id, doc_id,
    score_micro2, rank): phase 1 retrieves with the KEPT tokens only
    (the fat-and-weak tokens never touch their postings — the whole
    point: those are the cost dominators); with ``rescore`` the top
    ``k x rescore_mult`` phase-1 candidates are re-scored with the
    FULL query (kept + pruned) and the final page is exact among those
    candidates (ES's only_score_pruned_tokens=false shape; the SQ8/PQ
    two-phase pattern). A query whose every token prunes retrieves
    nothing (documented contract — there is no phase-1 signal left).

    ``score_micro2`` is phase-2's full-query score when rescoring, else
    the pruned-query score."""
    import json as _json

    if rescore_mult < 1:
        raise ValueError(f"rescore_mult must be >= 1, got {rescore_mult}")
    from ..indexing import fsio

    man_path = fsio.join(path, "manifest.json")
    if not fsio.exists(spark, man_path):
        raise ValueError(
            f"{path}: no manifest.json — pruning needs the stats sidecar "
            "(rebuild with build_sparse_index; pre-sidecar layouts serve "
            "only the unpruned sparse_topk_batch)")
    man = _json.loads(fsio.read_text(spark, man_path))
    all_terms = sorted({t for qw in query_weights for t in qw})
    dfs: Dict[str, int] = {}
    if all_terms:
        rows = (
            spark.read.parquet(fsio.join(path, "term_stats"))
            .filter(F.col("term").isin(all_terms))
            .select("term", "df").collect()
        )
        dfs = {r["term"]: int(r["df"]) for r in rows}
    kept_list = []
    for qw in query_weights:
        kept, _pruned = prune_query_tokens(
            qw, dfs, man["n_terms"], man["total_postings"],
            freq_ratio_threshold, weight_threshold_micro)
        kept_list.append(kept)
    phase1 = sparse_topk_batch(
        spark, path, kept_list, k=k * rescore_mult if rescore else k)
    if not rescore:
        return phase1
    cand = phase1.select("query_id", "doc_id")
    # full-query scoring restricted to the bounded candidate page
    scan = spark.read.parquet(_postings_path(spark, path)).filter(
        F.col("term").isin(all_terms))
    frames = []
    for qid, qw in enumerate(query_weights):
        if not qw or not kept_list[qid]:
            continue
        entries = [x for t, w in sorted(qw.items())
                   for x in (F.lit(t), F.lit(int(w)))]
        frames.append(
            scan.withColumn("_qw", F.create_map(*entries)[F.col("term")])
            .filter(F.col("_qw").isNotNull())
            .select(F.lit(qid).alias("query_id"), "doc_id",
                    (F.col("weight_micro") * F.col("_qw")).alias("_prod"))
        )
    if not frames:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, score_micro2 long, rank long")
    uni = frames[0]
    for f in frames[1:]:
        uni = uni.unionByName(f)
    rescored = (
        uni.join(F.broadcast(cand), ["query_id", "doc_id"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_prod").cast("long").alias("score_micro2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro2"), F.asc("doc_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_micro2", "rank")
    )
