"""Scalar int8 embedding quantization (SQ8) with exact-rescore top-k —
the memory-tier ANN pattern every vector store ships (FAISS
``SQ8``/Lucene ``int8_hnsw`` analog): keep a 4x-smaller quantized copy
of the corpus for candidate generation, rescore only the survivors
against the full-precision vectors.

Quantization contract (cross-engine exact, gated in
tests/test_quantize.py):

- per vector, ``m_i = floor(v_i * 1e6)`` micro-units (the ``micro_col``
  pattern — one float op, floor-quantized immediately), then
  ``M = max(|m_i|)`` (BIGINT) and ``q_i = floor(127.0 * m_i / M)`` in
  [-127, 127]. The division is IEEE double division of two exactly
  representable integers (|127*m| < 2^53), so Spark, DuckDB and Python
  produce the identical quantized vector bit-for-bit. All-zero vectors
  quantize to all zeros.
- candidate ranking is the INTEGER dot product ``Σ qa_i * qb_i``
  (BIGINT, summation-order-free) descending, id-asc ties — a
  maximum-inner-product candidate metric, deliberately norm-free (the
  rescore fixes ranking, the candidates only need recall).
- the top ``rescore_m`` candidates rescore with the EXACT float cosine
  (6dp — the same arithmetic ``cosine_topk`` uses) and the final top-k
  ranks by (cosine desc, id asc). ``rescore_m >= corpus`` degenerates
  to brute-force cosine exactly.

Scale shape: quantize = one zero-exchange map (persist the (id, q)
table next to the embeddings — int8-range values bit-pack to ~1 byte
in parquet, the 4x read-side win); query = one scan computing the
integer dot (codegen fold) + TakeOrderedAndProject for the candidate
cut + one pruned semi-join back to the full-precision vectors for the
bounded rescore. Composes with the IVF index (quantize within cells)
for the two-level FAISS layout. No reference counterpart.
"""

from __future__ import annotations

import math
from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import MICRO, _dot, as_double, micro_col

Q_RANGE = 127


def _qcol(vec: Column) -> Column:
    """array<float> -> array<long> int8-range quantized values."""
    m = micro_col(vec)
    mx = F.array_max(F.transform(m, lambda x: F.abs(x)))
    return F.when(
        mx == 0, F.transform(m, lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(
            m,
            lambda x: F.floor(
                F.lit(float(Q_RANGE)) * x.cast("double") / mx.cast("double")
            ).cast("long"),
        )
    )


def sq8_quantize(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, q): the int8-range quantized corpus — persist this next to
    the embeddings table; candidate generation reads ONLY it."""
    return embeddings.select(
        F.col(id_col), _qcol(F.col(vec_col)).alias("q")
    )


def sq8_quantize_vec(vec: Sequence[float]) -> List[int]:
    """Driver-side twin of the quantizer for query vectors — the same
    IEEE double arithmetic, so it matches the Spark/DuckDB columns
    bit-for-bit."""
    m = [math.floor(float(x) * MICRO) for x in vec]
    mx = max((abs(x) for x in m), default=0)
    if mx == 0:
        return [0] * len(m)
    return [math.floor(float(Q_RANGE) * float(x) / float(mx)) for x in m]


def sq8_topk(
    embeddings: DataFrame,
    quantized: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    rescore_m: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, cosine[6dp], rank): int8 candidate generation + exact
    rescore. ``quantized`` is the :func:`sq8_quantize` output (the
    4x-smaller scan); only the top-``rescore_m`` integer-dot candidates
    touch the full-precision table."""
    if rescore_m < k:
        raise ValueError(f"rescore_m ({rescore_m}) must be >= k ({k})")
    qq = sq8_quantize_vec(query_vec)
    qlit = F.array(*[F.lit(int(x)).cast("long") for x in qq])
    d = F.aggregate(
        F.zip_with(F.col("q"), qlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cands = (
        quantized.select(F.col(id_col), d.alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc(id_col))
        .limit(rescore_m)
    )
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    v = as_double(F.col(vec_col))
    cos = F.round(
        _dot(v, qv) / (F.sqrt(_dot(v, v)) * F.lit(qn)), 6
    )
    rescored = (
        embeddings.join(cands.select(id_col), id_col)
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
    # rank window runs over the already-cut k rows (bounded)
    return rescored.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("cosine"), F.asc(id_col))
        ).cast("long"),
    )


def ivf_sq8_topk(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    rescore_m: int = 100,
) -> DataFrame:
    """Two-level FAISS-style ANN over a ``build_ivf_index(..., sq8=True)``
    layout -> (id, centroid_id, cosine[6dp], rank): probe the ``n_probe``
    nearest cells (partition-pruned directory scan), integer-dot the
    cells' ``q_sq8`` column ONLY (parquet column pruning skips the
    full-precision bytes), cut to ``rescore_m`` candidates, rescore those
    with the exact 6dp cosine from the full-precision column of the same
    pruned partitions. ``n_probe >= n_centroids`` + ``rescore_m >=
    corpus`` degenerates to brute cosine exactly."""
    import json

    from ..indexing import fsio
    from .similarity import probe_centroids

    if rescore_m < k:
        raise ValueError(f"rescore_m ({rescore_m}) must be >= k ({k})")
    man = json.loads(fsio.read_text(spark, fsio.join(path, "ivf_manifest.json")))
    if not man.get("sq8"):
        raise ValueError(
            "this IVF index stores no q_sq8 column — rebuild with "
            "build_ivf_index(..., sq8=True) or query with ivf_topk_indexed"
        )
    id_col, vec_col = man["id_col"], man["vec_col"]
    probes = probe_centroids(man["centroids_micro"], list(query_vec), n_probe)
    bucket = spark.read.parquet(fsio.join(path, "buckets")).filter(
        F.col("centroid_id").isin(probes)
    )
    qq = sq8_quantize_vec(query_vec)
    qlit = F.array(*[F.lit(int(x)).cast("long") for x in qq])
    d = F.aggregate(
        F.zip_with(F.col("q_sq8"), qlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cands = (
        bucket.select(F.col(id_col), d.alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc(id_col))
        .limit(rescore_m)
    )
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    v = as_double(F.col(vec_col))
    cos = F.round(_dot(v, qv) / (F.sqrt(_dot(v, v)) * F.lit(qn)), 6)
    rescored = (
        bucket.join(cands.select(id_col), id_col)
        .select(F.col(id_col), F.col("centroid_id"), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
    return rescored.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("cosine"), F.asc(id_col))
        ).cast("long"),
    )
