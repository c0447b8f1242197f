"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force cosine top-k: the exact baseline. One
  scan, no shuffle until the final TakeOrderedAndProject; dot products run
  as sequential left-folds (F.aggregate) inside codegen, so results are
  bit-deterministic (no float summation-order variance between runs).
- IVF (inverted-file) path — the 100 TB scale path: assign every vector to
  its nearest of C coarse centroids (one cross join with a C-row broadcast
  table, C small), store bucketed; a query probes only its bucket(s).
  Centroids here are seeded-deterministic (numpy PCG64) — on a real corpus
  you'd k-means them (same assign machinery iterated).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: tuple = (),
) -> DataFrame:
    """Brute-force cosine top-k -> (vec_id, cosine[6dp]). Deterministic
    tie-break on id. Plan: scan + codegen fold + TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    v = as_double(F.col(vec_col))
    cos = _dot(v, q) / (F.sqrt(_dot(v, v)) * F.lit(qn))
    out = embeddings.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(*exclude_ids))
    return out.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def make_centroids(n_centroids: int, dim: int, seed: int = 20260816) -> np.ndarray:
    """Seeded deterministic coarse centroids (unit-normalized)."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, centroid_id) — nearest centroid by L2; the C-row centroid
    table broadcasts, assignment is one narrow cross join + min-by."""
    spark = embeddings.sparkSession
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    cdf = spark.createDataFrame(rows, "centroid_id int, cvec array<double>")
    v = as_double(F.col(vec_col))
    diff2 = F.aggregate(
        F.zip_with(v, F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # 9-dp round before the argmin: kills cross-engine last-ulp noise while
    # keeping assignment effectively exact (distances are O(1..100))
    d = embeddings.crossJoin(F.broadcast(cdf)).select(
        F.col(id_col), F.col("centroid_id"), F.round(diff2, 9).alias("l2sq")
    )
    best = d.groupBy(id_col).agg(
        F.min_by("centroid_id", F.struct(F.col("l2sq"), F.col("centroid_id"))).alias(
            "centroid_id"
        )
    )
    return best


def ivf_topk(
    embeddings: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: tuple = (),
) -> DataFrame:
    """ANN: probe only the query's nearest-centroid bucket, cosine-rank
    within it -> (vec_id, centroid_id, cosine[6dp])."""
    q = np.asarray(query_vec, dtype=np.float64)
    qc = int(np.argmin(((centroids - q) ** 2).sum(axis=1)))
    assign = ivf_assign(embeddings, centroids, id_col, vec_col)
    bucket = embeddings.join(
        assign.filter(F.col("centroid_id") == qc), id_col
    )
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(q, q)))
    v = as_double(F.col(vec_col))
    cos = _dot(v, qcol) / (F.sqrt(_dot(v, v)) * F.lit(qn))
    out = bucket.select(F.col(id_col), F.col("centroid_id"), F.round(cos, 6).alias("cosine"))
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(*exclude_ids))
    return out.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
