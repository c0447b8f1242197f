"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force cosine top-k: the exact baseline. One
  scan, no shuffle until the final TakeOrderedAndProject; dot products run
  as sequential left-folds (F.aggregate) inside codegen, so results are
  bit-deterministic (no float summation-order variance between runs).
- IVF (inverted-file) path — the 100 TB scale path, SERVABLE layout:
  :func:`kmeans_micro` trains C coarse centroids (k-means in exact integer
  micro-unit arithmetic — see below), :func:`build_ivf_index` persists the
  corpus bucketed by nearest centroid (``partitionBy(centroid_id)``
  parquet + fsio manifest), :func:`ivf_topk_indexed` answers a query by
  reading ONLY its ``n_probe`` nearest buckets (partition pruning: the
  scan never touches the other C - n_probe buckets). Assignment happens
  once at build, never per query.

Integer micro-unit arithmetic: every embedding value is quantized to
``floor(x * 1e6)`` (exact: float32 -> float64 widening and the multiply
are IEEE-identical everywhere). Distances are BIGINT sums of squared
integer diffs (exact, order-independent), centroid updates are
``floor(int_sum / count)`` in IEEE double (identical in Spark, DuckDB and
Python for sums < 2^53). k-means therefore produces BIT-IDENTICAL
centroids/assignments on every engine — which is what lets the DuckDB
oracle replicate the whole train->bucket->probe pipeline and hash-match
it. At 100 TB the same property makes builds reproducible across
clusters/retries (no float summation-order drift).
"""

from __future__ import annotations

import json
import math

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1_000_000


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
    allowed: DataFrame | None = None,
    min_similarity: float | None = None,
) -> DataFrame:
    """Brute-force cosine top-k -> (vec_id, cosine[6dp]). Deterministic
    tie-break on id. Plan: scan + codegen fold + TakeOrderedAndProject.

    ``allowed``: optional one-column id frame — PRE-filtered kNN (the ES
    knn ``filter`` contract: the k nearest among docs PASSING the
    filter, never top-k-then-filter, which under-fills and biases the
    page). The semi-join happens before the fold, so excluded vectors
    never pay the dot product.

    ``min_similarity``: the ES knn ``similarity`` cutoff — results below
    it drop even when the page is under-filled (applied on the ROUNDED
    6dp cosine, so both engines cut identically)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    src = embeddings
    if allowed is not None:
        src = src.join(
            F.broadcast(allowed.selectExpr(f"{allowed.columns[0]} AS {id_col}")
                        .distinct()),
            id_col, "left_semi")
    v = as_double(F.col(vec_col))
    cos = _dot(v, q) / (F.sqrt(_dot(v, v)) * F.lit(qn))
    out = src.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(*exclude_ids))
    if min_similarity is not None:
        out = out.filter(F.col("cosine") >= float(min_similarity))
    return out.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def make_centroids(n_centroids: int, dim: int, seed: int = 20260816) -> np.ndarray:
    """Seeded deterministic coarse centroids (unit-normalized)."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


# (the float-based ivf_assign was superseded by _assign_micro: integer
# micro-unit distances are exactly reproducible across engines/retries,
# which float L2 rounding only approximated.)


def micro_col(vec: Column) -> Column:
    """array<float> -> array<long> of floor(x * 1e6) micro-units."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(MICRO))).cast("long")
    )


def _micro_l2(a: Column, b: Column) -> Column:
    """Exact integer squared L2 between two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def initial_centroids_micro(
    n_centroids: int, dim: int, seed: int = 20260816
) -> list[list[int]]:
    """Seeded initial centroids quantized to micro-units (the shared
    starting point for the Spark build AND the DuckDB oracle replica)."""
    return [
        [int(math.floor(x * MICRO)) for x in c]
        for c in make_centroids(n_centroids, dim, seed)
    ]


def _assign_micro(m: DataFrame, cents: list[list[int]], id_col: str) -> DataFrame:
    """(id, m: array<long>) x centroid list -> (id, centroid_id) by exact
    integer L2, centroid_id tie-break. One broadcast cross join + min_by."""
    spark = m.sparkSession
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid int, cm array<bigint>"
    )
    d = m.crossJoin(F.broadcast(cdf)).select(
        F.col(id_col), F.col("cid"), _micro_l2(F.col("m"), F.col("cm")).alias("d")
    )
    return d.groupBy(id_col).agg(
        F.min_by("cid", F.struct(F.col("d"), F.col("cid"))).alias("centroid_id")
    )


def kmeans_micro(
    embeddings: DataFrame,
    n_centroids: int = 8,
    dim: int = 64,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 20260816,
) -> list[list[int]]:
    """Lloyd's k-means over micro-unit vectors, ``n_iters`` rounds.

    Per round: one broadcast-join assignment pass + one (cid, dim) integer
    sum/count aggregation (C x dim rows collected — tiny). Updates are
    floor(sum/count) in IEEE double; empty clusters keep their previous
    centroid. Everything is integer-exact, so any engine/cluster/retry
    reproduces identical centroids (module docstring)."""
    m = embeddings.select(F.col(id_col), micro_col(F.col(vec_col)).alias("m")).persist()
    cents = initial_centroids_micro(n_centroids, dim, seed)
    try:
        for _ in range(n_iters):
            assign = _assign_micro(m, cents, id_col)
            sums = (
                assign.join(m, id_col)
                .select("centroid_id", F.posexplode("m").alias("dim", "v"))
                .groupBy("centroid_id", "dim")
                .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
                .collect()
            )
            new = [list(c) for c in cents]  # empty clusters keep old position
            for r in sums:
                new[r["centroid_id"]][r["dim"]] = int(
                    math.floor(float(r["s"]) / float(r["c"]))
                )
            cents = new
    finally:
        m.unpersist()
    return cents


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 8,
    dim: int = 64,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 20260816,
    sq8: bool = False,
    pq: tuple | None = None,
) -> dict:
    """Train centroids, assign once, persist the corpus BUCKETED by
    centroid (``partitionBy(centroid_id)`` parquet) + a manifest with the
    trained centroids. Queries then read only their probed buckets —
    assignment cost is paid at build time, never per query.

    ``sq8=True`` additionally stores the int8-range quantized vector
    (column ``q_sq8``, textops/quantize.py) next to each full-precision
    one — the two-level FAISS layout: coarse cells prune the scan,
    int8 dot products generate candidates reading ONLY the pruned
    ``q_sq8`` column, exact rescore touches full precision last
    (``quantize.ivf_sq8_topk``).

    ``pq=(m, ksub)`` stores PQ codes instead/as well (column
    ``codes_pq``, textops/pq.py — codebooks trained over the SAME
    corpus with seed offsets, recorded in the manifest): the full
    IVFPQ layout — cells prune, m-int ADC lookups generate candidates,
    full precision rescores last (``pq.ivf_pq_topk``)."""
    spark = embeddings.sparkSession
    from ..indexing import fsio

    cents = kmeans_micro(embeddings, n_centroids, dim, n_iters, id_col, vec_col, seed)
    m = embeddings.select(
        F.col(id_col), F.col(vec_col), micro_col(F.col(vec_col)).alias("m")
    )
    rows = m.drop("m")
    if sq8:
        from .quantize import _qcol

        rows = rows.withColumn("q_sq8", _qcol(F.col(vec_col)))
    pq_books = None
    if pq is not None:
        from .pq import pq_encode, pq_train

        pq_m, pq_ksub = int(pq[0]), int(pq[1])
        pq_books = pq_train(
            embeddings, pq_m, pq_ksub, dim, n_iters, id_col, vec_col, seed)
        codes = pq_encode(embeddings, pq_books, id_col, vec_col)
        rows = rows.join(
            codes.select(F.col(id_col), F.col("codes").alias("codes_pq")),
            id_col,
        )
    assign = _assign_micro(m.select(id_col, "m"), cents, id_col)
    (
        rows
        .join(assign, id_col)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(fsio.join(path, "buckets"))
    )
    manifest = {
        "format": "searchengine_spark.ivf/1",
        "n_centroids": n_centroids,
        "dim": dim,
        "n_iters": n_iters,
        "seed": seed,
        "micro": MICRO,
        "id_col": id_col,
        "vec_col": vec_col,
        "centroids_micro": cents,
        "sq8": bool(sq8),
        "pq": [int(pq[0]), int(pq[1])] if pq is not None else None,
        "pq_codebooks_micro": pq_books,
    }
    fsio.write_text(spark, fsio.join(path, "ivf_manifest.json"), json.dumps(manifest))
    return manifest


def probe_centroids(
    centroids_micro: list[list[int]], query_vec: list[float], n_probe: int
) -> list[int]:
    """The n_probe nearest centroid ids to the query, by the same exact
    integer L2 (centroid-id tie-break) the build used."""
    qm = [int(math.floor(float(x) * MICRO)) for x in query_vec]
    dists = [
        (sum((a - b) * (a - b) for a, b in zip(qm, c)), i)
        for i, c in enumerate(centroids_micro)
    ]
    return [i for _, i in sorted(dists)[:n_probe]]


def ivf_topk_indexed(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 5,
    n_probe: int = 2,
    exclude_ids: tuple = (),
    allowed: DataFrame | None = None,
    min_similarity: float | None = None,
) -> DataFrame:
    """ANN over the persisted bucketed layout: probe the ``n_probe``
    nearest buckets (partition-pruned scan — the filter on the partition
    column prunes all other bucket directories), cosine-rank within them
    -> (vec_id, centroid_id, cosine[6dp]).

    ``allowed``: optional one-column id frame — PRE-filtered ANN (ES knn
    filter semantics): the filter applies INSIDE the probed cells, so
    the result is the k nearest PASSING vectors among the probes, never
    top-k-then-filter. Recall caveat (the honest IVF trade): a highly
    selective filter empties cells — widen ``n_probe`` (at n_probe =
    n_centroids this is exact filtered search; gated in
    tests/test_filtered_ann.py)."""
    from ..indexing import fsio

    man = json.loads(fsio.read_text(spark, fsio.join(path, "ivf_manifest.json")))
    probes = probe_centroids(man["centroids_micro"], query_vec, n_probe)
    id_col, vec_col = man["id_col"], man["vec_col"]
    bucket = spark.read.parquet(fsio.join(path, "buckets")).filter(
        F.col("centroid_id").isin(probes)
    )
    if allowed is not None:
        bucket = bucket.join(
            F.broadcast(allowed.selectExpr(f"{allowed.columns[0]} AS {id_col}")
                        .distinct()),
            id_col, "left_semi")
    q = np.asarray(query_vec, dtype=np.float64)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(q, q)))
    v = as_double(F.col(vec_col))
    cos = _dot(v, qcol) / (F.sqrt(_dot(v, v)) * F.lit(qn))
    out = bucket.select(
        F.col(id_col), F.col("centroid_id"), F.round(cos, 6).alias("cosine")
    )
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(*exclude_ids))
    if min_similarity is not None:
        # the ES knn similarity cutoff, on the rounded cosine (the same
        # value both engines rank by)
        out = out.filter(F.col("cosine") >= float(min_similarity))
    return out.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def cosine_near_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_by: list[list[int]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS -> (id_a, id_b, cosine[6dp])
    with rounded cosine >= threshold, id_a < id_b.

    ``bucket_by=None``: all-pairs self-join — O(n^2), verification scale.
    ``bucket_by=<micro centroids>`` (e.g. from :func:`kmeans_micro`):
    candidates are restricted to SAME-BUCKET pairs — the IVF composition
    (bucket sizes bound the quadratic term to Σ_b |b|^2; near-duplicates
    land in the same coarse cell with high probability). Same engineering
    shape as MinHash-LSH -> Jaccard for text."""
    v = embeddings.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    v = v.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    if bucket_by is not None:
        m = embeddings.select(
            F.col(id_col).alias("id"), micro_col(F.col(vec_col)).alias("m")
        )
        assign = _assign_micro(m, bucket_by, "id")
        v = v.join(assign, "id")
        key = ["centroid_id"]
    else:
        v = v.withColumn("centroid_id", F.lit(0))
        key = ["centroid_id"]
    a = v.select(
        F.col("centroid_id"), F.col("id").alias("id_a"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col("centroid_id").alias("_cb"), F.col("id").alias("id_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    pairs = a.join(
        b,
        (F.col("centroid_id") == F.col("_cb")) & (F.col("id_a") < F.col("id_b")),
    )
    cos = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
    )
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float,
    centroids: "list[list[int]] | None" = None,
    n_centroids: int = 8,
    dim: int = 64,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) -> (id,
    canonical_id, keep): semantic near-duplicate removal over an
    embedding column — the embedding-space twin of the text dedup
    family's LSH->verify->components composition, built from the same
    tested parts:

    1. cluster the space with the integer-micro k-means
       (:func:`kmeans_micro` — bit-identical across engines/retries),
       or reuse ``centroids`` from an existing IVF build;
    2. candidate pairs = SAME-CLUSTER members only (the paper's
       within-cluster restriction; quadratic term bounded by
       Σ_c |c|², never n²);
    3. keep pairs with rounded cosine >= ``threshold``
       (:func:`cosine_near_pairs`);
    4. resolve to connected components (min-label propagation,
       O(log diameter) bounded rounds) — ``keep`` is true iff
       id == canonical_id, the paper's one-representative-per-group
       policy with the dedup family's deterministic min-id choice.

    At 100 TB every stage is the scale path: one broadcast-join
    assignment pass, per-cluster self-joins, component resolution whose
    per-round shuffles are node-id-bounded."""
    from .dedup import connected_components

    cents = centroids if centroids is not None else kmeans_micro(
        embeddings, n_centroids, dim, n_iters, id_col, vec_col)
    pairs = cosine_near_pairs(
        embeddings, threshold, id_col, vec_col, bucket_by=cents)
    comp = connected_components(
        pairs.select("id_a", "id_b"), ids=embeddings.select(id_col))
    return comp.select(
        F.col("id").alias(id_col),
        "canonical_id",
        (F.col("id") == F.col("canonical_id")).alias("keep"),
    )
