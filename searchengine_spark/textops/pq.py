"""Product quantization (PQ) with ADC candidate generation and exact
rescore — the third member of the vector-compression ladder (brute →
SQ8 → PQ), the FAISS ``IVFPQ``/Jégou et al. 2011 memory tier: a
D-dim vector compresses to ``m`` small codes (here m log2(ksub) bits of
payload vs 4·D bytes), candidates rank by table lookups, and only the
survivors touch full precision.

Cross-engine-exact contract (the repo's integer micro-unit discipline —
similarity.py k-means; everything below reproduces bit-for-bit in
Spark, DuckDB and Python):

- **Train**: the D dims split into ``m`` contiguous subspaces of D/m.
  Each subspace trains its own ``ksub``-centroid codebook with the
  existing integer-micro Lloyd's k-means (``similarity.kmeans_micro``
  over the sliced vectors; seed + subspace index, so codebooks differ).
- **Encode**: per vector, per subspace, the code is the argmin-L2
  centroid over the MICRO-unit slice (exact BIGINT distances,
  centroid-id tie-break) — computed natively as an ``array_min`` over
  (distance, cid) structs, zero shuffle, one pass.
- **Query (ADC — asymmetric distance computation)**: the query stays
  unquantized; per subspace a ``ksub``-entry table of BIGINT dot
  products (query micro slice · codebook centroid) is built driver-side
  and shipped as literals; a row's candidate score is the sum of its
  ``m`` table lookups — integer, summation-order-free, a
  maximum-inner-product surrogate exactly like SQ8's integer dot.
- **Rescore**: the top ``rescore_m`` candidates join back to full
  precision for the exact 6dp cosine; ``rescore_m >= corpus``
  degenerates to brute-force cosine exactly (gated).

Scale shape: train = m small k-means jobs (C×D/m driver sums each);
encode = one zero-exchange map over the corpus (persist the (id, codes)
table — the PQ read-side win: candidates scan m small ints per row);
query = one scan of the codes table (codegen lookups +
TakeOrderedAndProject) + one bounded semi-join rescore. Composes with
the IVF layout the same way SQ8 does (encode within probed cells).
"""

from __future__ import annotations

import math
from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import MICRO, _dot, as_double, kmeans_micro, micro_col

Codebooks = List[List[List[int]]]  # [subspace][centroid][dim] micro-units


def _check_dims(dim: int, m: int) -> int:
    if m <= 0 or dim % m:
        raise ValueError(
            f"dim ({dim}) must split into m ({m}) equal subspaces")
    return dim // m


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 20260816,
) -> Codebooks:
    """Train the ``m`` per-subspace codebooks (micro-unit ints) —
    ``kmeans_micro`` over each contiguous D/m slice, seed offset by the
    subspace index."""
    dsub = _check_dims(dim, m)
    books: Codebooks = []
    for j in range(m):
        sub = embeddings.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * dsub + 1, dsub).alias(vec_col),
        )
        books.append(
            kmeans_micro(sub, ksub, dsub, n_iters, id_col, vec_col, seed + j)
        )
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, codes: array<int> length m): nearest codebook centroid per
    subspace by exact integer L2 (cid tie-break via lexicographic
    (distance, cid) struct min). All-native, zero shuffle — persist the
    output next to the embeddings table."""
    m = len(codebooks)
    if not m:
        raise ValueError("codebooks must be non-empty")
    dsub = len(codebooks[0][0])
    # bind the micro array once in its own select (interpreted HOFs get
    # no common-subexpression elimination — CLAUDE.md tokenize rule)
    mu = embeddings.select(
        F.col(id_col), micro_col(F.col(vec_col)).alias("_mu"))
    slices = mu.select(
        id_col,
        *[F.slice(F.col("_mu"), j * dsub + 1, dsub).alias(f"_s{j}")
          for j in range(m)],
    )

    def dist(sub_col, cm: List[int]):
        lit = F.array(*[F.lit(int(x)).cast("long") for x in cm])
        return F.aggregate(
            F.zip_with(sub_col, lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    code_cols = []
    for j, book in enumerate(codebooks):
        structs = [
            F.struct(dist(F.col(f"_s{j}"), cm).alias("d"),
                     F.lit(c).alias("cid"))
            for c, cm in enumerate(book)
        ]
        code_cols.append(F.array_min(F.array(*structs))["cid"].alias(f"_c{j}"))
    coded = slices.select(id_col, *code_cols)
    return coded.select(
        id_col,
        F.array(*[F.col(f"_c{j}") for j in range(m)]).alias("codes"),
    )


def _adc_tables(codebooks: Codebooks, query_vec: Sequence[float]) -> List[List[int]]:
    """Driver-side ADC tables: tables[j][c] = BIGINT dot of the query's
    micro-unit subspace slice with codebook centroid c — the same
    arithmetic any engine reproduces (products of two micro ints)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qm = [int(math.floor(float(x) * MICRO)) for x in query_vec]
    if len(qm) != m * dsub:
        raise ValueError(
            f"query dim {len(qm)} != m*dsub = {m * dsub}")
    tables: List[List[int]] = []
    for j, book in enumerate(codebooks):
        qs = qm[j * dsub:(j + 1) * dsub]
        tables.append([sum(a * b for a, b in zip(qs, cm)) for cm in book])
    return tables


def ivf_pq_topk(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    rescore_m: int = 100,
) -> DataFrame:
    """IVFPQ — the complete FAISS layout over a
    ``build_ivf_index(..., pq=(m, ksub))`` directory: probe the
    ``n_probe`` nearest coarse cells (partition-pruned directory scan),
    ADC-rank the cells' ``codes_pq`` column ONLY (parquet column pruning
    skips the full-precision bytes — m small ints per row instead of
    4·D), cut to ``rescore_m``, rescore those with the exact 6dp cosine
    from the same pruned partitions. ``n_probe >= n_centroids`` +
    ``rescore_m >= corpus`` degenerates to brute cosine exactly."""
    import json

    from ..indexing import fsio
    from .similarity import probe_centroids

    if rescore_m < k:
        raise ValueError(f"rescore_m ({rescore_m}) must be >= k ({k})")
    man = json.loads(
        fsio.read_text(spark, fsio.join(path, "ivf_manifest.json")))
    if not man.get("pq"):
        raise ValueError(
            "this IVF index stores no codes_pq column — rebuild with "
            "build_ivf_index(..., pq=(m, ksub)) or query another path"
        )
    id_col, vec_col = man["id_col"], man["vec_col"]
    books = man["pq_codebooks_micro"]
    probes = probe_centroids(man["centroids_micro"], list(query_vec), n_probe)
    bucket = spark.read.parquet(fsio.join(path, "buckets")).filter(
        F.col("centroid_id").isin(probes)
    )
    tables = _adc_tables(books, query_vec)
    adc = None
    for j, tab in enumerate(tables):
        lit = F.array(*[F.lit(int(x)).cast("long") for x in tab])
        term = F.get(lit, F.element_at(F.col("codes_pq"), j + 1))
        adc = term if adc is None else adc + term
    cands = (
        bucket.select(F.col(id_col), adc.alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
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


def build_pq_index(
    embeddings: DataFrame,
    path: str,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 20260816,
) -> dict:
    """Train + encode + persist the PQ layout: ``codes/`` parquet
    (id, codes) and ``pq_manifest.json`` carrying the codebooks — the
    same manifest-last commit pattern the IVF layout uses."""
    import json

    from ..indexing import fsio

    spark = embeddings.sparkSession
    books = pq_train(embeddings, m, ksub, dim, n_iters, id_col, vec_col, seed)
    pq_encode(embeddings, books, id_col, vec_col).write.mode(
        "overwrite").parquet(fsio.join(path, "codes"))
    manifest = {
        "format": "searchengine_spark.pq/1",
        "m": m, "ksub": ksub, "dim": dim, "n_iters": n_iters,
        "seed": seed, "micro": MICRO,
        "id_col": id_col, "vec_col": vec_col,
        "codebooks_micro": books,
    }
    fsio.write_text(spark, fsio.join(path, "pq_manifest.json"),
                    json.dumps(manifest))
    return manifest


def pq_topk_indexed(
    spark,
    path: str,
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    rescore_m: int = 100,
) -> DataFrame:
    """kNN over a persisted :func:`build_pq_index` layout: the codes
    table generates ADC candidates (the compressed scan), ``embeddings``
    supplies full precision for the bounded rescore."""
    import json

    from ..indexing import fsio

    man = json.loads(fsio.read_text(spark, fsio.join(path, "pq_manifest.json")))
    codes = spark.read.parquet(fsio.join(path, "codes"))
    return pq_topk(
        embeddings, codes, man["codebooks_micro"], query_vec,
        k=k, rescore_m=rescore_m,
        id_col=man["id_col"], vec_col=man["vec_col"],
    )


def pq_topk(
    embeddings: DataFrame,
    codes: DataFrame,
    codebooks: Codebooks,
    query_vec: Sequence[float],
    k: int = 10,
    rescore_m: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, cosine[6dp], rank): ADC candidate generation over the
    codes table + exact rescore against full precision. ``codes`` is the
    :func:`pq_encode` output; only the top-``rescore_m`` ADC candidates
    touch the embeddings table."""
    if rescore_m < k:
        raise ValueError(f"rescore_m ({rescore_m}) must be >= k ({k})")
    tables = _adc_tables(codebooks, query_vec)
    adc = None
    for j, tab in enumerate(tables):
        lit = F.array(*[F.lit(int(x)).cast("long") for x in tab])
        # F.get is 0-based — the stored code indexes the table directly
        term = F.get(lit, F.element_at(F.col("codes"), j + 1))
        adc = term if adc is None else adc + term
    cands = (
        codes.select(F.col(id_col), adc.alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
        .limit(rescore_m)
    )
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    v = as_double(F.col(vec_col))
    cos = F.round(_dot(v, qv) / (F.sqrt(_dot(v, v)) * F.lit(qn)), 6)
    rescored = (
        embeddings.join(cands.select(id_col), id_col)
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
    return rescored.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("cosine"), F.asc(id_col))
        ).cast("long"),
    )
