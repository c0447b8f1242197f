"""Dataset assembly operators: deterministic splits, rate sampling, and
sequence packing — the last mile of a training-data pipeline.

All assignment is pure md5 arithmetic over the doc id (+ a salt), so it
is reproducible across engines, retries, partitionings and cluster sizes
— no RNG, no ordering dependence (the cross-engine policy the IVF
k-means established: CLAUDE.md float protocol, here integer-only).

- :func:`hash_split`   train/val/test (any weighting) via a 16-bit md5
  bucket — a doc's split never changes when the corpus grows.
- :func:`hash_sample`  keep ~num/den of docs, same stability.
- :func:`pack_sequences` greedy contiguous packing of docs into
  fixed-token-budget bins (pretraining context windows): docs are
  scattered to ``n_buckets`` md5 buckets, ordered by id within a bucket,
  and assigned the bin where their running token offset starts. The only
  wide operation is one window over the bucket key — parallelism =
  n_buckets, each bucket's cumsum is O(its docs).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 65536  # first 4 md5 nibbles


def _hash16(id_col: Column, salt: str) -> Column:
    """0..65535 from md5(salt || '|' || id) — 4-nibble prefix, the same
    strpos-nibble formula the DuckDB oracles replicate."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long")


def hash_split(
    docs: DataFrame,
    weights: Dict[str, int],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """+ ``split`` column assigning each doc to a named split with
    probability weight/Σweights (integer weights). Assignment depends only
    on (salt, id): stable under corpus growth, repartitioning, retries."""
    total = sum(weights.values())
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative with a positive sum")
    if total > HASH_SPACE:
        raise ValueError(
            f"sum of weights ({total}) exceeds the {HASH_SPACE} hash space —"
            " buckets past it would be empty; scale the weights down"
        )
    bucket = _hash16(F.col(id_col), salt) % total
    expr = None
    acc = 0
    for name, w in weights.items():
        cond = bucket < F.lit(acc + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        acc += w
    return docs.withColumn("split", expr)


def hash_sample(
    docs: DataFrame,
    num: int,
    den: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep docs whose md5 bucket mod ``den`` falls below ``num`` — a
    deterministic ~num/den sample, stable across runs and engine."""
    if not (0 <= num <= den) or den <= 0:
        raise ValueError("need 0 <= num <= den, den > 0")
    if den > HASH_SPACE:
        raise ValueError(
            f"den ({den}) exceeds the {HASH_SPACE} hash space — the actual"
            " rate would silently distort; reduce the fraction"
        )
    return docs.filter(_hash16(F.col(id_col), salt) % den < num)


def pack_sequences(
    docs: DataFrame,
    length_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_buckets: int = 32,
    salt: str = "",
) -> DataFrame:
    """-> (id, bucket, bin_idx, offset): contiguous greedy packing of docs
    into ``budget``-token bins, per md5 bucket. ``offset`` is the doc's
    starting token offset inside its bin's stream (a doc longer than the
    remaining bin space starts in that bin and spills — the standard
    document-packing-with-spillover layout). Deterministic: bucket from
    (salt, id), order by id within bucket."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    bucket = (_hash16(F.col(id_col), salt) % n_buckets).alias("bucket")
    base = docs.select(
        F.col(id_col).alias("id"), bucket, F.col(length_col).cast("long").alias("_dl")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum("_dl").over(w), F.lit(0))
    # integer `div`, not floor(double /): double division loses exactness
    # past 2^52 cumulative tokens and breaks the module's integer-only
    # cross-engine contract (the DuckDB oracle uses `//`)
    return base.select(
        "id",
        "bucket",
        pre.alias("_pre"),
    ).select(
        "id",
        "bucket",
        F.expr(f"_pre div {int(budget)}").cast("long").alias("bin_idx"),
        (F.col("_pre") % budget).cast("long").alias("offset"),
    )
