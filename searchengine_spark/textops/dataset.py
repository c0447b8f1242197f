"""Dataset assembly operators: deterministic splits, rate sampling, and
sequence packing — the last mile of a training-data pipeline.

All assignment is pure md5 arithmetic over the doc id (+ a salt), so it
is reproducible across engines, retries, partitionings and cluster sizes
— no RNG, no ordering dependence (the cross-engine policy the IVF
k-means established: CLAUDE.md float protocol, here integer-only).

- :func:`hash_split`   train/val/test (any weighting) via a 16-bit md5
  bucket — a doc's split never changes when the corpus grows.
- :func:`hash_sample`  keep ~num/den of docs, same stability.
- :func:`stratified_sample`  per-stratum keep rates (the training-MIXTURE
  op: upsample rare languages/sources, downsample boilerplate-heavy ones)
  over ONE shared doc hash — raising a stratum's rate only ADDS docs
  (nested samples), and the whole op is a single codegen'd filter.
- :func:`deterministic_shuffle`  a pseudo-random GLOBAL training order as
  data: rank in (md5(salt|id), id) order, assigned with the same two-pass
  range-partition + offset trick the docID stage uses (indexing/docids.py)
  — no single-task global window, reproducible at any parallelism.
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


def stratified_sample(
    docs: DataFrame,
    stratum_col: str,
    rates: Dict[str, tuple],
    id_col: str = "doc_id",
    salt: str = "",
    default: tuple | None = None,
) -> DataFrame:
    """Keep ~num/den of each stratum's docs: ``rates`` maps a stratum
    value (compared as string) to its ``(num, den)`` keep rate — the
    dataset-mixture operator (e.g. ``{"en": (1, 1), "de": (1, 4)}``).
    Strata not listed keep at ``default`` (``None`` = drop: a mixture
    spec is exhaustive by default — silent passthrough of an unlisted
    source is how contamination ships).

    One shared per-doc hash across strata: the decision for a doc is
    ``h16(salt|id) % den < num``, so raising a rate strictly GROWS the
    kept set (nested samples — reruns with a bigger budget reuse every
    previously selected doc), and membership is independent of which
    stratum a doc lands in. Pure codegen filter, no shuffle, no RNG."""
    for v, (num, den) in rates.items():
        if not (0 <= num <= den) or den <= 0 or den > HASH_SPACE:
            raise ValueError(f"stratum {v!r}: need 0 <= num <= den, "
                             f"0 < den <= {HASH_SPACE}, got {(num, den)}")
    if default is not None:
        dn, dd = default
        if not (0 <= dn <= dd) or dd <= 0 or dd > HASH_SPACE:
            raise ValueError(f"default: bad rate {default}")
    h = _hash16(F.col(id_col), salt)
    s = F.col(stratum_col).cast("string")
    keep = None
    for v, (num, den) in sorted(rates.items()):
        cond = (s == v) & (h % den < num)
        keep = cond if keep is None else keep | cond
    if default is not None:
        dn, dd = default
        # NULL strata are "not listed" (coalesce: NULL isin -> NULL)
        others = (~F.coalesce(s.isin(*sorted(rates)), F.lit(False))
                  if rates else F.lit(True))
        cond = others & (h % dd < dn)
        keep = cond if keep is None else keep | cond
    if keep is None:
        raise ValueError("rates is empty and no default rate was given")
    return docs.filter(keep)


def deterministic_shuffle(
    docs: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    rank_col: str = "shuffle_rank",
    n_partitions: int | None = None,
) -> DataFrame:
    """+ ``rank_col``: the doc's position (dense, 0-based) in the
    deterministic pseudo-random global order ``(md5(salt|id), id)`` —
    the "global shuffle" a training run wants as DATA, reproducible
    across engines, retries and cluster sizes (no RNG, no
    partitioning dependence; change ``salt`` per epoch for a fresh
    permutation).

    Scale shape: the docID stage's two-pass dense rank
    (indexing/docids.py) — ``repartitionByRange`` on the hash key +
    per-partition offsets — never a single-task global window. The
    returned frame carries a load-bearing internal persist; release it
    after materializing with ``indexing.docids.unpersist_doc_ids``."""
    key = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    tmp = docs.withColumn("_se_shufkey", key)
    cols = [F.col("_se_shufkey"), F.col(id_col)]
    ranged = (tmp.repartitionByRange(n_partitions, *cols) if n_partitions
              else tmp.repartitionByRange(*cols))
    part = (
        ranged.sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["cnt"] for r in
              part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    if not counts:  # empty input
        out = part.drop("_pid", "_se_shufkey").withColumn(
            rank_col, F.lit(0).cast("long"))
        out._se_persisted = part  # type: ignore[attr-defined]
        return out
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    local = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    out = (
        part.withColumn(rank_col, (offset_map[F.col("_pid")] + local).cast("long"))
        .drop("_pid", "_se_shufkey")
    )
    out._se_persisted = part  # type: ignore[attr-defined]
    return out


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
    (salt, id), order by id within bucket. Sibling operators in
    textops/packing.py: ``pack_concat_chunks`` is the dataloader-facing
    span view of this same concat layout (explicit [start, end) +
    chunk straddle range); ``pack_greedy`` is the NO-SPLIT first-fit
    discipline (whole docs per sequence — SFT-style)."""
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
