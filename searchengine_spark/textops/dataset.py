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


def temperature_weights(
    docs: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    target_total: int = 0,
) -> DataFrame:
    """-> (stratum, n_docs, weight_micro, rate_num): the temperature /
    exponential-smoothing mixture every multilingual-pretraining recipe
    uses (sample stratum i with probability ∝ p_i^alpha — the mBERT /
    XLM-R up-weighting of rare strata), in the repo's EXACT integer
    protocol so it is oracle-able.

    ``alpha`` must be 1.0, 0.5 or 0.25 — the exactly-reproducible
    members: ``x^0.5`` is one IEEE sqrt (correctly rounded on every
    conforming engine, the BM25-oracle precedent for sqrt-modifier
    field_value_factor) and ``x^0.25`` is two; a general ``pow`` rides
    libm and is NOT cross-engine exact (the gauss/exp-decay precedent),
    so it is refused rather than silently drifting.

    Arithmetic (all BIGINT after one floor):
    ``s_i = floor(n_i^alpha * 1e6)``; ``weight_micro_i = s_i * 1e6 //
    Σ s_j`` (the mixture, in micro-units; at alpha=1.0 the shared 1e6
    factor is divided out of numerator and denominator first — the
    floor quotient is unchanged and the widening multiply no longer
    wraps past ~9.2M docs per stratum; past the representable range in
    the other branches the job refuses loudly instead of wrapping); with a ``target_total``
    budget, ``rate_num_i = min(65536, (target_total * weight_micro_i //
    1e6) * 65536 // n_i)`` — the per-stratum keep rate over the
    16-bit hash space, ready for :func:`stratified_sample` (rate =
    (rate_num, 65536)). NULL strata are skipped (the NULLs-drop
    contract aggregations use).

    Plan: one partial-aggregable groupBy (strata-bounded), one
    broadcast-joined scalar total — corpus size never appears in any
    exchange."""
    if alpha not in (1.0, 0.5, 0.25):
        raise ValueError(
            f"alpha must be 1.0, 0.5 or 0.25 (exact-arithmetic members), "
            f"got {alpha}")
    if target_total < 0:
        raise ValueError("target_total must be >= 0")
    counts = (
        docs.filter(F.col(stratum_col).isNotNull())
        .groupBy(F.col(stratum_col).cast("string").alias("stratum"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    n = F.col("n_docs").cast("double")
    # Overflow guard for the widening `_s * 1e6` multiply below: Spark's
    # non-ANSI long multiply WRAPS silently while the DuckDB twin errors
    # loudly, so past this bound the engines would diverge on garbage.
    # Refuse loudly instead (the exact-integer-path house policy).
    _s_cap = (1 << 63) // 1_000_000  # ≈9.22e12
    if alpha == 1.0:
        # s_i = n_i*1e6 and total = Σn_j*1e6 share the exact 1e6 factor,
        # so divide it out of both BEFORE the widening multiply:
        # floor(n_i*1e12 / Σn_j*1e6) == floor(n_i*1e6 / Σn_j) exactly.
        # Without this, `_s * 1e6` = n_i*1e12 wraps past ~9.2M docs per
        # stratum — realistic for pretraining strata.
        s = F.col("n_docs").cast("long")
    elif alpha == 0.5:
        s = F.floor(F.sqrt(n) * F.lit(1_000_000.0)).cast("long")
    else:
        s = F.floor(F.sqrt(F.sqrt(n)) * F.lit(1_000_000.0)).cast("long")
    weighted = counts.withColumn("_s", s)
    total = weighted.agg(F.sum("_s").alias("_total"))
    wexpr = (
        f"if(_s <= {_s_cap}, _s * 1000000 div _total, "
        f"cast(raise_error('temperature_weights: stratum exceeds the "
        f"exact-integer range (s_i > 2^63/1e6); mixture weights would "
        f"silently wrap') as long))")
    out = weighted.crossJoin(F.broadcast(total)).withColumn(
        "weight_micro",
        F.expr(wexpr).cast("long"),
    )
    if target_total:
        rate = F.expr(f"least({HASH_SPACE}, "
                      f"({int(target_total)} * weight_micro div 1000000)"
                      f" * {HASH_SPACE} div n_docs)")
        out = out.withColumn("rate_num", rate.cast("long"))
    else:
        out = out.withColumn("rate_num", F.lit(HASH_SPACE).cast("long"))
    return out.select("stratum", "n_docs", "weight_micro", "rate_num")


def temperature_sample(
    docs: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    target_total: int = 0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Compose :func:`temperature_weights` with
    :func:`stratified_sample`: compute the temperature mixture's
    per-stratum keep rates, then apply them over the shared doc hash
    (nested-sample property preserved — a bigger target only ADDS
    docs). The weights table is strata-bounded, so collecting it is a
    scalar-bounded driver step (the idf-map precedent, wand.py)."""
    w = temperature_weights(docs, stratum_col, alpha, target_total)
    rates = {r["stratum"]: (int(r["rate_num"]), HASH_SPACE)
             for r in w.collect()}
    if not rates:
        return docs.filter(F.lit(False))
    return stratified_sample(docs, stratum_col, rates, id_col=id_col,
                             salt=salt, default=None)
