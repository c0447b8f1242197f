"""Distinct-count sketching — a deterministic HyperLogLog (Flajolet et
al. 2007; the ES ``cardinality`` aggregation's engine) for CORPUS-scale
columns, where exact countDistinct means shuffling every distinct value.

Why a sketch here at all: result-set cardinality is exact
(query/aggregations.py — a hit window is k-bounded). A 100-TB COLUMN is
not: exact distinct over 10^12 tokens is a full shuffle of the distinct
set, while the HLL register state is m integers (m = 2^p, default 4096)
produced by ONE map-side-combinable max-aggregation — each executor
folds its partition into m registers locally and the exchange moves
m-row partials, never values. Registers are also the MERGE unit:
sketches of two corpora combine by per-bucket max (associative,
idempotent), so per-shard / per-day sketches roll up for free.

Cross-engine determinism (the repo's exact-arithmetic discipline —
CLAUDE.md "integer micro-units"): the register state is pure integer
arithmetic over md5 hex strings, bit-identical in Spark, DuckDB and
Python —

- hash = md5(utf8(value)) hex (lower-case in every engine);
- bucket = the first p/4 hex chars as an integer (p ∈ {4, 8, ..., 48}:
  whole hex chars keep the split string-exact);
- rho = position of the first 1-bit in the NEXT 48 bits (12 hex chars),
  computed with string ops only: 4 * (leading '0' chars) + a 16-way
  CASE on the first non-zero nibble + 1; all-zero -> 49.

The float ESTIMATE (``hll_estimate``) is driver-side Python over the
collected m-row state — never part of a hash-gated oracle (ln/division
ulp drift across engines is exactly what the integer-state contract
avoids; the driver oracle gates the REGISTERS).

No reference counterpart (the reference has no aggregation surface).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rho for an all-zero 48-bit suffix: 48 zero bits + 1
RHO_MAX = 49


def _rho_expr(hexcol):
    """First-1-bit position of the 48-bit integer spelled by a 12-char
    hex column — string arithmetic only (exact in any engine)."""
    stripped = F.regexp_replace(hexcol, "^0+", "")
    lead = F.lit(12) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    clz4 = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return (
        F.when(F.length(stripped) == 0, F.lit(RHO_MAX))
        .otherwise(lead * 4 + clz4 + 1)
        .cast("int")
    )


def hll_registers(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """-> (bucket, register): the HLL sketch state of ``df[col]`` —
    one row per OCCUPIED bucket (bucket in [0, 2^p), register = max rho
    seen there). Duplicates are free (same value -> same bucket/rho —
    no DISTINCT pass needed), NULLs are skipped (ES semantics). ONE
    partial-aggregable groupBy: the exchange moves <= 2^p rows per
    partition regardless of input size. ``p`` must be a multiple of 4
    (whole hex chars) in [4, 48]."""
    if p % 4 != 0 or not 4 <= p <= 48:
        raise ValueError(f"p must be a multiple of 4 in [4, 48], got {p}")
    n_chars = p // 4
    h = F.md5(F.encode(F.col(col).cast("string"), "UTF-8"))
    bucket = F.conv(F.substring(h, 1, n_chars), 16, 10).cast("long")
    rho = _rho_expr(F.substring(h, n_chars + 1, 12))
    return (
        df.filter(F.col(col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("register"))
        .orderBy("bucket")
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Fold N register frames into one sketch: per-bucket max —
    associative and idempotent, so per-shard / per-batch sketches built
    independently equal the sketch of the concatenated corpus EXACTLY
    (gated in tests/test_sketches.py). All inputs must share one p."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (
        out.groupBy("bucket")
        .agg(F.max("register").cast("int").alias("register"))
        .orderBy("bucket")
    )


def hll_estimate(registers, p: int = 12) -> float:
    """Driver-side cardinality estimate from a collected register state
    (``hll_registers(...).collect()`` or {bucket: register}) — the
    classic HLL estimator: alpha_m * m^2 / sum(2^-M_j) with linear
    counting below 2.5m when empty buckets remain (Flajolet et al.
    2007 §4's small-range correction). Input is m rows max — collecting
    it is the point of the sketch."""
    m = 1 << p
    if isinstance(registers, dict):
        regs = {int(b): int(r) for b, r in registers.items()}
    else:
        regs = {int(r["bucket"]): int(r["register"]) for r in registers}
    if any(not 0 <= b < m for b in regs):
        raise ValueError(f"bucket out of range for p={p} (m={m})")
    zeros = m - len(regs)
    # exact integer inner sum scaled by 2^RHO_MAX+1: empty buckets
    # contribute 2^-0 = 1, occupied 2^-M
    scale = RHO_MAX + 1
    s_int = zeros * (1 << scale) + sum(1 << (scale - r) for r in regs.values())
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m * float(1 << scale) / float(s_int)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)  # linear counting
    return raw


# ---------------------------------------------------------------------------
# Bloom filter — the set-MEMBERSHIP sketch (Bloom 1970): "have we seen
# this document before?" for streaming dedup against corpus-scale
# history, where an exact seen-set join means shuffling every historical
# id per batch. State = the SET OF SET BITS (sparse form: at most m
# rows of one long each — the dense bitmap is a presentation concern),
# produced by ONE map-side-combinable distinct; merge = union distinct
# (associative, idempotent — per-shard / per-day filters roll up like
# HLL registers). Same determinism contract as HLL: bit_i(v) =
# (first 12 md5 nibbles of 'bf<i>|<v>' as a 48-bit int) mod m, m a
# power of two ≤ 2^48 — pure integer arithmetic, bit-identical in
# Spark, DuckDB, and Python. One-sided error: NO false negatives (a
# sketched value always hits all k bits); false positives at the
# classic (1 - e^{-kn/m})^k rate drop some genuinely-new docs.

BLOOM_M = 1 << 20
BLOOM_K = 4


def _bloom_h48(col, salt: str):
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), col.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")


def _check_bloom(m: int, k: int) -> None:
    if not (m > 0 and (m & (m - 1)) == 0 and m <= (1 << 48)):
        raise ValueError(f"m must be a power of two <= 2^48, got {m}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


def bloom_bits(
    df: DataFrame, col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """-> (bit): the sparse Bloom state of ``df[col]`` — the distinct
    set of k md5-derived bit positions per value. NULLs are skipped
    (a NULL is not a member of anything)."""
    _check_bloom(m, k)
    if col not in df.columns:
        raise ValueError(f"frame lacks column {col!r}")
    src = df.select(F.col(col).alias("_v")).filter(F.col("_v").isNotNull())
    parts = [
        src.select((_bloom_h48(F.col("_v"), f"bf{i}") % m).alias("bit"))
        for i in range(k)
    ]
    uni = parts[0]
    for p_ in parts[1:]:
        uni = uni.unionByName(p_)
    return uni.distinct()


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Union of sparse Bloom states (same (m, k) by contract — the state
    carries no parameters, exactly like a real bitmap)."""
    if not sketches:
        raise ValueError("bloom_merge wants at least one sketch")
    uni = sketches[0].select("bit")
    for s in sketches[1:]:
        uni = uni.unionByName(s.select("bit"))
    return uni.distinct()


def bloom_unseen(
    batch: DataFrame,
    bits: DataFrame,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Rows of ``batch`` whose ``col`` is DEFINITELY NOT in the sketched
    set — the streaming-dedup gate: keep only never-seen docs, then
    fold their bits back in with bloom_merge. One-sided: no sketched
    value survives (no false negatives); a fresh value collides away
    with probability (1 - e^{-kn/m})^k. NULL values pass (unsketchable
    -> unseen). Plan: explode the k bit positions per row, ONE left
    join against the (≤ m)-row state, one all-bits-present groupBy —
    batch-sized exchanges, never history-sized.

    Caveat: the internal row key is ``monotonically_increasing_id``,
    evaluated in BOTH branches of one plan — ``batch`` must therefore
    be a DETERMINISTIC scan (a parquet/table read, as in the
    clean_corpus composition), not e.g. an unseeded sample, or the two
    branches could key rows differently."""
    _check_bloom(m, k)
    if col not in batch.columns:
        raise ValueError(f"frame lacks column {col!r}")
    rid = F.monotonically_increasing_id()
    keyed = batch.withColumn("_rid", rid)
    probes = keyed.select(
        "_rid",
        F.explode(F.array(*[
            (_bloom_h48(F.col(col), f"bf{i}") % m).alias(f"_b{i}")
            for i in range(k)
        ])).alias("bit"),
    )
    hit = probes.join(
        bits.select("bit").withColumn("_hit", F.lit(1)), "bit", "left")
    seen = (
        hit.groupBy("_rid")
        .agg(F.min(F.coalesce(F.col("_hit"), F.lit(0))).alias("_all"))
        .filter(F.col("_all") == 1)
        .select("_rid")
    )
    return (
        keyed.join(seen, "_rid", "left_anti").drop("_rid")
    )
