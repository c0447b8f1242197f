"""HLL sketch gates (textops/sketches.py): the register state is
bit-identical to a pure-Python md5 recompute (the cross-engine integer
contract), duplicates are free, shard sketches merge to the exact
whole-corpus sketch, and the estimator lands within HLL's published
error envelope on both branches (raw + linear counting)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.textops.sketches import (
    RHO_MAX,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _py_registers(values, p):
    regs: dict = {}
    for v in values:
        if v is None:
            continue
        h = hashlib.md5(str(v).encode("utf-8")).hexdigest()
        bucket = int(h[: p // 4], 16)
        bits = bin(int(h[p // 4: p // 4 + 12], 16))[2:].zfill(48)
        rho = (bits.index("1") + 1) if "1" in bits else RHO_MAX
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_registers_match_python_exactly(spark):
    vals = [f"tok{i}" for i in range(400)] + ["dup"] * 50 + [None] * 5
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    for p in (8, 12):
        got = {r["bucket"]: r["register"]
               for r in hll_registers(df, "value", p=p).collect()}
        assert got == _py_registers(vals, p)


def test_duplicates_are_free(spark):
    df = spark.range(300).select(F.concat(F.lit("v"), "id").alias("v"))
    one = {(r["bucket"], r["register"])
           for r in hll_registers(df, "v").collect()}
    dup = {(r["bucket"], r["register"])
           for r in hll_registers(df.union(df).union(df), "v").collect()}
    assert one == dup


def test_shard_sketches_merge_exactly(spark):
    df = spark.range(2000).select(F.concat(F.lit("d"), "id").alias("v"),
                                  (F.col("id") % 3).alias("part"))
    whole = {(r["bucket"], r["register"])
             for r in hll_registers(df, "v").collect()}
    parts = [hll_registers(df.filter(F.col("part") == i), "v")
             for i in range(3)]
    merged = {(r["bucket"], r["register"])
              for r in hll_merge(*parts).collect()}
    assert merged == whole


def test_estimate_error_envelope(spark):
    # raw branch: 50k distinct at p=12 (m=4096) — published stderr is
    # 1.04/sqrt(m) ~ 1.6%; gate at 5% (3 sigma)
    n = 50_000
    df = spark.range(n).select(F.concat(F.lit("x"), "id").alias("v"))
    regs = hll_registers(df, "v", p=12).collect()
    est = hll_estimate(regs, p=12)
    assert abs(est - n) / n < 0.05
    # linear-counting branch: 100 distinct at m=4096 — near-exact
    small = spark.range(100).select(F.concat(F.lit("y"), "id").alias("v"))
    sregs = hll_registers(small, "v", p=12).collect()
    sest = hll_estimate(sregs, p=12)
    assert sest == 4096 * math.log(4096 / (4096 - len(sregs)))
    assert abs(sest - 100) / 100 < 0.05


def test_validation(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="multiple of 4"):
        hll_registers(df, "v", p=10)
    with pytest.raises(ValueError, match="at least one"):
        hll_merge()
    with pytest.raises(ValueError, match="bucket out of range"):
        hll_estimate({5000: 3}, p=8)


def test_bloom_no_false_negatives_and_merge(spark):
    """Every sketched value hits all k bits (one-sided error); merge ==
    bits of the union; fresh values mostly survive at low load."""
    from searchengine_spark.textops.sketches import (
        bloom_bits,
        bloom_merge,
        bloom_unseen,
    )

    m, k = 1 << 16, 4
    a = spark.createDataFrame([(f"doc{i}",) for i in range(200)], "v string")
    b = spark.createDataFrame([(f"other{i}",) for i in range(200)], "v string")
    bits_a = bloom_bits(a, "v", m=m, k=k)
    # no false negatives: nothing sketched is 'unseen'
    assert bloom_unseen(a, bits_a, "v", m=m, k=k).count() == 0
    # fresh values mostly retained (kn/m small -> FP rate tiny)
    fresh = bloom_unseen(b, bits_a, "v", m=m, k=k).count()
    assert fresh >= 190
    # merge == union's bits, exactly
    bits_b = bloom_bits(b, "v", m=m, k=k)
    merged = {r["bit"] for r in bloom_merge(bits_a, bits_b).collect()}
    both = {r["bit"] for r in bloom_bits(a.unionByName(b), "v",
                                         m=m, k=k).collect()}
    assert merged == both
    # after folding b in, b is fully seen too
    assert bloom_unseen(b, bloom_merge(bits_a, bits_b), "v",
                        m=m, k=k).count() == 0


def test_bloom_bits_match_hashlib(spark):
    """The bit positions are exactly the first-12-md5-nibbles mod m of
    'bf<i>|<value>' — the Python twin of the engine arithmetic."""
    import hashlib

    from searchengine_spark.textops.sketches import bloom_bits

    m, k = 1 << 16, 3
    vals = ["alpha", "beta", "42"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r["bit"] for r in bloom_bits(df, "v", m=m, k=k).collect()}
    want = {
        int(hashlib.md5(f"bf{i}|{v}".encode()).hexdigest()[:12], 16) % m
        for v in vals for i in range(k)
    }
    assert got == want


def test_bloom_validation_and_nulls(spark):
    import pytest as _pt

    from searchengine_spark.textops.sketches import bloom_bits, bloom_unseen

    df = spark.createDataFrame([("x",), (None,)], "v string")
    with _pt.raises(ValueError, match="power of two"):
        bloom_bits(df, "v", m=1000)
    with _pt.raises(ValueError, match="k must"):
        bloom_bits(df, "v", k=0)
    with _pt.raises(ValueError, match="lacks column"):
        bloom_bits(df, "nope")
    bits = bloom_bits(df, "v")  # NULL skipped on the sketch side
    # NULL rows pass the gate (unsketchable -> unseen)
    out = bloom_unseen(df, bits, "v")
    assert [r["v"] for r in out.collect()] == [None]
