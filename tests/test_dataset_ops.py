"""Dataset-assembly gates: split stability under corpus growth, sample
bounds, and packing contiguity/spillover semantics."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from searchengine_spark.textops import hash_sample, hash_split, pack_sequences


def _h16(salt: str, i: int) -> int:
    return int(hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:4], 16)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(500).select(F.col("id").alias("doc_id"))


def test_split_matches_python_md5(spark, docs):
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            docs, {"train": 8, "val": 1, "test": 1}, salt="s"
        ).collect()
    }
    for d, s in got.items():
        b = _h16("s", d) % 10
        assert s == ("train" if b < 8 else "val" if b < 9 else "test")
    # all three splits non-empty at 500 docs and roughly weighted
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == {"train", "val", "test"} and c["train"] > c["val"]


def test_split_stable_under_growth(spark, docs):
    """A doc's split must not change when the corpus grows — the property
    random-number splits lack."""
    small = hash_split(
        docs.filter(F.col("doc_id") < 100), {"a": 1, "b": 1}, salt="x"
    )
    big = hash_split(docs, {"a": 1, "b": 1}, salt="x")
    sm = {r["doc_id"]: r["split"] for r in small.collect()}
    bg = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(bg[d] == s for d, s in sm.items())


def test_sample_rate_and_determinism(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, 1, 10, salt="z").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 1, 10, salt="z").collect()}
    assert a == b
    assert 20 <= len(a) <= 90  # ~50 expected of 500
    assert a == {d for d in range(500) if _h16("z", d) % 10 < 1}


def test_pack_sequences_contiguous(spark):
    rows = [(i, 10 + (i * 7) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, dl long")
    out = pack_sequences(df, "dl", budget=100, n_buckets=4, salt="p")
    got = [(r["id"], r["bucket"], r["bin_idx"], r["offset"]) for r in out.collect()]
    dl = dict(rows)
    by_bucket: dict = {}
    for i, b, bi, off in got:
        by_bucket.setdefault(b, []).append((i, bi, off))
    assert set(len(v) for v in by_bucket.values()) and sum(
        len(v) for v in by_bucket.values()
    ) == 200
    for b, items in by_bucket.items():
        items.sort()
        pre = 0
        for i, bi, off in items:
            assert bi == pre // 100 and off == pre % 100, (b, i)
            pre += dl[i]
        assert {i for i, _, _ in items} == {
            i for i in range(200) if _h16("p", i) % 4 == b
        }


def test_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame([(0, 5)], "doc_id long, dl long")
    with pytest.raises(ValueError):
        pack_sequences(df, "dl", budget=0)
    with pytest.raises(ValueError):
        hash_sample(df, 3, 2)
    with pytest.raises(ValueError):
        hash_split(df, {"a": -1, "b": 2})
    # denominators/weights beyond the 16-bit hash space silently distort
    # rates -> refused
    with pytest.raises(ValueError, match="hash space"):
        hash_sample(df, 50000, 100000)
    with pytest.raises(ValueError, match="hash space"):
        hash_split(df, {"a": 70000, "b": 70000})


def test_pack_sequences_integer_div_past_double_precision(spark):
    # bin_idx must use exact integer division: floor(double /) rounds a
    # cumulative count near 2^53 to the wrong bin
    big = (1 << 53) - 1  # largest odd long a double cannot represent +1 of
    rows = [(0, big), (1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, dl long")
    out = {
        r["id"]: (r["bin_idx"], r["offset"])
        for r in pack_sequences(df, "dl", budget=2, n_buckets=1).collect()
    }
    assert out[0] == (0, 0)
    # python int arithmetic is the oracle: pre=big for doc 1
    assert out[1] == (big // 2, big % 2)


# ----------------------------------------------- stratified mixture sampling

def test_stratified_sample_matches_python_md5(spark):
    from searchengine_spark.textops import stratified_sample

    docs = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
         .when(F.col("id") % 3 == 1, "de")
         .otherwise("fr").alias("lang"),
    )
    rates = {"en": (1, 1), "de": (1, 4), "fr": (0, 1)}
    got = {r["doc_id"] for r in
           stratified_sample(docs, "lang", rates, salt="m").collect()}
    want = set()
    for d in range(600):
        lang = ["en", "de", "fr"][d % 3]
        num, den = rates[lang]
        if _h16("m", d) % den < num:
            want.add(d)
    assert got == want
    assert {d for d in got if d % 3 == 0} == {d for d in range(600) if d % 3 == 0}
    assert not {d for d in got if d % 3 == 2}


def test_stratified_sample_nested_under_rate_growth(spark):
    """Raising a stratum's rate must strictly grow its kept set (one
    shared doc hash — rerunning with a larger budget reuses every
    previously kept doc)."""
    from searchengine_spark.textops import stratified_sample

    docs = spark.range(400).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    lo = {r["doc_id"] for r in
          stratified_sample(docs, "lang", {"en": (1, 8)}, salt="n").collect()}
    hi = {r["doc_id"] for r in
          stratified_sample(docs, "lang", {"en": (3, 8)}, salt="n").collect()}
    assert lo and lo < hi


def test_stratified_sample_default_and_nulls(spark):
    from searchengine_spark.textops import stratified_sample

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise(None).alias("lang"),
    )
    # no default: unlisted strata (here NULL) are DROPPED
    kept = stratified_sample(docs, "lang", {"en": (1, 1)}, salt="q").collect()
    assert all(r["lang"] == "en" for r in kept)
    # default keeps NULL-stratum docs at the default rate
    withd = {r["doc_id"] for r in stratified_sample(
        docs, "lang", {"en": (0, 1)}, salt="q", default=(1, 1)).collect()}
    assert withd == {d for d in range(300) if d % 2 == 1}
    with pytest.raises(ValueError, match="rates is empty"):
        stratified_sample(docs, "lang", {})
    with pytest.raises(ValueError, match="need 0 <= num"):
        stratified_sample(docs, "lang", {"en": (2, 1)})


# ------------------------------------------------------ deterministic shuffle

def test_deterministic_shuffle_matches_python(spark):
    from searchengine_spark.textops import deterministic_shuffle

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    out = deterministic_shuffle(docs, salt="e0", n_partitions=7).collect()
    got = {r["doc_id"]: r["shuffle_rank"] for r in out}
    order = sorted(range(500),
                   key=lambda d: (hashlib.md5(f"e0|{d}".encode()).hexdigest(), d))
    want = {d: i for i, d in enumerate(order)}
    assert got == want


def test_deterministic_shuffle_partitioning_invariant(spark):
    """Same ranks at any parallelism (the reproducible-training-order
    contract) and a fresh permutation per salt."""
    from searchengine_spark.textops import deterministic_shuffle

    docs = spark.range(400).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shuffle_rank"] for r in
         deterministic_shuffle(docs.repartition(3), salt="e1",
                               n_partitions=2).collect()}
    b = {r["doc_id"]: r["shuffle_rank"] for r in
         deterministic_shuffle(docs.repartition(11), salt="e1",
                               n_partitions=13).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(400))  # dense 0..N-1
    c = {r["doc_id"]: r["shuffle_rank"] for r in
         deterministic_shuffle(docs, salt="e2", n_partitions=2).collect()}
    assert c != a


def test_deterministic_shuffle_releasable_persist(spark):
    from searchengine_spark.indexing.docids import unpersist_doc_ids
    from searchengine_spark.textops import deterministic_shuffle

    docs = spark.range(50).select(F.col("id").alias("doc_id"))
    out = deterministic_shuffle(docs, salt="e3", n_partitions=2)
    out.count()
    assert getattr(out, "_se_persisted", None) is not None
    unpersist_doc_ids(out)
    assert out._se_persisted is None
