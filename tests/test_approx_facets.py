"""ES distributed terms-aggregation approximation gates
(query/facets.py approx_terms_agg / approx_facet_counts):

- exhaustive shards (shard_size >= every shard's value count) degrade to
  the exact facet_counts buckets with err = 0 everywhere;
- under real truncation the ES guarantee holds for every returned
  bucket: merged n <= true count <= n + doc_count_error_upper_bound,
  and the bound is exactly what a Python replay of the per-shard
  top-shard_size protocol produces (not merely an upper bound we
  happened to satisfy);
- exhaustive shards contribute zero error (the ES rule that a shard
  returning ALL its buckets hides nothing)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.facets import (
    approx_facet_counts,
    approx_terms_agg,
    facet_counts,
)

N_DOCS = 800


def _shard(key, n_shards: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % n_shards


def _value(doc: int, facet: str) -> str:
    if facet == "a":
        return f"v{doc % 37:02d}"
    # skewed: many docs share low buckets
    return f"w{int((doc % 100) ** 0.5):02d}"


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        (0, facet, _value(d, facet), d)
        for d in range(N_DOCS)
        for facet in ("a", "b")
    ] + [
        (1, "a", _value(d, "a"), d) for d in range(0, N_DOCS, 3)
    ]
    return spark.createDataFrame(
        rows, "query_id int, facet string, value string, doc_id long"
    )


def _true_counts(rows):
    out = {}
    for q, facet, value, _ in rows:
        out[(q, facet, value)] = out.get((q, facet, value), 0) + 1
    return out


def _replay(rows, n_shards, shard_size, k):
    """Python replay of the ES shard protocol over the same md5 split."""
    per_shard: dict = {}
    for q, facet, value, d in rows:
        s = _shard(d, n_shards)
        per_shard.setdefault((q, facet, s), {})
        per_shard[(q, facet, s)][value] = per_shard[(q, facet, s)].get(value, 0) + 1
    merged: dict = {}
    trunc: dict = {}
    returned: dict = {}
    for (q, facet, s), counts in per_shard.items():
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = ranked[:shard_size]
        t = kept[-1][1] if len(ranked) > shard_size else 0
        trunc[(q, facet, s)] = t
        for value, n in kept:
            merged[(q, facet, value)] = merged.get((q, facet, value), 0) + n
            returned.setdefault((q, facet, value), set()).add(s)
    out = {}
    for (q, facet, value), n in merged.items():
        err = sum(
            t for (qq, ff, s), t in trunc.items()
            if (qq, ff) == (q, facet) and s not in returned[(q, facet, value)]
        )
        out.setdefault((q, facet), []).append((value, n, err))
    final = {}
    for key, buckets in out.items():
        buckets.sort(key=lambda b: (-b[1], b[0]))
        final[key] = buckets[:k]
    return final


def test_exhaustive_shards_equal_exact(spark, pairs):
    approx = approx_terms_agg(pairs, n_shards=4, shard_size=10_000, k=8)
    rows = approx.collect()
    assert rows and all(r["err"] == 0 for r in rows)
    got = {(r["query_id"], r["facet"], r["rank"]): (r["value"], r["n"])
           for r in rows}
    truth = _true_counts([tuple(r) for r in pairs.collect()])
    by_group: dict = {}
    for (q, facet, value), n in truth.items():
        by_group.setdefault((q, facet), []).append((value, n))
    for key, buckets in by_group.items():
        buckets.sort(key=lambda b: (-b[1], b[0]))
        for i, (value, n) in enumerate(buckets[:8], start=1):
            assert got[(key[0], key[1], i)] == (value, n)


def test_truncated_matches_protocol_replay_and_bound(spark, pairs):
    rows = [tuple(r) for r in pairs.collect()]
    truth = _true_counts(rows)
    for n_shards, shard_size in ((4, 5), (8, 3), (2, 10)):
        want = _replay(rows, n_shards, shard_size, k=10)
        got_rows = approx_terms_agg(
            pairs, n_shards=n_shards, shard_size=shard_size, k=10).collect()
        got: dict = {}
        for r in got_rows:
            got.setdefault((r["query_id"], r["facet"]), []).append(
                (r["rank"], r["value"], r["n"], r["err"]))
        assert set(got) == set(want)
        saw_error = False
        for key, buckets in want.items():
            got_sorted = [b[1:] for b in sorted(got[key])]
            assert got_sorted == buckets, (n_shards, shard_size, key)
            for value, n, err in buckets:
                true_n = truth[(key[0], key[1], value)]
                assert n <= true_n <= n + err, (key, value)
                saw_error = saw_error or err > 0
        assert saw_error, (n_shards, shard_size)  # fixture must exercise truncation


def test_facet_wrapper_over_attrs(spark):
    results = spark.createDataFrame(
        [(0, d) for d in range(200)], "query_id int, doc_id long")
    attrs = spark.createDataFrame(
        [(d, _value(d, "b")) for d in range(200)], "doc_id long, grp string")
    out = approx_facet_counts(
        results, attrs, ["grp"], ["doc_id"], n_shards=4, shard_size=3, k=5
    ).collect()
    assert out and all(r["facet"] == "grp" for r in out)
    truth: dict = {}
    for d in range(200):
        v = _value(d, "b")
        truth[v] = truth.get(v, 0) + 1
    for r in out:
        assert r["n"] <= truth[r["value"]] <= r["n"] + r["err"]


def test_validation(spark, pairs):
    with pytest.raises(ValueError):
        approx_terms_agg(pairs, n_shards=0, shard_size=5)
    with pytest.raises(ValueError):
        approx_terms_agg(pairs, n_shards=2, shard_size=0)
