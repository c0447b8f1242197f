"""Faceted search gates (query/facets.py).

Contract (ES terms-aggregation analog): per query and facet column,
buckets are (value, doc count over the result set) ranked count-desc
then value-asc, NULL values skipped, top-k cut, values stringified.
Facets are computed over RESOLVED external ids, so every serving tier
(exact, packed, federated) must produce identical facets for identical
result sets.
"""

import pyspark.sql.functions as F
import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.indexing.shards import build_shard_indexes, shard_paths
from searchengine_spark.query.facets import facet_counts
from searchengine_spark.query.federated import (
    boolean_search_federated,
    resolve_docs_federated,
)
from searchengine_spark.query.wand import boolean_search_packed, resolve_docs
from searchengine_spark.tokenizer import TokenizerConfig

QUERIES = ["greatest rock album", "drummer tour"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=10).persist()


def _facet_rows(df):
    return sorted(map(tuple, df.select(
        "query_id", "facet", "value", "n", "rank").collect()))


def test_facet_semantics_handbuilt(spark):
    """Exact counts, count-desc/value-asc tie order, NULL skip, k cut,
    stringified values — on a hand-built result set."""
    results = spark.createDataFrame(
        [(0, "c1", 0), (0, "c1", 1), (0, "c2", 0), (1, "c2", 0)],
        "query_id int, conv_id string, turn_idx int",
    )
    attrs = spark.createDataFrame(
        [("c1", 0, "user", 7), ("c1", 1, "assistant", 7),
         ("c2", 0, None, 9)],
        "conv_id string, turn_idx int, role string, code int",
    )
    got = _facet_rows(facet_counts(
        results, attrs, ["role", "code"], ["conv_id", "turn_idx"], k=10))
    assert got == sorted([
        # query 0: roles user=1, assistant=1 (tie -> value asc), NULL skipped
        (0, "role", "assistant", 1, 1),
        (0, "role", "user", 1, 2),
        # code facet stringifies ints; 7 twice beats 9 once
        (0, "code", "7", 2, 1),
        (0, "code", "9", 1, 2),
        (1, "code", "9", 1, 1),
        # query 1 hit c2/0 whose role is NULL -> no role bucket at all
    ])
    # k cut keeps the top bucket only
    cut = facet_counts(results, attrs, ["code"], ["conv_id", "turn_idx"], k=1)
    assert _facet_rows(cut) == [(0, "code", "7", 2, 1), (1, "code", "9", 1, 1)]

    with pytest.raises(ValueError, match="lacks columns"):
        facet_counts(results, attrs, ["nope"], ["conv_id", "turn_idx"])
    with pytest.raises(ValueError, match="at least one"):
        facet_counts(results, attrs, [], ["conv_id", "turn_idx"])


def test_facets_match_python_expectation(spark, corpus, cfg, tmp_path):
    """End-to-end over a real boolean result set: facet counts equal the
    Python-computed histogram of the matched docs' attributes."""
    path = str(tmp_path / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=64)
    pidx = load_packed_index(spark, path)
    hits = resolve_docs(
        pidx,
        boolean_search_packed(pidx, QUERIES, cfg, op="or").select(
            "query_id", "doc_id", F.lit(0.0).alias("score"),
            F.lit(0).alias("rank"),
        ),
    )
    got = _facet_rows(facet_counts(hits, corpus, ["role"],
                                   ["conv_id", "turn_idx"], k=10))

    attrs = {(r["conv_id"], r["turn_idx"]): r["role"]
             for r in corpus.collect()}
    exp = []
    for r in hits.select("query_id", "conv_id", "turn_idx").collect():
        exp.append((r["query_id"], attrs[(r["conv_id"], r["turn_idx"])]))
    from collections import Counter

    expected = []
    for q in sorted({e[0] for e in exp}):
        cnt = Counter(v for qq, v in exp if qq == q and v is not None)
        buckets = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        expected += [(q, "role", v, n, i + 1)
                     for i, (v, n) in enumerate(buckets)]
    assert got == sorted(expected)
    assert len(got) > 0


def test_facets_tier_identical(spark, corpus, cfg, tmp_path):
    """Facets are namespace-free: the federated boolean result over built
    shards produces bit-identical facets to the single fresh index."""
    out, single = str(tmp_path / "fed"), str(tmp_path / "one")
    build_shard_indexes(corpus, cfg, out, 3, chunk_docs=64)
    build_packed_index(corpus, cfg, single, chunk_docs=64)
    shards = [load_packed_index(spark, p) for p in shard_paths(out, 3)]
    pidx = load_packed_index(spark, single)

    fed_hits = resolve_docs_federated(
        shards,
        boolean_search_federated(shards, QUERIES, cfg, op="or").select(
            "query_id", "doc_id", F.lit(0.0).alias("score"),
            F.lit(0).alias("rank"),
        ),
    )
    one_hits = resolve_docs(
        pidx,
        boolean_search_packed(pidx, QUERIES, cfg, op="or").select(
            "query_id", "doc_id", F.lit(0.0).alias("score"),
            F.lit(0).alias("rank"),
        ),
    )
    fa = _facet_rows(facet_counts(fed_hits, corpus, ["role", "tool"],
                                  ["conv_id", "turn_idx"], k=5))
    fb = _facet_rows(facet_counts(one_hits, corpus, ["role", "tool"],
                                  ["conv_id", "turn_idx"], k=5))
    assert fa == fb
    assert len(fa) > 0


def test_top_hits_buckets(spark):
    from searchengine_spark.query.facets import top_hits

    hits = spark.createDataFrame(
        [(0, 1, 3.0, 1), (0, 2, 2.0, 2), (0, 3, 2.0, 3), (0, 4, 1.0, 4),
         (1, 2, 9.0, 1)],
        "query_id int, ext_id long, score double, rank int",
    )
    attrs = spark.createDataFrame(
        [(1, "user"), (2, "assistant"), (3, "user"), (4, "user"),
         (5, None)],
        "ext_id long, role string",
    )
    got = [(r["query_id"], r["value"], r["hit_rank"], r["ext_id"],
            r["score"])
           for r in top_hits(hits, attrs, ["role"], ["ext_id"],
                             n=2).collect()]
    assert got == [
        (0, "assistant", 1, 2, 2.0),
        (0, "user", 1, 1, 3.0),      # best user hit
        (0, "user", 2, 3, 2.0),      # rank tiebreak: retrieval rank asc
        (1, "assistant", 1, 2, 9.0),
    ]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n must be"):
        top_hits(hits, attrs, ["role"], ["ext_id"], n=0)
    with _pytest.raises(ValueError, match="lacks columns"):
        top_hits(hits, attrs, ["nope"], ["ext_id"])


def test_top_hits_composes_with_retrieval(spark, stop_words, tmp_path):
    """Ranked retrieval -> top_hits equals a Python recompute; every
    bucket's hits come back in the retrieval's own order."""
    from pyspark.sql import functions as F

    from searchengine_spark.fixtures import transcripts_df
    from searchengine_spark.indexing.packed import (
        build_packed_index,
        load_packed_index,
    )
    from searchengine_spark.query.facets import top_hits
    from searchengine_spark.query.wand import bm25_topk_packed_batch, resolve_docs
    from searchengine_spark.tokenizer import TokenizerConfig

    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words)
    corpus = transcripts_df(spark, n_conv=8)
    path = str(tmp_path / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=64)
    pidx = load_packed_index(spark, path)
    res = resolve_docs(pidx, bm25_topk_packed_batch(
        pidx, ["greatest rock album", "guitar solo"], cfg, k=10,
        round_dp=6))
    ext = ["conv_id", "turn_idx"]
    got = [(r["query_id"], r["facet"], r["value"], r["hit_rank"],
            r["conv_id"], r["turn_idx"])
           for r in top_hits(res, corpus, ["role"], ext, n=2).collect()]
    roles = {(r["conv_id"], r["turn_idx"]): r["role"]
             for r in corpus.select("conv_id", "turn_idx", "role").collect()}
    expect = []
    rows = sorted(res.collect(), key=lambda r: (r["query_id"], r["rank"]))
    per_bucket: dict = {}
    for r in rows:
        v = roles[(r["conv_id"], r["turn_idx"])]
        key = (r["query_id"], "role", v)
        per_bucket.setdefault(key, []).append(r)
    for (qid, facet, v), lst in per_bucket.items():
        for hr, r in enumerate(lst[:2], start=1):
            expect.append((qid, facet, v, hr, r["conv_id"], r["turn_idx"]))
    assert sorted(got) == sorted(expect) and got
