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
