"""Sharded build gates (indexing/shards.py).

Contract: build_shard_indexes hash-partitions ONE corpus into N
conversation-coherent shard indexes whose union is exactly the corpus,
with a deterministic cross-engine shard assignment (md5 mod N), a
committed federation.json sidecar, and bit-identical shard contents
whether the corpus was staged (partitioned write + pruned reads) or
filtered per shard.
"""

import json

import pyspark.sql.functions as F
import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing import fsio
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.indexing.shards import (
    FEDERATION_MANIFEST,
    build_shard_indexes,
    shard_assignment,
    shard_paths,
)
from searchengine_spark.query.federated import (
    bm25_topk_federated,
    boolean_search_federated,
    resolve_docs_federated,
    resolve_shards_arg,
)
from searchengine_spark.query.wand import (
    bm25_topk_packed_batch,
    boolean_search_packed,
    resolve_docs,
)
from searchengine_spark.tokenizer import TokenizerConfig

QUERIES = ["greatest rock album", "guitar solo legendary", "drummer tour"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=12).persist()


def _ext(df):
    return sorted(
        (r["query_id"], r["conv_id"], r["turn_idx"])
        for r in df.select("query_id", "conv_id", "turn_idx").collect()
    )


def test_shard_assignment_deterministic_and_coherent(spark, corpus):
    """The assignment is a pure function of the key: every row of a
    conversation lands in ONE shard, ids cover [0, N), and the Python
    twin (md5 of the key, top 15 hex chars mod N) reproduces Spark's
    conv() expression bit for bit — the same recipe the DuckDB oracle
    uses, so routers in any engine agree."""
    import hashlib

    n = 3
    got = corpus.withColumn("shard", shard_assignment("conv_id", n))
    per_conv = got.groupBy("conv_id").agg(
        F.countDistinct("shard").alias("k"), F.first("shard").alias("shard")
    ).collect()
    assert all(r["k"] == 1 for r in per_conv)
    assert {r["shard"] for r in per_conv} <= set(range(n))

    for r in per_conv:
        exp = int(hashlib.md5(r["conv_id"].encode()).hexdigest()[:15], 16) % n
        assert r["shard"] == exp, r["conv_id"]


def test_build_shards_union_is_corpus(spark, corpus, cfg, tmp_path):
    """Shard docmaps partition the corpus: disjoint conv sets, doc counts
    sum to the corpus, each shard's (conv_id, turn_idx) order is dense
    0..n-1 in its own namespace, and federation.json records it all."""
    out = str(tmp_path / "fed")
    fed = build_shard_indexes(corpus, cfg, out, 3, chunk_docs=64)
    assert fed["n_shards"] == 3
    assert fed["n_docs"] == corpus.count()
    paths = shard_paths(out, 3)
    assert fed["spec"] == ",".join(paths)

    convs = []
    total = 0
    for p in paths:
        pidx = load_packed_index(spark, p)
        rows = pidx.docmap.select("conv_id").distinct().collect()
        convs.append({r["conv_id"] for r in rows})
        total += pidx.manifest["n_docs"]
    assert total == fed["n_docs"]
    for i in range(3):
        for j in range(i + 1, 3):
            assert not (convs[i] & convs[j])

    side = json.loads(fsio.read_text(spark, fsio.join(out, FEDERATION_MANIFEST)))
    assert side["spec"] == fed["spec"]
    assert side["n_docs"] == fed["n_docs"]
    assert side["assignment"] == "md5_hex15_mod"
    # staging dir cleaned up by default
    assert not fsio.exists(spark, fsio.join(out, "_staging"))


def test_staging_equals_filtering(spark, corpus, cfg, tmp_path):
    """The staged build (one partitioned write, pruned per-shard reads)
    and the staging-free build (N filtered scans) commit bit-identical
    shard indexes — same manifests (minus timings), same BM25 results."""
    oa, ob = str(tmp_path / "staged"), str(tmp_path / "filtered")
    fa = build_shard_indexes(corpus, cfg, oa, 2, chunk_docs=64)
    fb = build_shard_indexes(corpus, cfg, ob, 2, chunk_docs=64, staging=False)
    for ma, mb in zip(fa["shards"], fb["shards"]):
        for key in ("n_docs", "n_terms", "n_chunks", "n_postings", "avgdl"):
            assert ma[key] == mb[key]
    sa = [load_packed_index(spark, p) for p in shard_paths(oa, 2)]
    sb = [load_packed_index(spark, p) for p in shard_paths(ob, 2)]
    ra = bm25_topk_federated(sa, QUERIES, cfg, k=10, round_dp=6)
    rb = bm25_topk_federated(sb, QUERIES, cfg, k=10, round_dp=6)
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    got = rows(ra)
    assert got == rows(rb)
    assert len(got) > 0


def test_sharded_boolean_equals_single_index(spark, corpus, cfg, tmp_path):
    """Served results over built shards match a single fresh index over
    the same corpus where the contract is namespace-free: boolean OR/AND
    doc SETS on external ids are identical (scores and BM25 ranks may
    legitimately differ — shard-local avgdl)."""
    out, single = str(tmp_path / "fed"), str(tmp_path / "one")
    build_shard_indexes(corpus, cfg, out, 3, chunk_docs=64)
    build_packed_index(corpus, cfg, single, chunk_docs=64)
    shards = [load_packed_index(spark, p) for p in shard_paths(out, 3)]
    pidx = load_packed_index(spark, single)
    for op in ("or", "and"):
        fed = resolve_docs_federated(
            shards,
            boolean_search_federated(shards, QUERIES, cfg, op=op).select(
                "query_id", "doc_id", F.lit(0.0).alias("score"),
                F.lit(0).alias("rank"),
            ),
        )
        one = resolve_docs(
            pidx,
            boolean_search_packed(pidx, QUERIES, cfg, op=op).select(
                "query_id", "doc_id", F.lit(0.0).alias("score"),
                F.lit(0).alias("rank"),
            ),
        )
        got = _ext(fed)
        assert got == _ext(one)
        assert len(got) > 0


def test_resolve_shards_arg(spark, corpus, cfg, tmp_path):
    """--shards <dir> expands through federation.json; explicit specs and
    plain single-index paths pass through untouched."""
    out = str(tmp_path / "fed")
    fed = build_shard_indexes(corpus, cfg, out, 2, chunk_docs=64)
    assert resolve_shards_arg(spark, out) == fed["spec"]
    assert resolve_shards_arg(spark, "a,b") == "a,b"
    assert resolve_shards_arg(spark, out + "@1") == out + "@1"
    assert resolve_shards_arg(spark, str(tmp_path / "nope")) == str(
        tmp_path / "nope"
    )


def test_empty_shard_fails_loudly(spark, cfg, tmp_path):
    """A shard that receives no documents must raise a clear error, not
    an opaque missing-parquet-path crash (tiny corpus, large N)."""
    from pyspark.sql import functions as F

    one = spark.createDataFrame(
        [("conly", 0, "user", "guitar album rock", "")],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    with pytest.raises(ValueError, match="received no documents"):
        build_shard_indexes(one, cfg, str(tmp_path / "es"), n_shards=16)
