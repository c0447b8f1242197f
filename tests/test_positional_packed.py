"""Positional packed index gates: decoded ≡ M1 positional index; packed
proximity serving ≡ exact-path proximity (which is itself reference-gated in
tests/test_proximity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import REFERENCE_QUERIES, transcripts_df
from searchengine_spark.indexing.build import Bm25Params, build_index
from searchengine_spark.indexing.packed import (
    build_packed_index,
    exploded_view,
    load_packed_index,
)
from searchengine_spark.query.proximity import (
    proximity_topk_batch,
    proximity_topk_packed_batch,
)
from searchengine_spark.tokenizer import TokenizerConfig

PARAMS = Bm25Params(1.2, 0.75)
N_CONV = 60


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=N_CONV, n_partitions=4)


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pospacked") / "idx")
    build_packed_index(
        corpus, cfg, path, params=PARAMS, chunk_docs=256, positional=True,
        tfidf_sidecar=True,
    )
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def exact(corpus, cfg):
    return build_index(corpus, cfg, positional=True).cache()


def test_manifest_positional(packed):
    assert packed.manifest["positional"] is True
    assert packed.manifest["dl_norm_max"] >= packed.manifest["dl_norm_min"] >= 0


def test_decoded_positions_equal_m1(packed, exact):
    dec = exploded_view(packed, include_positions=True).select(
        "term", "doc_id", "tf", "positions"
    )
    ref = exact.index.select(
        "term",
        "doc_id",
        F.col("tf").cast("long").alias("tf"),
        F.array_join(F.col("positions").cast("array<string>"), ",").alias("positions"),
    )
    diff = dec.exceptAll(ref).union(ref.exceptAll(dec))
    assert diff.count() == 0


def test_packed_proximity_equals_exact_path(packed, exact, cfg):
    queries = list(REFERENCE_QUERIES[:8])
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in proximity_topk_packed_batch(
            packed, queries, cfg, k=10, params=PARAMS
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in proximity_topk_batch(
            exact, queries, cfg, k=10, mode="bm25", params=PARAMS
        ).collect()
    }
    assert got == want


def test_packed_tfidf_proximity_equals_exact_path(packed, exact, cfg):
    """TF_IDF_OPTIMIZED from the packed index (doc_norms sidecar + stored
    3dp weights at decode) == exact-path scorer, rank + score identical."""
    queries = list(REFERENCE_QUERIES[:8])
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in proximity_topk_packed_batch(
            packed, queries, cfg, k=10, params=PARAMS, mode="tfidf"
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in proximity_topk_batch(
            exact, queries, cfg, k=10, mode="tfidf", params=PARAMS
        ).collect()
    }
    assert got == want


def test_packed_tfidf_requires_sidecar(spark, corpus, cfg, tmp_path):
    path = str(tmp_path / "nosidecar")
    build_packed_index(
        corpus, cfg, path, params=PARAMS, chunk_docs=256, positional=True
    )
    pidx = load_packed_index(spark, path)
    with pytest.raises(ValueError, match="tfidf_sidecar"):
        proximity_topk_packed_batch(
            pidx, ["greatest rock album"], cfg, k=5, mode="tfidf"
        ).collect()
