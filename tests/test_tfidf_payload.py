"""payload='tfidf' gates: the reference's 'doc:freq/w' on-disk format
(stored-3dp lnc weights INSIDE the postings, tf_idf.py:114-115) — joinless
plain TF-IDF serving from the packed index."""

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
from searchengine_spark.query.proximity import tfidf_topk_packed_batch
from searchengine_spark.query.tfidf import tfidf_topk_batch, tfidf_weights
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig

PARAMS = Bm25Params(1.2, 0.75)


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=60, n_partitions=4)


@pytest.fixture(scope="module")
def tpidx(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tfidfpay") / "idx")
    build_packed_index(
        corpus, cfg, path, params=PARAMS, chunk_docs=256, payload="tfidf"
    )
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def exact(corpus, cfg):
    return build_index(corpus, cfg).cache()


def test_stored_weights_equal_exact_path(tpidx, exact):
    """Decoded (term, doc, tf, w) == tfidf_weights of the exact path —
    the stored-3dp 'doc:freq/w' contract, bit for bit."""
    dec = exploded_view(tpidx)  # (term, doc_id, tf, w)
    ref = tfidf_weights(exact).select(
        "term", "doc_id", F.col("tf").cast("long").alias("tf"), "w"
    )
    diff = dec.exceptAll(ref).union(ref.exceptAll(dec))
    assert diff.count() == 0


def test_joinless_serving_equals_exact(tpidx, exact, cfg):
    """tfidf_topk_packed_batch on the tfidf payload (no sidecar, no norms
    join) == exact-path tfidf_topk_batch, rank-identical, scores 1e-9."""
    queries = list(REFERENCE_QUERIES[:8])
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in tfidf_topk_packed_batch(tpidx, queries, cfg, k=10).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in tfidf_topk_batch(exact, queries, cfg, k=10).collect()
    }
    assert got == want and got


def test_bm25_refused_on_tfidf_payload(tpidx, cfg):
    with pytest.raises(ValueError, match="payload"):
        bm25_topk_packed_batch(tpidx, ["rock"], cfg, k=5)


def test_boolean_still_works_on_tfidf_payload(tpidx, cfg):
    from searchengine_spark.query.wand import boolean_search_packed

    rows = boolean_search_packed(tpidx, ["greatest rock album"], cfg, op="or").collect()
    assert rows
