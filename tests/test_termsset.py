"""terms_set gates: required=1 degenerates to the gated OR ranker,
coverage floor vs a python brute, exact == packed parity, NULL-required
drop, and the malformed-frame refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import build_index
from searchengine_spark.indexing.packed import (
    build_packed_index,
    load_packed_index,
)
from searchengine_spark.query.bm25 import bm25_topk_batch
from searchengine_spark.query.termsset import (
    required_from_attrs,
    terms_set_topk_batch,
    terms_set_topk_packed_batch,
)
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

N_CONV = 60

QUERIES = ["greatest rock album", "guitar solo", "drum bass drum"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=N_CONV, n_partitions=4)


@pytest.fixture(scope="module")
def exact(corpus, cfg):
    return build_index(corpus, cfg).cache()


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("termsset") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=256)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def required(exact):
    # deterministic per-doc floor 1..3
    return exact.doc_lengths.select(
        "doc_id", (F.col("doc_id") % 3 + 1).alias("required")
    ).cache()


def test_required_one_is_plain_or(spark, exact, cfg):
    req1 = exact.doc_lengths.select(
        "doc_id", F.lit(1).alias("required")
    )
    got = terms_set_topk_batch(
        exact, QUERIES, req1, cfg, k=10, round_dp=None
    )
    want = bm25_topk_batch(exact, QUERIES, cfg, k=10)
    g = {
        (r["query_id"], r["doc_id"]): (round(r["score"], 9), r["rank"])
        for r in got.collect()
    }
    w = {
        (r["query_id"], r["doc_id"]): (round(r["score"], 9), r["rank"])
        for r in want.collect()
    }
    assert g == w and g


def test_coverage_floor_vs_brute(exact, required, cfg):
    doc_tokens = {
        int(r["doc_id"]): set(r["tokens"])
        for r in exact.docs.select("doc_id", "tokens").collect()
    }
    req = {r["doc_id"]: r["required"] for r in required.collect()}
    got = terms_set_topk_batch(exact, QUERIES, required, cfg, k=None)
    got_set = {(r["query_id"], r["doc_id"]): r["n_matched"] for r in got.collect()}
    for qid, q in enumerate(QUERIES):
        terms = set(dict.fromkeys(tokenize_text(q, cfg)))
        want = {
            d: len(terms & toks)
            for d, toks in doc_tokens.items()
            if len(terms & toks) >= req[d] and len(terms & toks) >= 1
        }
        assert {
            d: n for (i, d), n in got_set.items() if i == qid
        } == want, q


def test_packed_equals_exact(exact, packed, required, cfg):
    want = {
        (r["query_id"], r["doc_id"]): (r["n_matched"], r["score"], r["rank"])
        for r in terms_set_topk_batch(
            exact, QUERIES, required, cfg, k=10, round_dp=6
        ).collect()
    }
    got = {
        (r["query_id"], r["doc_id"]): (r["n_matched"], r["score"], r["rank"])
        for r in terms_set_topk_packed_batch(
            packed, QUERIES, required, cfg, k=10, round_dp=6
        ).collect()
    }
    assert got == want and got


def test_null_required_drops(spark, exact, cfg):
    req = exact.doc_lengths.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit(1)).alias("required"),
    )
    got = terms_set_topk_batch(exact, QUERIES, req, cfg, k=None)
    assert got.filter(F.col("doc_id") % 2 == 1).count() == 0
    assert got.count() > 0


def test_unreachable_floor_matches_nothing(exact, cfg):
    req = exact.doc_lengths.select(
        "doc_id", F.lit(99).alias("required")
    )
    assert terms_set_topk_batch(exact, QUERIES, req, cfg, k=None).count() == 0


def test_refuses_malformed_required(exact, cfg):
    bad = exact.doc_lengths.select("doc_id")
    with pytest.raises(ValueError, match="required"):
        terms_set_topk_batch(exact, QUERIES, bad, cfg)


def test_required_from_attrs(spark, corpus, packed):
    attrs = corpus.select(
        "conv_id", "turn_idx", (F.length("text") % 2 + 1).alias("m")
    )
    req = required_from_attrs(packed, attrs, "m")
    rows = req.limit(5).collect()
    assert rows and all(r["required"] in (1, 2) for r in rows)
    with pytest.raises(ValueError, match="external-id"):
        required_from_attrs(packed, attrs.select("conv_id", "m"), "m")
