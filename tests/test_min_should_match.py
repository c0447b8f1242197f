"""minimum_should_match gates (ES minimum_should_match): the coverage
floor interpolates exactly between OR (m=1) and AND (m=n), matches a
boolean-OR-coverage brute at every m, survives WAND pruning, and serves
identically from every tier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import Bm25Params
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.serve import FederatedLocalSearcher, LocalSearcher
from searchengine_spark.query.wand import (
    bm25_topk_packed_batch,
    boolean_search_packed,
)
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

PARAMS = Bm25Params(k=1.2, b=0.75)
# three-term queries so m=2 is a real middle ground
QS = ["greatest rock album", "drummer world tour"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=50, n_partitions=8)


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("msmpacked") / "idx")
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    return load_packed_index(spark, path)


def _rows(df):
    return sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                  for r in df.collect())


def test_msm_matches_coverage_brute(packed, cfg):
    """Expected = the exhaustive OR ranking restricted to docs whose
    boolean-OR matched-term count >= m, re-ranked."""
    n = packed.manifest["n_docs"]
    full = bm25_topk_packed_batch(packed, QS, cfg, k=n, round_dp=6,
                                  exhaustive=True).collect()
    cov = {(r["query_id"], r["doc_id"]): int(r["n_terms"])
           for r in boolean_search_packed(packed, QS, cfg, op="or").collect()}
    for m in (1, 2, 3):
        by_q: dict = {}
        for r in full:
            if cov[(r["query_id"], r["doc_id"])] >= m:
                by_q.setdefault(r["query_id"], []).append(
                    (-r["score"], r["doc_id"]))
        expect = sorted(
            (qid, rk, d, -ns)
            for qid, lst in by_q.items()
            for rk, (ns, d) in enumerate(sorted(lst)[:8], start=1)
        )
        got = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=8, round_dp=6,
                                           min_should_match=m))
        assert got == expect, f"m={m}"
        assert got, f"m={m} empty"


def test_msm_edges_are_or_and_and(packed, cfg):
    base = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=8, round_dp=6))
    m1 = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=8, round_dp=6,
                                      min_should_match=1))
    assert m1 == base
    n_terms = [len(dict.fromkeys(tokenize_text(q, cfg))) for q in QS]
    assert len(set(n_terms)) == 1  # same m applies batch-wide
    conj = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=8, round_dp=6,
                                        conjunctive=True))
    mn = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=8, round_dp=6,
                                      min_should_match=n_terms[0]))
    assert mn == conj and conj


def test_msm_wand_equals_exhaustive_and_validates(packed, cfg):
    a = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=8, round_dp=6,
                                     min_should_match=2))
    b = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=8, round_dp=6,
                                     min_should_match=2, exhaustive=True))
    assert a == b and a
    with pytest.raises(ValueError, match="mutually exclusive"):
        bm25_topk_packed_batch(packed, QS, cfg, k=8, conjunctive=True,
                               min_should_match=2)
    with pytest.raises(ValueError, match=">= 1"):
        bm25_topk_packed_batch(packed, QS, cfg, k=8, min_should_match=0)


def test_msm_local_tier_identical(packed, cfg):
    local = LocalSearcher(packed, preload=True, cfg=cfg)
    for q in QS:
        dist = _rows(bm25_topk_packed_batch(packed, [q], cfg, k=8,
                                            round_dp=6, min_should_match=2))
        got = sorted((0, r["rank"], r["doc_id"], r["score"])
                     for r in local.search(q, k=8, round_dp=6, resolve=False,
                                           min_should_match=2))
        assert got == dist
    with pytest.raises(NotImplementedError, match="min_should_match"):
        local.search(QS[0], ranker="tfidf", min_should_match=2)


def test_msm_federated_identical(spark, corpus, cfg, tmp_path_factory):
    from searchengine_spark.query.federated import bm25_topk_federated

    base = tmp_path_factory.mktemp("msmfed")
    shards = []
    for i, part in enumerate(
        [corpus.filter(F.col("turn_idx") % 2 == 0),
         corpus.filter(F.col("turn_idx") % 2 == 1)]
    ):
        p = str(base / f"s{i}")
        build_packed_index(part, cfg, p, params=PARAMS, chunk_docs=256)
        shards.append(load_packed_index(spark, p))
    n = sum(s.manifest["n_docs"] for s in shards)
    # brute over the federated score contract
    full = bm25_topk_federated(shards, QS, cfg, k=n, round_dp=6,
                               exhaustive=True, min_should_match=2)
    exp8: dict = {}
    for r in sorted(full.collect(), key=lambda r: (r["query_id"], r["rank"])):
        exp8.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"]))
    expect = sorted((qid, rk, d, s)
                    for qid, lst in exp8.items()
                    for rk, (d, s) in enumerate(lst[:8], start=1))
    for gather in ("single", "two_phase"):
        got = _rows(bm25_topk_federated(shards, QS, cfg, k=8, round_dp=6,
                                        gather=gather, min_should_match=2))
        assert got == expect, gather
    floc = FederatedLocalSearcher(shards, cfg=cfg)
    got = sorted((qid, r["rank"], r["doc_id"], r["score"])
                 for qid, q in enumerate(QS)
                 for r in floc.search(q, k=8, round_dp=6, resolve=False,
                                      min_should_match=2))
    assert got == expect
