"""Boosting-query gates (ES boosting query): demoted docs sink by
negative_boost but stay (vs must_not which removes), a positive+demoted
term both scores and sinks, demotion survives WAND pruning, and the
local tier serves identically — all against an exhaustive-ranking
brute."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import Bm25Params
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.serve import LocalSearcher
from searchengine_spark.query.wand import (
    bm25_topk_packed_batch,
    boolean_search_packed,
)
from searchengine_spark.tokenizer import TokenizerConfig

PARAMS = Bm25Params(k=1.2, b=0.75)
QS = ["greatest rock album", "drummer tour"]
DEM = {0: {"guitar"}, 1: {"album"}}


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def packed(spark, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("boostpacked") / "idx")
    corpus = transcripts_df(spark, n_conv=50, n_partitions=8)
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    return load_packed_index(spark, path)


def _rows(df):
    return sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                  for r in df.collect())


def _brute(packed, cfg, dem, factor, k):
    n = packed.manifest["n_docs"]
    full = bm25_topk_packed_batch(packed, QS, cfg, k=n,
                                  exhaustive=True).collect()
    sunk = {}
    for qid, ts in dem.items():
        hits = boolean_search_packed(
            packed, [" ".join(sorted(ts))], cfg, op="or").collect()
        sunk[qid] = {r["doc_id"] for r in hits}
    by_q: dict = {}
    for r in full:
        s = r["score"]
        if r["doc_id"] in sunk.get(r["query_id"], ()):
            s = s * factor
        by_q.setdefault(r["query_id"], []).append(
            (-np.round(s, 6), r["doc_id"]))
    return sorted(
        (qid, rk, d, -ns)
        for qid, lst in by_q.items()
        for rk, (ns, d) in enumerate(sorted(lst)[:k], start=1)
    )


def test_demotion_matches_brute_and_prunes_safely(packed, cfg):
    for factor in (0.5, 0.0):
        expect = _brute(packed, cfg, DEM, factor, 8)
        got = _rows(bm25_topk_packed_batch(
            packed, QS, cfg, k=8, round_dp=6,
            demote_terms=DEM, negative_boost=factor))
        assert got == expect and got, factor
        ex = _rows(bm25_topk_packed_batch(
            packed, QS, cfg, k=8, round_dp=6, exhaustive=True,
            demote_terms=DEM, negative_boost=factor))
        assert ex == expect, f"WAND != exhaustive at {factor}"
    # demotion actually changed the ranking vs plain OR
    plain = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=8, round_dp=6))
    assert plain != _rows(bm25_topk_packed_batch(
        packed, QS, cfg, k=8, round_dp=6, demote_terms=DEM))


def test_positive_and_demoted_term_scores_and_sinks(packed, cfg):
    # demote a term that IS in the query: docs with it keep its score
    # contribution but sink — distinct from exclusion, which removes
    dem = {0: {"album"}}
    got = _rows(bm25_topk_packed_batch(
        packed, [QS[0]], cfg, k=8, round_dp=6, demote_terms=dem))
    assert got == _brute(packed, cfg, {0: {"album"}}, 0.5, 8)[: len(got)]
    excl = {r[2] for r in _rows(bm25_topk_packed_batch(
        packed, [QS[0]], cfg, k=1 << 20, round_dp=6, exhaustive=True,
        exclude_terms=dem))}
    dem_docs = {r[2] for r in _rows(bm25_topk_packed_batch(
        packed, [QS[0]], cfg, k=1 << 20, round_dp=6, exhaustive=True,
        demote_terms=dem))}
    assert dem_docs > excl  # demotion keeps the sunk docs


def test_validation(packed, cfg):
    with pytest.raises(ValueError, match="negative_boost"):
        bm25_topk_packed_batch(packed, QS, cfg, k=5, demote_terms=DEM,
                               negative_boost=1.0)
    with pytest.raises(ValueError, match="both demoted and excluded"):
        bm25_topk_packed_batch(packed, QS, cfg, k=5,
                               demote_terms={0: {"guitar"}},
                               exclude_terms={0: {"guitar"}})


def test_federated_demotes_identically(spark, cfg, tmp_path_factory):
    """Federated demotion (both gathers + the in-process federation)
    against a brute over the federated score contract."""
    from searchengine_spark.query.federated import bm25_topk_federated
    from searchengine_spark.query.serve import FederatedLocalSearcher

    corpus = transcripts_df(spark, n_conv=40, n_partitions=8)
    base = tmp_path_factory.mktemp("boostfed")
    shards = []
    for i, part in enumerate(
        [corpus.filter(F.col("turn_idx") % 2 == 0),
         corpus.filter(F.col("turn_idx") % 2 == 1)]
    ):
        p = str(base / f"s{i}")
        build_packed_index(part, cfg, p, params=PARAMS, chunk_docs=256)
        shards.append(load_packed_index(spark, p))
    n = sum(s.manifest["n_docs"] for s in shards)
    expect = _rows(
        bm25_topk_federated(shards, QS, cfg, k=n, round_dp=6,
                            exhaustive=True, demote_terms=DEM)
        .filter(F.col("rank") <= 8))
    for gather in ("single", "two_phase"):
        got = _rows(bm25_topk_federated(shards, QS, cfg, k=8, round_dp=6,
                                        gather=gather, demote_terms=DEM))
        assert got == expect and got, gather
    floc = FederatedLocalSearcher(shards, cfg=cfg)
    got = sorted((qid, r["rank"], r["doc_id"], r["score"])
                 for qid, q in enumerate(QS)
                 for r in floc.search(q, k=8, round_dp=6, resolve=False,
                                      demote=sorted(DEM[qid])))
    assert got == expect


def test_local_tier_demotes_identically(packed, cfg):
    local = LocalSearcher(packed, preload=True, cfg=cfg)
    for qid, q in enumerate(QS):
        dist = _rows(bm25_topk_packed_batch(
            packed, [q], cfg, k=8, round_dp=6,
            demote_terms={0: DEM[qid]}))
        got = sorted((0, r["rank"], r["doc_id"], r["score"])
                     for r in local.search(q, k=8, round_dp=6,
                                           resolve=False,
                                           demote=sorted(DEM[qid])))
        assert got == dist
    with pytest.raises(NotImplementedError, match="demote"):
        local.search(QS[0], ranker="tfidf", demote=["guitar"])
