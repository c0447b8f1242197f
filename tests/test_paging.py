"""Result-paging gates (ES from/size): pages partition the ranking
prefix exactly, ranks stay absolute, WAND == exhaustive under paging,
and every serving tier pages identically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import Bm25Params
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.serve import FederatedLocalSearcher, LocalSearcher
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig

PARAMS = Bm25Params(k=1.2, b=0.75)
QS = ["greatest rock album", "drummer tour"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=60, n_partitions=8)


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pagepacked") / "idx")
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    return load_packed_index(spark, path)


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in df.collect()
    )


def test_pages_partition_the_prefix(packed, cfg):
    top20 = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=20, round_dp=6))
    p1 = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=10, round_dp=6))
    p2 = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=10, round_dp=6,
                                      offset=10))
    assert sorted(p1 + p2) == top20
    assert all(rank > 10 for _, rank, _, _ in p2)  # absolute ranks


def test_paging_wand_equals_exhaustive(packed, cfg):
    a = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=7, offset=5,
                                     round_dp=6))
    b = _rows(bm25_topk_packed_batch(packed, QS, cfg, k=7, offset=5,
                                     round_dp=6, exhaustive=True))
    assert a == b and a


def test_paging_past_the_end_is_empty(packed, cfg):
    n = packed.manifest["n_docs"]
    out = bm25_topk_packed_batch(packed, [QS[0]], cfg, k=5, offset=n + 10)
    assert out.count() == 0
    with pytest.raises(ValueError, match="offset"):
        bm25_topk_packed_batch(packed, QS, cfg, k=5, offset=-1)


def test_local_tier_pages_identically(packed, cfg):
    local = LocalSearcher(packed, preload=True, cfg=cfg)
    for q in QS:
        dist = _rows(bm25_topk_packed_batch(packed, [q], cfg, k=5, offset=5,
                                            round_dp=6))
        got = sorted(
            (0, r["rank"], r["doc_id"], r["score"])
            for r in local.search(q, k=5, offset=5, resolve=False,
                                  round_dp=6))
        assert got == dist
    with pytest.raises(NotImplementedError, match="offset"):
        local.search(QS[0], ranker="boolean_or", offset=5)


def test_federated_pages_identically(spark, corpus, cfg, tmp_path_factory):
    from searchengine_spark.query.federated import bm25_topk_federated

    base = tmp_path_factory.mktemp("pagefed")
    shards = []
    for i, part in enumerate(
        [corpus.filter(F.col("turn_idx") % 2 == 0),
         corpus.filter(F.col("turn_idx") % 2 == 1)]
    ):
        p = str(base / f"s{i}")
        build_packed_index(part, cfg, p, params=PARAMS, chunk_docs=256)
        shards.append(load_packed_index(spark, p))

    full = _rows(bm25_topk_federated(shards, QS, cfg, k=16, round_dp=6))
    pages = []
    for gather in ("single", "two_phase"):
        got = []
        for off in (0, 8):
            got += _rows(bm25_topk_federated(shards, QS, cfg, k=8,
                                             offset=off, round_dp=6,
                                             gather=gather))
        pages.append(sorted(got))
        assert sorted(got) == full, gather

    floc = FederatedLocalSearcher(shards, cfg=cfg)
    got = []
    for qid, q in enumerate(QS):
        for off in (0, 8):
            got += [(qid, r["rank"], r["doc_id"], r["score"])
                    for r in floc.search(q, k=8, offset=off, resolve=False,
                                         round_dp=6)]
    assert sorted(got) == full
