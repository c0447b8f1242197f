"""search_after cursor-paging gates (ES search_after): cursor pages
partition the ranking prefix exactly (no skips, no dups — including
across rounded-score ties), WAND == exhaustive under the cursor, every
serving tier pages identically, and the cursor/offset contracts refuse
to combine."""

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
    path = str(tmp_path_factory.mktemp("sapacked") / "idx")
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    return load_packed_index(spark, path)


def _by_query(df):
    """-> {qid: [(doc_id, score), ...] rank-ordered} (ranks re-derived —
    cursor pages are page-relative, offset pages absolute)."""
    out: dict = {}
    for r in sorted(df.collect(), key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return out


def _cursors(page):
    """last (score, doc_id) per query — the next page's cursor."""
    return {qid: (hits[-1][1], hits[-1][0]) for qid, hits in page.items()}


def test_cursor_pages_partition_the_prefix(packed, cfg):
    full = _by_query(bm25_topk_packed_batch(packed, QS, cfg, k=20,
                                            round_dp=6))
    p1 = _by_query(bm25_topk_packed_batch(packed, QS, cfg, k=10,
                                          round_dp=6))
    p2_df = bm25_topk_packed_batch(packed, QS, cfg, k=10, round_dp=6,
                                   search_after=_cursors(p1))
    p2 = _by_query(p2_df)
    for qid in full:
        assert p1.get(qid, []) + p2.get(qid, []) == full[qid]
    # ranks are PAGE-RELATIVE 1..k (the ES search_after contract)
    ranks = {r["rank"] for r in p2_df.collect()}
    assert ranks and ranks <= set(range(1, 11))


def test_cursor_walks_the_whole_ranking(packed, cfg):
    """Repeated cursoring visits exactly the top-k prefix, in order —
    no doc skipped or duplicated across rounded-score tie boundaries."""
    full = _by_query(bm25_topk_packed_batch(packed, QS, cfg, k=24,
                                            round_dp=6))
    walked: dict = {qid: [] for qid in full}
    cur = None
    for _ in range(6):
        page = _by_query(bm25_topk_packed_batch(
            packed, QS, cfg, k=4, round_dp=6, search_after=cur))
        if not page:
            break
        for qid, hits in page.items():
            walked[qid].extend(hits)
        cur = _cursors(page)
    assert walked == full


def test_cursor_wand_equals_exhaustive(packed, cfg):
    p1 = _by_query(bm25_topk_packed_batch(packed, QS, cfg, k=5, round_dp=6))
    cur = _cursors(p1)
    a = _by_query(bm25_topk_packed_batch(packed, QS, cfg, k=7, round_dp=6,
                                         search_after=cur))
    b = _by_query(bm25_topk_packed_batch(packed, QS, cfg, k=7, round_dp=6,
                                         search_after=cur, exhaustive=True))
    assert a == b and a


def test_cursor_past_the_end_is_empty(packed, cfg):
    big = _by_query(bm25_topk_packed_batch(packed, [QS[0]], cfg, k=1 << 20,
                                           round_dp=6, exhaustive=True))
    out = bm25_topk_packed_batch(packed, [QS[0]], cfg, k=5, round_dp=6,
                                 search_after=_cursors(big))
    assert out.count() == 0
    with pytest.raises(ValueError, match="mutually exclusive"):
        bm25_topk_packed_batch(packed, QS, cfg, k=5, offset=5,
                               search_after={0: (1.0, 0)})


def test_local_tier_cursor_identical(packed, cfg):
    local = LocalSearcher(packed, preload=True, cfg=cfg)
    for q in QS:
        p1 = _by_query(bm25_topk_packed_batch(packed, [q], cfg, k=5,
                                              round_dp=6))
        cur = _cursors(p1)[0]
        dist = _by_query(bm25_topk_packed_batch(
            packed, [q], cfg, k=5, round_dp=6, search_after={0: cur}))
        got = [(r["doc_id"], r["score"])
               for r in local.search(q, k=5, round_dp=6, resolve=False,
                                     search_after=cur)]
        assert got == dist[0]
    with pytest.raises(NotImplementedError, match="search_after"):
        local.search(QS[0], ranker="boolean_or", search_after=(1.0, 0))
    with pytest.raises(ValueError, match="mutually exclusive"):
        local.search(QS[0], offset=5, search_after=(1.0, 0))


def test_federated_cursor_identical(spark, corpus, cfg, tmp_path_factory):
    from searchengine_spark.query.federated import bm25_topk_federated

    base = tmp_path_factory.mktemp("safed")
    shards = []
    for i, part in enumerate(
        [corpus.filter(F.col("turn_idx") % 2 == 0),
         corpus.filter(F.col("turn_idx") % 2 == 1)]
    ):
        p = str(base / f"s{i}")
        build_packed_index(part, cfg, p, params=PARAMS, chunk_docs=256)
        shards.append(load_packed_index(spark, p))

    full = _by_query(bm25_topk_federated(shards, QS, cfg, k=16, round_dp=6))
    p1 = _by_query(bm25_topk_federated(shards, QS, cfg, k=8, round_dp=6))
    cur = _cursors(p1)
    for gather in ("single", "two_phase"):
        p2 = _by_query(bm25_topk_federated(shards, QS, cfg, k=8, round_dp=6,
                                           gather=gather, search_after=cur))
        for qid in full:
            assert p1.get(qid, []) + p2.get(qid, []) == full[qid], gather

    floc = FederatedLocalSearcher(shards, cfg=cfg)
    for qid, q in enumerate(QS):
        got = [(r["doc_id"], r["score"])
               for r in floc.search(q, k=8, round_dp=6, resolve=False,
                                    search_after=cur[qid])]
        assert p1[qid] + got == full[qid]
