"""Query-string boost gates (query/termboost.py — ES term^W): the
parser's contract (malformed pass-through, multi-term words, last-wins,
stop-word no-op), parse->serve identity with the already-oracle-gated
weighted-term path, and the W=1 == plain identity."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.termboost import parse_boosted_queries, split_boosts
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def packed(spark, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("boost") / "idx")
    corpus = transcripts_df(spark, n_conv=20, n_partitions=4)
    build_packed_index(corpus, cfg, path, chunk_docs=128)
    return load_packed_index(spark, path)


def test_split_boosts_parser():
    clean, boosted = split_boosts("rock^2 album music^0.5 plain")
    assert clean == "rock album music plain"
    assert boosted == [("rock", 2.0), ("music", 0.5)]
    # malformed / bare carets pass through untouched (never an error)
    clean, boosted = split_boosts("rock^ ^2 a^b rock^1.5.2")
    assert boosted == []
    assert clean == "rock^ ^2 a^b rock^1.5.2"


def test_parse_boosted_queries(cfg):
    qs, w = parse_boosted_queries(
        ["rock^2 album", "music", "the^3 rock^2 rock^0.5"], cfg)
    assert qs == ["rock album", "music", "the rock rock"]
    assert 1 not in w                      # unboosted query absent
    assert w[0] == {"rock": 2.0}
    assert w[2] == {"rock": 0.5}           # last boost wins; stop word no-op
    # a boosted word with inner punctuation spreads W to every term
    _, w2 = parse_boosted_queries(["rock-album^2"], cfg)
    assert w2[0] == {"rock": 2.0, "album": 2.0}


def _rows(df):
    return sorted((r["query_id"], r["doc_id"], r["score"], r["rank"])
                  for r in df.collect())


def test_boosted_serve_identity(spark, packed, cfg):
    """parse -> serve == the weighted-term path called directly (the
    path synonym expansion already oracle-gates), and ^1 == plain."""
    raw = ["music rock^2 album", "guitar^0.25 solo"]
    qs, weights = parse_boosted_queries(raw, cfg)
    got = _rows(bm25_topk_packed_batch(packed, qs, cfg, k=10, round_dp=6,
                                       term_weights=weights))
    want = _rows(bm25_topk_packed_batch(
        packed, ["music rock album", "guitar solo"], cfg, k=10, round_dp=6,
        term_weights={0: {"rock": 2.0}, 1: {"guitar": 0.25}}))
    assert got == want and got

    ones = ["music rock^1 album"]
    q1, w1 = parse_boosted_queries(ones, cfg)
    got1 = _rows(bm25_topk_packed_batch(packed, q1, cfg, k=10, round_dp=6,
                                        term_weights=w1))
    plain = _rows(bm25_topk_packed_batch(packed, ["music rock album"], cfg,
                                         k=10, round_dp=6))
    assert got1 == plain

    # boosting genuinely reorders: ^2 on 'rock' changes the page vs plain
    got2 = _rows(bm25_topk_packed_batch(packed, [qs[0]], cfg, k=10,
                                        round_dp=6,
                                        term_weights={0: weights[0]}))
    assert {x[1] for x in got2} != {x[1] for x in plain} or \
           [x for x in got2] != [x for x in plain]
