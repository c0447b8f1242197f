"""Pinned-results gates (query/pinned.py — the ES ``pinned`` query).

Contract: pins occupy ranks 1..p in the GIVEN order regardless of
relevance; organic follows from p+1 excluding the pinned ids (never a
duplicate); unknown pinned ids skip silently; a pinned doc that also
matches shows its organic score, one that doesn't carries NULL.
"""

import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.pinned import pinned_topk_packed
from searchengine_spark.query.wand import bm25_topk_packed_batch, resolve_docs
from searchengine_spark.tokenizer import TokenizerConfig

QUERY = "guitar solo"


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def pidx(spark, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pin") / "idx")
    build_packed_index(transcripts_df(spark, n_conv=6), cfg, path,
                       chunk_docs=64)
    return load_packed_index(spark, path)


def test_pinned_contract(spark, pidx, cfg):
    organic = resolve_docs(pidx, bm25_topk_packed_batch(
        pidx, [QUERY], cfg, k=13, round_dp=6)).collect()
    org = sorted(organic, key=lambda r: r["rank"])
    top = [(r["conv_id"], r["turn_idx"]) for r in org]
    scores = {(r["conv_id"], r["turn_idx"]): r["score"] for r in org}
    # pin: the organic #3 hit (keeps its score), plus a non-matching doc
    # (turn 0 of conv 0 — whatever it is, make sure it's NOT a match),
    # plus an unknown id (skipped)
    non_match = None
    matched = set(top)
    for r in pidx.docmap.select("conv_id", "turn_idx").collect():
        key = (r["conv_id"], r["turn_idx"])
        if key not in matched:
            non_match = key
            break
    pins = [top[2], non_match, ("no_such_conv", 0)]
    rows = sorted(
        pinned_topk_packed(pidx, [QUERY], cfg, pins, k=10,
                           round_dp=6).collect(),
        key=lambda r: r["rank"])
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    # ranks 1..2: the two EXISTING pins in the given order
    assert keys[0] == top[2] and rows[0]["pinned"]
    assert keys[1] == non_match and rows[1]["pinned"]
    # pinned-and-matched keeps its organic score; unmatched pin is NULL
    assert rows[0]["score"] == scores[top[2]]
    assert rows[1]["score"] is None
    # organic follows, in organic order, EXCLUDING the pinned doc
    want_org = [t for t in top if t != top[2]][:8]
    assert keys[2:] == want_org
    assert not any(r["pinned"] for r in rows[2:])
    assert [r["rank"] for r in rows] == list(range(1, 11))
    assert len(set(keys)) == len(keys)  # never a duplicate


def test_pinned_validation(pidx, cfg):
    with pytest.raises(ValueError, match="at least one"):
        pinned_topk_packed(pidx, [QUERY], cfg, [])
    with pytest.raises(ValueError, match="distinct"):
        pinned_topk_packed(pidx, [QUERY], cfg, [("c", 1), ("c", 1)])
    with pytest.raises(ValueError, match="external-id values"):
        pinned_topk_packed(pidx, [QUERY], cfg, ["just_one_value"])
