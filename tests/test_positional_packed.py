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


def test_rerank_candidates_unit():
    from searchengine_spark.query.proximity import _rerank_candidates

    scores = {3: 1.0, 1: 2.0, 2: 2.0, 4: 0.5}
    assert sorted(_rerank_candidates(scores, None)) == [1, 2, 3, 4]
    assert sorted(_rerank_candidates(scores, 10)) == [1, 2, 3, 4]
    # top-N by score, doc_id tie-break (1 beats 2 at equal score)
    assert set(_rerank_candidates(scores, 2)) == {1, 2}
    assert set(_rerank_candidates(scores, 3)) == {1, 2, 3}
    assert _rerank_candidates(scores, 0) == []


def test_rerank_cut_identity(packed, exact, cfg):
    """rerank_n >= #matched docs is provably identical to the unbounded
    boost (module docstring) — packed AND exact paths."""
    queries = list(REFERENCE_QUERIES[:4])
    for fn, idx in ((proximity_topk_packed_batch, packed), (proximity_topk_batch, exact)):
        kw = {} if fn is proximity_topk_packed_batch else {"mode": "bm25"}
        full = {
            (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
            for r in fn(idx, queries, cfg, k=10, params=PARAMS, **kw).collect()
        }
        cut = {
            (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
            for r in fn(
                idx, queries, cfg, k=10, params=PARAMS, rerank_n=10_000, **kw
            ).collect()
        }
        assert cut == full


def test_rerank_cut_bounds_boosted_docs(packed, cfg):
    """With rerank_n=N, at most N docs per query deviate from the pure base
    score (rerank_n=0 disables every boost -> base BM25); deviating docs
    must agree with the unbounded-boost scores (they ARE the top-N)."""
    queries = [REFERENCE_QUERIES[0]]
    K = 50
    run = lambda n: {
        r["doc_id"]: round(r["score"], 9)
        for r in proximity_topk_packed_batch(
            packed, queries, cfg, k=K, params=PARAMS, rerank_n=n
        ).collect()
    }
    base, cut, full = run(0), run(3), run(None)
    # base top-3 actually received boosts in the full run (non-degenerate)
    assert sum(1 for d, s in full.items() if base.get(d) not in (None, s)) >= 3
    changed = {d for d, s in cut.items() if base.get(d) not in (None, s)}
    assert 0 < len(changed) <= 3
    for d in changed:
        assert cut[d] == full[d]
    # everyone outside the cut keeps the exact base score
    for d, s in cut.items():
        if d not in changed and d in base:
            assert s == base[d]


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
