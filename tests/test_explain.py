"""Score-explain gates (query/serve.py LocalSearcher.explain +
FederatedLocalSearcher.explain — the Lucene/ES explain analog).

Contract: explain returns exactly the search ranking, each result
carrying a term-asc breakdown whose tf/dl_norm/idf match the index's
stored values and whose contributions sum to the doc's score; OOV terms
never appear; the federated twin pins global idf and still sums to the
federated scores.
"""

import math

import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.packed import (
    build_packed_index,
    exploded_view,
    load_packed_index,
)
from searchengine_spark.query.serve import FederatedLocalSearcher, LocalSearcher
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

QUERY = "greatest rock album"


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def pidx(spark, cfg, tmp_path_factory):
    corpus = transcripts_df(spark, n_conv=8)
    path = str(tmp_path_factory.mktemp("explain") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=64)
    return load_packed_index(spark, path)


def test_explain_matches_index_and_search(spark, cfg, pidx):
    ls = LocalSearcher(pidx, cfg=cfg)
    res = ls.explain(QUERY, k=5)
    plain = ls.search(QUERY, k=5, ranker="bm25")
    assert [(r["doc_id"], r["score"], r["rank"]) for r in res] == [
        (r["doc_id"], r["score"], r["rank"]) for r in plain
    ]
    assert len(res) > 0

    # stored-truth twin: tf/dl_norm from the decoded index view, idf from
    # term_stats, contribution recomputed from the BM25 formula
    view = {
        (r["term"], r["doc_id"]): (int(r["tf"]), float(r["dl_norm"]))
        for r in exploded_view(pidx).collect()
    }
    idf = {r["term"]: float(r["idf"]) for r in pidx.term_stats.collect()}
    k1, b = float(pidx.params.k), float(pidx.params.b)
    qterms = set(tokenize_text(QUERY, cfg))
    for r in res:
        assert len(r["breakdown"]) > 0
        assert [x["term"] for x in r["breakdown"]] == sorted(
            {x["term"] for x in r["breakdown"]}
        )
        total = 0.0
        for x in r["breakdown"]:
            assert x["term"] in qterms
            tf, dln = view[(x["term"], r["doc_id"])]
            assert x["tf"] == tf
            assert x["dl_norm"] == pytest.approx(dln, abs=0)
            assert x["idf"] == idf[x["term"]]
            exp = idf[x["term"]] * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dln))
            assert math.isclose(x["contribution"], exp, rel_tol=0, abs_tol=0)
            total += x["contribution"]
        assert math.isclose(total, r["score"], abs_tol=1e-9)


def test_explain_edges(spark, cfg, pidx):
    ls = LocalSearcher(pidx, cfg=cfg)
    assert ls.explain("") == []
    assert ls.explain("the and of") == []
    # OOV term contributes nothing and never appears in a breakdown
    res = ls.explain("album zzzunknownzzz", k=3)
    assert len(res) > 0
    for r in res:
        assert {x["term"] for x in r["breakdown"]} <= {"album"}
    # rounded serving: displayed score equals the rounded contribution sum
    r6 = ls.explain(QUERY, k=3, round_dp=6)
    for r in r6:
        assert math.isclose(
            sum(x["contribution"] for x in r["breakdown"]),
            r["score"], abs_tol=5e-7,
        )


def test_federated_explain(spark, cfg, tmp_path):
    corpus = transcripts_df(spark, n_conv=8)
    import pyspark.sql.functions as F

    a = corpus.filter(F.col("turn_idx") % 2 == 0)
    b = corpus.filter(F.col("turn_idx") % 2 == 1)
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    build_packed_index(a, cfg, pa, chunk_docs=32)
    build_packed_index(b, cfg, pb, chunk_docs=32)
    shards = [load_packed_index(spark, p) for p in (pa, pb)]
    fed = FederatedLocalSearcher(shards, cfg=cfg)

    res = fed.explain(QUERY, k=5)
    plain = fed.search(QUERY, k=5, ranker="bm25")
    assert [(r["doc_id"], r["score"], r["rank"]) for r in res] == [
        (r["doc_id"], r["score"], r["rank"]) for r in plain
    ]
    assert len(res) > 0
    for r in res:
        assert len(r["breakdown"]) > 0
        assert math.isclose(
            sum(x["contribution"] for x in r["breakdown"]),
            r["score"], abs_tol=1e-9,
        )
        # breakdown idf is the federation-global map, not the shard's own
        gidf = fed._idf_global([x["term"] for x in r["breakdown"]])
        for x in r["breakdown"]:
            assert x["idf"] == gidf[x["term"]]

    # single-shard federation explains bit-identically to the plain tier
    solo_path = str(tmp_path / "solo")
    build_packed_index(corpus, cfg, solo_path, chunk_docs=64)
    solo = load_packed_index(spark, solo_path)
    f1 = FederatedLocalSearcher([solo], cfg=cfg).explain(QUERY, k=5)
    l1 = LocalSearcher(solo, cfg=cfg).explain(QUERY, k=5)
    assert f1 == l1
