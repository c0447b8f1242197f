"""Hybrid BM25 + vector retrieval gates (query/hybrid.py).

Contract: RRF contributions are exact-integer ``scale // (k_rrf + rank)``
(window-not-corpus semantics, absent-system contributes 0, doc_id-asc
ties); the text side is the packed WAND batch and the vector side the
cosine top-k, fused bit-identically whether the vector candidates come
from the default brute path or a prebuilt frame (the IVF seam).
"""

import numpy as np
import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.hybrid import (
    cosine_candidates,
    hybrid_topk,
    rrf_fuse,
)
from searchengine_spark.tokenizer import TokenizerConfig

ROWS = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
CFG = TokenizerConfig(min_token_length=2)


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id int, doc_id long, rank int")


def test_rrf_arithmetic_exact(spark):
    """Hand-checked fusion: integer contributions, absent-system zero,
    doc_id tie-break."""
    a = _ranking(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
    b = _ranking(spark, [(0, 11, 1), (0, 13, 2)])
    got = {(r["doc_id"]): (r["rrf_score"], r["rank"])
           for r in rrf_fuse([a, b], k=10, k_rrf=60, scale=1_000_000).collect()}
    s = lambda r: 1_000_000 // (60 + r)  # noqa: E731
    assert got[11] == (s(2) + s(1), 1)   # both systems
    assert got[10] == (s(1), 2)          # text only
    assert got[13] == (s(2), 3)          # vector only; beats rank-3 text
    assert got[12] == (s(3), 4)
    # doc_id breaks exact integer ties: two docs ranked 1 in exactly one
    # system each
    c = _ranking(spark, [(1, 5, 1)])
    d = _ranking(spark, [(1, 3, 1)])
    tied = [(r["doc_id"], r["rank"])
            for r in rrf_fuse([c, d], k=10).filter("query_id = 1").collect()]
    assert sorted(tied) == [(3, 1), (5, 2)]


def test_rrf_k_cut_and_validation(spark):
    a = _ranking(spark, [(0, i, i) for i in range(1, 8)])
    assert rrf_fuse([a], k=3).count() == 3
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k_rrf"):
        rrf_fuse([a], k_rrf=-1)


@pytest.fixture(scope="module")
def corpus(spark):
    """Tiny aligned (documents, embeddings) pair: doc texts from the
    transcript generator, embeddings seeded so cosine neighbours are
    deterministic."""
    docs = (
        transcripts_df(spark, n_conv=4)
        .selectExpr("text")
        .limit(120)
        .rdd.zipWithIndex()
        .map(lambda t: (t[1], t[0]["text"]))
        .toDF(["ext_id", "text"])
    )
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((120, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    return docs, emb, vecs


@pytest.fixture(scope="module")
def pidx(spark, corpus, tmp_path_factory):
    docs, _, _ = corpus
    path = str(tmp_path_factory.mktemp("hyb") / "idx")
    build_packed_index(docs, CFG, path, text_col="text",
                       order_cols=("ext_id",), chunk_docs=64)
    return load_packed_index(spark, path)


def test_cosine_candidates_ranks(spark, corpus):
    """Rank column == the cosine_topk ordering (cosine desc, id asc),
    per query."""
    _, emb, vecs = corpus
    out = cosine_candidates(emb, [vecs[0], vecs[5]], n_candidates=7)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    for qid in (0, 1):
        mine = sorted((r for r in rows if r["query_id"] == qid),
                      key=lambda r: r["rank"])
        assert len(mine) == 7
        key = [(-r["cosine"], r["doc_id"]) for r in mine]
        assert key == sorted(key)
        assert mine[0]["doc_id"] == (0 if qid == 0 else 5)  # self is top-1


def test_hybrid_matches_python_reference(spark, corpus, pidx):
    """End-to-end fusion == a from-scratch Python RRF over the two
    systems' collected candidate lists."""
    _, emb, vecs = corpus
    queries = ["greatest rock album", "guitar solo"]
    qvecs = [vecs[3], vecs[11]]
    n_cand, k_rrf, scale = 15, 60, 1_000_000

    got = ROWS(hybrid_topk(pidx, emb, queries, qvecs, CFG, k=10,
                           n_candidates=n_cand))
    assert len(got) > 0

    from searchengine_spark.query.wand import bm25_topk_packed_batch, resolve_docs

    text = resolve_docs(
        pidx, bm25_topk_packed_batch(pidx, queries, CFG, k=n_cand,
                                     round_dp=6)).collect()
    vec = cosine_candidates(emb, qvecs, n_candidates=n_cand).collect()
    expect = []
    for qid in range(len(queries)):
        scores: dict[int, int] = {}
        for r in text:
            if r["query_id"] == qid:
                d = int(r["ext_id"])
                scores[d] = scores.get(d, 0) + scale // (k_rrf + r["rank"])
        for r in vec:
            if r["query_id"] == qid:
                d = int(r["doc_id"])
                scores[d] = scores.get(d, 0) + scale // (k_rrf + r["rank"])
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        expect.extend((qid, d, s, rk + 1) for rk, (d, s) in enumerate(ranked))
    assert got == sorted(expect)


def test_vector_candidates_seam(spark, corpus, pidx):
    """Passing a prebuilt vector frame (the IVF seam) is bit-identical to
    the default brute path given the same candidates."""
    _, emb, vecs = corpus
    queries = ["greatest rock album"]
    qvecs = [vecs[3]]
    pre = cosine_candidates(emb, qvecs, n_candidates=15)
    a = ROWS(hybrid_topk(pidx, emb, queries, qvecs, CFG, k=10,
                         n_candidates=15))
    b = ROWS(hybrid_topk(pidx, emb, queries, [], CFG, k=10,
                         n_candidates=15, vector_candidates=pre))
    assert a == b


def test_compound_ext_id_refused(spark, corpus, cfg_none=None, tmp_path=None):
    _, emb, vecs = corpus
    # transcripts index has (conv_id, turn_idx) external ids
    import tempfile

    path = tempfile.mkdtemp() + "/tidx"
    build_packed_index(transcripts_df(spark, n_conv=2), CFG, path,
                       chunk_docs=64)
    tp = load_packed_index(spark, path)
    with pytest.raises(ValueError, match="single external id"):
        hybrid_topk(tp, emb, ["rock"], [vecs[0]], CFG)


def test_query_pairing_validated(spark, corpus, pidx):
    _, emb, vecs = corpus
    with pytest.raises(ValueError, match="pairs"):
        hybrid_topk(pidx, emb, ["a", "b"], [vecs[0]], CFG)


def test_linear_fuse_minmax_integer_protocol(spark):
    """linear_fuse (ES linear retriever, minmax normalizer): exact
    integer minmax + weighted combine, degenerate system -> 1e6,
    absent-from-system docs contribute 0, doc_id-asc ties."""
    from searchengine_spark.query.hybrid import linear_fuse

    a = spark.createDataFrame(
        [(0, 1, 2.5), (0, 2, 1.5), (0, 3, 0.5)],
        "query_id int, doc_id long, score double")
    b = spark.createDataFrame(
        [(0, 2, 0.9), (0, 3, 0.9), (0, 4, 0.9)],
        "query_id int, doc_id long, score double")
    out = {r["doc_id"]: (r["linear_score"], r["rank"]) for r in
           linear_fuse([a, b], weights=(0.5, 0.25), k=10).collect()}
    # system a: sm 2500000/1500000/500000 -> norm 1e6 / 5e5 / 0
    # system b: degenerate (all 0.9) -> norm 1e6 for docs 2,3,4
    # contributions: w_a=5e5, w_b=25e4
    # doc1: 5e5*1e6//1e6 = 500000
    # doc2: 5e5*5e5//1e6 + 25e4*1e6//1e6 = 250000 + 250000 = 500000
    # doc3: 0 + 250000
    # doc4: 250000
    assert out == {1: (500000, 1), 2: (500000, 2), 3: (250000, 3),
                   4: (250000, 4)}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="weights"):
        linear_fuse([a, b], weights=(1.0,))
    with _pytest.raises(ValueError, match=">= 0"):
        linear_fuse([a], weights=(-0.5,))
