"""Retrieve-then-rerank gates (query/rerank.py).

Contract: candidates are the BM25 top-n window (window-not-corpus);
the default Jaccard scorer is exact-integer micro-units; the scorer
seam is pluggable; ranks are (rr_score desc, doc_id asc).
"""

import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.rerank import RR_SCALE, jaccard_scorer, rerank_topk
from searchengine_spark.query.wand import bm25_topk_packed_batch, resolve_docs
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

ROWS = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
CFG = TokenizerConfig(min_token_length=2)


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        transcripts_df(spark, n_conv=6)
        .selectExpr("text")
        .limit(200)
        .rdd.zipWithIndex()
        .map(lambda t: (t[1], t[0]["text"]))
        .toDF(["ext_id", "text"])
    )


@pytest.fixture(scope="module")
def pidx(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rr") / "idx")
    build_packed_index(corpus, CFG, path, text_col="text",
                       order_cols=("ext_id",), chunk_docs=64)
    return load_packed_index(spark, path)


def test_jaccard_scorer_exact():
    s = jaccard_scorer(CFG)
    got = s("aa bb cc", ["aa bb cc", "aa zz", "", None])
    assert got[0] == RR_SCALE                      # identical sets
    assert got[1] == (RR_SCALE * 1) // 4           # inter 1, union 4
    assert got[2] == 0 and got[3] == 0             # empty / NULL text


def test_rerank_matches_python_reference(spark, corpus, pidx):
    queries = ["greatest rock album", "guitar solo"]
    n_cand = 15
    got = ROWS(rerank_topk(pidx, corpus, queries, CFG, k=5,
                           n_candidates=n_cand))
    assert len(got) > 0

    cands = resolve_docs(pidx, bm25_topk_packed_batch(
        pidx, queries, CFG, k=n_cand, round_dp=6)).collect()
    texts = {r["ext_id"]: r["text"] for r in corpus.collect()}
    expect = []
    for qid, q in enumerate(queries):
        qset = set(tokenize_text(q, CFG))
        scores = {}
        for r in cands:
            if r["query_id"] == qid:
                d = int(r["ext_id"])
                dset = set(tokenize_text(texts[d], CFG))
                u = len(qset | dset)
                scores[d] = 0 if u == 0 else (RR_SCALE * len(qset & dset)) // u
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        expect.extend((qid, d, s, i + 1) for i, (d, s) in enumerate(ranked))
    assert got == sorted(expect)


def test_window_not_corpus(spark, corpus, pidx):
    """n_candidates=1 reranks exactly the BM25 top-1, nothing else."""
    top1 = resolve_docs(pidx, bm25_topk_packed_batch(
        pidx, ["greatest rock album"], CFG, k=1, round_dp=6)).collect()
    got = rerank_topk(pidx, corpus, ["greatest rock album"], CFG, k=1,
                      n_candidates=1).collect()
    assert len(got) == 1 and got[0]["doc_id"] == int(top1[0]["ext_id"])


def test_custom_scorer_seam(spark, corpus, pidx):
    """A pluggable scorer reorders the window (text length here — where
    a cross-encoder goes)."""
    by_len = rerank_topk(pidx, corpus, ["greatest rock album"], CFG, k=5,
                         n_candidates=15,
                         scorer=lambda q, ds: [len(d or "") for d in ds])
    rows = sorted(by_len.collect(), key=lambda r: r["rank"])
    lens = [r["rr_score"] for r in rows]
    assert lens == sorted(lens, reverse=True) and len(rows) == 5


def test_validation(spark, corpus, pidx):
    with pytest.raises(ValueError, match="n_candidates"):
        rerank_topk(pidx, corpus, ["x"], CFG, k=10, n_candidates=5)
    with pytest.raises(ValueError, match="lacks"):
        rerank_topk(pidx, corpus.drop("text"), ["x"], CFG)
