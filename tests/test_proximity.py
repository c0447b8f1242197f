"""Proximity-boost ranker parity vs the LIVE reference (BM25_OPTIMIZED and
TF_IDF_OPTIMIZED over positional postings)."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import (
    REFERENCE_QUERIES,
    generate_transcripts_pdf,
    transcripts_df,
)
from searchengine_spark.indexing.build import Bm25Params, build_index
from searchengine_spark.query.proximity import proximity_topk_batch
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

from ref_oracle import ref_build_and_search

N_CONV = 60
TOPK = 10


@pytest.fixture(scope="module")
def setup(spark, stop_words):
    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words)
    pdf = generate_transcripts_pdf(n_conv=N_CONV)
    it = build_index(
        transcripts_df(spark, n_conv=N_CONV), cfg, n_partitions=4, positional=True
    ).cache()
    doc_tokens = [tokenize_text(t, cfg) for t in pdf["text"]]
    qtoks = [tokenize_text(q, cfg) for q in REFERENCE_QUERIES]
    return cfg, it, doc_tokens, qtoks


def _ref_results(tmpdir, doc_tokens, qtoks, method, schema="lnc.ltc"):
    """Run the live reference; queries that trigger its ZeroDivisionError
    (bm25_positional.py:100-101, §2.6.9) are recorded as None."""
    out = []
    for qt in qtoks:
        try:
            res, _ = ref_build_and_search(
                tmpdir + f"_{method}_{len(out)}",
                doc_tokens,
                [qt],
                n=TOPK,
                ranking_method=method,
                schema=schema,
                posting="positional",
            )
            out.append(res[0])
        except ZeroDivisionError:
            out.append(None)
    return out


def _compare(got_df, ref, queries):
    by_q = {}
    for r in got_df.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    n_checked = 0
    for qid, ref_rows in enumerate(ref):
        if ref_rows is None:
            continue  # reference crashed (its own bug) — nothing to compare
        want = sorted(((round(-s, 9), d) for d, s in ref_rows))[:TOPK]
        mine = sorted(((round(-s, 9), d) for _, d, s in by_q.get(qid, [])))[:TOPK]
        assert mine == want, f"query {qid}: {queries[qid]}"
        n_checked += 1
    assert n_checked >= 10  # the gate must actually exercise most queries


def test_bm25_optimized_parity(setup, tmp_path):
    cfg, it, doc_tokens, qtoks = setup
    ref = _ref_results(str(tmp_path / "r"), doc_tokens, qtoks, "BM25_OPTIMIZED")
    got = proximity_topk_batch(
        it, list(REFERENCE_QUERIES), cfg, k=TOPK, mode="bm25", params=Bm25Params(1.2, 0.75)
    )
    _compare(got, ref, REFERENCE_QUERIES)


def test_tfidf_optimized_parity(setup, tmp_path):
    cfg, it, doc_tokens, qtoks = setup
    ref = _ref_results(str(tmp_path / "r"), doc_tokens, qtoks, "TF_IDF_OPTIMIZED")
    got = proximity_topk_batch(
        it, list(REFERENCE_QUERIES), cfg, k=TOPK, mode="tfidf"
    )
    _compare(got, ref, REFERENCE_QUERIES)


def test_uniform_length_corpus_boost_skips_not_crashes(spark, stop_words):
    # dl_norm_max == dl_norm_min (every doc the same length): the boost's
    # deviation term is 0/0 — the scorer must SKIP the boost (the module's
    # documented ZeroDivisionError-site convention), not crash the job
    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words)
    docs = spark.createDataFrame(
        [
            ("c0", 0, "alpha beta gamma delta"),
            ("c0", 1, "alpha beta epsilon zeta"),
            ("c1", 0, "ietaa kappa lambda muon"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    it = build_index(docs, cfg, positional=True)
    for mode in ("bm25", "tfidf"):
        got = proximity_topk_batch(
            it, ["alpha beta"], cfg, k=5, mode=mode,
            params=Bm25Params(1.2, 0.75),
        ).collect()
        assert got, mode
    # packed twin: same corpus through the packed scorer
    import tempfile

    from searchengine_spark.indexing.packed import (
        build_packed_index,
        load_packed_index,
    )
    from searchengine_spark.query.proximity import proximity_topk_packed_batch

    p = tempfile.mkdtemp() + "/unif_idx"
    build_packed_index(
        docs, cfg, p, params=Bm25Params(1.2, 0.75), positional=True
    )
    pidx = load_packed_index(spark, p)
    assert proximity_topk_packed_batch(pidx, ["alpha beta"], cfg, k=5).collect()
