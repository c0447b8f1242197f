"""SMART doc-side schema generalization gates (VERDICT r02 "missing #5").

Packed TF-IDF serving accepts any doc-side l|b|n x c|b|n schema, not just
lnc: cosine norms come from the multi-letter doc_norms sidecar
(nrm / nrm_b / nrm_n), 'n'/'b' norms are norm-free (no sidecar needed),
and payload='tfidf' builds bake a chosen ``tfidf_doc_schema`` into the
postings (manifest-recorded, serving validates).

Gating chain per schema: live reference (ref_oracle) <-> exact path
(tfidf.py) <-> packed path (proximity.py) <-> LocalSearcher (serve.py).
The live-ref leg covers norms 'c' and 'n'; norm 'b' has no uniform_weight
branch in the reference (tf_idf.py:201 returns None -> crash there), so our
identity treatment is gated packed==exact only.

Comparisons use FULL result-set multisets of (rounded score, doc_id) at
k >= corpus size — rank-map equality is tie-fragile for degenerate schemas
('n' norm maps every doc weight to 1)."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import (
    REFERENCE_QUERIES,
    generate_transcripts_pdf,
    transcripts_df,
)
from searchengine_spark.indexing.build import Bm25Params, build_index
from searchengine_spark.indexing.packed import (
    build_packed_index,
    exploded_view,
    load_packed_index,
)
from searchengine_spark.query.proximity import (
    proximity_topk_batch,
    proximity_topk_packed_batch,
    tfidf_topk_packed_batch,
)
from searchengine_spark.query.tfidf import tfidf_topk_batch, tfidf_weights
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

from ref_oracle import ref_build_and_search

PARAMS = Bm25Params(1.2, 0.75)
N_CONV = 40
K_ALL = 100_000  # >= #docs: no top-k cut -> tie-proof multiset compare
QUERIES = list(REFERENCE_QUERIES[:6])

REF_SCHEMAS = ["bnc.ltc", "nnc.ltc", "lnn.ltc"]  # live-ref-runnable
ALL_SCHEMAS = REF_SCHEMAS + ["lnb.ltc"]  # + identity-'b' norm (ours only)


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=N_CONV, n_partitions=4)


@pytest.fixture(scope="module")
def exact(corpus, cfg):
    return build_index(corpus, cfg, positional=True).cache()


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("schpacked") / "idx")
    build_packed_index(
        corpus, cfg, path, params=PARAMS, chunk_docs=256, positional=True,
        tfidf_sidecar=True,
    )
    return load_packed_index(spark, path)


def _resultset(rows):
    return sorted((round(r["score"], 9), r["doc_id"]) for r in rows)


@pytest.mark.parametrize("schema", REF_SCHEMAS)
def test_exact_path_vs_live_reference(spark, cfg, schema, tmp_path):
    """Exact-path TF-IDF under non-lnc doc schemas == the live reference's
    full ranked set (score multiset at n >= corpus — tie-cut-proof)."""
    pdf = generate_transcripts_pdf(n_conv=N_CONV)
    it = build_index(transcripts_df(spark, n_conv=N_CONV), cfg, n_partitions=4).cache()
    doc_tokens = [tokenize_text(t, cfg) for t in pdf["text"]]
    qtoks = [tokenize_text(q, cfg) for q in QUERIES]
    ref, _ = ref_build_and_search(
        str(tmp_path), doc_tokens, qtoks, n=K_ALL,
        ranking_method="TF_IDF", schema=schema,
    )
    got = tfidf_topk_batch(it, QUERIES, cfg, k=K_ALL, schema=schema)
    by_q: dict = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((round(r["score"], 9), r["doc_id"]))
    for qid, ref_rows in enumerate(ref):
        want = sorted((round(s, 9), d) for d, s in ref_rows)
        assert sorted(by_q.get(qid, [])) == want, f"{schema} query {qid}"
    it.unpersist()


@pytest.mark.parametrize("schema", ALL_SCHEMAS)
def test_packed_plain_equals_exact(packed, exact, cfg, schema):
    got = _resultset(
        tfidf_topk_packed_batch(packed, QUERIES, cfg, k=K_ALL, schema=schema).collect()
    )
    want = _resultset(
        tfidf_topk_batch(exact, QUERIES, cfg, k=K_ALL, schema=schema).collect()
    )
    assert got == want and got


@pytest.mark.parametrize("schema", ALL_SCHEMAS)
def test_packed_boosted_equals_exact(packed, exact, cfg, schema):
    """TF_IDF_OPTIMIZED (positional boost) under every doc-side schema:
    packed == exact path, full result set."""
    got = _resultset(
        proximity_topk_packed_batch(
            packed, QUERIES, cfg, k=K_ALL, params=PARAMS, mode="tfidf",
            schema=schema,
        ).collect()
    )
    want = _resultset(
        proximity_topk_batch(
            exact, QUERIES, cfg, k=K_ALL, mode="tfidf", params=PARAMS,
            schema=schema,
        ).collect()
    )
    assert got == want and got


@pytest.mark.parametrize("schema", ["bnc.ltc", "lnn.ltc", "nnc.ltc"])
def test_local_searcher_parity(packed, cfg, schema):
    # nnc is load-bearing: it is the ONLY schema whose fixture hits the
    # 0.0625-class banker's-rounding ties serve._round3 exists for — a
    # HALF_UP regression there passes the tie-free bnc/lnn legs
    from searchengine_spark.query.serve import LocalSearcher

    local = LocalSearcher(packed, preload=True, cfg=cfg)
    for q in QUERIES[:3]:
        got = sorted(
            (round(r["score"], 9), r["doc_id"])
            for r in local.search(q, k=K_ALL, ranker="tfidf", schema=schema,
                                  resolve=False)
        )
        want = _resultset(
            tfidf_topk_packed_batch(packed, [q], cfg, k=K_ALL, schema=schema).collect()
        )
        assert got == want and got


def test_embedded_payload_bakes_schema(spark, corpus, cfg, exact, tmp_path):
    """payload='tfidf' + tfidf_doc_schema='bnc': stored weights == exact
    tfidf_weights under bnc, serving validates the baked schema."""
    path = str(tmp_path / "bncidx")
    manifest = build_packed_index(
        corpus, cfg, path, params=PARAMS, chunk_docs=256, payload="tfidf",
        tfidf_doc_schema="bnc",
    )
    assert manifest["tfidf_doc_schema"] == "bnc"
    pidx = load_packed_index(spark, path)
    dec = exploded_view(pidx).select("term", "doc_id", "w")
    from pyspark.sql import functions as F

    ref = tfidf_weights(exact, "bnc.ltc").select("term", "doc_id", "w")
    assert dec.exceptAll(ref).union(ref.exceptAll(dec)).count() == 0
    got = _resultset(
        tfidf_topk_packed_batch(pidx, QUERIES, cfg, k=K_ALL, schema="bnc.ltc").collect()
    )
    want = _resultset(
        tfidf_topk_batch(exact, QUERIES, cfg, k=K_ALL, schema="bnc.ltc").collect()
    )
    assert got == want and got
    with pytest.raises(ValueError, match="baked"):
        tfidf_topk_packed_batch(pidx, QUERIES, cfg, k=10, schema="lnc.ltc").collect()


def test_norm_free_schema_needs_no_sidecar(spark, corpus, cfg, exact, tmp_path):
    """'n'/'b' norms serve from a plain freq build (no sidecar at all);
    cosine still refuses without the sidecar."""
    path = str(tmp_path / "nosidecar")
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    pidx = load_packed_index(spark, path)
    got = _resultset(
        tfidf_topk_packed_batch(pidx, QUERIES[:2], cfg, k=K_ALL, schema="lnn.ltc").collect()
    )
    want = _resultset(
        tfidf_topk_batch(exact, QUERIES[:2], cfg, k=K_ALL, schema="lnn.ltc").collect()
    )
    assert got == want and got
    with pytest.raises(ValueError, match="tfidf_sidecar"):
        tfidf_topk_packed_batch(pidx, QUERIES[:2], cfg, k=10, schema="lnc.ltc").collect()


def test_bad_doc_schema_refused_at_build(corpus, cfg, tmp_path):
    with pytest.raises(ValueError, match="tfidf_doc_schema"):
        build_packed_index(
            corpus, cfg, str(tmp_path / "bad"), payload="tfidf",
            tfidf_doc_schema="ltc",  # doc-side df 't' unsupported from-disk
        )
