"""PRF (Rocchio) expansion + more-like-this gates (query/feedback.py).

Brute strategy: single-term exhaustive scores from the (already gated)
WAND path are per-doc idf·tfsat contributions; the weighted multi-term
combination and the expansion selection are recomputed independently in
pandas and must match the composed pipeline exactly.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import Bm25Params
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.feedback import (
    more_like_this_packed,
    prf_bm25_topk_packed_batch,
    prf_expansion_terms,
)
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

PARAMS = Bm25Params(k=1.2, b=0.75)
QUERIES = ["greatest rock album", "house party songs"]
R, M, BETA = 4, 3, 0.5


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=100, n_partitions=8)


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("prf") / "idx")
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def idf_map(packed):
    return {r["term"]: float(r["idf"]) for r in
            packed.term_stats.select("term", "idf").collect()}


@pytest.fixture(scope="module")
def doc_tokens(packed):
    return {int(r["doc_id"]): list(r["tokens"])
            for r in packed.doc_tokens().collect()}


def _single_term_scores(packed, term, cfg):
    """doc_id -> idf·tfsat contribution for one term (gated WAND path)."""
    n = int(packed.manifest["n_docs"])
    out = bm25_topk_packed_batch(
        packed, [None], cfg, k=n, exhaustive=True, query_terms=[[term]]
    )
    return {int(r["doc_id"]): float(r["score"]) for r in out.collect()}


def _brute_expansion(packed, cfg, idf_map, doc_tokens, queries, r, m):
    """-> {qid: [(term, weight6), ...]} by the documented contract."""
    base = bm25_topk_packed_batch(packed, queries, cfg, k=r, round_dp=6)
    fb: dict[int, list[int]] = {}
    for row in base.collect():
        fb.setdefault(int(row["query_id"]), []).append(int(row["doc_id"]))
    out = {}
    for qid, q in enumerate(queries):
        orig = set(dict.fromkeys(tokenize_text(q, cfg)))
        mass: dict[str, float] = {}
        for d in fb.get(qid, []):
            toks = doc_tokens[d]
            for t in set(toks):
                mass[t] = mass.get(t, 0.0) + (1.0 + math.log(toks.count(t)))
        w = {
            t: round(v * idf_map[t], 6)
            for t, v in mass.items()
            if t not in orig and t in idf_map
        }
        top = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        out[qid] = top
    return out


def test_expansion_terms_match_brute(packed, cfg, idf_map, doc_tokens):
    want = _brute_expansion(packed, cfg, idf_map, doc_tokens, QUERIES, R, M)
    got: dict[int, list] = {qid: [] for qid in range(len(QUERIES))}
    rows = prf_expansion_terms(packed, QUERIES, cfg, r=R, m=M).collect()
    for row in sorted(rows, key=lambda r: (r["query_id"], r["erank"])):
        got[int(row["query_id"])].append(
            (row["term"], round(float(row["weight"]), 6))
        )
    assert got == want
    for qid, q in enumerate(QUERIES):
        orig = set(dict.fromkeys(tokenize_text(q, cfg)))
        assert not orig & {t for t, _ in got[qid]}
        assert len(got[qid]) <= M


def test_prf_equals_brute_combination(packed, cfg, idf_map, doc_tokens):
    exp = _brute_expansion(packed, cfg, idf_map, doc_tokens, QUERIES, R, M)
    got = {}
    for row in prf_bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, r=R, m=M, beta=BETA, round_dp=6
    ).collect():
        got.setdefault(int(row["query_id"]), []).append(
            (int(row["rank"]), int(row["doc_id"]), round(float(row["score"]), 6))
        )
    got = {q: sorted(v) for q, v in got.items()}
    for qid, q in enumerate(QUERIES):
        scores: dict[int, float] = {}
        for t in dict.fromkeys(tokenize_text(q, cfg)):
            for d, s in _single_term_scores(packed, t, cfg).items():
                scores[d] = scores.get(d, 0.0) + s
        for t, _ in exp[qid]:
            for d, s in _single_term_scores(packed, t, cfg).items():
                scores[d] = scores.get(d, 0.0) + BETA * s
        ranked = sorted(
            ((round(s, 6), d) for d, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )[:10]
        want = sorted(
            (i + 1, d, s) for i, (s, d) in enumerate(ranked)
        )
        assert got[qid] == want, QUERIES[qid]


def test_prf_pruned_equals_exhaustive(packed, cfg):
    a = prf_bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, r=R, m=M, beta=BETA, round_dp=6
    ).collect()
    b = prf_bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, r=R, m=M, beta=BETA, round_dp=6,
        exhaustive=True,
    ).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in rows
    )
    assert key(a) == key(b)


def test_prf_m0_equals_base(packed, cfg):
    prf = prf_bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, r=R, m=0, round_dp=6
    ).collect()
    base = bm25_topk_packed_batch(packed, QUERIES, cfg, k=10, round_dp=6).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in rows
    )
    assert key(prf) == key(base)


def test_prf_changes_some_ranking(packed, cfg):
    # the whole point: expansion must actually surface docs the raw query
    # missed (fixture sanity — if this fails the gate above is vacuous)
    prf = prf_bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, r=R, m=M, beta=BETA, round_dp=6
    ).collect()
    base = bm25_topk_packed_batch(packed, QUERIES, cfg, k=10, round_dp=6).collect()
    prf_docs = {(r["query_id"], r["doc_id"]) for r in prf}
    base_docs = {(r["query_id"], r["doc_id"]) for r in base}
    assert prf_docs != base_docs


def test_mlt_excludes_source_and_matches_brute(packed, cfg, idf_map, doc_tokens):
    # source: the top doc for the first reference query
    base = bm25_topk_packed_batch(packed, QUERIES[:1], cfg, k=1, round_dp=6)
    src = int(base.collect()[0]["doc_id"])
    out = more_like_this_packed(packed, [src], k=10, m=5, round_dp=6).collect()
    assert out and all(int(r["doc_id"]) != src for r in out)
    assert sorted(int(r["rank"]) for r in out) == list(range(1, len(out) + 1))
    # brute: top-5 terms of src by (1+ln tf)·idf, then unweighted combo
    toks = doc_tokens[src]
    w = {
        t: round((1.0 + math.log(toks.count(t))) * idf_map[t], 6)
        for t in set(toks) if t in idf_map
    }
    top = [t for t, _ in sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
    scores: dict[int, float] = {}
    for t in top:
        for d, s in _single_term_scores(packed, t, cfg).items():
            scores[d] = scores.get(d, 0.0) + s
    scores.pop(src, None)
    ranked = sorted(
        ((round(s, 6), d) for d, s in scores.items()), key=lambda x: (-x[0], x[1])
    )[:10]
    want = [(i + 1, d, s) for i, (s, d) in enumerate(ranked)]
    got = sorted(
        ((int(r["rank"]), int(r["doc_id"]), round(float(r["score"]), 6))
         for r in out)
    )
    assert got == sorted(want)


def test_mlt_empty_ids(packed):
    assert more_like_this_packed(packed, [], k=5).count() == 0


def test_local_more_like_matches_distributed(packed, cfg):
    from searchengine_spark.query.serve import LocalSearcher

    base = bm25_topk_packed_batch(packed, QUERIES[:1], cfg, k=1, round_dp=6)
    src = int(base.collect()[0]["doc_id"])
    dist = sorted(
        (int(r["rank"]), int(r["doc_id"]), round(float(r["score"]), 6))
        for r in more_like_this_packed(
            packed, [src], k=10, m=5, round_dp=6).collect()
    )
    ls = LocalSearcher(packed, preload=True, cfg=cfg)
    got = sorted(
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in ls.more_like(src, k=10, m=5, round_dp=6, resolve=False)
    )
    assert got == dist and got
    # lazy tier agrees too, and unknown docs raise
    lazy = LocalSearcher(packed, preload=False, cfg=cfg)
    got_lazy = sorted(
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in lazy.more_like(src, k=10, m=5, round_dp=6, resolve=False)
    )
    assert got_lazy == dist
    import pytest as _pytest
    with _pytest.raises(KeyError):
        ls.more_like(10 ** 9)
