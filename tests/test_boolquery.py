"""ES bool-query gates (query/boolquery.py): the compound result equals
the engine's own exhaustive score-all surface filtered by a brute
Python eligibility check (all must terms, >= msm should terms, no
must_not term, all filter terms — from the STORED token streams), and
the degenerate shapes collapse to the already-gated single-clause
paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.boolquery import bool_query_topk
from searchengine_spark.query.wand import bm25_scores_packed_batch, bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=20, n_partitions=4)


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("boolq") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=128)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def doc_tokens(packed):
    return {int(r["doc_id"]): set(r["tokens"])
            for r in packed.docs_stage().select("doc_id", "tokens").collect()}


def _eligible(doc_tokens, cfg, must, should, must_not, filt, msm):
    m = set(tokenize_text(must or "", cfg))
    s = set(tokenize_text(should or "", cfg))
    n = set(tokenize_text(must_not or "", cfg))
    f = set(tokenize_text(filt or "", cfg))
    out = set()
    for d, toks in doc_tokens.items():
        if (m | f) - toks:
            continue
        if n & toks:
            continue
        if len(s & toks) < msm:
            continue
        out.add(d)
    return out


def _brute_topk(packed, cfg, scoring, eligible, k=10):
    """Ground-truth ranking: the gated score-all surface over the
    scoring terms, cut to the brute-eligible set, rounded-rank order."""
    rows = bm25_scores_packed_batch(
        packed, [scoring], cfg, round_dp=6).collect()
    cand = sorted(
        ((-r["score"], r["doc_id"]) for r in rows
         if r["doc_id"] in eligible))
    return [(d, -ns) for ns, d in cand[:k]]


def _got(df):
    rows = sorted(df.collect(), key=lambda r: r["rank"])
    return [(r["doc_id"], r["score"]) for r in rows]


MUST, SHOULD, NOT, FILT = "music", "rock album vinyl", "piano", "song"


def test_bool_full_compound(spark, packed, cfg, doc_tokens):
    for msm in (0, 1, 2):
        got = _got(bool_query_topk(
            packed, cfg, must=MUST, should=SHOULD, must_not=NOT,
            filter_terms=FILT, min_should_match=msm, k=10, round_dp=6))
        elig = _eligible(doc_tokens, cfg, MUST, SHOULD, NOT, FILT, msm)
        want = _brute_topk(packed, cfg, f"{MUST} {SHOULD}", elig)
        assert got == want, msm
        assert got  # non-vacuous
    # msm=2 is strictly more selective than msm=0 on this fixture
    e0 = _eligible(doc_tokens, cfg, MUST, SHOULD, NOT, FILT, 0)
    e2 = _eligible(doc_tokens, cfg, MUST, SHOULD, NOT, FILT, 2)
    assert e2 < e0


def test_bool_filter_terms_do_not_score(spark, packed, cfg, doc_tokens):
    """Filter context: same eligibility as must, but the term's BM25
    contribution is absent — scores differ from the must variant."""
    as_filter = _got(bool_query_topk(
        packed, cfg, must=MUST, filter_terms=FILT, k=10, round_dp=6))
    as_must = _got(bool_query_topk(
        packed, cfg, must=f"{MUST} {FILT}", k=10, round_dp=6))
    assert {d for d, _ in as_filter} <= _eligible(
        doc_tokens, cfg, MUST, None, None, FILT, 0)
    assert as_filter != as_must  # filter never contributes score
    elig = _eligible(doc_tokens, cfg, MUST, None, None, FILT, 0)
    assert as_filter == _brute_topk(packed, cfg, MUST, elig)


def test_bool_degenerate_shapes(spark, packed, cfg):
    # should-only == plain bm25 (ES default msm=1 == OR: every match
    # has coverage >= 1)
    got = _got(bool_query_topk(packed, cfg, should=SHOULD, k=10,
                               round_dp=6))
    want = _got(bm25_topk_packed_batch(packed, [SHOULD], cfg, k=10,
                                       round_dp=6))
    assert got == want and got
    # must-only == conjunctive bm25_and
    got = _got(bool_query_topk(packed, cfg, must="music rock", k=10,
                               round_dp=6))
    want = _got(bm25_topk_packed_batch(packed, ["music rock"], cfg, k=10,
                                       round_dp=6, conjunctive=True))
    assert got == want and got


def test_bool_refusals_and_empties(spark, packed, cfg):
    with pytest.raises(ValueError, match="scoring clause"):
        bool_query_topk(packed, cfg, filter_terms=FILT)
    with pytest.raises(ValueError, match="should clause"):
        bool_query_topk(packed, cfg, must=MUST, min_should_match=2)
    # OOV must term -> nothing (the AND contract)
    assert not bool_query_topk(packed, cfg, must="zzzzunseen",
                               should=SHOULD).collect()
    # required and negated -> nothing (ES agrees)
    assert not bool_query_topk(packed, cfg, must=MUST,
                               must_not=MUST).collect()
    # unreachable msm -> nothing
    assert not bool_query_topk(packed, cfg, should="rock album",
                               min_should_match=5).collect()


def test_bool_federated(spark, corpus, cfg, tmp_path):
    """Federated bool over turn-parity shards: the ELIGIBLE SET equals
    the merged index's (membership is shard-exact), and scores equal the
    federated score-all surface cut to the brute eligible set (the
    federation BM25 contract — global idf, shard-local dl_norm, so raw
    scores deliberately differ from a merged build; CLAUDE.md)."""
    from searchengine_spark.query.boolquery import bool_query_topk_federated
    from searchengine_spark.query.federated import (
        bm25_scores_federated,
        resolve_docs_federated,
    )

    shards = []
    for i in range(2):
        p = str(tmp_path / f"s{i}")
        build_packed_index(corpus.filter(F.col("turn_idx") % 2 == i),
                           cfg, p, chunk_docs=128)
        shards.append(load_packed_index(spark, p))
    kw = dict(must=MUST, should=SHOULD, must_not=NOT, filter_terms=FILT,
              min_should_match=1, k=10, round_dp=6)
    fed = bool_query_topk_federated(shards, cfg, **kw)
    got = [(r["doc_id"], r["score"]) for r in
           sorted(fed.collect(), key=lambda r: r["rank"])]

    # brute eligibility per shard, federation namespace
    from searchengine_spark.query.federated import _doc_bases

    elig = set()
    for s, base in zip(shards, _doc_bases(shards)):
        toks = {int(r["doc_id"]): set(r["tokens"]) for r in
                s.docs_stage().select("doc_id", "tokens").collect()}
        for d in _eligible(toks, cfg, MUST, SHOULD, NOT, FILT, 1):
            elig.add(d + base)
    scores = bm25_scores_federated(
        shards, [f"{MUST} {SHOULD}"], cfg, round_dp=6).collect()
    cand = sorted((-r["score"], r["doc_id"]) for r in scores
                  if r["doc_id"] in elig)
    want = [(d, -ns) for ns, d in cand[:10]]
    assert got == want and got

    # the eligible set itself is merged-exact: resolve external keys
    mp = str(tmp_path / "merged")
    build_packed_index(corpus, cfg, mp, chunk_docs=128)
    merged = load_packed_index(spark, mp)
    one = bool_query_topk(merged, cfg, **dict(kw, k=10_000))
    fed_all = bool_query_topk_federated(shards, cfg, **dict(kw, k=10_000))
    from searchengine_spark.query.wand import resolve_docs

    ext = lambda df, pidx_or_shards, fed_: {
        (r["conv_id"], r["turn_idx"]) for r in (
            resolve_docs_federated(pidx_or_shards, df) if fed_
            else resolve_docs(pidx_or_shards, df)).collect()}
    assert ext(fed_all, shards, True) == ext(one, merged, False)


def test_bool_local_parity(spark, corpus, packed, cfg, tmp_path):
    """The in-process bool twin is rank-identical to its distributed
    counterpart on BOTH serving shapes (single index; turn-parity
    federation)."""
    from searchengine_spark.query.boolquery import (
        bool_query_local,
        bool_query_topk_federated,
    )
    from searchengine_spark.query.serve import FederatedLocalSearcher

    kw = dict(must=MUST, should=SHOULD, must_not=NOT, filter_terms=FILT,
              min_should_match=1, k=10, round_dp=6)
    # single index
    ls = FederatedLocalSearcher([packed], cfg=cfg)
    got = [(r["doc_id"], r["score"], r["rank"])
           for r in bool_query_local(ls, resolve=False, **kw)]
    want = [(r["doc_id"], r["score"], r["rank"]) for r in
            sorted(bool_query_topk(packed, cfg, **kw).collect(),
                   key=lambda r: r["rank"])]
    assert got == want and got
    # federated
    shards = []
    for i in range(2):
        p = str(tmp_path / f"ls{i}")
        build_packed_index(corpus.filter(F.col("turn_idx") % 2 == i),
                           cfg, p, chunk_docs=128)
        shards.append(load_packed_index(spark, p))
    fls = FederatedLocalSearcher(shards, cfg=cfg)
    got = [(r["doc_id"], r["score"], r["rank"])
           for r in bool_query_local(fls, resolve=False, **kw)]
    want = [(r["doc_id"], r["score"], r["rank"]) for r in
            sorted(bool_query_topk_federated(shards, cfg, **kw).collect(),
                   key=lambda r: r["rank"])]
    assert got == want and got
    # empty required set short-circuits (no scoring pass)
    assert bool_query_local(ls, must="zzzzunseen", should=SHOULD) == []
