"""Negated query terms (query/negation.py; ES bool must_not / -term).

Gates:

- ``-term`` parsing happens on the RAW query (the tokenize chain maps
  ``-`` to space — un-parsed it would silently become a positive term);
- ranked exclusion == post-filtering the EXHAUSTIVE full ranking (true
  top-k of the excluded corpus), WAND == exhaustive under exclusion;
- boolean exclusion == set difference;
- the negation wins over a same-term positive; OOV negations are no-ops;
- LocalSearcher / federated / FederatedLocalSearcher are bit-identical
  to the single-index distributed path.
"""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import Bm25Params
from searchengine_spark.indexing.merge import merge_packed_indexes
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.negation import (
    negated_terms,
    parse_negated_queries,
    split_negations,
)
from searchengine_spark.query.serve import FederatedLocalSearcher, LocalSearcher
from searchengine_spark.query.wand import (
    bm25_topk_packed_batch,
    boolean_search_packed,
)
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

PARAMS = Bm25Params(k=1.2, b=0.75)


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=120, n_partitions=8)


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("negpacked") / "idx")
    # small chunks: exclusion masking must work across many chunks
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    return load_packed_index(spark, path)


def _rows(df, cols=("query_id", "doc_id", "score")):
    return sorted(tuple(row[c] for c in cols)
                  for row in df.select(*cols).collect())


def _docs_matching(pidx, cfg, term: str) -> set:
    out = boolean_search_packed(pidx, [term], cfg, op="or")
    return {r["doc_id"] for r in out.collect()}


# ------------------------------------------------------------ parsing

def test_split_negations():
    assert split_negations("apple -banana pie") == ("apple pie", ["banana"])
    assert split_negations("-banana") == ("", ["banana"])
    # a bare dash is punctuation, not a negation
    assert split_negations("apple - pie") == ("apple - pie", [])
    # unicode whitespace separates words (the tokenizer parity contract)
    assert split_negations("apple -banana") == ("apple", ["banana"])
    assert split_negations("") == ("", [])
    # double dash: the stripped word is "-banana"; normalization then
    # maps the inner dash to space like any punctuation
    assert split_negations("--banana") == ("", ["-banana"])


def test_negated_terms_normalize(cfg):
    # stop words / short tokens can't be excluded (they were never indexed)
    assert negated_terms(["the"], cfg) == []
    assert negated_terms(["ab"], cfg) == []
    # punctuation splits into several excluded terms
    assert negated_terms(["rock&roll"], cfg) == ["rock", "roll"]
    # dedup, order-preserving
    assert negated_terms(["rock", "rock"], cfg) == ["rock"]


def test_parse_negated_queries(cfg):
    qs, ex = parse_negated_queries(
        ["guitar solo", "guitar -solo", "-the guitar"], cfg
    )
    assert qs == ["guitar solo", "guitar", "guitar"]
    assert ex == {1: ["solo"]}  # '-the' is a stop word -> no-op, absent


# ------------------------------------------------- ranked (bm25) exclusion

def test_must_not_is_true_topk_of_excluded_corpus(spark, packed, cfg):
    q = "greatest rock album"
    neg = "guitar"
    banned = _docs_matching(packed, cfg, neg)
    assert banned, "fixture must contain the negated term"

    # ground truth: the FULL exhaustive ranking, minus banned docs, top 10
    full = bm25_topk_packed_batch(
        packed, [q], cfg, k=packed.manifest["n_docs"], exhaustive=True
    ).collect()
    full = sorted(full, key=lambda r: r["rank"])
    expect = [(r["doc_id"], r["score"]) for r in full
              if r["doc_id"] not in banned][:10]

    ex_terms = {0: tokenize_text(neg, cfg)}
    got_df = bm25_topk_packed_batch(packed, [q], cfg, k=10,
                                    exclude_terms=ex_terms)
    got = [(r["doc_id"], r["score"])
           for r in sorted(got_df.collect(), key=lambda r: r["rank"])]
    assert got == expect
    assert not {d for d, _ in got} & banned


def test_wand_equals_exhaustive_under_exclusion(packed, cfg):
    qs = ["greatest rock album -guitar", "drummer tour -legendary"]
    pos, ex = parse_negated_queries(qs, cfg)
    pruned = bm25_topk_packed_batch(packed, pos, cfg, k=10, exclude_terms=ex)
    exact = bm25_topk_packed_batch(packed, pos, cfg, k=10, exclude_terms=ex,
                                   exhaustive=True)
    cols = ("query_id", "doc_id", "score", "rank")
    assert _rows(pruned, cols) == _rows(exact, cols)


def test_exclusion_composes_with_conjunctive(packed, cfg):
    pos, ex = parse_negated_queries(["guitar solo -tour"], cfg)
    out = bm25_topk_packed_batch(packed, pos, cfg, k=50, exclude_terms=ex,
                                 conjunctive=True).collect()
    assert out
    and_set = {r["doc_id"] for r in
               boolean_search_packed(packed, ["guitar solo"], cfg,
                                     op="and").collect()}
    banned = _docs_matching(packed, cfg, "tour")
    for r in out:
        assert r["doc_id"] in and_set and r["doc_id"] not in banned


def test_negation_wins_over_same_term_positive(packed, cfg):
    # 'guitar -guitar': every match of the only scoring term is excluded
    out = bm25_topk_packed_batch(packed, ["guitar"], cfg, k=10,
                                 exclude_terms={0: ["guitar"]})
    assert out.count() == 0
    # with a second positive term, the other term's docs survive unless
    # they also contain the negated one
    out2 = bm25_topk_packed_batch(packed, ["guitar album"], cfg, k=10,
                                  exclude_terms={0: ["guitar"]}).collect()
    banned = _docs_matching(packed, cfg, "guitar")
    assert out2 and all(r["doc_id"] not in banned for r in out2)


def test_oov_negation_is_noop(packed, cfg):
    base = bm25_topk_packed_batch(packed, ["greatest rock album"], cfg, k=10)
    ex = bm25_topk_packed_batch(packed, ["greatest rock album"], cfg, k=10,
                                exclude_terms={0: ["zzzznotaterm"]})
    cols = ("query_id", "doc_id", "score", "rank")
    assert _rows(base, cols) == _rows(ex, cols)


# ------------------------------------------------------ boolean exclusion

@pytest.mark.parametrize("op", ["and", "or"])
def test_boolean_exclusion_is_set_difference(packed, cfg, op):
    q = "guitar album"
    neg = "tour"
    plain = boolean_search_packed(packed, [q], cfg, op=op)
    banned = _docs_matching(packed, cfg, neg)
    expect = sorted(r["doc_id"] for r in plain.collect()
                    if r["doc_id"] not in banned)
    got = boolean_search_packed(packed, [q], cfg, op=op,
                                exclude_terms={0: [
                                    t for t in tokenize_text(neg, cfg)]})
    assert sorted(r["doc_id"] for r in got.collect()) == expect
    if op == "or":
        # n_terms counts POSITIVE matches only, unchanged by the negation
        plain_n = {r["doc_id"]: r["n_terms"] for r in plain.collect()}
        for r in got.collect():
            assert r["n_terms"] == plain_n[r["doc_id"]]


def test_boolean_pure_negation_matches_nothing(packed, cfg):
    out = boolean_search_packed(packed, [""], cfg, op="or",
                                exclude_terms={0: ["guitar"]})
    assert out.count() == 0


# ----------------------------------------------------------- serving tiers

def test_local_searcher_exclusion_parity(packed, cfg):
    local = LocalSearcher(packed, preload=True, cfg=cfg)
    for q, neg in [("greatest rock album", ["guitar"]),
                   ("drummer tour", ["legendary", "rock"])]:
        dist = bm25_topk_packed_batch(
            packed, [q], cfg, k=10, round_dp=6,
            exclude_terms={0: negated_terms(neg, cfg)}).collect()
        dist = [(r["doc_id"], r["score"])
                for r in sorted(dist, key=lambda r: r["rank"])]
        got = [(r["doc_id"], r["score"])
               for r in local.search(q, k=10, exclude=neg, resolve=False,
                                     round_dp=6)]
        assert got == dist


def test_local_searcher_boolean_exclusion(packed, cfg):
    local = LocalSearcher(packed, preload=True, cfg=cfg)
    for op, ranker in [("and", "boolean_and"), ("or", "boolean_or")]:
        dist = sorted(
            r["doc_id"]
            for r in boolean_search_packed(
                packed, ["guitar album"], cfg, op=op,
                exclude_terms={0: ["tour"]}).collect())
        got = [r["doc_id"] for r in local.search(
            "guitar album", ranker=ranker, exclude=["tour"], resolve=False)]
        assert got == dist


def test_local_searcher_exclusion_refusals(packed, cfg):
    local = LocalSearcher(packed, preload=True, cfg=cfg)
    with pytest.raises(NotImplementedError, match="exclude"):
        local.search("guitar", ranker="tfidf", exclude=["tour"])


def test_federated_exclusion_parity(spark, corpus, cfg, tmp_path_factory):
    from pyspark.sql import functions as F

    from searchengine_spark.query.federated import (
        bm25_topk_federated,
        boolean_search_federated,
    )

    base = tmp_path_factory.mktemp("negfed")
    shards = []
    for i, part in enumerate(
        [corpus.filter(F.col("turn_idx") % 2 == 0),
         corpus.filter(F.col("turn_idx") % 2 == 1)]
    ):
        p = str(base / f"s{i}")
        build_packed_index(part, cfg, p, params=PARAMS, chunk_docs=256)
        shards.append(load_packed_index(spark, p))

    qs = ["greatest rock album -guitar", "drummer -tour"]
    pos, ex = parse_negated_queries(qs, cfg)
    n_total = sum(s_.manifest["n_docs"] for s_ in shards)

    # ground truth INSIDE the federation's own scoring contract (idf
    # global, dl_norm shard-local — a merged index would differ on a
    # non-uniform corpus): full exhaustive federated ranking, minus the
    # docs matching each query's negated terms, top 10
    full = bm25_topk_federated(shards, pos, cfg, k=n_total, exhaustive=True)
    full_rows = sorted(full.collect(), key=lambda r: (r["query_id"], r["rank"]))
    banned = {}
    for qid, terms in ex.items():
        b = boolean_search_federated(shards, [" ".join(terms)], cfg, op="or")
        banned[qid] = {r["doc_id"] for r in b.collect()}
    expect = {}
    for r in full_rows:
        q = r["query_id"]
        if r["doc_id"] in banned.get(q, ()):  # excluded
            continue
        expect.setdefault(q, [])
        if len(expect[q]) < 10:
            expect[q].append((r["doc_id"], r["score"]))

    for gather in ("single", "two_phase"):
        fed = bm25_topk_federated(shards, pos, cfg, k=10, exclude_terms=ex,
                                  gather=gather)
        got = {}
        for r in sorted(fed.collect(), key=lambda r: (r["query_id"], r["rank"])):
            got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
        assert got == expect, gather

    # boolean: per-shard set difference == federation-wide set difference
    fed_or = boolean_search_federated(shards, ["guitar album"], cfg, op="or")
    fed_ban = {r["doc_id"] for r in boolean_search_federated(
        shards, ["tour"], cfg, op="or").collect()}
    want = sorted(r["doc_id"] for r in fed_or.collect()
                  if r["doc_id"] not in fed_ban)
    got_b = boolean_search_federated(shards, ["guitar album"], cfg, op="or",
                                     exclude_terms={0: ["tour"]})
    assert sorted(r["doc_id"] for r in got_b.collect()) == want

    # in-process federated tier == distributed federated, bit for bit
    floc = FederatedLocalSearcher(shards, cfg=cfg)
    for qid, q_raw in enumerate(qs):
        p, neg = split_negations(q_raw)
        got = [(r["doc_id"], r["score"])
               for r in floc.search(p, k=10, exclude=neg, resolve=False,
                                    round_dp=6)]
        dist = bm25_topk_federated(
            shards, [p], cfg, k=10, round_dp=6,
            exclude_terms={0: negated_terms(neg, cfg)}).collect()
        want = [(r["doc_id"], r["score"])
                for r in sorted(dist, key=lambda r: r["rank"])]
        assert got == want
