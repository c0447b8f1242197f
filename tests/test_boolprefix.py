"""ES match_bool_prefix gates (query/boolprefix.py): the composition
equals a Python combine of its two already-gated sides (score-all BM25
over the full terms + constant 1.0 for any-expansion membership), the
no-expansion degenerate collapses to plain BM25 ranking over the full
terms, and the single-prefix degenerate is the constant-score doc set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.boolprefix import (
    match_bool_prefix_topk,
    split_bool_prefix,
)
from searchengine_spark.query.wand import (
    bm25_scores_packed_batch,
    boolean_search_packed,
)
from searchengine_spark.tokenizer import TokenizerConfig

QUERIES = ["greatest rock alb", "guitar so", "mus", "rock zzznoexpansion"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def packed(spark, cfg, tmp_path_factory):
    corpus = transcripts_df(spark, n_conv=25, n_partitions=4)
    path = str(tmp_path_factory.mktemp("mbp") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=128)
    return load_packed_index(spark, path)


def _expansions(packed, prefix: str, cap: int = 50):
    rows = (
        packed.term_stats.filter(F.col("df") > 0)
        .filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term")).limit(cap).collect()
    )
    return [r["term"] for r in rows]


def test_matches_python_combine_of_gated_sides(packed, cfg):
    out = match_bool_prefix_topk(packed, QUERIES, cfg, k=10, round_dp=6)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))

    split = [split_bool_prefix(q, cfg) for q in QUERIES]
    scores = bm25_scores_packed_batch(
        packed, QUERIES, cfg, query_terms=[full for full, _ in split])
    base = {(r["query_id"], r["doc_id"]): r["score"] for r in scores.collect()}
    exp_lists = [_expansions(packed, p) if p else [] for _, p in split]
    pref = boolean_search_packed(
        packed, QUERIES, cfg, op="or", query_terms=exp_lists)
    pref_set = {(r["query_id"], r["doc_id"]) for r in pref.collect()}

    combined: dict = {}
    for key, s in base.items():
        combined[key] = s
    for key in pref_set:
        combined[key] = combined.get(key, 0.0) + 1.0
    want: dict = {}
    for (qid, doc), s in combined.items():
        want.setdefault(qid, []).append((round(s, 6), doc))
    for qid, lst in want.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        expect = [(i + 1, doc, s) for i, (s, doc) in enumerate(lst[:10])]
        assert got.get(qid, []) == expect, qid


def test_no_expansion_collapses_to_plain_bm25(packed, cfg):
    # 'zzznoexpansion' matches no dictionary term -> pure full-term BM25
    qid = QUERIES.index("rock zzznoexpansion")
    out = match_bool_prefix_topk(packed, QUERIES, cfg, k=5, round_dp=6)
    got = [(r["doc_id"], r["score"]) for r in out.collect()
           if r["query_id"] == qid]
    scores = bm25_scores_packed_batch(
        packed, ["rock"], cfg)
    lst = sorted(((round(r["score"], 6), r["doc_id"])
                  for r in scores.collect()), key=lambda t: (-t[0], t[1]))
    assert got == [(d, s) for s, d in lst[:5]]


def test_single_prefix_is_constant_score_set(packed, cfg):
    out = match_bool_prefix_topk(packed, ["mus"], cfg, k=8)
    rows = [r for r in out.collect()]
    assert rows and all(r["score"] == 1.0 for r in rows)
    exp = _expansions(packed, "mus")
    want = boolean_search_packed(
        packed, ["mus"], cfg, op="or", query_terms=[exp])
    docs = sorted(r["doc_id"] for r in want.collect())[:8]
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])] == docs


def test_empty_and_validation(packed, cfg):
    assert match_bool_prefix_topk(packed, ["", "   "], cfg, k=5).count() == 0
    with pytest.raises(ValueError):
        match_bool_prefix_topk(packed, ["x"], cfg, k=0)


@pytest.fixture(scope="module")
def shard_pair(spark, cfg, tmp_path_factory):
    corpus = transcripts_df(spark, n_conv=25, n_partitions=4)
    base = tmp_path_factory.mktemp("mbp_shards")
    out = []
    for i, pred in enumerate((F.col("turn_idx") % 2 == 0,
                              F.col("turn_idx") % 2 == 1)):
        p = str(base / f"s{i}")
        build_packed_index(corpus.filter(pred), cfg, p, chunk_docs=128)
        out.append(load_packed_index(spark, p))
    return out


def test_federated_matches_python_combine(spark, shard_pair, cfg):
    """Composition gate on the federation: scores from the gated
    federated score-all + constant from federated boolean OR over the
    GLOBAL-dictionary expansions."""
    from searchengine_spark.query.boolprefix import split_bool_prefix
    from searchengine_spark.query.federated import (
        _global_dictionary,
        bm25_scores_federated,
        boolean_search_federated,
        match_bool_prefix_topk_federated,
    )

    out = match_bool_prefix_topk_federated(
        shard_pair, QUERIES, cfg, k=10)
    got: dict = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))

    split = [split_bool_prefix(q, cfg) for q in QUERIES]
    gdict = {r["term"]: r["df"] for r in _global_dictionary(shard_pair).collect()}
    exp_lists = []
    for _, p in split:
        if not p:
            exp_lists.append([])
            continue
        cands = sorted(((t, df) for t, df in gdict.items()
                        if t.startswith(p)), key=lambda td: (-td[1], td[0]))
        exp_lists.append([t for t, _ in cands[:50]])
    scores = bm25_scores_federated(
        shard_pair, QUERIES, cfg, query_terms=[f for f, _ in split])
    base = {(r["query_id"], r["doc_id"]): r["score"] for r in scores.collect()}
    pref = boolean_search_federated(
        shard_pair, QUERIES, cfg, op="or", query_terms=exp_lists)
    pset = {(r["query_id"], r["doc_id"]) for r in pref.collect()}
    combined: dict = dict(base)
    for key in pset:
        combined[key] = combined.get(key, 0.0) + 1.0
    want: dict = {}
    for (qid, doc), s in combined.items():
        want.setdefault(qid, []).append((round(s, 6), doc))
    for qid, lst in want.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        expect = [(i + 1, d, s) for i, (s, d) in enumerate(lst[:10])]
        assert got.get(qid, []) == expect, qid


def test_federated_constant_score(spark, shard_pair, cfg):
    from searchengine_spark.query.federated import (
        boolean_search_federated,
        constant_score_topk_federated,
    )

    out = constant_score_topk_federated(
        shard_pair, ["the search engine"], cfg, boost=3.0, op="and", k=6)
    rows = sorted((r["rank"], r["doc_id"], r["score"]) for r in out.collect())
    want_docs = sorted(
        r["doc_id"] for r in boolean_search_federated(
            shard_pair, ["the search engine"], cfg, op="and").collect())[:6]
    assert rows == [(i + 1, d, 3.0) for i, d in enumerate(want_docs)]
