"""minimum_should_match value-grammar gates (query/msm.py): the
resolver implements the Lucene spec (positive/negative integers,
[-]percentages, floor rounding, the below-1 -> 1 clamp), msm_map fans
one spec into per-query floors, and the scorers accept the per-query
dict — '75%' over a mixed-length batch equals per-query integer calls."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.msm import msm_map, resolve_min_should_match
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text


@pytest.mark.parametrize("spec,n,want", [
    (3, 5, 3), ("3", 5, 3),
    (-2, 5, 3), ("-2", 5, 3),
    ("75%", 4, 3), ("75%", 5, 3), ("75%", 3, 2),   # floor
    ("-25%", 4, 3), ("-25%", 5, 4),                # n - floor(25%)
    ("100%", 4, 4), ("0%", 4, 1),                  # clamp below 1 -> 1
    (-10, 4, 1), ("-100%", 7, 1),
    (9, 4, 9),                                     # unreachable stays
    # conditional clauses (Solr calculateMinShouldMatch walk)
    ("3<90%", 3, 3),   # n <= bound: ALL clauses required
    ("3<90%", 2, 2),
    ("3<90%", 10, 9),  # n > bound: sub-spec applies (floor 90%)
    ("3<90%", 4, 3),
    ("3 < 90%", 10, 9),                            # spaces tolerated
    ("2<-25% 9<-3", 2, 2),   # below first bound -> all
    ("2<-25% 9<-3", 8, 6),   # first clause applies: 8 - floor(2) = 6
    ("2<-25% 9<-3", 12, 9),  # second clause applies: 12 - 3
    ("2<2", 5, 2),           # integer sub-spec
    ("4<0%", 5, 1),          # clamp below 1 still applies
])
def test_spec_grammar(spec, n, want):
    assert resolve_min_should_match(spec, n) == want


def test_bad_specs():
    for bad in ("abc", "50 %%", "", "<90%", "3<", "x<90%", "3<90%<2"):
        with pytest.raises(ValueError):
            resolve_min_should_match(bad, 5)


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def packed(spark, cfg, tmp_path_factory):
    corpus = transcripts_df(spark, n_conv=12, n_partitions=4)
    path = str(tmp_path_factory.mktemp("msm") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=128)
    return load_packed_index(spark, path)


def test_percentage_batch_equals_per_query_ints(packed, cfg):
    queries = ["greatest rock album", "guitar solo", "music"]
    mm = msm_map("67%", queries, cfg)
    for qid, q in enumerate(queries):
        n = len(dict.fromkeys(tokenize_text(q, cfg)))
        assert mm[qid] == max(1, n * 67 // 100)
    batch = bm25_topk_packed_batch(
        packed, queries, cfg, k=10, round_dp=6, min_should_match=mm)
    got = sorted(map(tuple, batch.collect()))
    singles = []
    for qid, q in enumerate(queries):
        one = bm25_topk_packed_batch(
            packed, [q], cfg, k=10, round_dp=6, min_should_match=mm[qid])
        singles.extend((qid, r["doc_id"], r["score"], r["rank"])
                       for r in one.collect())
    assert got == sorted(singles) and got


def test_percolate_accepts_spec_grammar(spark, cfg):
    from searchengine_spark.query.percolate import register_queries

    qs = register_queries(
        ["greatest rock album", "guitar solo"], cfg, min_should_match="67%")
    for sq in qs:
        assert sq.m == max(1, sq.n_terms * 67 // 100)
    qs2 = register_queries(["greatest rock album"], cfg,
                           min_should_match="-1")
    assert qs2[0].m == qs2[0].n_terms - 1
