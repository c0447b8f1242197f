"""Percolator gates (ES percolate analog, query/percolate.py): matching
agrees with a brute Python recompute AND with forward boolean retrieval
over the same corpus (doc percolates into query <=> doc is in the
query's result set), negations veto, min_should_match clamps per query,
and degenerate registrations are refused."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.query.percolate import percolate, register_queries
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

QUERIES = [
    "greatest rock album",
    "guitar solo -vinyl",
    "music",
]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=12, n_partitions=4)


def _brute(corpus, cfg, stored):
    """{(conv_id, turn_idx, query_id): n_matched} recomputed per doc."""
    out = {}
    for r in corpus.select("conv_id", "turn_idx", "text").collect():
        toks = set(tokenize_text(r["text"], cfg))
        for sq in stored:
            if any(t in toks for t in sq.neg_terms):
                continue
            n = sum(1 for t in sq.terms if t in toks)
            if n >= sq.m:
                out[(r["conv_id"], r["turn_idx"], sq.query_id)] = n
    return out


def test_percolate_brute_all_terms(spark, cfg, corpus):
    stored = register_queries(QUERIES, cfg)  # default: ALL positive terms
    got = {(r["conv_id"], r["turn_idx"], r["query_id"]): r["n_matched"]
           for r in percolate(corpus, stored, cfg,
                              id_cols=("conv_id", "turn_idx")).collect()}
    assert got == _brute(corpus, cfg, stored) and got
    # the negated query actually vetoed something: relaxing it grows hits
    relaxed = register_queries(["guitar solo"], cfg)
    full = percolate(corpus, relaxed, cfg,
                     id_cols=("conv_id", "turn_idx")).count()
    kept = sum(1 for k in got if k[2] == 1)
    assert kept < full


def test_percolate_min_should_match(spark, cfg, corpus):
    stored = register_queries(QUERIES, cfg, min_should_match=2)
    # clamp: the 1-term query 'music' floors at 1, not 2
    assert [sq.m for sq in stored] == [2, 2, 1]
    got = {(r["conv_id"], r["turn_idx"], r["query_id"]): r["n_matched"]
           for r in percolate(corpus, stored, cfg,
                              id_cols=("conv_id", "turn_idx")).collect()}
    assert got == _brute(corpus, cfg, stored) and got
    # m=2 is a superset of m=all for the 3-term query
    all_terms = _brute(corpus, cfg, register_queries(QUERIES, cfg))
    assert {k for k in all_terms if k[2] == 0} <= {k for k in got
                                                   if k[2] == 0}


def test_percolate_agrees_with_retrieval(spark, cfg, corpus, tmp_path):
    """doc percolates into query <=> doc is in the query's forward
    boolean-AND result set over the same corpus — percolation IS search
    inverted, gated against the served retrieval path."""
    from searchengine_spark.indexing.packed import (
        build_packed_index,
        load_packed_index,
    )
    from searchengine_spark.query.wand import boolean_search_packed

    path = str(tmp_path / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=128)
    pidx = load_packed_index(spark, path)
    q = ["greatest rock album"]
    fwd = {(r["conv_id"], r["turn_idx"])
           for r in boolean_search_packed(pidx, q, cfg, op="and")
           .join(pidx.docmap, "doc_id").collect()}
    stored = register_queries(q, cfg)
    perc = {(r["conv_id"], r["turn_idx"])
            for r in percolate(corpus, stored, cfg,
                               id_cols=("conv_id", "turn_idx")).collect()}
    assert perc == fwd and perc


def test_percolate_refusals(spark, cfg, corpus):
    with pytest.raises(ValueError, match="no positive terms"):
        register_queries(["the and of"], cfg)  # all stop words
    with pytest.raises(ValueError, match="never match"):
        stored = register_queries(["music -music"], cfg)
        percolate(corpus, stored, cfg, id_cols=("conv_id", "turn_idx"))
    with pytest.raises(ValueError, match="at least one"):
        percolate(corpus, [], cfg, id_cols=("conv_id", "turn_idx"))


def test_percolate_stream(spark, cfg, tmp_path):
    """availableNow streaming percolation: run after each file drop —
    the committed union equals batch percolation over everything seen,
    and a re-run with no new files changes nothing (file-source
    tracking + per-batch overwrite idempotence)."""
    from searchengine_spark.query.percolate import (
        percolate_stream,
        read_percolate_output,
    )

    corpus = transcripts_df(spark, n_conv=8, n_partitions=2)
    half_a = corpus.filter("turn_idx % 2 = 0")
    half_b = corpus.filter("turn_idx % 2 = 1")
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    stored = register_queries(["greatest rock album", "music"], cfg)
    ids = ("conv_id", "turn_idx")

    half_a.write.mode("append").parquet(inp)
    percolate_stream(spark, inp, out, stored, cfg, id_cols=ids)
    got1 = {(r["conv_id"], r["turn_idx"], r["query_id"], r["n_matched"])
            for r in read_percolate_output(spark, out).collect()}
    want1 = {(r["conv_id"], r["turn_idx"], r["query_id"], r["n_matched"])
             for r in percolate(half_a, stored, cfg, id_cols=ids).collect()}
    assert got1 == want1 and got1

    half_b.write.mode("append").parquet(inp)
    percolate_stream(spark, inp, out, stored, cfg, id_cols=ids)
    got2 = {(r["conv_id"], r["turn_idx"], r["query_id"], r["n_matched"])
            for r in read_percolate_output(spark, out).collect()}
    wantall = {(r["conv_id"], r["turn_idx"], r["query_id"], r["n_matched"])
               for r in percolate(corpus, stored, cfg, id_cols=ids).collect()}
    assert got2 == wantall and got2 > got1

    # no new files -> no-op
    percolate_stream(spark, inp, out, stored, cfg, id_cols=ids)
    got3 = {(r["conv_id"], r["turn_idx"], r["query_id"], r["n_matched"])
            for r in read_percolate_output(spark, out).collect()}
    assert got3 == got2
