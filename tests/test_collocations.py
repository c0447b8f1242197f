"""Bigram collocation (PMI) gates — textops/collocations.py."""

from __future__ import annotations

import math

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.textops.collocations import bigram_collocations
from searchengine_spark.tokenizer import TokenizerConfig, tokens_column

from pyspark.sql import functions as F


def _tokens_df(spark, texts, min_len=1):
    cfg = TokenizerConfig(min_token_length=min_len)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return df.select(tokens_column(F.col("text"), cfg).alias("tokens"))


def test_handcrafted_pmi_exact(spark):
    # unigrams: a:3 b:3 c:1 (N=7); bigrams: (a,b):2 (b,a):2
    toks = _tokens_df(spark, ["a b a b", "b a", "c"])
    rows = {(r["w1"], r["w2"]): (int(r["pair_count"]), float(r["pmi"]))
            for r in bigram_collocations(toks, min_count=1, k=10).collect()}
    assert set(rows) == {("a", "b"), ("b", "a")}
    want_pmi = round(math.log(2.0 * 7.0 / (3.0 * 3.0)), 6)
    assert rows[("a", "b")] == (2, want_pmi)
    assert rows[("b", "a")] == (2, want_pmi)


def test_short_docs_count_unigrams_only(spark):
    # 'c' doc adds to N but no pairs; empty doc contributes nothing
    with_c = bigram_collocations(
        _tokens_df(spark, ["a b", "c", ""]), min_count=1).collect()
    without_c = bigram_collocations(
        _tokens_df(spark, ["a b"]), min_count=1).collect()
    pmi_with = float(with_c[0]["pmi"])
    pmi_without = float(without_c[0]["pmi"])
    assert pmi_with == round(math.log(1.0 * 3.0 / 1.0), 6)
    assert pmi_without == round(math.log(1.0 * 2.0 / 1.0), 6)


def test_min_count_and_k_cut(spark):
    texts = ["x y"] * 6 + ["p q"] * 5 + ["r s"] * 4
    out = bigram_collocations(_tokens_df(spark, texts), min_count=5, k=1)
    rows = out.collect()
    assert [(r["w1"], r["w2"], r["pair_count"]) for r in rows] == [("x", "y", 6)]


def test_fixture_corpus_brute(spark, stop_words):
    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words)
    corpus = transcripts_df(spark, n_conv=30, n_partitions=4)
    toks = corpus.select(tokens_column(F.col("text"), cfg).alias("tokens"))
    got = [(r["w1"], r["w2"], int(r["pair_count"]), float(r["pmi"]))
           for r in bigram_collocations(toks, min_count=3, k=20).collect()]
    # brute in python
    tok_lists = [list(r["tokens"]) for r in toks.collect()]
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for ts in tok_lists:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n = sum(uni.values())
    want = sorted(
        (
            (w1, w2, c, round(math.log(c * float(n) / (uni[w1] * float(uni[w2]))), 6))
            for (w1, w2), c in big.items() if c >= 3
        ),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:20]
    assert got == want
    assert got, "fixture corpus should produce collocations at min_count=3"
