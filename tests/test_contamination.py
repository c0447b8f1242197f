"""Decontamination gates: brute-force Python oracle, short-doc inclusion,
and the broadcast/one-exchange plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.textops import ngram_contamination, reference_shingles
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text, tokens_column

CFG = TokenizerConfig(min_token_length=2)
N = 3


@pytest.fixture(scope="module")
def corpora(spark):
    train = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma something entirely different here"),
        (2, "no overlap with anything in the reference at all"),
        (3, "xy"),                       # < n tokens -> zero shingles
        (4, "delta epsilon zeta eta theta"),
    ]
    ref = [
        (100, "alpha beta gamma delta"),
        (101, "epsilon zeta eta"),
    ]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    rdf = spark.createDataFrame(ref, "doc_id long, text string")
    return train, ref, tdf, rdf


def brute(train, ref, n=N):
    def sh(text):
        toks = tokenize_text(text, CFG)
        return {
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
        }

    refset = set().union(*(sh(t) for _, t in ref)) if ref else set()
    return {
        d: (len(sh(t)), len(sh(t) & refset)) for d, t in train
    }


def test_matches_brute(spark, corpora):
    train, ref, tdf, rdf = corpora
    refs = reference_shingles(rdf, tokens_column(F.col("text"), CFG), n=N)
    got = {
        r["id"]: (r["n_ngrams"], r["n_contaminated"])
        for r in ngram_contamination(
            tdf, refs, tokens_column(F.col("text"), CFG), n=N
        ).collect()
    }
    assert got == brute(train, ref)
    assert got[3] == (0, 0)          # short doc present, not dropped
    assert got[0][1] > 0 and got[2][1] == 0


def test_plan_broadcasts_reference(spark, corpora):
    """The reference set must never shuffle: broadcast join + exactly one
    wide exchange (the per-doc groupBy)."""
    from contextlib import redirect_stdout
    import io

    _, _, tdf, rdf = corpora
    refs = reference_shingles(rdf, tokens_column(F.col("text"), CFG), n=N)
    df = ngram_contamination(tdf, refs, tokens_column(F.col("text"), CFG), n=N)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan  # map-side combine
