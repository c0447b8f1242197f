"""Scale-wiring gates for the dedup family (VERDICT r01 item 5):
hot-bucket cap, candidate-routed Jaccard, simhash hamming<=k banding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.textops import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_table,
)
from searchengine_spark.tokenizer import TokenizerConfig, tokens_column

CFG = TokenizerConfig(min_token_length=2)


def _toks():
    return tokens_column(F.col("text"), CFG)


def test_hot_bucket_cap_bounds_pairs(spark):
    """A boilerplate bucket of 20 identical docs must generate pairs only
    among the cap lowest ids — C(8,2)=28 pairs, not C(20,2)=190."""
    docs = spark.createDataFrame(
        [(i, "identical boilerplate legal disclaimer text repeated verbatim")
         for i in range(20)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(docs, _toks(), bucket_cap=8).collect()
    assert len(pairs) == 28
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert ids == set(range(8))
    # uncapped: the full quadratic set (verification mode)
    assert minhash_lsh_candidates(docs, _toks(), bucket_cap=None).count() == 190


def test_jaccard_on_candidates_restricts_pairs(spark):
    """candidates= routes intersection through the given pairs: results are
    exactly the all-pairs results restricted to the candidate set."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy cat again and again"),
        (3, "completely unrelated text about database query optimizers"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    allp = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, _toks(), threshold=0.1).collect()
    }
    cand = spark.createDataFrame([(0, 1), (2, 3)], "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, _toks(), threshold=0.1, candidates=cand
        ).collect()
    }
    assert got == {(0, 1): allp[(0, 1)]}  # (2,3) shares nothing; (0,2) not a candidate
    assert allp[(0, 1)] == 1.0


def test_simhash_near_pairs_hamming(spark):
    """Identical docs -> hamming 0; one-word-changed doc -> small hamming
    found through the 4x16 band join (pigeonhole guarantees <=3 coverage)."""
    base = "rock album review with many detailed words about the band sound"
    rows = [
        (0, base),
        (1, base),
        (2, base.replace("sound", "noise")),
        (3, "entirely different content on tax law and accounting rules"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = simhash_table(docs, _toks(), id_col="doc_id")
    near = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_near_pairs(sigs, max_hamming=3).collect()}
    assert near[(0, 1)] == 0
    assert (0, 3) not in near and (1, 3) not in near
    with pytest.raises(ValueError):
        simhash_near_pairs(sigs, max_hamming=4)
