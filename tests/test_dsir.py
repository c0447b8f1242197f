"""DSIR gates (textops/dsir.py): weights equal an independent Python
replica of the hashed-bigram importance formula (md5 bucket hash,
floor-quantized micro-nat logs, exact BIGINT combine), target-like docs
outrank off-target ones, and empty-token docs emit nothing."""

from __future__ import annotations

import hashlib
import math

import pytest

from searchengine_spark.textops import dsir_weights, hashed_feature_counts
from searchengine_spark.textops.dsir import DSIR_SALT, LN_SCALE
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

B = 64
CFG = TokenizerConfig(min_token_length=3)

TARGET = [
    "quantum physics lectures and quantum entanglement notes",
    "physics problem sets about entanglement and measurement",
    "lecture notes on quantum measurement theory",
]
RAW = [
    (0, "quantum entanglement measurement notes from the physics lecture"),
    (1, "cheap flights hotel deals best travel offers today"),
    (2, "physics lectures about quantum theory and notes"),
    (3, "buy cheap deals travel flights hotel booking offers"),
    (4, "a of an is to"),  # every token below min length -> no features
]


def _feats(text):
    toks = tokenize_text(text, CFG)
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(f):
    h = hashlib.md5(f"{DSIR_SALT}|{f}".encode()).hexdigest()[:4]
    return int(h, 16) % B


def _model(texts):
    counts: dict = {}
    for t in texts:
        for f in _feats(t):
            b = _bucket(f)
            counts[b] = counts.get(b, 0) + 1
    return counts


def _lp(c):
    return math.floor(math.log(c + 1) * LN_SCALE)


def test_weights_match_python_replica(spark):
    target = spark.createDataFrame([(t,) for t in TARGET], "text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tc = hashed_feature_counts(target, CFG, B)
    rc = hashed_feature_counts(raw, CFG, B)
    got = {r["doc_id"]: (r["n_features"], r["weight_micro"])
           for r in dsir_weights(raw, tc, rc, CFG, n_buckets=B).collect()}

    tm, rm = _model(TARGET), _model([t for _, t in RAW])
    # the Spark models hash identically
    assert {r["bucket"]: r["cnt"] for r in tc.collect()} == tm
    assert {r["bucket"]: r["cnt"] for r in rc.collect()} == rm
    nt, nr = sum(tm.values()), sum(rm.values())
    c_diff = (math.floor(math.log(nt + B) * LN_SCALE)
              - math.floor(math.log(nr + B) * LN_SCALE))
    want = {}
    for did, text in RAW:
        fs = _feats(text)
        if not fs:
            continue
        w = sum(_lp(tm.get(_bucket(f), 0)) - _lp(rm.get(_bucket(f), 0))
                for f in fs) - len(fs) * c_diff
        want[did] = (len(fs), w)
    assert got == want
    assert 4 not in got  # featureless doc emits nothing
    # target-like raw docs outrank the off-target ones
    assert min(got[0][1], got[2][1]) > max(got[1][1], got[3][1])


def test_bucket_bounds(spark):
    docs = spark.createDataFrame([(0, "alpha beta gamma")],
                                 "doc_id long, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_feature_counts(docs, CFG, 1)
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_feature_counts(docs, CFG, 1 << 17)
