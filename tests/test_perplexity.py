"""CCNet-style perplexity filter gates (textops/perplexity.py).

Contract: cross-entropy is add-one-smoothed unigram in EXACT integer
micro-nats (one floor-quantized ln per vocab term, BIGINT everywhere
after — partitioning/order invariant); OOV terms get lp=0 (max penalty)
with no special-casing; buckets are rank-exact thirds via the two-pass
global rank; the filter keeps exactly the named buckets.
"""

import math

import pytest

from searchengine_spark.textops.perplexity import (
    LN_SCALE,
    doc_cross_entropy,
    lm_totals,
    perplexity_buckets,
    perplexity_filter,
    train_unigram_lm,
)
from searchengine_spark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(min_token_length=2)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "aa aa aa bb"),       # fluent: common terms
        (1, "aa bb cc"),
        (2, "cc dd"),
        (3, "zz zz"),             # rare terms -> high ce
        (4, "aa aa aa aa aa"),    # most fluent
        (5, "x"),                 # tokenizes to nothing (min_len 2)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_reference(rows, score_rows):
    """From-scratch Python twin of the exact integer arithmetic."""
    counts: dict = {}
    for _, text in rows:
        for t in text.split():
            if len(t) >= 2:
                counts[t] = counts.get(t, 0) + 1
    n, v = sum(counts.values()), len(counts)
    den = math.floor(LN_SCALE * math.log(n + v + 1))
    out = {}
    for did, text in score_rows:
        toks = [t for t in text.split() if len(t) >= 2]
        if not toks:
            continue
        slp = sum(math.floor(LN_SCALE * math.log(counts.get(t, 0) + 1))
                  for t in toks)
        out[did] = (len(toks), (len(toks) * den - slp) // len(toks))
    return out


def test_cross_entropy_exact(spark, docs):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    lm = train_unigram_lm(docs, CFG)
    n, v = lm_totals(lm)
    assert (n, v) == (16, 5)  # aa:9 bb:2 cc:2 dd:1 zz:2 ('x' dropped)
    got = {r["doc_id"]: (r["n_tokens"], r["ce_micro"])
           for r in doc_cross_entropy(docs, lm, n, v, CFG).collect()}
    assert got == _py_reference(rows, rows)
    assert 5 not in got                      # token-less doc: no row
    assert got[4][1] < got[0][1] < got[3][1]  # fluency ordering


def test_oov_max_penalty(spark, docs):
    """Scoring a doc with unseen terms: lp=0 -> ce == ln(N+V+1) exactly."""
    lm = train_unigram_lm(docs, CFG)
    n, v = lm_totals(lm)
    target = spark.createDataFrame([(9, "qq ww")], "doc_id long, text string")
    got = doc_cross_entropy(target, lm, n, v, CFG).collect()[0]
    assert got["ce_micro"] == math.floor(LN_SCALE * math.log(n + v + 1))


def test_buckets_rank_exact(spark, docs):
    lm = train_unigram_lm(docs, CFG)
    n, v = lm_totals(lm)
    scored = doc_cross_entropy(docs, lm, n, v, CFG)
    got = {r["doc_id"]: r["bucket"]
           for r in perplexity_buckets(scored).collect()}
    # 5 scored docs: ranks 0-4 by (ce, id); 3r<5 -> head(0,1), 3r<10 ->
    # middle(2,3), else tail(4)
    ce = {r["doc_id"]: r["ce_micro"] for r in scored.collect()}
    order = sorted(ce, key=lambda d: (ce[d], d))
    expect = {d: ("head" if 3 * i < 5 else "middle" if 3 * i < 10 else "tail")
              for i, d in enumerate(order)}
    assert got == expect
    assert sorted(got.values()).count("head") == 2


def test_bucket_partitioning_invariance(spark, docs):
    """Same buckets at 1 and 8 input partitions (the two-pass rank is
    partitioning-independent)."""
    lm = train_unigram_lm(docs, CFG)
    n, v = lm_totals(lm)
    a = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(
        doc_cross_entropy(docs.coalesce(1), lm, n, v, CFG)).collect()}
    b = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(
        doc_cross_entropy(docs.repartition(8), lm, n, v, CFG)).collect()}
    assert a == b


def test_filter_composition(spark, docs):
    kept = perplexity_filter(docs, docs, CFG, keep=("head",))
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert len(ids) == 2
    assert set(kept.columns) >= {"doc_id", "text", "n_tokens", "ce_micro",
                                 "bucket"}
    with pytest.raises(ValueError, match="head/middle/tail"):
        perplexity_filter(docs, docs, CFG, keep=("best",))
