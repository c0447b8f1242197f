"""Temperature-mixture gates (textops/dataset.py temperature_weights /
temperature_sample): the integer weight table matches an independent
Python replay at all three alphas, alpha ordering behaves (smaller
alpha flattens the mixture), the sample honors the nested-samples
property, and non-exact alphas are refused."""

from __future__ import annotations

import hashlib
import math

import pytest

from searchengine_spark.textops.dataset import (
    HASH_SPACE,
    temperature_sample,
    temperature_weights,
)

COUNTS = {"en": 700, "de": 200, "fr": 60, "zh": 40}


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    i = 0
    for lang, n in COUNTS.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _replay(alpha, target):
    s = {}
    for lang, n in COUNTS.items():
        if alpha == 1.0:
            s[lang] = n * 1_000_000
        elif alpha == 0.5:
            s[lang] = math.floor(math.sqrt(n) * 1_000_000.0)
        else:
            s[lang] = math.floor(math.sqrt(math.sqrt(n)) * 1_000_000.0)
    total = sum(s.values())
    out = {}
    for lang, n in COUNTS.items():
        w = s[lang] * 1_000_000 // total
        if target:
            rate = min(HASH_SPACE, (target * w // 1_000_000) * HASH_SPACE // n)
        else:
            rate = HASH_SPACE
        out[lang] = (n, w, rate)
    return out


@pytest.mark.parametrize("alpha,target", [(1.0, 0), (0.5, 300), (0.25, 300)])
def test_weights_match_replay(spark, docs, alpha, target):
    got = {r["stratum"]: (r["n_docs"], r["weight_micro"], r["rate_num"])
           for r in temperature_weights(docs, "lang", alpha, target).collect()}
    assert got == _replay(alpha, target)


def test_smaller_alpha_flattens(spark, docs):
    w1 = {r["stratum"]: r["weight_micro"]
          for r in temperature_weights(docs, "lang", 1.0).collect()}
    w25 = {r["stratum"]: r["weight_micro"]
           for r in temperature_weights(docs, "lang", 0.25).collect()}
    # rare stratum gains, dominant stratum loses
    assert w25["zh"] > w1["zh"] and w25["en"] < w1["en"]


def test_sample_nested_and_hash_rule(spark, docs):
    small = {r["doc_id"] for r in
             temperature_sample(docs, "lang", 0.5, 200, salt="t").collect()}
    big = {r["doc_id"] for r in
           temperature_sample(docs, "lang", 0.5, 600, salt="t").collect()}
    assert small <= big and small
    # membership follows the shared 16-bit md5 hash rule exactly
    rates = {r["stratum"]: r["rate_num"] for r in
             temperature_weights(docs, "lang", 0.5, 600).collect()}
    langs = {}
    i = 0
    for lang, n in COUNTS.items():
        for _ in range(n):
            langs[i] = lang
            i += 1
    for d, lang in langs.items():
        h = int(hashlib.md5(f"t|{d}".encode()).hexdigest()[:4], 16)
        assert (d in big) == (h % HASH_SPACE < rates[lang]), d


def test_inexact_alpha_refused(spark, docs):
    with pytest.raises(ValueError):
        temperature_weights(docs, "lang", 0.3)
    with pytest.raises(ValueError):
        temperature_weights(docs, "lang", 0.5, target_total=-1)
