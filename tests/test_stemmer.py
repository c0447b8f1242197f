"""Snowball English (Porter2) stemmer gates.

Golden vectors follow the published algorithm description
(snowballstem.org/algorithms/english/stemmer.html): documented exceptional
forms, the step-1a stop list, and worked suffix-rule cases. The nltk
cross-check test auto-activates when nltk is importable (not in this
sandbox) — that is the full-vocabulary parity path.
"""

from __future__ import annotations

import pytest

from searchengine_spark.stemmer import stem_english
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

GOLDEN = {
    # exceptional forms / invariants (listed explicitly in the algorithm)
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes",
    # step-1a stop list
    "inning": "inning", "outing": "outing", "canning": "canning",
    "herring": "herring", "earring": "earring", "proceed": "proceed",
    "exceed": "exceed", "succeed": "succeed",
    "earrings": "earring",  # 1a s-removal then stop
    # 1a suffixes
    "caresses": "caress", "ponies": "poni", "cries": "cri",
    "ties": "tie", "dies": "die", "mules": "mule", "gas": "gas",
    # 1b + post-adjustments
    "agreed": "agre", "owned": "own", "meeting": "meet", "meetings": "meet",
    "sing": "sing", "running": "run", "hopping": "hop",
    "hoping": "hope", "hoped": "hope", "conflated": "conflat",
    # 1c + step 2
    "happily": "happili", "generously": "generous", "knightly": "knight",
    "conditional": "condit", "vietnamization": "vietnam",
    # short words / regions
    "by": "by", "on": "on", "a": "a", "": "",
    # y-handling
    "fly": "fli", "flies": "fli", "why": "whi", "say": "say",
    "yoyo": "yoyo",
    # published sample-vocabulary cases incl. the gener-/commun-/arsen-
    # R1 overrides and multi-step suffix chains
    "consign": "consign", "consigned": "consign", "consigning": "consign",
    "consignment": "consign", "consist": "consist", "consisted": "consist",
    "consistency": "consist", "consistent": "consist",
    "consistently": "consist", "consisting": "consist", "consists": "consist",
    "knack": "knack", "knackeries": "knackeri", "knacks": "knack",
    "generate": "generat", "generates": "generat", "generated": "generat",
    "general": "general", "generally": "general", "generic": "generic",
    "generous": "generous", "communism": "communism",
    "communities": "communiti", "community": "communiti",
    "arsenal": "arsenal", "arsenic": "arsenic",
}


@pytest.mark.parametrize("word,want", sorted(GOLDEN.items()))
def test_golden(word, want):
    assert stem_english(word) == want


def test_stems_are_stable_strings():
    # no crashes / surprising types on edge shapes
    for w in ("'", "''", "'s", "o'clock", "x" * 50, "aaaa", "yyyy"):
        s = stem_english(w)
        assert isinstance(s, str)
        assert "Y" not in s  # postlude always restores y


def test_tokenizer_stemming_path():
    cfg = TokenizerConfig(min_token_length=2, stem_lang="english")
    toks = tokenize_text("The ponies were running and hoping happily", cfg)
    assert toks == ["the", "poni", "were", "run", "and", "hope", "happili"]


def test_tokenizer_memo_consistency():
    cfg = TokenizerConfig(min_token_length=2, stem_lang="english")
    memo: dict = {}
    a = tokenize_text("running running runner", cfg, _memo=memo)
    b = tokenize_text("running runner", cfg, _memo=memo)
    assert a == ["run", "run", "runner"]
    assert b == ["run", "runner"]


def test_pandas_udf_matches_plain(spark):
    """Arrow pandas-UDF stemming path == plain-Python path, row for row."""
    from pyspark.sql import functions as F

    from searchengine_spark.tokenizer import tokenize_pandas_udf

    cfg = TokenizerConfig(min_token_length=2, stem_lang="english")
    texts = [
        "The ponies were running and hoping happily",
        "conditional generously knightly meetings agreed",
        "dying lying skies early only news",
        "tabs\there\tand\tmore\ttabs",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["toks"]
        for r in df.select(
            tokenize_pandas_udf(cfg)(F.col("text")).alias("toks")
        ).collect()
    ]
    want = [tokenize_text(t, cfg) for t in texts]
    assert got == want


def test_stemmed_index_end_to_end(spark):
    """Build + query a stemmed index: morphological variants of a planted
    phrase must hit the same postings."""
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.query.bm25 import bm25_topk

    cfg = TokenizerConfig(min_token_length=2, stem_lang="english")
    rows = [
        ("c0", 0, "the guitarist was running while singing loudly"),
        ("c0", 1, "completely unrelated text about databases"),
        ("c1", 0, "several runners run daily in the park"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    it = build_index(df, cfg)
    # query uses a DIFFERENT inflection; stemming unifies run/running/runners
    top = bm25_topk(it, "runs", cfg, k=3).collect()
    assert {r["doc_id"] for r in top} == {0, 2}


def test_nltk_parity_when_available():
    """Full parity vs nltk's SnowballStemmer — the reference's stemmer —
    whenever the environment provides it."""
    nltk = pytest.importorskip("nltk")
    from nltk.stem.snowball import SnowballStemmer

    try:
        ref = SnowballStemmer("english")
        ref.stem("test")
    except Exception:
        pytest.skip("nltk absent or stubbed (ref_oracle shim)")
    vocab = set(GOLDEN) | {
        "nationally", "rationalization", "traditional", "references",
        "referencing", "activated", "activation", "sensational",
        "possibilities", "flexibility", "authenticity", "dramatically",
        "hopefulness", "carelessly", "decisiveness", "communication",
        "generalization", "arsenic", "communism", "archaeology",
        "databases", "indexes", "queries", "tokenized", "stemming",
    }
    mism = {
        w: (stem_english(w), ref.stem(w))
        for w in sorted(vocab)
        if stem_english(w) != ref.stem(w)
    }
    assert not mism, mism
