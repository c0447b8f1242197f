"""Highlight gates (query/highlight.py): handcrafted tag placement,
stemming/stop-word behavior through the analyzed chain, the regex-oracle
equivalence property on clean text (and the documented underscore
divergence), and the distributed table == kernel parity."""

from __future__ import annotations

import random
import re

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import build_index
from searchengine_spark.query.bm25 import bm25_topk_batch
from searchengine_spark.query.highlight import highlight_results, highlight_text
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

CFG = TokenizerConfig(min_token_length=2)


def test_handcrafted_tags_and_case():
    hl, n = highlight_text("Rock and roll ROCK-star", ["rock"], CFG)
    assert hl == "<em>Rock</em> and roll <em>ROCK</em>-star"
    assert n == 2


def test_custom_tags_and_no_match():
    hl, n = highlight_text("nothing here", ["zzz"], CFG, pre="[", post="]")
    assert hl is None and n == 0
    hl, n = highlight_text("a zzz b", ["zzz"], CFG, pre="[", post="]")
    assert hl == "a [zzz] b" and n == 1


def test_subword_never_matches():
    hl, n = highlight_text("rock rocks rocked", ["rock"], CFG)
    assert hl == "<em>rock</em> rocks rocked" and n == 1


def test_stemmed_chain_highlights_inflections():
    cfg = TokenizerConfig(min_token_length=2, stem_lang="english")
    terms = list(dict.fromkeys(tokenize_text("run", cfg)))
    hl, n = highlight_text("running runs rune", terms, cfg)
    # 'running'/'runs' stem to 'run'; 'rune' stems to 'rune'
    assert hl == "<em>running</em> <em>runs</em> rune" and n == 2


def test_stop_words_never_highlight():
    cfg = TokenizerConfig(min_token_length=2, stop_words=frozenset({"the"}))
    hl, n = highlight_text("the rock the", ["the", "rock"], cfg)
    assert hl == "the <em>rock</em> the" and n == 1


def test_min_length_filter_applies():
    hl, n = highlight_text("a ab abc", ["a", "ab", "abc"],
                           TokenizerConfig(min_token_length=3))
    assert hl == "a ab <em>abc</em>" and n == 1


WORDS = ["rock", "roll", "scan", "scans", "merge", "big", "db", "x9", "beat"]


def test_regex_oracle_equivalence_on_clean_text():
    """On [A-Za-z0-9 ]+punctuation text the analyzed highlight equals the
    word-boundary regex replace the DuckDB oracle runs (module
    docstring)."""
    rng = random.Random(20260822)
    puncts = [" ", ", ", ". ", "; ", " - ", "! "]
    for _ in range(200):
        words = [rng.choice(WORDS) for _ in range(rng.randint(1, 12))]
        text = ""
        for w in words:
            text += (w.upper() if rng.random() < 0.2 else w)
            text += rng.choice(puncts)
        terms = sorted({rng.choice(WORDS) for _ in range(rng.randint(1, 3))})
        pat = re.compile(
            r"(?i)\b(" + "|".join(sorted(terms, key=len, reverse=True))
            + r")\b")
        want = pat.sub(lambda m: f"<em>{m.group(0)}</em>", text)
        n_want = len(pat.findall(text))
        hl, n = highlight_text(text, terms, CFG)
        if n_want == 0:
            assert hl is None and n == 0, (text, terms)
        else:
            assert hl == want and n == n_want, (text, terms)


def test_underscore_is_the_documented_oracle_divergence():
    """'_' is punctuation to the tokenizer (a_b -> tokens a, b at min=1)
    but a word char to \\b — the oracle approximation's known limit."""
    cfg = TokenizerConfig(min_token_length=2)
    hl, n = highlight_text("ab_cd", ["ab"], cfg)
    assert hl == "<em>ab</em>_cd" and n == 1  # analyzed: matches
    assert re.search(r"\bab\b", "ab_cd") is None  # regex: would not


def test_distributed_equals_kernel(spark, stop_words):
    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words)
    corpus = transcripts_df(spark, n_conv=20, n_partitions=4)
    it = build_index(corpus, cfg).cache()
    queries = ["greatest rock album", "guitar solo"]
    hits = bm25_topk_batch(it, queries, cfg, k=5)
    docs = it.docs.select("doc_id", "text")
    out = highlight_results(hits, docs, queries, cfg)
    rows = out.collect()
    assert rows
    text_by_doc = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows:
        terms = list(dict.fromkeys(tokenize_text(queries[r["query_id"]], cfg)))
        hl, n = highlight_text(text_by_doc[r["doc_id"]], terms, cfg)
        assert (r["highlighted"], r["n_matches"]) == (hl, n)
        assert "<em>" in r["highlighted"]
    # every hit highlighted (OR retrieval guarantees >= 1 matched term)
    assert len(rows) == hits.count()
