"""Snippet extraction gates: offset-tokenizer parity with tokenize_text,
handcrafted snippet windows, distributed table == per-row function, and
lo/hi consistency with the index-side minimal-span operator."""

from __future__ import annotations

import pytest

from searchengine_spark.query.snippet import (
    extract_snippet,
    snippets_table,
    tokenize_with_spans,
)
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

ADVERSARIAL = [
    "Hello, world! This is a test.",
    "tabs\tand\nnewlines\t\teverywhere",
    "punct!!!only???",
    "",
    "  leading and trailing  ",
    "MiXeD CaSe WoRdS",
    "a b c single chars",
    "hyphen-ated and under_scored tokens",
]


@pytest.mark.parametrize("cfg", [
    TokenizerConfig(),
    TokenizerConfig(min_token_length=3),
    TokenizerConfig(min_token_length=2, stop_words=frozenset({"and", "is"})),
    TokenizerConfig(min_token_length=2, stem_lang="english"),
])
@pytest.mark.parametrize("text", ADVERSARIAL)
def test_spans_tokens_match_tokenize_text(cfg, text):
    kept, src = tokenize_with_spans(text, cfg)
    assert [t for t, _, _ in kept] == tokenize_text(text, cfg)
    # spans index the display source and cover the pre-stem surface form:
    # punct-translated + lowered surface == the token (== its stem source
    # under stem_lang) — a wrong offset highlights the wrong text
    from searchengine_spark.stemmer import stem_english

    for t, s, e in kept:
        surf = src[s:e].translate(
            str.maketrans({c: " " for c in "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"})
        ).lower()
        if cfg.stem_lang is None:
            assert surf == t, (t, src[s:e])
        else:
            assert stem_english(surf) == t, (t, src[s:e])
        assert e > s and 0 <= s < len(src) + 1


def test_extract_snippet_core_window():
    cfg = TokenizerConfig(min_token_length=2, stop_words=frozenset({"the"}))
    text = "first filler words then the MERGE phase meets the SORT phase at last"
    sn = extract_snippet(text, "merge sort", cfg, pad_tokens=1)
    assert sn is not None
    # filtered stream: first filler words then merge phase meets sort ...
    assert sn["span_len"] == 4  # merge phase meets sort
    assert "MERGE" in sn["snippet"] and "SORT" in sn["snippet"]
    assert text[sn["char_start"]:sn["char_end"]] == sn["snippet"]


def test_extract_snippet_absent_term():
    cfg = TokenizerConfig(min_token_length=2)
    assert extract_snippet("some text here", "missing term", cfg) is None
    assert extract_snippet("", "query", cfg) is None
    assert extract_snippet("some text", "", cfg) is None


def test_extract_snippet_max_chars_trims_padding_not_core():
    cfg = TokenizerConfig(min_token_length=2)
    text = ("aaaa " * 20) + "alpha beta" + (" zzzz" * 20)
    sn = extract_snippet(text, "alpha beta", cfg, max_chars=12, pad_tokens=5)
    assert sn["snippet"] == "alpha beta"  # padding trimmed, core intact


def test_snippets_table_matches_function(spark):
    cfg = TokenizerConfig(min_token_length=2, stop_words=frozenset({"the"}))
    rows = [
        (0, "the merge phase meets the sort phase"),
        (1, "sort first then merge later"),
        (2, "no relevant terms at all"),
        (3, "merge merge sort"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["span_len"], r["lo"], r["hi"], r["snippet"])
        for r in snippets_table(docs, "merge sort", cfg).collect()
    }
    want = {}
    for d, text in rows:
        sn = extract_snippet(text, "merge sort", cfg)
        if sn is not None:
            want[d] = (sn["span_len"], sn["lo"], sn["hi"], sn["snippet"])
    assert got == want and 2 not in got and len(got) == 3


def test_null_text_rows_skipped(spark):
    cfg = TokenizerConfig(min_token_length=2)
    docs = spark.createDataFrame(
        [(0, "merge sort here"), (1, None)], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in snippets_table(docs, "merge sort", cfg).collect()}
    assert got == {0}
    assert extract_snippet(None, "merge sort", cfg) is None


def test_snippet_lo_hi_match_index_minspan(spark):
    """The text-side span must agree with the index-side operator: same
    tokenizer, same positions, same minimal window."""
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.query.spans import minspan_topk_batch

    cfg = TokenizerConfig(min_token_length=2, stop_words=frozenset({"the"}))
    rows = [
        ("c0", 0, "the quick brown fox jumps over the lazy dog quick"),
        ("c0", 1, "dog days and quick fixes for the dog"),
        ("c0", 2, "nothing matching here"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    it = build_index(df, cfg, positional=True)
    idx_rows = {
        r["doc_id"]: (r["span_len"], r["lo"], r["hi"])
        for r in minspan_topk_batch(it, ["quick dog"], cfg, k=None).collect()
    }
    for (conv, ti, text), doc_id in zip(rows, range(3)):
        sn = extract_snippet(text, "quick dog", cfg)
        if doc_id in idx_rows:
            assert sn is not None
            assert (sn["span_len"], sn["lo"], sn["hi"]) == idx_rows[doc_id]
        else:
            assert sn is None
