"""_analyze endpoint analog gates (query/analyze.py).

Contract: the token stream equals tokenize_text exactly (the parity
chain the whole engine rests on); position = index in the FILTERED
sequence (the positional payload's own semantics — documented
divergence from ES's stop-word gaps); offsets slice the punctuation-
translated lowered source back to the pre-stem token; the distributed
table pass equals the per-row driver path row for row.
"""

import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.query.analyze import analyze_table, analyze_text
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


def test_analyze_text_parity(cfg):
    text = "The GREATEST rock-album: guitar solos, & drums!!"
    got = analyze_text(text, cfg)
    assert [t["token"] for t in got] == tokenize_text(text, cfg)
    assert [t["position"] for t in got] == list(range(len(got)))
    # offsets slice the translated/lowered source back to the token
    from searchengine_spark.query.snippet import tokenize_with_spans

    _, src = tokenize_with_spans(text, cfg)
    for t in got:
        assert src[t["start_offset"]:t["end_offset"]].lower() == t["token"]
    assert analyze_text(None, cfg) == []
    assert analyze_text("", cfg) == []


def test_analyze_text_stemmed(stop_words):
    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words,
                          stem_lang="english")
    text = "running runners ran"
    got = analyze_text(text, cfg)
    assert [t["token"] for t in got] == tokenize_text(text, cfg)
    # offsets still span the SOURCE word, the token is the stem
    assert got[0]["token"] == "run"
    assert text[got[0]["start_offset"]:got[0]["end_offset"]] == "running"


def test_analyze_table_equals_driver_path(spark, cfg):
    corpus = transcripts_df(spark, n_conv=3)
    rows = analyze_table(corpus, cfg, text_col="text",
                         id_cols=("conv_id", "turn_idx")).collect()
    got = {}
    for r in rows:
        got.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            (r["position"], r["token"], r["start_offset"],
             r["end_offset"]))
    local = {}
    for r in corpus.select("conv_id", "turn_idx", "text").collect():
        toks = analyze_text(r["text"], cfg)
        if toks:
            local[(r["conv_id"], r["turn_idx"])] = [
                (t["position"], t["token"], t["start_offset"],
                 t["end_offset"]) for t in toks]
    for k in got:
        got[k].sort()
    assert got == local  # zero-token docs emit nothing on both paths


def test_analyze_table_validation(spark, cfg):
    corpus = transcripts_df(spark, n_conv=1)
    with pytest.raises(ValueError, match="lacks columns"):
        analyze_table(corpus, cfg, text_col="nope")
