"""ES fuzzy query gates (query/fuzzyquery.py): tilde parsing + AUTO
budgets, expansion selection vs a python brute, the scoring_boolean
equivalence (expanded fuzzy query == plain WAND with the union term
list), budget-0 passthrough, and the multi-token refusal."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.packed import (
    build_packed_index,
    load_packed_index,
)
from searchengine_spark.query.fuzzyquery import (
    bm25_fuzzyq_packed_batch,
    expand_fuzzy,
    parse_fuzzy_batch,
    split_fuzzy,
)
from searchengine_spark.tokenizer import TokenizerConfig


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def pidx(spark, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fq") / "idx")
    build_packed_index(transcripts_df(spark, n_conv=40), cfg, path,
                       chunk_docs=256)
    return load_packed_index(spark, path)


def test_split_and_parse(cfg):
    pos, specs = split_fuzzy("greatest rock~ albom~1 solo~2 plain")
    assert pos == "greatest plain"
    assert specs == [("rock", None), ("albom", 1), ("solo", 2)]
    pos_qs, per_q, uniq = parse_fuzzy_batch(
        ["greatest rock~ albom~1"], cfg)
    assert pos_qs == ["greatest"]
    # AUTO: 'rock' is 4 chars -> budget 1
    assert per_q == [[("rock", 1), ("albom", 1)]]
    assert set(uniq) == {("rock", 1), ("albom", 1)}
    with pytest.raises(ValueError, match="exactly one term"):
        parse_fuzzy_batch(["a.b~2"], cfg)


def test_budget_zero_passthrough(cfg):
    _, per_q, uniq = parse_fuzzy_batch(["rock~0"], cfg)
    assert per_q == [[("rock", 0)]]


def test_expand_selection_vs_brute(spark):
    d = spark.createDataFrame(
        [("table", 40), ("cable", 90), ("tale", 90), ("fable", 5),
         ("label", 2), ("zzz", 99)],
        "term string, df long",
    )
    exp = expand_fuzzy(d, [("table", 1), ("table", 2), ("qq", 0)],
                       max_expansions=3)
    # budget 1: exact first, then df desc, term asc; cap 3
    assert exp[("table", 1)] == ["table", "cable", "tale"]
    # budget 2: distance asc before df — d1 {cable, tale, fable} by df,
    # exact first; cap 3 cuts before any d2 term
    assert exp[("table", 2)] == ["table", "cable", "tale"]
    assert exp[("qq", 0)] == ["qq"]


def test_scoring_boolean_equivalence(spark, pidx, cfg):
    """The fuzzy query scores EXACTLY like plain WAND fed the expanded
    union term list (weight-1 scoring_boolean rewrite)."""
    from searchengine_spark.query.fuzzyquery import (
        expand_fuzzy as ef,
        fuzzy_query_terms,
        parse_fuzzy_batch as pfb,
    )
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    raw = ["greatest albom~1 rock", "guitr~2 solo"]
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_fuzzyq_packed_batch(
            pidx, raw, cfg, k=10, round_dp=6).collect()
    }
    pos, per_q, uniq = pfb(raw, cfg)
    terms = fuzzy_query_terms(pos, cfg, ef(pidx.term_stats, uniq), per_q)
    want = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk_packed_batch(
            pidx, pos, cfg, k=10, round_dp=6, query_terms=terms).collect()
    }
    assert got == want and got


def test_fuzzy_word_actually_widens(spark, pidx, cfg):
    """'albom~1' must retrieve album docs an exact 'albom' query cannot."""
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    exact = bm25_topk_packed_batch(pidx, ["albom"], cfg, k=10).count()
    fuzzy = bm25_fuzzyq_packed_batch(pidx, ["albom~1"], cfg, k=10).count()
    assert exact == 0 and fuzzy > 0


def test_no_neighbor_contributes_nothing(spark, pidx, cfg):
    out = bm25_fuzzyq_packed_batch(
        pidx, ["greatest zzzzqqqq~1"], cfg, k=5, round_dp=6)
    base = bm25_fuzzyq_packed_batch(pidx, ["greatest"], cfg, k=5,
                                    round_dp=6)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, base.collect()))
    assert a == b and a
