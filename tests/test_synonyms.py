"""Query-time synonym expansion gates (query/synonyms.py).

Contract: rules normalize through the SAME tokenize chain as queries;
expansion preserves the unique-terms quirk; weight-1.0 expansion is
bit-identical to typing the expanded query; explicit query terms are
never down-weighted; the federated path expands identically.
"""

import pyspark.sql.functions as F
import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.synonyms import (
    expand_query_terms,
    normalize_synonyms,
    parse_synonyms,
)
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


def test_parse_synonyms():
    text = """
# dictionary
guitar => axe, six-string
drums: percussion
guitar => strat          # later rules EXTEND
"""
    got = parse_synonyms(text)
    assert got == {"guitar": ["axe", "six-string", "strat"],
                   "drums": ["percussion"]}
    with pytest.raises(ValueError, match="expected"):
        parse_synonyms("guitar axe")
    with pytest.raises(ValueError, match="empty left-hand"):
        parse_synonyms("=> axe")


def test_normalize_synonyms(cfg):
    """Both sides ride the query tokenize chain: stop-word/short LHS
    rules drop (can never match a query term), short/stop RHS entries
    drop, multi-token RHS entries contribute every token, phrase LHS is
    a loud error, self-synonyms vanish."""
    norm = normalize_synonyms(
        {
            "Guitar": ["Axe", "ax", "the", "bass guitar", "guitar"],
            "the": ["whatever"],     # LHS is a stop word -> dropped
            "ox": ["something"],     # LHS too short -> dropped
            "drums": ["the", "ox"],  # every RHS drops -> rule dropped
        },
        cfg,
    )
    assert norm == {"guitar": ["axe", "bass"]}
    with pytest.raises(ValueError, match="phrase"):
        normalize_synonyms({"bass guitar": ["axe"]}, cfg)


def test_expand_query_terms(cfg):
    terms, weights = expand_query_terms(
        ["guitar solo guitar", "bass"], cfg,
        {"guitar": ["axe", "solo"]}, weight=0.5,
    )
    # unique-terms quirk kept; 'solo' is an ORIGINAL term -> stays 1.0
    assert terms == [["guitar", "solo", "axe"], ["bass"]]
    assert weights == {0: {"axe": 0.5}}
    # weight 1.0 -> no weight map entries at all
    terms1, weights1 = expand_query_terms(
        ["guitar"], cfg, {"guitar": ["axe"]}, weight=1.0)
    assert terms1 == [["guitar", "axe"]]
    assert weights1 == {}


def test_weight1_equals_expanded_query(spark, cfg, tmp_path):
    """Expansion at weight 1.0 == typing the expanded query: the ES
    equal-footing synonym contract, bit for bit through the packed WAND
    path (and non-trivially different from the unexpanded ranking)."""
    corpus = transcripts_df(spark, n_conv=8)
    path = str(tmp_path / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=64)
    pidx = load_packed_index(spark, path)

    rules = {"guitar": ["drummer"], "album": ["vinyl"]}
    queries = ["guitar solo", "greatest album"]
    terms, weights = expand_query_terms(queries, cfg, rules, weight=1.0)
    assert weights == {}
    exp = bm25_topk_packed_batch(
        pidx, queries, cfg, k=10, round_dp=6,
        query_terms=terms, term_weights=None,
    )
    typed = bm25_topk_packed_batch(
        pidx, ["guitar solo drummer", "greatest album vinyl"], cfg,
        k=10, round_dp=6,
    )
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    got = rows(exp)
    assert got == rows(typed)
    assert len(got) > 0
    plain = bm25_topk_packed_batch(pidx, queries, cfg, k=10, round_dp=6)
    assert got != rows(plain)


def test_federated_expansion_equals_single(spark, cfg, tmp_path):
    """A single-shard federation with synonym expansion is bit-identical
    to the plain packed path with the same expansion (the weighted-term
    seam federates through query_terms/term_weights)."""
    from searchengine_spark.query.federated import bm25_topk_federated

    corpus = transcripts_df(spark, n_conv=8)
    path = str(tmp_path / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=64)
    pidx = load_packed_index(spark, path)

    queries = ["guitar solo"]
    terms, weights = expand_query_terms(
        queries, cfg, {"guitar": ["drummer"]}, weight=0.25)
    plain = bm25_topk_packed_batch(
        pidx, queries, cfg, k=10, round_dp=6,
        query_terms=terms, term_weights=weights,
    )
    fed = bm25_topk_federated(
        [pidx], queries, cfg, k=10, round_dp=6,
        query_terms=terms, term_weights=weights,
    )
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    got = rows(fed)
    assert got == rows(plain)
    assert len(got) > 0
