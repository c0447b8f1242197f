"""Wildcard term query gates (query/wildcard.py).

Contract: patterns parse on the RAW query and match the normalized
dictionary (never analyzed themselves); expansion is df-desc/term-asc
capped at max_expansions and identical across the Spark scan, the
in-memory dictionary, and the federation-global dictionary; the
scoring_boolean rewrite (expansion == typing the matched terms) is bit
exact through the packed WAND path; leading wildcards are refused
unless opted in.
"""

import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.query.wildcard import (
    bm25_wildcard_federated,
    bm25_wildcard_packed_batch,
    expand_patterns,
    expand_patterns_local,
    pattern_like,
    pattern_prefix,
    pattern_regex,
    split_wildcards,
    wildcard_query_terms,
)
from searchengine_spark.tokenizer import TokenizerConfig

ROWS = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def pidx(spark, cfg, tmp_path_factory):
    corpus = transcripts_df(spark, n_conv=8)
    path = str(tmp_path_factory.mktemp("wild") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=64)
    return load_packed_index(spark, path)


def test_split_wildcards():
    assert split_wildcards("GUI* solo te?t") == ("solo", ["gui*", "te?t"])
    # bare * / ? are punctuation, not patterns (tokenize chain drops them)
    assert split_wildcards("a * b ?") == ("a * b ?", [])
    assert split_wildcards("plain query") == ("plain query", [])


def test_pattern_translations():
    assert pattern_prefix("gui*") == "gui"
    assert pattern_prefix("g?i*") == "g"
    assert pattern_prefix("*ism") == ""
    assert pattern_regex("gui*") == "^gui.*$"
    assert pattern_regex("te?t") == "^te.t$"
    # non-alnum literals escape for BOTH Python re and Java Pattern
    assert pattern_regex("a.b*") == "^a\\.b.*$"
    assert pattern_like("gui*") == "gui%"
    assert pattern_like("te?t") == "te_t"
    # literal LIKE metachars escape with backslash (pair with ESCAPE '\\')
    assert pattern_like("100%*") == "100\\%%"
    assert pattern_like("a_b?") == "a\\_b_"


def test_expand_patterns_spark_equals_local(pidx):
    """The pushed-prefix Spark scan and the in-memory dictionary produce
    the identical df-desc/term-asc capped expansion."""
    stats = {r["term"]: int(r["df"])
             for r in pidx.term_stats.select("term", "df").collect()}
    pats = ["gui*", "dru*", "s?lo", "zzz*"]
    got_spark = expand_patterns(pidx.term_stats, pats, max_expansions=5)
    got_local = expand_patterns_local(stats, pats, max_expansions=5)
    assert got_spark == got_local
    assert "guitar" in got_spark["gui*"]
    assert got_spark["zzz*"] == []          # matchless pattern -> empty
    assert got_spark["s?lo"] == ["solo"]    # ? = exactly one char
    for terms in got_spark.values():
        assert len(terms) <= 5
    # cap keeps the HIGHEST-df match, deterministically
    top1 = expand_patterns_local(stats, ["gui*"], max_expansions=1)["gui*"]
    full = expand_patterns_local(stats, ["gui*"], max_expansions=50)["gui*"]
    assert top1 == full[:1]
    assert full == sorted(full, key=lambda t: (-stats[t], t))


def test_leading_wildcard_guard(pidx):
    with pytest.raises(ValueError, match="leading wildcard"):
        expand_patterns(pidx.term_stats, ["*tar"])
    with pytest.raises(ValueError, match="leading wildcard"):
        expand_patterns_local({"guitar": 3}, ["?uitar"])
    got = expand_patterns_local({"guitar": 3}, ["*tar"],
                                allow_leading_wildcard=True)
    assert got == {"*tar": ["guitar"]}
    with pytest.raises(ValueError, match="no wildcard"):
        expand_patterns_local({"guitar": 3}, ["guitar"])


def test_dead_terms_never_expand():
    assert expand_patterns_local({"guitar": 0, "guide": 2}, ["gui*"]) == {
        "gui*": ["guide"]
    }


def test_scoring_boolean_rewrite_exact(pidx, cfg):
    """Wildcard retrieval == typing the expansion terms yourself, bit
    for bit (Lucene scoring_boolean rewrite), and differs from the
    pattern-less query."""
    exp = expand_patterns(pidx.term_stats, ["gui*"], max_expansions=50)
    typed_q = "solo " + " ".join(exp["gui*"])
    wild = bm25_wildcard_packed_batch(pidx, ["solo gui*"], cfg, k=10,
                                      round_dp=6)
    typed = bm25_topk_packed_batch(pidx, [typed_q], cfg, k=10, round_dp=6)
    got = ROWS(wild)
    assert got == ROWS(typed)
    assert len(got) > 0
    plain = bm25_topk_packed_batch(pidx, ["solo"], cfg, k=10, round_dp=6)
    assert got != ROWS(plain)


def test_matchless_and_pure_pattern_queries(pidx, cfg):
    # a matchless pattern contributes nothing (OR semantics)
    wild = bm25_wildcard_packed_batch(pidx, ["solo zzz*"], cfg, k=10,
                                      round_dp=6)
    plain = bm25_topk_packed_batch(pidx, ["solo"], cfg, k=10, round_dp=6)
    assert ROWS(wild) == ROWS(plain)
    # a query of ONLY matchless patterns returns nothing
    assert ROWS(bm25_wildcard_packed_batch(pidx, ["zzz*"], cfg, k=10)) == []
    # a pure-pattern query with matches retrieves
    assert len(ROWS(bm25_wildcard_packed_batch(pidx, ["gui*"], cfg, k=10))) > 0


def test_wildcard_query_terms_dedup(cfg):
    """Expansions already present as explicit terms add nothing (the
    unique-terms quirk holds through expansion)."""
    terms = wildcard_query_terms(
        ["guitar solo"], cfg, {"gui*": ["guitar", "guide"]}, [["gui*"]])
    assert terms == [["guitar", "solo", "guide"]]
    with pytest.raises(KeyError, match="not expanded"):
        wildcard_query_terms(["solo"], cfg, {}, [["gui*"]])


def test_local_tier_parity(pidx, cfg):
    """LocalSearcher wildcard (preload AND lazy) == the distributed
    packed batch, row for row."""
    from searchengine_spark.query.serve import LocalSearcher

    dist = ROWS(bm25_wildcard_packed_batch(pidx, ["solo gui*"], cfg, k=10,
                                           round_dp=6))
    for preload in (True, False):
        local = LocalSearcher(pidx, preload=preload, cfg=cfg)
        rows = local.search("solo gui*", k=10, round_dp=6, wildcard=True,
                            resolve=False)
        got = sorted((0, r["doc_id"], r["score"], r["rank"]) for r in rows)
        assert got == dist, f"preload={preload}"


def test_local_tier_refusals(pidx, cfg):
    from searchengine_spark.query.serve import LocalSearcher

    local = LocalSearcher(pidx, preload=True, cfg=cfg)
    with pytest.raises(NotImplementedError, match="wildcard"):
        local.search("gui*", ranker="bm25_and", wildcard=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        local.search("gui*", wildcard=True, query_tokens=["guitar"])
    with pytest.raises(ValueError, match="leading wildcard"):
        local.search("*tar", wildcard=True)
    # boolean_or wildcard: set union over the expansion
    rows = local.search("gui*", ranker="boolean_or", wildcard=True,
                        resolve=False)
    assert len(rows) > 0


def test_federated_parity(spark, pidx, cfg, tmp_path):
    """Single-shard federation wildcard == plain packed wildcard, on both
    the distributed and the in-process federated tiers."""
    from searchengine_spark.query.serve import FederatedLocalSearcher

    dist = ROWS(bm25_wildcard_packed_batch(pidx, ["solo gui*"], cfg, k=10,
                                           round_dp=6))
    fed = ROWS(bm25_wildcard_federated([pidx], ["solo gui*"], cfg, k=10,
                                       round_dp=6))
    assert fed == dist
    floc = FederatedLocalSearcher([pidx], preload=True, cfg=cfg)
    rows = floc.search("solo gui*", k=10, round_dp=6, wildcard=True,
                       resolve=False)
    got = sorted((0, r["doc_id"], r["score"], r["rank"]) for r in rows)
    assert got == dist
