"""match_phrase_prefix gates (query/phrase.py prefix functions).

Contract: the raw phrase's last word is a dictionary prefix (lowercased,
never analyzed); the prefix slot matches ANY of its df-top
max_expansions expansions at the final offset; occurrence counts equal
the sum over expansion variants (two variants can never share a start);
packed == exact == local, and a matchless prefix matches nothing.
"""

import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.build import build_index
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.phrase import (
    phrase_prefix_slots,
    phrase_prefix_topk_batch,
    phrase_prefix_topk_packed_batch,
    phrase_topk_packed_batch,
)
from searchengine_spark.query.wildcard import expand_patterns
from searchengine_spark.tokenizer import TokenizerConfig

ROWS = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=8)


@pytest.fixture(scope="module")
def pidx(spark, cfg, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pp") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=64, positional=True)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def it(spark, cfg, corpus):
    return build_index(corpus, cfg, positional=True)


def test_slots_parse(cfg):
    slots = phrase_prefix_slots(
        ["greatest rock ALB", "solo"], cfg,
        {"alb*": ["album", "albatross"], "solo*": ["solo"]})
    assert slots[0] == ["greatest", "rock", ["album", "albatross"]]
    assert slots[1] == [["solo"]]
    # matchless prefix -> poisoned query; empty phrase -> no slots
    s2 = phrase_prefix_slots(["rock zz"], cfg, {"zz*": []})
    assert s2[0] == ["rock", []]
    assert phrase_prefix_slots([" "], cfg, {})[0] == []


def test_prefix_equals_variant_union(spark, cfg, pidx):
    """n_occurrences == the per-variant phrase counts summed (variants
    can never share a start position)."""
    exp = expand_patterns(pidx.term_stats, ["alb*"], max_expansions=50)
    variants = exp["alb*"]
    assert len(variants) >= 1
    got = {r["doc_id"]: r["n_occurrences"] for r in
           phrase_prefix_topk_packed_batch(
               pidx, ["greatest rock alb"], cfg, k=None).collect()}
    assert got
    expect: dict = {}
    for v in variants:
        for r in phrase_topk_packed_batch(
                pidx, [f"greatest rock {v}"], cfg, k=None).collect():
            expect[r["doc_id"]] = expect.get(r["doc_id"], 0) + r["n_occurrences"]
    assert got == expect


def test_packed_equals_exact(spark, cfg, pidx, it):
    qs = ["greatest rock alb", "guitar so", "nonexistentprefix xx"]
    a = ROWS(phrase_prefix_topk_packed_batch(pidx, qs, cfg, k=10))
    b = ROWS(phrase_prefix_topk_batch(it, qs, cfg, k=10))
    assert a == b and len(a) > 0


def test_local_tier_parity(spark, cfg, pidx):
    from searchengine_spark.query.phrase import local_phrase_prefix
    from searchengine_spark.query.serve import LocalSearcher

    dist = ROWS(
        phrase_prefix_topk_packed_batch(pidx, ["greatest rock alb"], cfg,
                                        k=10))
    for preload in (True, False):
        local = LocalSearcher(pidx, preload=preload, cfg=cfg)
        rows = local_phrase_prefix(local, "greatest rock alb", k=10,
                                   resolve=False)
        got = sorted((0, r["doc_id"], r["n_occurrences"], r["first_pos"],
                      r["rank"]) for r in rows)
        assert got == dist, f"preload={preload}"


def test_single_word_prefix(spark, cfg, pidx):
    """A bare prefix phrase ranks docs by total expansion-term
    occurrences (slot 0 only)."""
    rows = phrase_prefix_topk_packed_batch(pidx, ["alb"], cfg, k=5).collect()
    assert rows and all(r["n_occurrences"] >= 1 for r in rows)


def test_matchless_and_empty(spark, cfg, pidx):
    assert ROWS(phrase_prefix_topk_packed_batch(
        pidx, ["greatest zzqq"], cfg, k=10)) == []
    assert ROWS(phrase_prefix_topk_packed_batch(pidx, [""], cfg, k=10)) == []


def test_expansion_cap_applies(spark, cfg, pidx):
    """cap=1 keeps only the df-top expansion term."""
    exp = expand_patterns(pidx.term_stats, ["s*"], max_expansions=1)
    top = exp["s*"][0]
    a = ROWS(phrase_prefix_topk_packed_batch(pidx, ["greatest s"], cfg,
                                             k=None, max_expansions=1))
    b = ROWS(phrase_topk_packed_batch(pidx, [f"greatest {top}"], cfg,
                                      k=None))
    assert a == b


def test_federated_equals_merged(spark, cfg, corpus, tmp_path):
    """2-shard federation == the single index over the concatenated
    corpus (global-dictionary expansion keeps shard selections coherent;
    conv-split shards preserve the docID order)."""
    from pyspark.sql import functions as F

    from searchengine_spark.query.federated import (
        phrase_prefix_topk_federated,
    )
    from searchengine_spark.query.serve import FederatedLocalSearcher

    convs = sorted(r["conv_id"] for r in
                   corpus.select("conv_id").distinct().collect())
    half = convs[: len(convs) // 2]
    shards = []
    for i, part in enumerate((half, convs[len(convs) // 2:])):
        p = str(tmp_path / f"s{i}")
        build_packed_index(corpus.filter(F.col("conv_id").isin(part)),
                           cfg, p, chunk_docs=64, positional=True)
        shards.append(load_packed_index(spark, p))
    single_p = str(tmp_path / "single")
    build_packed_index(corpus, cfg, single_p, chunk_docs=64,
                       positional=True)
    single = load_packed_index(spark, single_p)

    qs = ["greatest rock alb", "guitar so"]
    want = ROWS(phrase_prefix_topk_packed_batch(single, qs, cfg, k=10))
    fed = ROWS(phrase_prefix_topk_federated(shards, qs, cfg, k=10))
    assert fed == want and len(want) > 0

    floc = FederatedLocalSearcher(shards, preload=True, cfg=cfg)
    rows = floc.phrase_prefix("greatest rock alb", k=10, resolve=False)
    got = sorted((0, r["doc_id"], r["n_occurrences"], r["first_pos"],
                  r["rank"]) for r in rows)
    assert got == [w for w in want if w[0] == 0]
