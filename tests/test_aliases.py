"""Alias registry gates (indexing/aliases.py): set/resolve/remove
round-trip through fsio (URI-capable), atomic re-point (swap), filtered
aliases carry their predicate, dangling names fail loudly, and serving
through a filtered alias equals direct filtered retrieval."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.aliases import (
    alias_list,
    alias_remove,
    alias_resolve,
    alias_set,
    split_alias_arg,
)
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.wand import (
    bm25_topk_packed_batch,
    filter_doc_ids,
)
from searchengine_spark.tokenizer import TokenizerConfig


@pytest.fixture()
def registry(tmp_path):
    return f"file://{tmp_path}/aliases.json"


def test_roundtrip_swap_remove(spark, registry):
    assert alias_list(spark, registry) == {}
    alias_set(spark, registry, "prod", "/idx/v1")
    alias_set(spark, registry, "user-view", "/idx/v1", "role = 'user'")
    assert alias_resolve(spark, registry, "prod") == ("/idx/v1", None)
    assert alias_resolve(spark, registry, "user-view") == (
        "/idx/v1", "role = 'user'")
    alias_set(spark, registry, "prod", "/idx/v2")  # the swap action
    assert alias_resolve(spark, registry, "prod") == ("/idx/v2", None)
    assert sorted(alias_list(spark, registry)) == ["prod", "user-view"]
    alias_remove(spark, registry, "user-view")
    with pytest.raises(KeyError):
        alias_resolve(spark, registry, "user-view")
    with pytest.raises(KeyError):
        alias_remove(spark, registry, "nope")


def test_validation_and_split():
    assert split_alias_arg("alias:prod") == ("prod", True)
    assert split_alias_arg("/some/path") == ("/some/path", False)


def test_bad_names(spark, registry):
    with pytest.raises(ValueError):
        alias_set(spark, registry, "", "/idx")
    with pytest.raises(ValueError):
        alias_set(spark, registry, "alias:x", "/idx")


def test_filtered_alias_serving(spark, tmp_path, stop_words, registry):
    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words)
    corpus = transcripts_df(spark, n_conv=10, n_partitions=2)
    path = str(tmp_path / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=128)
    alias_set(spark, registry, "users", path, "role = 'user'")
    resolved, pred = alias_resolve(spark, registry, "users")
    pidx = load_packed_index(spark, resolved)
    via_alias = bm25_topk_packed_batch(
        pidx, ["rock album"], cfg, k=5, round_dp=6,
        doc_filter=filter_doc_ids(pidx, corpus, pred))
    direct = bm25_topk_packed_batch(
        pidx, ["rock album"], cfg, k=5, round_dp=6,
        doc_filter=filter_doc_ids(pidx, corpus, "role = 'user'"))
    assert sorted(map(tuple, via_alias.collect())) == \
        sorted(map(tuple, direct.collect()))
    assert via_alias.count() > 0
