"""Regression gates for the round-2 ADVICE findings.

1. append_batch must REFUSE payload='boolean' indexes (it would silently
   corrupt doc-gap decode). tfidf_sidecar and payload='tfidf' indexes were
   refused in round 2 and are SUPPORTED since round 3 (per-epoch
   doc_norms / baked epoch weights).
2. the with_doc_ids internal persist must actually be RELEASED by every
   caller (it used to be a silent no-op: the handle lived on the exact
   DataFrame object with_doc_ids returned and withColumn/select derivations
   dropped it — a per-build / per-micro-batch executor-storage leak).
3. TokenizerConfig.from_manifest must fail loudly on pre-round-2 manifests
   that record a stop-word COUNT but no list (silently rebuilding a
   stop-word-free tokenizer skews query vs build tokenization).
"""

from __future__ import annotations

import datetime as dt

import pytest

from searchengine_spark.fixtures.transcripts import TRANSCRIPTS_SCHEMA, transcripts_df
from searchengine_spark.indexing.build import Bm25Params, build_index
from searchengine_spark.indexing.packed import build_packed_index
from searchengine_spark.streaming.incremental import append_batch
from searchengine_spark.tokenizer import TokenizerConfig

PARAMS = Bm25Params(1.2, 0.75)
CFG = TokenizerConfig(min_token_length=3)


def _batch(spark):
    rows = [
        ("zzconv", i, "user", f"appended words number {i}", None,
         dt.datetime(2026, 3, 1, 0, 0, i))
        for i in range(3)
    ]
    return spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)


def _n_persistent(spark) -> int:
    # materialized persisted RDDs (cached DataFrames appear here once a job
    # has actually computed them — true for the with_doc_ids internal
    # persist, whose counts are collected during the build)
    return spark.sparkContext._jsc.getPersistentRDDs().size()


# The round-2 ADVICE refusal matrix is fully superseded: appends into
# tfidf_sidecar, payload='tfidf', positional AND payload='boolean' indexes
# are all SUPPORTED since round 3 and gated in tests/test_streaming.py
# (per-epoch doc_norms / baked epoch weights / position deltas / doc gaps).


def test_packed_build_releases_docid_persist(spark, tmp_path):
    before = _n_persistent(spark)
    build_packed_index(
        transcripts_df(spark, n_conv=8), CFG, str(tmp_path / "idx"),
        params=PARAMS, chunk_docs=64,
    )
    assert _n_persistent(spark) == before


def test_append_batch_releases_docid_persist(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_packed_index(
        transcripts_df(spark, n_conv=8), CFG, idx, params=PARAMS, chunk_docs=64
    )
    before = _n_persistent(spark)
    append_batch(_batch(spark), idx, CFG, batch_id=0)
    assert _n_persistent(spark) == before


def test_index_tables_unpersist_releases_docid_persist(spark):
    before = _n_persistent(spark)
    tables = build_index(transcripts_df(spark, n_conv=8), CFG)
    tables.index.count()  # materialize the cache() marks too
    assert _n_persistent(spark) > before  # the build really does persist
    tables.unpersist()
    assert _n_persistent(spark) == before


def test_from_manifest_rejects_count_only_stop_words():
    with pytest.raises(ValueError, match="n_stop_words"):
        TokenizerConfig.from_manifest(
            {"min_token_length": 3, "n_stop_words": 570, "stop_words": None}
        )
    # modern manifests (full list) and stop-word-free ones still load
    assert TokenizerConfig.from_manifest(
        {"min_token_length": 3, "n_stop_words": 0, "stop_words": None}
    ).stop_words is None
    got = TokenizerConfig.from_manifest(
        {"min_token_length": 3, "n_stop_words": 2, "stop_words": ["a", "the"]}
    )
    assert got.stop_words == frozenset({"a", "the"})
