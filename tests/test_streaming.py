"""Streaming incremental-append gates (availableNow + checkpoint)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import TRANSCRIPTS_SCHEMA, transcripts_df
from searchengine_spark.indexing.build import Bm25Params
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.wand import bm25_topk_packed_batch, resolve_docs
from searchengine_spark.streaming import stream_append
from searchengine_spark.tokenizer import TokenizerConfig

PARAMS = Bm25Params(1.2, 0.75)
PHRASE = "zxqv wvutter blorptastic"  # appended-only vocabulary


@pytest.fixture(scope="module")
def cfg():
    return TokenizerConfig(min_token_length=3)


@pytest.fixture(scope="module")
def built(spark, cfg, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    idx = str(base / "idx")
    build_packed_index(
        transcripts_df(spark, n_conv=40), cfg, idx, params=PARAMS, chunk_docs=256
    )
    n0 = json.load(open(os.path.join(idx, "manifest.json")))["n_docs"]

    newdir = str(base / "incoming")
    rows = [
        ("zconv1", i, "user", f"{PHRASE} extra words here {i}", None,
         dt.datetime(2026, 2, 1, 0, 0, i))
        for i in range(5)
    ]
    spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(newdir)

    stream_append(spark, newdir, idx, cfg)
    return idx, n0, newdir


def test_append_updates_counts(spark, built):
    idx, n0, _ = built
    m = json.load(open(os.path.join(idx, "manifest.json")))
    assert m["n_docs"] == n0 + 5
    assert len(m["appends"]) == 1
    assert m["appends"][0]["n_new"] == 5
    assert m["appends"][0]["batch_id"] == 0
    assert m["appends"][0]["n_postings"] > 0
    assert m["term_stats_dir"] == "term_stats_v0"


def test_appended_docs_searchable(spark, cfg, built):
    idx, n0, _ = built
    pidx = load_packed_index(spark, idx)
    topk = bm25_topk_packed_batch(pidx, [PHRASE], cfg, k=5, params=PARAMS)
    rows = resolve_docs(pidx, topk).collect()
    assert len(rows) == 5
    assert all(r["conv_id"] == "zconv1" for r in rows)
    assert all(r["doc_id"] >= n0 for r in rows)


def test_idf_recomputed_exactly(spark, built):
    """Delta-merged term_stats must equal an exact recompute for BOTH the
    new vocabulary and pre-existing terms (idf shifts for every term when
    N grows)."""
    idx, _, _ = built
    m = json.load(open(os.path.join(idx, "manifest.json")))
    ts = spark.read.parquet(os.path.join(idx, m["term_stats_dir"]))
    row = ts.filter(F.col("term") == "blorptastic").collect()
    assert len(row) == 1
    assert row[0]["df"] == 5
    import math

    assert row[0]["idf"] == round(math.log(m["n_docs"] / 5), 3)
    # an old term: df unchanged by the append, idf recomputed for new N
    old = ts.orderBy(F.desc("df")).first()
    assert old["idf"] == round(math.log(m["n_docs"] / old["df"]), 3)


def test_append_retry_is_idempotent(spark, cfg, built):
    """foreachBatch retry semantics: re-running a COMMITTED batch_id is a
    no-op (manifest unchanged, no duplicate postings)."""
    import datetime as dt

    from searchengine_spark.streaming.incremental import append_batch

    idx, n0, _ = built
    before = json.load(open(os.path.join(idx, "manifest.json")))
    rows = [("zconv9", 0, "user", "retry text", None, dt.datetime(2026, 3, 1))]
    batch = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    after = append_batch(batch, idx, cfg, batch_id=0)  # 0 already committed
    assert after["n_docs"] == before["n_docs"]
    assert len(after.get("appends", [])) == len(before.get("appends", []))


def test_positional_append_refused(spark, cfg, tmp_path):
    import datetime as dt

    from searchengine_spark.streaming.incremental import append_batch

    idx = str(tmp_path / "pidx")
    build_packed_index(
        transcripts_df(spark, n_conv=5), cfg, idx, params=PARAMS,
        chunk_docs=256, positional=True,
    )
    rows = [("zconv9", 0, "user", "some text", None, dt.datetime(2026, 3, 1))]
    batch = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    with pytest.raises(NotImplementedError):
        append_batch(batch, idx, cfg, batch_id=1)


def test_rerun_is_noop(spark, cfg, built):
    idx, n0, newdir = built
    stream_append(spark, newdir, idx, cfg)  # checkpoint: no new files
    m = json.load(open(os.path.join(idx, "manifest.json")))
    assert m["n_docs"] == n0 + 5
    assert len(m.get("appends", [])) == 1
