"""Index fsck (indexing/fsck.py): clean indexes verify OK at every
lifecycle stage; injected corruption is detected, never silently served."""

import json

import pyspark.sql.functions as F
import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.compact import compact_index
from searchengine_spark.indexing.deletes import delete_docs
from searchengine_spark.indexing.fsck import verify_index
from searchengine_spark.indexing.packed import build_packed_index
from searchengine_spark.streaming.incremental import append_batch
from searchengine_spark.tokenizer import TokenizerConfig


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


def _rewrite_manifest(spark, path, **patch):
    """Tamper with the manifest THROUGH fsio (the local Hadoop FS keeps CRC
    sidecars; a plain open() write would trip ChecksumException, not fsck)."""
    from searchengine_spark.indexing import fsio

    mp = path + "/manifest.json"
    m = json.loads(fsio.read_text(spark, mp))
    m.update(patch)
    fsio.write_text(spark, mp, json.dumps(m))
    return m


def _mk(spark, cfg, path, **kw):
    build_packed_index(transcripts_df(spark, n_conv=12), cfg, path,
                       chunk_docs=256, **kw)


def test_clean_lifecycle_verifies(spark, cfg, tmp_path):
    path = str(tmp_path / "idx")
    _mk(spark, cfg, path, positional=True, tfidf_sidecar=True)
    assert verify_index(spark, path)["ok"]
    assert verify_index(spark, path, deep=True)["ok"]
    append_batch(
        transcripts_df(spark, n_conv=4).withColumn(
            "conv_id", F.concat(F.lit("a_"), F.col("conv_id"))
        ),
        path, cfg, batch_id=1,
    )
    delete_docs(spark, path, where="doc_id % 6 = 2")
    rep = verify_index(spark, path, deep=True)
    assert rep["ok"], rep["errors"]
    assert rep["checks"]["tombstones"] > 0
    compact_index(spark, path)
    rep2 = verify_index(spark, path, deep=True)
    assert rep2["ok"], rep2["errors"]
    assert rep2["checks"]["tombstones"] == 0


def test_missing_manifest(spark, tmp_path):
    rep = verify_index(spark, str(tmp_path / "nothing"))
    assert not rep["ok"] and "no manifest" in rep["errors"][0]


def test_detects_stats_drift(spark, cfg, tmp_path):
    """A tampered term_stats df (the silent-wrong-idf failure) is caught by
    the deep per-term live-count cross-check."""
    path = str(tmp_path / "idx")
    _mk(spark, cfg, path)
    ts_dir = path + "/term_stats"
    df = spark.read.parquet(ts_dir).toPandas()
    df.loc[df.index[0], "df"] = int(df.loc[df.index[0], "df"]) + 5
    spark.createDataFrame(df).write.mode("overwrite").parquet(ts_dir + "_bad")
    _rewrite_manifest(spark, path, term_stats_dir="term_stats_bad")
    assert verify_index(spark, path)["ok"]  # shallow can't see it
    rep = verify_index(spark, path, deep=True)
    assert not rep["ok"] and any("term_stats df" in e for e in rep["errors"])


def test_detects_torn_postings(spark, cfg, tmp_path):
    """Chopping bytes off a postings parquet (torn write) fails deep fsck."""
    path = str(tmp_path / "idx")
    _mk(spark, cfg, path)
    pdf = spark.read.parquet(path + "/index").toPandas()
    # truncate one row's buffer: decode count will disagree with df_chunk
    victim = pdf["postings"].map(len).idxmax()
    pdf.at[victim, "postings"] = bytes(pdf.at[victim, "postings"])[:-1]
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path + "/index_bad")
    _rewrite_manifest(spark, path, index_dir="index_bad")
    rep = verify_index(spark, path, deep=True)
    assert not rep["ok"]


def test_detects_lost_epoch_dir(spark, cfg, tmp_path):
    path = str(tmp_path / "idx")
    _mk(spark, cfg, path)
    append_batch(
        transcripts_df(spark, n_conv=3).withColumn(
            "conv_id", F.concat(F.lit("b_"), F.col("conv_id"))
        ),
        path, cfg, batch_id=5,
    )
    import shutil

    shutil.rmtree(path + "/index_appends/5")
    rep = verify_index(spark, path)
    assert not rep["ok"] and any("index_appends/5" in e for e in rep["errors"])


def test_detects_tombstone_ledger_drift(spark, cfg, tmp_path):
    path = str(tmp_path / "idx")
    _mk(spark, cfg, path)
    delete_docs(spark, path, where="doc_id % 9 = 4")
    m = _rewrite_manifest(spark, path)
    _rewrite_manifest(spark, path, n_docs_live=m["n_docs_live"] + 1)
    rep = verify_index(spark, path)
    assert not rep["ok"] and any("tombstones" in e for e in rep["errors"])
