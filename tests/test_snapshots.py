"""Snapshot time travel (indexing/snapshots.py): every maintenance commit
archives the superseded manifest; readers pin historical states; expiry
follows the delayed-GC retention exactly."""

import pyspark.sql.functions as F
import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.compact import compact_index
from searchengine_spark.indexing.deletes import delete_docs
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.indexing.snapshots import SnapshotExpired
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.streaming.incremental import append_batch
from searchengine_spark.tokenizer import TokenizerConfig

QUERY = "greatest rock album"


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def timeline(spark, cfg, tmp_path_factory):
    """build(seq0) -> append(seq1) -> delete(seq2) -> compact(seq3)."""
    path = str(tmp_path_factory.mktemp("snap")) + "/idx"
    build_packed_index(transcripts_df(spark, n_conv=15), cfg, path, chunk_docs=256)
    append_batch(
        transcripts_df(spark, n_conv=5).withColumn(
            "conv_id", F.concat(F.lit("a_"), F.col("conv_id"))
        ),
        path, cfg, batch_id=1,
    )
    delete_docs(spark, path, where="doc_id % 3 = 0")
    compact_index(spark, path)
    return path


def _docs(pidx, cfg, k=20):
    return {
        r.doc_id
        for r in bm25_topk_packed_batch(pidx, [QUERY], cfg, k=k).collect()
    }


def test_snapshot_sequence_and_states(spark, cfg, timeline):
    live = load_packed_index(spark, timeline)
    assert live.manifest["snapshot_seq"] == 3

    base = load_packed_index(spark, timeline, snapshot=0)
    assert base.manifest["n_docs"] < live.manifest["n_docs"]  # pre-append
    assert base.manifest.get("appends", []) == []

    post_append = load_packed_index(spark, timeline, snapshot=1)
    assert post_append.manifest["n_docs"] == live.manifest["n_docs"]
    # pre-delete state: tombstoned docs still retrievable
    assert any(d % 3 == 0 for d in _docs(post_append, cfg))

    post_delete = load_packed_index(spark, timeline, snapshot=2)
    assert post_delete.manifest["deletes"]  # tombstones pending there
    assert _docs(post_delete, cfg) == _docs(live, cfg)  # masked == folded

    # pinning the live seq is just the live index
    assert load_packed_index(spark, timeline, snapshot=3).manifest == live.manifest

    with pytest.raises(FileNotFoundError):
        load_packed_index(spark, timeline, snapshot=9)


def test_expiry_follows_delayed_gc(spark, cfg, timeline):
    """A second compaction physically retires the pre-compaction dirs —
    snapshots that referenced them must EXPIRE loudly, while states after
    the first compaction stay readable."""
    append_batch(
        transcripts_df(spark, n_conv=3).withColumn(
            "conv_id", F.concat(F.lit("b_"), F.col("conv_id"))
        ),
        timeline, cfg, batch_id=2,
    )  # seq4; live=seq... archive grows
    compact_index(spark, timeline)  # retires group 1 (base+epoch1 dirs)
    live = load_packed_index(spark, timeline)
    assert live.manifest["snapshot_seq"] == 5
    for old in (0, 1, 2):
        with pytest.raises(SnapshotExpired):
            load_packed_index(spark, timeline, snapshot=old)
    # post-compaction-1 states reference index_v1 — retired only by the
    # NEXT (third) compaction, so still readable
    s3 = load_packed_index(spark, timeline, snapshot=3)
    assert _docs(s3, cfg)  # serves
    s4 = load_packed_index(spark, timeline, snapshot=4)
    assert s4.manifest["appends"]  # the epoch-2 state
