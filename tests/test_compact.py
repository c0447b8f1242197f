"""Compaction (indexing/compact.py): fold epochs + tombstones, results
IDENTICAL before/after for every payload and ranker; physical layout
collapses to one row per (term, chunk); retired dirs GC on the next run."""

import pyspark.sql.functions as F
import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.compact import compact_index
from searchengine_spark.indexing.deletes import delete_docs
from searchengine_spark.indexing.packed import (
    build_packed_index,
    exploded_view,
    load_packed_index,
)
from searchengine_spark.query.phrase import phrase_topk_packed_batch
from searchengine_spark.query.proximity import proximity_topk_packed_batch
from searchengine_spark.query.serve import LocalSearcher
from searchengine_spark.query.wand import (
    bm25_topk_packed_batch,
    boolean_search_packed,
)
from searchengine_spark.streaming.incremental import append_batch
from searchengine_spark.tokenizer import TokenizerConfig

QUERIES = ["greatest rock album", "morning coffee ritual"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


def _batch(spark, n, prefix):
    return transcripts_df(spark, n_conv=n).withColumn(
        "conv_id", F.concat(F.lit(prefix), F.col("conv_id"))
    )


def _grow(spark, cfg, path, **build_kw):
    """base build + two append epochs + one delete wave."""
    build_packed_index(
        transcripts_df(spark, n_conv=25), cfg, path, chunk_docs=256, **build_kw
    )
    append_batch(_batch(spark, 6, "e1_"), path, cfg, batch_id=1)
    append_batch(_batch(spark, 5, "e2_"), path, cfg, batch_id=2)
    return delete_docs(spark, path, where="doc_id % 5 = 2")


@pytest.fixture(scope="module")
def grown(spark, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cmp")) + "/idx"
    _grow(spark, cfg, path, positional=True, tfidf_sidecar=True)
    return path


def _results(pidx, cfg):
    return {
        "wand": sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in bm25_topk_packed_batch(pidx, QUERIES, cfg, k=10, round_dp=6).collect()
        ),
        "bool": sorted(
            (r.query_id, r.doc_id)
            for r in boolean_search_packed(pidx, QUERIES, cfg, op="and").collect()
        ),
        "prox": sorted(
            (r.query_id, r.rank, r.doc_id, round(r.score, 9))
            for r in proximity_topk_packed_batch(pidx, QUERIES, cfg, k=10).collect()
        ),
        "tfidf": sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in proximity_topk_packed_batch(
                pidx, QUERIES, cfg, k=10, mode="tfidf", round_dp=6
            ).collect()
        ),
        "phrase": sorted(
            (r.query_id, r.rank, r.doc_id, r.n_occurrences, r.first_pos)
            for r in phrase_topk_packed_batch(pidx, ["rock album"], cfg, k=10).collect()
        ),
    }


def _exploded(pidx):
    return sorted(
        (r.term, r.doc_id, r.tf, r.dl_norm, r.positions)
        for r in exploded_view(pidx, include_positions=True).collect()
    )


def test_compaction_preserves_everything(spark, cfg, grown):
    pre_idx = load_packed_index(spark, grown)
    pre = _results(pre_idx, cfg)
    # exploded_view is the UNMASKED physical truth — drop the tombstoned
    # docs from the pre snapshot (compaction drops them physically)
    dead = set(pre_idx.delete_mask().arr.tolist())
    pre_rows = [t for t in _exploded(pre_idx) if t[1] not in dead]
    pre_manifest = dict(pre_idx.manifest)

    manifest = compact_index(spark, grown)
    assert manifest["appends"] == [] and manifest["deletes"] == []
    assert manifest["index_dir"] == "index_v1"
    assert manifest["n_docs"] == pre_manifest["n_docs"]
    assert manifest["n_docs_live"] == pre_manifest["n_docs_live"]
    assert manifest["n_postings"] == pre_manifest["n_postings"]

    post_idx = load_packed_index(spark, grown)
    assert post_idx.delete_mask() is None  # tombstones folded in
    assert _results(post_idx, cfg) == pre
    # physical truth: decoded postings identical (deletes were already
    # masked pre-compaction at decode, dropped physically now)
    assert _exploded(post_idx) == pre_rows
    # layout collapsed: one row per (term, chunk)
    dup = (
        post_idx.index.groupBy("term", "chunk")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0
    assert post_idx.index.agg(F.sum("df_chunk")).collect()[0][0] == manifest["n_postings"]
    # LocalSearcher serves the compacted layout identically
    ls = LocalSearcher(post_idx, cfg=cfg)
    got = [(0, r["rank"], r["doc_id"], r["score"]) for r in ls.search(QUERIES[0], k=10, round_dp=6)]
    want = [t for t in pre["wand"] if t[0] == 0]
    assert sorted(got) == want


def test_second_compaction_gcs_the_first(spark, cfg, grown):
    """Runs after the module fixture's first compaction: appending again,
    compacting again must (a) fold the new epoch, (b) physically remove the
    group-1 retired dirs."""
    from searchengine_spark.indexing import fsio

    m1 = load_packed_index(spark, grown).manifest
    retired = m1["gc_groups"][0]
    assert any(fsio.exists(spark, d) for d in retired)  # still alive (delayed GC)
    append_batch(_batch(spark, 4, "e3_"), grown, cfg, batch_id=3)
    pre = _results(load_packed_index(spark, grown), cfg)
    m2 = compact_index(spark, grown)
    assert m2["index_dir"] == "index_v2"
    assert all(not fsio.exists(spark, d) for d in retired)
    assert _results(load_packed_index(spark, grown), cfg) == pre


def test_compact_noop_without_debt(spark, cfg, tmp_path):
    path = str(tmp_path / "idx")
    build_packed_index(transcripts_df(spark, n_conv=5), cfg, path, chunk_docs=256)
    m = compact_index(spark, path)
    assert "compaction" not in m and m.get("appends", []) == []


@pytest.mark.parametrize("payload", ["boolean", "tfidf"])
def test_compaction_other_payloads(spark, cfg, tmp_path, payload):
    path = str(tmp_path / "idx")
    build_packed_index(
        transcripts_df(spark, n_conv=12), cfg, path, chunk_docs=256, payload=payload
    )
    append_batch(_batch(spark, 4, "p1_"), path, cfg, batch_id=1)
    delete_docs(spark, path, where="doc_id % 4 = 1")
    pidx = load_packed_index(spark, path)
    if payload == "boolean":
        pre = sorted(
            (r.query_id, r.doc_id, r.n_terms)
            for r in boolean_search_packed(pidx, QUERIES, cfg, op="or").collect()
        )
    else:
        from searchengine_spark.query.proximity import tfidf_topk_packed_batch

        pre = sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in tfidf_topk_packed_batch(pidx, QUERIES, cfg, k=10, round_dp=6).collect()
        )
    compact_index(spark, path)
    post_idx = load_packed_index(spark, path)
    assert post_idx.delete_mask() is None
    if payload == "boolean":
        post = sorted(
            (r.query_id, r.doc_id, r.n_terms)
            for r in boolean_search_packed(post_idx, QUERIES, cfg, op="or").collect()
        )
    else:
        from searchengine_spark.query.proximity import tfidf_topk_packed_batch

        post = sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in tfidf_topk_packed_batch(post_idx, QUERIES, cfg, k=10, round_dp=6).collect()
        )
    assert post == pre
    assert all(t[2 if payload == "tfidf" else 1] % 4 != 1 for t in post)


def test_append_after_compaction(spark, cfg, tmp_path):
    """The maintenance cycle keeps going: compact -> append -> delete ->
    compact again, term_stats staying exact throughout."""
    path = str(tmp_path / "idx")
    _grow(spark, cfg, path)
    compact_index(spark, path)
    append_batch(_batch(spark, 3, "post_"), path, cfg, batch_id=9)
    delete_docs(spark, path, where="doc_id % 7 = 3")
    m = compact_index(spark, path)
    assert m["compaction"] == 2
    pidx = load_packed_index(spark, path)
    live = (
        spark.read.parquet(path + "/" + m["docs_dir"])
        .select(F.explode(F.array_distinct("tokens")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df_t"))
    )
    bad = (
        pidx.term_stats.join(live, "term", "full_outer")
        .filter("df IS DISTINCT FROM df_t")
        .count()
    )
    assert bad == 0
    assert bm25_topk_packed_batch(pidx, QUERIES, cfg, k=5).count() > 0


def test_epoch_retry_after_compaction_is_noop(spark, cfg, tmp_path):
    """A foreachBatch retry of an epoch that a compaction already FOLDED
    must be a no-op (append_seq high-water), never a duplicate re-append or
    an overwrite of an epoch dir awaiting group GC."""
    path = str(tmp_path / "idx")
    build_packed_index(transcripts_df(spark, n_conv=8), cfg, path, chunk_docs=256)
    append_batch(_batch(spark, 3, "x_"), path, cfg, batch_id=0)
    m1 = compact_index(spark, path)
    assert m1["append_seq"] == 1 and m1["appends"] == []
    n_before = m1["n_docs"]
    m2 = append_batch(_batch(spark, 3, "x_"), path, cfg, batch_id=0)  # retry
    assert m2["n_docs"] == n_before and m2.get("appends", []) == []
    # the next legitimate epoch takes a FRESH id and appends normally
    m3 = append_batch(_batch(spark, 2, "y_"), path, cfg, batch_id=m2["append_seq"])
    assert m3["appends"][0]["batch_id"] == 1 and m3["n_docs"] > n_before


def test_gc_self_heals_after_crashed_cleanup(spark, cfg, tmp_path):
    """A dir left behind by a crash between a compaction's commit and its
    GC loop is carried in gc_groups and removed by the NEXT compaction."""
    import os

    from searchengine_spark.indexing import fsio

    path = str(tmp_path / "idx")
    _grow(spark, cfg, path)
    compact_index(spark, path)
    append_batch(_batch(spark, 2, "z_"), path, cfg, batch_id=9)
    compact_index(spark, path)  # deletes group 1
    # simulate the crashed-cleanup survivor: resurrect a group-1 dir
    ghost = path + "/index"  # the original base dir, retired in group 1
    os.makedirs(ghost, exist_ok=True)
    open(ghost + "/orphan.parquet", "w").write("x")
    m = compact_index(spark, path, force=True)
    assert m["compaction"] == 3
    compact_index(spark, path, force=True)  # the NEXT one removes survivors
    assert not fsio.exists(spark, ghost)
