"""Filtered-reindex gates (indexing/merge.py reindex_filtered — the ES
_reindex-with-query analog): the carved index is bit-identical to a
fresh build over the filtered live corpus, tombstones fold (reindex is
a compaction), positional/sidecar contracts carry over, and degenerate
calls are refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.merge import reindex_filtered
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig

QUERIES = ["greatest rock album", "guitar solo", "music"]
WHERE = "turn_idx % 3 = 0"


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=20, n_partitions=4)


def _stats(m):
    return {k: m[k] for k in ("n_docs", "avgdl", "n_terms", "n_chunks",
                              "n_postings", "dl_norm_min", "dl_norm_max")}


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _topk(pidx, cfg):
    return _rows(bm25_topk_packed_batch(pidx, QUERIES, cfg, k=10, round_dp=6),
                 ("query_id", "doc_id", "score", "rank"))


def _assert_equals_fresh(spark, got_path, fresh_path, cfg):
    from searchengine_spark.indexing.fsck import verify_index

    v = verify_index(spark, got_path)
    assert v["ok"], v["errors"]
    got = load_packed_index(spark, got_path)
    fresh = load_packed_index(spark, fresh_path)
    assert _stats(got.manifest) == _stats(fresh.manifest)
    assert _rows(got.term_stats, ("term", "df", "idf")) == _rows(
        fresh.term_stats, ("term", "df", "idf"))
    dm = ("doc_id", "conv_id", "turn_idx")
    assert _rows(got.docmap, dm) == _rows(fresh.docmap, dm)
    t = _topk(got, cfg)
    assert t == _topk(fresh, cfg) and t
    return got


def test_reindex_equals_fresh_build(spark, cfg, corpus, tmp_path):
    src = str(tmp_path / "src")
    build_packed_index(corpus, cfg, src, chunk_docs=64)
    out = str(tmp_path / "out")
    reindex_filtered(spark, src, out, WHERE)
    fresh = str(tmp_path / "fresh")
    build_packed_index(corpus.filter(F.expr(WHERE)), cfg, fresh, chunk_docs=64)
    got = _assert_equals_fresh(spark, out, fresh, cfg)
    # a reindex is a FRESH index: empty ledgers, snapshot history reset
    assert got.manifest.get("deletes", []) == []
    assert got.manifest["snapshot_seq"] == 0


def test_reindex_folds_tombstones(spark, cfg, corpus, tmp_path):
    """Deleted docs don't survive a reindex even when they match WHERE."""
    from searchengine_spark.indexing.deletes import delete_docs

    src = str(tmp_path / "src")
    build_packed_index(corpus, cfg, src, chunk_docs=64)
    delete_docs(spark, src, where="doc_id % 2 = 0")
    out = str(tmp_path / "out")
    reindex_filtered(spark, src, out, WHERE)
    fresh = str(tmp_path / "fresh")
    build_packed_index(
        corpus.join(
            load_packed_index(spark, src).docmap
            .filter(f"({WHERE}) AND doc_id % 2 != 0")
            .select("conv_id", "turn_idx"),
            ["conv_id", "turn_idx"],
        ),
        cfg, fresh, chunk_docs=64,
    )
    _assert_equals_fresh(spark, out, fresh, cfg)


def test_reindex_positional_carries(spark, cfg, corpus, tmp_path):
    """Positional build contract survives the carve: phrase search over
    the reindexed corpus equals a fresh positional build's."""
    from searchengine_spark.query.phrase import phrase_topk_packed_batch

    src = str(tmp_path / "src")
    build_packed_index(corpus, cfg, src, chunk_docs=64, positional=True)
    out = str(tmp_path / "out")
    man = reindex_filtered(spark, src, out, WHERE)
    assert man["positional"]
    fresh = str(tmp_path / "fresh")
    build_packed_index(corpus.filter(F.expr(WHERE)), cfg, fresh,
                       chunk_docs=64, positional=True)
    pg = _rows(phrase_topk_packed_batch(
        load_packed_index(spark, out), QUERIES, cfg, k=10),
        ("query_id", "doc_id", "n_occurrences", "first_pos", "rank"))
    pf = _rows(phrase_topk_packed_batch(
        load_packed_index(spark, fresh), QUERIES, cfg, k=10),
        ("query_id", "doc_id", "n_occurrences", "first_pos", "rank"))
    assert pg == pf and pg


def test_reindex_refusals(spark, cfg, corpus, tmp_path):
    src = str(tmp_path / "src")
    build_packed_index(corpus, cfg, src, chunk_docs=64)
    with pytest.raises(ValueError, match="differ from src_path"):
        reindex_filtered(spark, src, src, WHERE)
    with pytest.raises(ValueError, match="matches no live"):
        reindex_filtered(spark, src, str(tmp_path / "o2"), "turn_idx < 0")
