"""Tombstone deletes (indexing/deletes.py): live-doc masking across every
packed serving path + exact term_stats maintenance + the append interplay.

The value contract (scores equal BM25 over the remaining corpus with
frozen avgdl and idf recomputed at the live N) is hash-gated end-to-end by
the driver entries ``delete_then_search`` / ``compacted_search`` against
DuckDB (tests/test_entry_contract.py); here we gate the mechanics."""

import pyspark.sql.functions as F
import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.deletes import DeleteMask, delete_docs
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.phrase import phrase_topk_packed_batch
from searchengine_spark.query.proximity import proximity_topk_packed_batch
from searchengine_spark.query.serve import LocalSearcher
from searchengine_spark.query.spans import minspan_topk_packed_batch
from searchengine_spark.query.wand import (
    bm25_topk_packed_batch,
    boolean_search_packed,
    prefix_search_packed,
)
from searchengine_spark.streaming.incremental import append_batch
from searchengine_spark.tokenizer import TokenizerConfig

QUERIES = ["greatest rock album", "morning coffee ritual"]
PRED = "doc_id % 3 = 0"


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def deleted_idx(spark, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("del")) + "/idx"
    src = transcripts_df(spark, n_conv=40)
    build_packed_index(
        src, cfg, path, chunk_docs=256, positional=True, tfidf_sidecar=True
    )
    pre = load_packed_index(spark, path)
    pre_top = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk_packed_batch(pre, QUERIES, cfg, k=10, round_dp=6).collect()
    }
    manifest = delete_docs(spark, path, where=PRED)
    return path, load_packed_index(spark, path), manifest, pre_top


def test_manifest_bookkeeping(deleted_idx):
    path, pidx, manifest, _ = deleted_idx
    d = manifest["deletes"][0]
    assert manifest["n_docs_live"] == manifest["n_docs"] - d["n_docs"]
    # n_docs stays the docID high-water mark (appends must never reuse ids)
    assert manifest["n_docs"] == 1085
    assert manifest["term_stats_dir"].startswith("term_stats_d")


def test_delete_retry_is_noop(spark, deleted_idx):
    path, _, manifest, _ = deleted_idx
    again = delete_docs(spark, path, where=PRED, delete_id=0)
    assert again["deletes"] == manifest["deletes"]
    assert again["n_docs_live"] == manifest["n_docs_live"]
    # re-matching docs are already tombstoned -> a fresh version is a no-op
    again2 = delete_docs(spark, path, where=PRED)
    assert again2["deletes"] == manifest["deletes"]


def test_term_stats_exact_after_delete(spark, deleted_idx):
    """df/idf == a from-scratch aggregation over the REMAINING docs' tokens
    — the delta merge may never drift from ground truth."""
    path, pidx, manifest, _ = deleted_idx
    live = (
        spark.read.parquet(path + "/docs")
        .filter(f"NOT ({PRED})")
        .select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
    )
    truth = live.groupBy("term").agg(F.count("*").alias("df_t"))
    n_live = manifest["n_docs_live"]
    truth = truth.withColumn(
        "idf_t", F.round(F.log(F.lit(float(n_live)) / F.col("df_t")), 3)
    )
    joined = pidx.term_stats.join(truth, "term", "full_outer")
    bad = joined.filter(
        "df IS DISTINCT FROM df_t OR idf IS DISTINCT FROM idf_t"
    ).count()
    assert bad == 0
    assert pidx.manifest["n_postings"] == live.count()


def test_all_rankers_exclude_deleted(deleted_idx, cfg):
    _, pidx, _, _ = deleted_idx
    wand = bm25_topk_packed_batch(pidx, QUERIES, cfg, k=10, round_dp=6).collect()
    assert wand and all(r.doc_id % 3 != 0 for r in wand)
    ex = bm25_topk_packed_batch(
        pidx, QUERIES, cfg, k=10, round_dp=6, exhaustive=True
    ).collect()
    # block-max pruning stays SAFE under masks (bounds valid over subsets)
    key = lambda rows: sorted((r.query_id, r.rank, r.doc_id, r.score) for r in rows)  # noqa: E731
    assert key(wand) == key(ex)
    for rows in (
        boolean_search_packed(pidx, QUERIES, cfg, op="and").collect(),
        boolean_search_packed(pidx, QUERIES, cfg, op="or").collect(),
        prefix_search_packed(pidx, "ro").collect(),
        proximity_topk_packed_batch(pidx, QUERIES, cfg, k=10).collect(),
        proximity_topk_packed_batch(
            pidx, QUERIES, cfg, k=10, mode="tfidf", rerank_n=None
        ).collect(),
        phrase_topk_packed_batch(pidx, ["rock album"], cfg, k=10).collect(),
        minspan_topk_packed_batch(pidx, ["rock album"], cfg, k=10).collect(),
    ):
        assert rows and all(r.doc_id % 3 != 0 for r in rows)


def test_scores_change_only_via_idf(deleted_idx, cfg):
    """A surviving doc's post-delete score equals re-scoring with the NEW
    idf over its unchanged stored tf/dlq — deletes never rewrite postings."""
    _, pidx, _, pre_top = deleted_idx
    post = bm25_topk_packed_batch(pidx, QUERIES, cfg, k=10, round_dp=6).collect()
    # every surviving pre-delete top doc must reappear (scores may move
    # with idf, the candidate can only rise with competitors gone)
    post_docs = {(r.query_id, r.doc_id) for r in post}
    survivors = {k for k in pre_top if k[1] % 3 != 0}
    top5 = set(sorted(survivors)[:5])
    assert top5 <= post_docs or len(survivors) > 10


def test_local_searcher_matches_distributed(deleted_idx, cfg):
    _, pidx, _, _ = deleted_idx
    ls = LocalSearcher(pidx, cfg=cfg)
    for ranker, dist in (
        ("bm25", bm25_topk_packed_batch(pidx, [QUERIES[0]], cfg, k=10, round_dp=6)),
        ("bm25_optimized", proximity_topk_packed_batch(pidx, [QUERIES[0]], cfg, k=10, round_dp=6)),
    ):
        got = ls.search(QUERIES[0], k=10, ranker=ranker, round_dp=6)
        want = [(r.doc_id, r.score) for r in dist.collect()]
        assert [(r["doc_id"], r["score"]) for r in got] == want
    got_b = ls.search(QUERIES[0], k=10, ranker="boolean_and")
    assert got_b and all(r["doc_id"] % 3 != 0 for r in got_b)


def test_append_after_delete_uses_live_count(spark, cfg, tmp_path):
    """idf after an append reflects N_live (not the docID high-water mark),
    and appended docIDs never collide with tombstoned ones."""
    path = str(tmp_path / "idx")
    src = transcripts_df(spark, n_conv=10)
    build_packed_index(src, cfg, path, chunk_docs=256)
    m0 = delete_docs(spark, path, where="doc_id % 2 = 0")
    batch = (
        transcripts_df(spark, n_conv=4)
        .withColumn("conv_id", F.concat(F.lit("new_"), F.col("conv_id")))
    )
    m1 = append_batch(batch, path, cfg, batch_id=77)
    n_new = m1["appends"][0]["n_new"]
    assert m1["n_docs_live"] == m0["n_docs_live"] + n_new
    assert m1["n_docs"] == m0["n_docs"] + n_new
    pidx = load_packed_index(spark, path)
    r = pidx.term_stats.limit(1).collect()[0]
    import math

    truth_df = (
        spark.read.parquet(path + "/docs", path + "/docs_appends/77")
        .filter("doc_id % 2 != 0 OR doc_id >= {}".format(m0["n_docs"]))
        .select(F.explode(F.array_distinct("tokens")).alias("term"))
        .filter(F.col("term") == r["term"])
        .count()
    )
    assert r["df"] == truth_df
    assert r["idf"] == round(math.log(m1["n_docs_live"] / r["df"]), 3)


def test_delete_mask_paired_decoders():
    """Positions re-slice exactly when postings are masked (the id-paired
    decoder contract every positional scorer relies on)."""
    import numpy as np

    from searchengine_spark.indexing.codec import (
        encode_position_groups,
        encode_postings,
    )

    doc_ids = np.array([3, 7, 9, 12], dtype=np.int64)
    tfs = np.array([2, 1, 3, 1], dtype=np.int64)
    dlqs = np.array([500, 900, 1000, 1100], dtype=np.int64)
    pos = np.array([1, 5, 2, 0, 4, 8, 6], dtype=np.int64)
    pstarts = np.array([0, 2, 3, 6], dtype=np.int64)
    buf = encode_postings(doc_ids, tfs, dlqs)
    posbuf = encode_position_groups(np.zeros(1, np.int64), pstarts, pos)[0]

    mask = DeleteMask(np.array([7, 12], dtype=np.int64))
    dec, dec_pos = mask.wrap_decoders()
    d, t, n = dec(buf)
    assert d.tolist() == [3, 9] and t.tolist() == [2, 3]
    flat, starts = dec_pos(posbuf, t)
    assert flat.tolist() == [1, 5, 0, 4, 8] and starts.tolist() == [0, 2]
    # a row with no tombstoned doc skips masking entirely (fast path)
    mask2 = DeleteMask(np.array([999], dtype=np.int64))
    dec2, dec_pos2 = mask2.wrap_decoders()
    d2, t2, _ = dec2(buf)
    assert d2.tolist() == doc_ids.tolist()
    flat2, starts2 = dec_pos2(posbuf, t2)
    assert flat2.tolist() == pos.tolist() and starts2.tolist() == pstarts.tolist()


def test_delete_all_docs_of_a_term(spark, cfg, tmp_path):
    path = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [
            ("c0", 0, "user", "zebra unique marker", None),
            ("c0", 1, "user", "other words entirely", None),
            ("c1", 0, "user", "other words entirely again", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    build_packed_index(df, cfg, path, chunk_docs=256)
    delete_docs(spark, path, doc_ids=[0])
    pidx = load_packed_index(spark, path)
    assert pidx.term_stats.filter("term = 'zebra'").count() == 0
    assert bm25_topk_packed_batch(pidx, ["zebra"], cfg, k=5).count() == 0
    rows = bm25_topk_packed_batch(pidx, ["words"], cfg, k=5).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]


def test_delete_id_below_highwater_is_noop(spark, cfg, tmp_path):
    """An explicit delete_id below delete_seq is a retry of a delete that
    was committed (and possibly compacted away) — a no-op, never a
    re-execution that would clobber pending-GC dirs."""
    from searchengine_spark.indexing.compact import compact_index

    path = str(tmp_path / "idx")
    build_packed_index(transcripts_df(spark, n_conv=8), cfg, path, chunk_docs=256)
    m0 = delete_docs(spark, path, where="doc_id % 2 = 0")
    compact_index(spark, path)
    m1 = delete_docs(spark, path, where="doc_id % 2 = 1", delete_id=0)  # retry id
    assert m1["deletes"] == [] and m1["n_docs_live"] == m0["n_docs_live"]
    m2 = delete_docs(spark, path, where="doc_id % 5 = 1")  # fresh default id
    assert m2["deletes"][0]["version"] == 1
    assert m2["delete_seq"] == 2


def test_stash_survives_capacity_pressure():
    """The paired-decoder stash is weakref-keyed: entries live exactly as
    long as the caller holds the masked tf array — far more rows than the
    purge threshold cannot evict a live pairing (the old FIFO cap would
    have mis-sliced positions here)."""
    import numpy as np

    from searchengine_spark.indexing.codec import (
        encode_position_groups,
        encode_postings,
    )
    from searchengine_spark.indexing.deletes import _STASH_CAP

    mask = DeleteMask(np.array([1], dtype=np.int64))
    dec, dec_pos = mask.wrap_decoders()
    doc_ids = np.array([1, 2], dtype=np.int64)
    tfs = np.array([2, 1], dtype=np.int64)
    buf = encode_postings(doc_ids, tfs, np.array([500, 600], dtype=np.int64))
    posbuf = encode_position_groups(
        np.zeros(1, np.int64), np.array([0, 2], np.int64),
        np.array([4, 9, 3], np.int64),
    )[0]
    first = dec(buf)  # row containing the tombstoned doc -> stashed pairing
    held = [dec(buf) for _ in range(_STASH_CAP + 100)]  # pressure, all live
    flat, starts = dec_pos(posbuf, first[1])
    assert flat.tolist() == [3] and starts.tolist() == [0]  # doc 1's occs dropped
    del held


def test_tombstone_collect_cap_refuses(spark, deleted_idx, monkeypatch):
    """The driver-collect of the tombstone set refuses loudly past the
    documented cap (the 'tiny sidecar' contract; the temperature_weights
    refusal pattern) — compaction is the answer, not a bigger driver."""
    from searchengine_spark.indexing.deletes import load_delete_mask

    path, pidx, manifest, _ = deleted_idx
    assert manifest.get("deletes"), "fixture has committed deletes"
    monkeypatch.setenv("SPARK_GRAFT_MAX_TOMBSTONES", "0")
    with pytest.raises(ValueError, match="--compact"):
        load_delete_mask(spark, path, manifest)
    monkeypatch.delenv("SPARK_GRAFT_MAX_TOMBSTONES")
    assert load_delete_mask(spark, path, manifest) is not None
