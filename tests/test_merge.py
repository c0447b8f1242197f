"""Shard merge gates (indexing/merge.py).

The merge contract is equality with a fresh build: merging N shard
indexes must produce BIT-IDENTICAL statistics, postings and rankings to
``build_packed_index`` over the concatenation of the shards' live
corpora. The shards here INTERLEAVE in ``order_cols`` space (split by
turn parity), so a merge that concatenated shard docID ranges instead of
globally re-sorting would produce a different docID assignment and fail
the docmap/ranking equality below.
"""

import pyspark.sql.functions as F
import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.deletes import delete_docs
from searchengine_spark.indexing.merge import merge_packed_indexes
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig

QUERIES = ["greatest rock album", "guitar solo legendary", "drummer tour"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=10).persist()


def _split(corpus):
    """Two shards interleaved in (conv_id, turn_idx) order."""
    a = corpus.filter(F.col("turn_idx") % 2 == 0)
    b = corpus.filter(F.col("turn_idx") % 2 == 1)
    return a, b


def _stats(manifest):
    return {k: manifest[k] for k in
            ("n_docs", "avgdl", "n_terms", "n_chunks", "n_postings",
             "dl_norm_min", "dl_norm_max")}


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _topk(pidx, cfg):
    return _rows(
        bm25_topk_packed_batch(pidx, QUERIES, cfg, k=10, round_dp=6),
        ("query_id", "doc_id", "score", "rank"),
    )


def _assert_merged_equals_fresh(spark, merged_path, fresh_path, cfg, search=True):
    from searchengine_spark.indexing.fsck import verify_index

    v = verify_index(spark, merged_path)
    assert v["ok"], v["errors"]
    merged = load_packed_index(spark, merged_path)
    fresh = load_packed_index(spark, fresh_path)
    assert _stats(merged.manifest) == _stats(fresh.manifest)
    assert _rows(merged.term_stats, ("term", "df", "idf")) == _rows(
        fresh.term_stats, ("term", "df", "idf")
    )
    dm_cols = ("doc_id", "conv_id", "turn_idx")
    assert _rows(merged.docmap, dm_cols) == _rows(fresh.docmap, dm_cols)
    if search:  # BM25 WAND serving (freq payload only)
        got = _topk(merged, cfg)
        assert got == _topk(fresh, cfg)
        assert got  # non-vacuous: the fixture queries hit docs
    return merged


def test_merge_equals_fresh_build(spark, cfg, corpus, tmp_path):
    """THREE shards (N > 2), interleaved by turn_idx % 3."""
    paths = []
    for i in range(3):
        p = str(tmp_path / f"s{i}")
        build_packed_index(
            corpus.filter(F.col("turn_idx") % 3 == i), cfg, p, chunk_docs=64
        )
        paths.append(p)
    build_packed_index(corpus, cfg, str(tmp_path / "fresh"), chunk_docs=64)

    out = str(tmp_path / "merged")
    merge_packed_indexes(spark, paths, out, check_disjoint=True)
    merged = _assert_merged_equals_fresh(spark, out, str(tmp_path / "fresh"), cfg)
    # a merged index is a FRESH index: empty ledgers, snapshot history reset
    assert merged.manifest.get("appends", []) == []
    assert merged.manifest.get("deletes", []) == []
    assert merged.manifest["snapshot_seq"] == 0


def test_merge_folds_tombstones_and_epochs(spark, cfg, corpus, tmp_path):
    """A merge sees each shard's COMMITTED state: tombstones do not
    survive (merge(delete(A, conv), B) folds them) and committed append
    epochs DO (merge(A', append(B, batch)) includes the batch) — all
    equal to a fresh build over the live union, avgdl/idf recomputed
    (never the shard high-water statistics)."""
    from searchengine_spark.streaming.incremental import append_batch

    a, b = _split(corpus)
    victim = a.select("conv_id").first()["conv_id"]
    extra = transcripts_df(spark, n_conv=2, seed=9900).withColumn(
        "conv_id", F.concat(F.lit("xx_"), F.col("conv_id"))
    ).persist()
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    build_packed_index(a, cfg, pa, chunk_docs=64)
    build_packed_index(b, cfg, pb, chunk_docs=64)
    delete_docs(spark, pa, where=f"conv_id = '{victim}'")
    append_batch(extra, pb, cfg, batch_id=0)

    live = corpus.filter(
        (F.col("turn_idx") % 2 == 1) | (F.col("conv_id") != victim)
    ).unionByName(extra)
    build_packed_index(live, cfg, str(tmp_path / "fresh"), chunk_docs=64)

    out = str(tmp_path / "merged")
    merge_packed_indexes(spark, [pa, pb], out)
    merged = _assert_merged_equals_fresh(spark, out, str(tmp_path / "fresh"), cfg)
    n_extra = extra.count()
    extra.unpersist()
    assert merged.manifest["n_docs"] < corpus.count() + n_extra  # deletes folded
    assert merged.manifest["n_docs"] > corpus.count() // 2       # epoch included


def test_merge_positional_sidecar(spark, cfg, corpus, tmp_path):
    """The resume seam rebuilds EVERY downstream stage: a positional +
    tfidf_sidecar shard merge serves the proximity ranker identically to
    a fresh build."""
    from searchengine_spark.query.proximity import proximity_topk_packed_batch

    a, b = _split(corpus)
    kw = dict(chunk_docs=64, positional=True, tfidf_sidecar=True)
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    build_packed_index(a, cfg, pa, **kw)
    build_packed_index(b, cfg, pb, **kw)
    build_packed_index(corpus, cfg, str(tmp_path / "fresh"), **kw)

    out = str(tmp_path / "merged")
    merge_packed_indexes(spark, [pa, pb], out)
    merged = _assert_merged_equals_fresh(spark, out, str(tmp_path / "fresh"), cfg)
    assert merged.manifest["positional"] and merged.manifest["tfidf_sidecar"]

    cols = ("query_id", "doc_id", "score", "rank")
    for mode in ("bm25", "tfidf"):
        got = _rows(
            proximity_topk_packed_batch(
                load_packed_index(spark, out), QUERIES, cfg, k=10,
                mode=mode, round_dp=6),
            cols,
        )
        want = _rows(
            proximity_topk_packed_batch(
                load_packed_index(spark, str(tmp_path / "fresh")), QUERIES,
                cfg, k=10, mode=mode, round_dp=6),
            cols,
        )
        assert got == want and got


def test_merge_payload_matrix(spark, cfg, corpus, tmp_path):
    """The remaining payload contracts survive a merge: 'boolean' (gap-only
    postings, membership serving) and 'tfidf' (baked doc:freq/w triples,
    joinless plain TF-IDF) — merged indexes serve identically to fresh
    builds, and the merged manifest keeps the baked schema."""
    from searchengine_spark.query.proximity import tfidf_topk_packed_batch
    from searchengine_spark.query.wand import boolean_search_packed

    a, b = _split(corpus)

    def shards(tag, **kw):
        pa, pb = str(tmp_path / f"{tag}_a"), str(tmp_path / f"{tag}_b")
        build_packed_index(a, cfg, pa, chunk_docs=64, **kw)
        build_packed_index(b, cfg, pb, chunk_docs=64, **kw)
        fresh = str(tmp_path / f"{tag}_fresh")
        build_packed_index(corpus, cfg, fresh, chunk_docs=64, **kw)
        out = str(tmp_path / f"{tag}_merged")
        merge_packed_indexes(spark, [pa, pb], out)
        return out, fresh

    out, fresh = shards("bool", payload="boolean")
    merged = _assert_merged_equals_fresh(spark, out, fresh, cfg, search=False)
    assert merged.manifest["payload"] == "boolean"
    got = _rows(
        boolean_search_packed(
            load_packed_index(spark, out), QUERIES, cfg, op="or"),
        ("query_id", "doc_id", "n_terms"),
    )
    want = _rows(
        boolean_search_packed(
            load_packed_index(spark, fresh), QUERIES, cfg, op="or"),
        ("query_id", "doc_id", "n_terms"),
    )
    assert got == want and got

    out, fresh = shards("tfidf", payload="tfidf", tfidf_doc_schema="bnc")
    merged = _assert_merged_equals_fresh(spark, out, fresh, cfg, search=False)
    assert merged.manifest["payload"] == "tfidf"
    assert merged.manifest["tfidf_doc_schema"] == "bnc"
    cols = ("query_id", "doc_id", "score", "rank")
    got = _rows(
        tfidf_topk_packed_batch(
            load_packed_index(spark, out), QUERIES, cfg, k=10,
            schema="bnc.ltc", round_dp=6),
        cols,
    )
    want = _rows(
        tfidf_topk_packed_batch(
            load_packed_index(spark, fresh), QUERIES, cfg, k=10,
            schema="bnc.ltc", round_dp=6),
        cols,
    )
    assert got == want and got


def test_adopt_shard_equals_raw_append(spark, cfg, corpus, stop_words, tmp_path):
    """Shard ADOPTION (O(shard) epoch append of a finished index,
    indexing/merge.py adopt_shard_index) is bit-identical to append_batch
    over the shard's raw live rows: the stored token streams substitute
    for re-tokenizing, the shard's tombstones fold, and the target's
    incremental contract (frozen avgdl, live-set idf) applies unchanged.
    The shard deliberately uses a different chunk_docs — only its DOCS
    stage is read, so index-layout knobs are irrelevant."""
    from searchengine_spark.indexing.merge import adopt_shard_index
    from searchengine_spark.streaming.incremental import append_batch

    extra = transcripts_df(spark, n_conv=3, seed=9901).withColumn(
        "conv_id", F.concat(F.lit("zz_"), F.col("conv_id"))
    ).persist()
    p_raw, p_adopt = str(tmp_path / "via_raw"), str(tmp_path / "via_adopt")
    build_packed_index(corpus, cfg, p_raw, chunk_docs=64)
    build_packed_index(corpus, cfg, p_adopt, chunk_docs=64)

    shp = str(tmp_path / "shard")
    build_packed_index(extra, cfg, shp, chunk_docs=32)
    victim = extra.select("conv_id").first()["conv_id"]
    delete_docs(spark, shp, where=f"conv_id = '{victim}'")

    append_batch(extra.filter(F.col("conv_id") != victim), p_raw, cfg, batch_id=0)
    m = adopt_shard_index(spark, p_adopt, shp)
    extra.unpersist()
    assert m["appends"][0]["batch_id"] == 0  # default epoch id

    raw, adopted = load_packed_index(spark, p_raw), load_packed_index(spark, p_adopt)
    for key in ("n_docs", "n_docs_live", "avgdl"):
        assert adopted.manifest.get(key) == raw.manifest.get(key), key
    assert _rows(adopted.term_stats, ("term", "df", "idf")) == _rows(
        raw.term_stats, ("term", "df", "idf")
    )
    got = _topk(adopted, cfg)
    assert got == _topk(raw, cfg) and got

    # tokenizer parity is the caller-owned contract — mismatch refuses
    shp2 = str(tmp_path / "shard_badtok")
    build_packed_index(
        transcripts_df(spark, n_conv=2, seed=9902),
        TokenizerConfig(min_token_length=4, stop_words=stop_words),
        shp2, chunk_docs=32,
    )
    with pytest.raises(ValueError, match="tokenizer"):
        adopt_shard_index(spark, p_adopt, shp2)


def test_merge_refusals(spark, cfg, corpus, tmp_path):
    a, b = _split(corpus)
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    build_packed_index(a, cfg, pa, chunk_docs=64)
    build_packed_index(b, cfg, pb, chunk_docs=128)  # contract mismatch

    with pytest.raises(ValueError, match="different contract.*chunk_docs"):
        merge_packed_indexes(spark, [pa, pb], str(tmp_path / "out1"))
    with pytest.raises(ValueError, match="at least two"):
        merge_packed_indexes(spark, [pa], str(tmp_path / "out2"))
    # overlap detection: merging a shard with itself duplicates every key
    with pytest.raises(ValueError, match="duplicate"):
        merge_packed_indexes(
            spark, [pa, pa], str(tmp_path / "out3"), check_disjoint=True
        )
