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


def test_positional_append_exact(spark, cfg, tmp_path):
    """Positional appends encode the per-posting position stream: appended
    rows decode identically to a positional rebuild of the union corpus
    (term/doc/tf/positions — avgdl-free), TF_IDF_OPTIMIZED (whose boost
    uses no dl normalization) is fully rebuild-exact, and BM25_OPTIMIZED
    ranks appended-vocabulary docs (its dl_norms keep the documented
    frozen-avgdl append semantics)."""
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.indexing.packed import exploded_view
    from searchengine_spark.query.proximity import (
        proximity_topk_batch,
        proximity_topk_packed_batch,
    )
    from searchengine_spark.streaming.incremental import append_batch

    corpus = transcripts_df(spark, n_conv=10)
    idx = str(tmp_path / "pidx")
    build_packed_index(
        corpus, cfg, idx, params=PARAMS, chunk_docs=256, positional=True,
        tfidf_sidecar=True,
    )
    rows = [
        ("zzconv", i, "user", f"{PHRASE} positional append {i} {PHRASE}", None,
         dt.datetime(2026, 5, 1, 0, 0, i))
        for i in range(4)
    ]
    batch = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    append_batch(batch, idx, cfg, batch_id=0)
    pidx = load_packed_index(spark, idx)
    offset = pidx.manifest["n_docs"] - 4

    union = corpus.unionByName(batch)
    it = build_index(union, cfg, positional=True).cache()
    # decoded appended rows == positional rebuild (positions exact)
    dec = exploded_view(pidx, include_positions=True).filter(
        F.col("doc_id") >= offset
    ).select("term", "doc_id", "tf", "positions")
    ref = it.index.filter(F.col("doc_id") >= offset).select(
        "term", "doc_id", F.col("tf").cast("long").alias("tf"),
        F.array_join(F.col("positions").cast("array<string>"), ",").alias("positions"),
    )
    assert dec.exceptAll(ref).union(ref.exceptAll(dec)).count() == 0
    # TF_IDF_OPTIMIZED: packed-after-append == exact over rebuilt union
    queries = ["zxqv blorptastic", "greatest rock album"]
    got = sorted(
        (r["query_id"], round(r["score"], 9), r["doc_id"])
        for r in proximity_topk_packed_batch(
            pidx, queries, cfg, k=100_000, params=PARAMS, mode="tfidf"
        ).collect()
    )
    want = sorted(
        (r["query_id"], round(r["score"], 9), r["doc_id"])
        for r in proximity_topk_batch(
            it, queries, cfg, k=100_000, mode="tfidf", params=PARAMS
        ).collect()
    )
    assert got == want and got
    # BM25_OPTIMIZED serves appended docs (frozen-avgdl semantics)
    hit = proximity_topk_packed_batch(
        pidx, [queries[0]], cfg, k=10, params=PARAMS, mode="bm25"
    ).collect()
    assert hit and all(r["doc_id"] >= offset for r in hit)
    it.unpersist()


def test_boolean_append_exact(spark, cfg, tmp_path):
    """Boolean-payload appends encode doc gaps: AND/OR retrieval over
    base+append equals set algebra over a rebuilt exact index."""
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.query.wand import boolean_search_packed
    from searchengine_spark.streaming.incremental import append_batch

    corpus = transcripts_df(spark, n_conv=10)
    idx = str(tmp_path / "bidx")
    build_packed_index(
        corpus, cfg, idx, params=PARAMS, chunk_docs=256, payload="boolean"
    )
    rows = [
        ("zzconv", i, "user", f"{PHRASE} boolean append {i}", None,
         dt.datetime(2026, 6, 1, 0, 0, i))
        for i in range(4)
    ]
    batch = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    append_batch(batch, idx, cfg, batch_id=0)
    pidx = load_packed_index(spark, idx)

    it = build_index(corpus.unionByName(batch), cfg).cache()
    from searchengine_spark.tokenizer import tokenize_text

    for q in ["zxqv blorptastic", "greatest rock album"]:
        terms = list(dict.fromkeys(tokenize_text(q, cfg)))
        sets = {
            t: {r["doc_id"] for r in
                it.index.filter(F.col("term") == t).select("doc_id").collect()}
            for t in terms
        }
        want_and = set.intersection(*sets.values()) if all(sets.values()) else set()
        want_or = set.union(*sets.values())
        got_and = {r["doc_id"] for r in
                   boolean_search_packed(pidx, [q], cfg, op="and").collect()}
        got_or = {r["doc_id"] for r in
                  boolean_search_packed(pidx, [q], cfg, op="or").collect()}
        assert got_and == want_and and got_or == want_or, q
    # fixture-strength guard: the appended-only-vocabulary AND query hits
    # EXACTLY the epoch's 4 docs (ids [n_base, n_base+4)) — proves the
    # appended gap-postings decode AND that the rebuilt-union comparison
    # above wasn't vacuous on appended vocabulary
    n_base = pidx.manifest["n_docs"] - 4
    got_app = {
        r["doc_id"]
        for r in boolean_search_packed(
            pidx, ["zxqv blorptastic"], cfg, op="and"
        ).collect()
    }
    assert got_app == set(range(n_base, n_base + 4))
    it.unpersist()


def test_rerun_is_noop(spark, cfg, built):
    idx, n0, newdir = built
    stream_append(spark, newdir, idx, cfg)  # checkpoint: no new files
    m = json.load(open(os.path.join(idx, "manifest.json")))
    assert m["n_docs"] == n0 + 5
    assert len(m.get("appends", [])) == 1


def test_sidecar_append_tfidf_exact(spark, cfg, tmp_path):
    """Appends into a tfidf_sidecar index extend doc_norms per epoch:
    packed TF-IDF over base+append == exact path over the rebuilt union
    corpus — for lnc (nrm) AND bnc (nrm_b) doc schemas — and appended-only
    vocabulary is rankable (the round-2 refusal's failure mode was those
    docs silently dropping out of the norms join)."""
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.query.proximity import tfidf_topk_packed_batch
    from searchengine_spark.query.tfidf import tfidf_topk_batch
    from searchengine_spark.streaming.incremental import append_batch

    corpus = transcripts_df(spark, n_conv=12)
    idx = str(tmp_path / "idx")
    build_packed_index(
        corpus, cfg, idx, params=PARAMS, chunk_docs=256, tfidf_sidecar=True
    )
    rows = [
        ("zzconv", i, "user", f"{PHRASE} appended ranking text {i}", None,
         dt.datetime(2026, 3, 1, 0, 0, i))
        for i in range(4)
    ]
    batch = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    append_batch(batch, idx, cfg, batch_id=0)
    pidx = load_packed_index(spark, idx)
    assert set(pidx.doc_norms.columns) == {"doc_id", "nrm", "nrm_b", "nrm_n"}
    # every APPENDED doc has an epoch norms row (token-less docs never get
    # norms rows, in base builds and appends alike)
    offset = pidx.manifest["n_docs"] - 4
    assert pidx.doc_norms.filter(F.col("doc_id") >= offset).count() == 4

    # "zzconv" sorts after every base conv_id -> the union rebuild assigns
    # the SAME dense docIDs as base+offset (comparable directly)
    it = build_index(corpus.unionByName(batch), cfg).cache()
    queries = ["zxqv blorptastic", "greatest rock album", "appended ranking"]
    for schema in ("lnc.ltc", "bnc.ltc"):
        got = sorted(
            (r["query_id"], round(r["score"], 9), r["doc_id"])
            for r in tfidf_topk_packed_batch(
                pidx, queries, cfg, k=100_000, schema=schema
            ).collect()
        )
        want = sorted(
            (r["query_id"], round(r["score"], 9), r["doc_id"])
            for r in tfidf_topk_batch(
                it, queries, cfg, k=100_000, schema=schema
            ).collect()
        )
        assert got == want and got, schema
    # the appended-only-vocabulary query really ranks appended docs
    hit = tfidf_topk_packed_batch(pidx, [queries[0]], cfg, k=10).collect()
    assert hit and all(r["doc_id"] >= offset for r in hit)  # appended range
    it.unpersist()


@pytest.mark.parametrize("doc_schema", ["lnc", "bnc"])
def test_tfidf_payload_append_exact(spark, cfg, tmp_path, doc_schema):
    """payload='tfidf' appends bake stored weights under the manifest's
    doc schema: packed joinless serving over base+append == exact path
    over the rebuilt union corpus, and appended stored weights are
    bit-identical to a rebuild's (exploded_view vs tfidf_weights)."""
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.indexing.packed import exploded_view
    from searchengine_spark.query.proximity import tfidf_topk_packed_batch
    from searchengine_spark.query.tfidf import tfidf_topk_batch, tfidf_weights
    from searchengine_spark.streaming.incremental import append_batch

    corpus = transcripts_df(spark, n_conv=10)
    idx = str(tmp_path / f"idx_{doc_schema}")
    build_packed_index(
        corpus, cfg, idx, params=PARAMS, chunk_docs=256, payload="tfidf",
        tfidf_doc_schema=doc_schema,
    )
    rows = [
        ("zzconv", i, "user", f"{PHRASE} payload append text {i}", None,
         dt.datetime(2026, 4, 1, 0, 0, i))
        for i in range(4)
    ]
    batch = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    append_batch(batch, idx, cfg, batch_id=0)
    pidx = load_packed_index(spark, idx)

    it = build_index(corpus.unionByName(batch), cfg).cache()
    schema = f"{doc_schema}.ltc"
    dec = exploded_view(pidx).select("term", "doc_id", "w")
    ref = tfidf_weights(it, schema).select("term", "doc_id", "w")
    assert dec.exceptAll(ref).union(ref.exceptAll(dec)).count() == 0

    queries = ["zxqv blorptastic", "greatest rock album"]
    got = sorted(
        (r["query_id"], round(r["score"], 9), r["doc_id"])
        for r in tfidf_topk_packed_batch(
            pidx, queries, cfg, k=100_000, schema=schema
        ).collect()
    )
    want = sorted(
        (r["query_id"], round(r["score"], 9), r["doc_id"])
        for r in tfidf_topk_batch(it, queries, cfg, k=100_000, schema=schema).collect()
    )
    assert got == want and got
    it.unpersist()


def test_append_order_cols_from_manifest(spark, cfg, tmp_path_factory):
    """Appends default to the MANIFEST's order_cols: an index built over a
    non-default external-id schema (e.g. TSV ext_id) appends cleanly, and
    an explicitly conflicting order_cols raises instead of committing an
    epoch whose docs-stage schema diverges from the base."""
    from searchengine_spark.streaming.incremental import append_batch

    idx = str(tmp_path_factory.mktemp("oc") / "idx")
    base = spark.createDataFrame(
        [(f"d{i:03d}", f"alpha beta doc{i}") for i in range(20)],
        "ext_id string, text string",
    )
    build_packed_index(base, cfg, idx, params=PARAMS, order_cols=("ext_id",))
    batch = spark.createDataFrame(
        [(f"x{i:03d}", f"gamma delta doc{i}") for i in range(5)],
        "ext_id string, text string",
    )
    man = append_batch(batch, idx, cfg, batch_id=0)
    assert man["n_docs"] == 25
    pidx = load_packed_index(spark, idx)
    got = resolve_docs(
        pidx, bm25_topk_packed_batch(pidx, ["gamma"], cfg, k=5, params=PARAMS)
    ).collect()
    assert got and all(r["ext_id"].startswith("x") for r in got)
    with pytest.raises(ValueError, match="order_cols"):
        append_batch(batch, idx, cfg, batch_id=1,
                     order_cols=("conv_id", "turn_idx"))


def test_lineage_stream_written_post_commit(spark, cfg, tmp_path_factory):
    """One lineage_stream row per COMMITTED epoch — a retried batch_id
    (manifest no-op) must not append a duplicate row."""
    from searchengine_spark.streaming.incremental import append_batch

    idx = str(tmp_path_factory.mktemp("ls") / "idx")
    build_packed_index(
        transcripts_df(spark, n_conv=4, n_partitions=2), cfg, idx,
        params=PARAMS,
    )
    batch = transcripts_df(spark, n_conv=2, n_partitions=1, seed=99)
    append_batch(batch, idx, cfg, batch_id=0)
    append_batch(batch, idx, cfg, batch_id=0)  # retry: no-op
    rows = spark.read.parquet(os.path.join(idx, "lineage_stream")).collect()
    assert [r["batch_id"] for r in rows] == [0]
