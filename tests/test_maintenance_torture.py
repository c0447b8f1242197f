"""Randomized maintenance torture: seeded op sequences over one index.

The unit tests gate each maintenance op (append/delete/compact/snapshot)
in isolation and in a few hand-picked interplays; real state-machine bugs
live in the sequences nobody hand-picked. This suite drives a SEEDED
random sequence of commits against one packed index and, after EVERY
commit, runs the full invariant battery:

  1. fsck passes (``verify_index`` ok, zero errors);
  2. manifest bookkeeping matches the model (``n_docs`` = high-water,
     ``n_docs_live`` = live count — CLAUDE.md: never conflate them);
  3. BM25 top-k from the distributed packed path == the in-process
     LocalSearcher, bit-for-bit at round_dp=6 (two independent serving
     stacks over the same bytes);
  4. every served doc is LIVE in the model (no tombstone leaks, no lost
     appends);
  5. boolean OR results == a pure-set model over the stored token stage
     (avgdl/idf-free, so it isolates MEMBERSHIP state from scoring);
  6. the previous commit's snapshot still loads and still serves the
     EXACT results recorded before this op (the delayed-GC retention
     guarantee, indexing/snapshots.py);
  7. a compaction commit leaves current results bit-identical.

Finally the same op multiset is REPLAYED in canonical order (appends in
original order first, then one folded delete, then one compaction) onto a
second index: final BM25 results must be identical. The incremental
contract makes maintenance order-commutative — appends assign doc_ids
from the high-water mark (independent of interleaved deletes), dl_norm is
frozen against the BASE avgdl, and idf depends only on the FINAL live
set (streaming/incremental.py, indexing/deletes.py) — so any divergence
is a state-machine bug, not a semantics change.
"""

import random

import pyspark.sql.functions as F
import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.compact import compact_index
from searchengine_spark.indexing.deletes import delete_docs
from searchengine_spark.indexing.fsck import verify_index
from searchengine_spark.indexing.merge import adopt_shard_index
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.serve import LocalSearcher
from searchengine_spark.query.wand import bm25_topk_packed_batch, boolean_search_packed
from searchengine_spark.streaming.incremental import append_batch
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

QUERIES = ["greatest rock album", "guitar solo legendary"]
K = 10


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


def _append_df(spark, b: int):
    """Epoch ``b``'s batch: distinct seed + prefixed conv_id so external
    ids never collide with the base corpus or other epochs."""
    return transcripts_df(spark, n_conv=3, seed=7700 + b).withColumn(
        "conv_id", F.concat(F.lit(f"ep{b}_"), F.col("conv_id"))
    )


def _search(pidx, cfg):
    """Per-query [(doc_id, score, rank), ...] from the distributed path."""
    rows = bm25_topk_packed_batch(pidx, QUERIES, cfg, k=K, round_dp=6).collect()
    out = {i: [] for i in range(len(QUERIES))}
    for r in rows:
        out[r["query_id"]].append((int(r["doc_id"]), float(r["score"]), int(r["rank"])))
    return {i: sorted(v, key=lambda t: t[2]) for i, v in out.items()}


def _battery(spark, path, cfg, live, high_water, token_sets):
    """The full post-commit invariant battery; returns current results."""
    v = verify_index(spark, path)
    assert v["ok"], v["errors"]
    pidx = load_packed_index(spark, path)
    assert pidx.manifest["n_docs"] == high_water
    assert pidx.manifest.get("n_docs_live", high_water) == len(live)

    got = _search(pidx, cfg)
    assert any(got.values())  # non-vacuous: the fixture queries hit docs
    for hits in got.values():
        assert all(d in live for d, _, _ in hits)

    local = LocalSearcher(pidx, preload=True, cfg=cfg)
    for qi, q in enumerate(QUERIES):
        loc = [
            (r["doc_id"], float(r["score"]), r["rank"])
            for r in local.search(q, k=K, round_dp=6, resolve=False)
        ]
        assert loc == got[qi], f"local != distributed for {q!r}"

    # boolean OR vs the pure-set model: membership state isolated from
    # scoring (n_terms = how many query terms the live doc contains)
    q_terms = set(tokenize_text(QUERIES[0], cfg))
    want = {
        d: len(q_terms & token_sets[d])
        for d in live
        if q_terms & token_sets[d]
    }
    got_bool = {
        int(r["doc_id"]): int(r["n_terms"])
        for r in boolean_search_packed(pidx, [QUERIES[0]], cfg, op="or").collect()
    }
    assert got_bool == want
    return got


def _refresh_tokens(spark, path):
    pidx = load_packed_index(spark, path)
    return {
        int(r["doc_id"]): set(r["tokens"])
        for r in pidx.doc_tokens().collect()
    }


@pytest.mark.parametrize("seed", [2026, 818])
def test_maintenance_torture(spark, cfg, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / "idx")
    base = transcripts_df(spark, n_conv=12)
    build_packed_index(base, cfg, path, chunk_docs=64)

    manifest = load_packed_index(spark, path).manifest
    high_water = manifest["n_docs"]
    live = set(range(high_water))
    token_sets = _refresh_tokens(spark, path)

    # content id 1 arrives as a SHARD ADOPTION (a pre-built index appended
    # as an epoch, indexing/merge.py) — the replay below re-plays it as a
    # RAW append, so the final equality also gates adopt == append inside
    # arbitrary op interleavings
    ops = ["append:0", "delete", "adopt:1", "delete", "compact", "append:2"]
    rng.shuffle(ops)
    shard1 = str(tmp_path / "shard1")
    build_packed_index(_append_df(spark, 1), cfg, shard1, chunk_docs=32)

    # batch_id must be MONOTONIC in execution order, decoupled from the
    # content seed: compaction advances append_seq past folded epochs, so
    # a reused lower id would be (correctly) treated as an exactly-once
    # retry and silently no-op — the epoch contract, not a bug.
    next_batch_id = 0
    append_order: list = []  # content ids in executed order (for the replay)
    deleted_all: set = set()
    prev_results = _battery(spark, path, cfg, live, high_water, token_sets)
    prev_seq = load_packed_index(spark, path).manifest["snapshot_seq"]

    for op in ops:
        if op.startswith(("append:", "adopt:")):
            b = int(op.split(":")[1])
            n = _append_df(spark, b).count()
            if op.startswith("adopt:"):
                adopt_shard_index(spark, path, shard1, batch_id=next_batch_id)
            else:
                append_batch(_append_df(spark, b), path, cfg, batch_id=next_batch_id)
            next_batch_id += 1
            live |= set(range(high_water, high_water + n))
            high_water += n
            append_order.append(b)
            token_sets = _refresh_tokens(spark, path)
        elif op == "delete":
            victims = rng.sample(sorted(live), k=min(5, len(live) - 1))
            delete_docs(spark, path, doc_ids=victims)
            live -= set(victims)
            deleted_all |= set(victims)
        else:  # compact
            compact_index(spark, path)

        cur = _battery(spark, path, cfg, live, high_water, token_sets)
        seq = load_packed_index(spark, path).manifest["snapshot_seq"]
        if seq != prev_seq:
            # retention guarantee: the superseded state (one commit ago)
            # must still serve its exact pre-op results
            snap = load_packed_index(spark, path, snapshot=prev_seq)
            assert _search(snap, cfg) == prev_results, f"snapshot drift after {op}"
        else:
            assert op == "compact"  # only a debt-free compaction no-ops
        if op == "compact" and seq != prev_seq:
            assert cur == prev_results, "compaction changed answers"
        prev_results, prev_seq = cur, seq

    # ---- order-commutativity replay: canonical order, same multiset ----
    path_b = str(tmp_path / "idx_replay")
    build_packed_index(base, cfg, path_b, chunk_docs=64)
    for i, b in enumerate(append_order):
        append_batch(_append_df(spark, b), path_b, cfg, batch_id=i)
    if deleted_all:
        delete_docs(spark, path_b, doc_ids=sorted(deleted_all))
    compact_index(spark, path_b)
    replay = _search(load_packed_index(spark, path_b), cfg)
    assert replay == prev_results, "maintenance ops do not commute"
