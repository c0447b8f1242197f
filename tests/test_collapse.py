"""Field-collapse gates (ES collapse): one result per group, group
score = max doc score, representative = smallest doc_id among the max
achievers, groups ranked (score desc, rep doc asc) — all checked
against a pandas brute over the exhaustive ranking; the score-all
surface itself is gated score-identical to WAND top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import Bm25Params
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.collapse import collapse_topk_packed
from searchengine_spark.query.wand import (
    bm25_scores_packed_batch,
    bm25_topk_packed_batch,
)
from searchengine_spark.tokenizer import TokenizerConfig

PARAMS = Bm25Params(k=1.2, b=0.75)
QS = ["greatest rock album", "drummer tour"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def packed(spark, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("collpacked") / "idx")
    corpus = transcripts_df(spark, n_conv=50, n_partitions=8)
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    return load_packed_index(spark, path)


def _brute_collapse(packed, cfg, queries, k, **kw):
    """Exhaustive ranking -> pandas group-max collapse (the oracle)."""
    n = packed.manifest["n_docs"]
    full = bm25_topk_packed_batch(packed, queries, cfg, k=n, round_dp=6,
                                  exhaustive=True, **kw)
    docmap = {r["doc_id"]: r["conv_id"]
              for r in packed.docmap.select("doc_id", "conv_id").collect()}
    best: dict = {}
    for r in full.collect():
        key = (r["query_id"], docmap[r["doc_id"]])
        cur = best.get(key)
        cand = (r["score"], -r["doc_id"])
        if cur is None or cand > cur:
            best[key] = cand
    out: dict = {}
    for (qid, conv), (s, nid) in best.items():
        out.setdefault(qid, []).append((s, -nid, conv))
    return {
        qid: [(conv, d, s) for s, d, conv in
              sorted(rows, key=lambda x: (-x[0], x[1]))[:k]]
        for qid, rows in out.items()
    }


def _got(df):
    out: dict = {}
    for r in sorted(df.collect(), key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append(
            (r["conv_id"], r["doc_id"], r["score"]))
    return out


def test_collapse_matches_brute(packed, cfg):
    got = _got(collapse_topk_packed(packed, QS, cfg, k=8, round_dp=6))
    assert got == _brute_collapse(packed, cfg, QS, 8)
    # one result per group, ranks dense from 1
    for qid, rows in got.items():
        convs = [c for c, _, _ in rows]
        assert len(convs) == len(set(convs))


def test_collapse_conjunctive_and_negation(packed, cfg):
    got = _got(collapse_topk_packed(packed, QS, cfg, k=5, round_dp=6,
                                    conjunctive=True))
    assert got == _brute_collapse(packed, cfg, QS, 5, conjunctive=True)
    ex = {0: {"album"}, 1: {"tour"}}
    got = _got(collapse_topk_packed(packed, QS, cfg, k=5, round_dp=6,
                                    exclude_terms=ex))
    assert got == _brute_collapse(packed, cfg, QS, 5, exclude_terms=ex)


def test_scores_surface_matches_wand(packed, cfg):
    """The score-all surface agrees with WAND top-k on the docs both
    emit — same contract, no heap."""
    k = 15
    topk = {(r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_topk_packed_batch(packed, QS, cfg, k=k,
                                            round_dp=6).collect()}
    flat = {(r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_scores_packed_batch(packed, QS, cfg,
                                              round_dp=6).collect()}
    assert topk and all(flat[key] == s for key, s in topk.items())
    # the flat surface scores MORE docs than the heap kept
    assert len(flat) > len(topk)


def test_collapse_refuses_unknown_group_col(packed, cfg):
    with pytest.raises(ValueError, match="group_col"):
        collapse_topk_packed(packed, QS, cfg, group_col="nope")


def test_federated_collapse_groups_span_shards(spark, cfg, tmp_path_factory):
    """Turn-parity shards: EVERY conversation spans both shards — the
    case per-shard collapse would get wrong. Gate against a pandas brute
    over the federated exhaustive ranking (the federated score contract:
    global idf, shard-local dl_norm)."""
    from searchengine_spark.query.collapse import collapse_topk_federated
    from searchengine_spark.query.federated import (
        bm25_scores_federated,
        bm25_topk_federated,
    )

    corpus = transcripts_df(spark, n_conv=40, n_partitions=8)
    base = tmp_path_factory.mktemp("collfed")
    shards = []
    for i, part in enumerate(
        [corpus.filter(F.col("turn_idx") % 2 == 0),
         corpus.filter(F.col("turn_idx") % 2 == 1)]
    ):
        p = str(base / f"s{i}")
        build_packed_index(part, cfg, p, params=PARAMS, chunk_docs=256)
        shards.append(load_packed_index(spark, p))

    # the score-all surface agrees with federated WAND on common docs
    n_total = sum(s.manifest["n_docs"] for s in shards)
    full = bm25_topk_federated(shards, QS, cfg, k=n_total, round_dp=6,
                               exhaustive=True)
    flat = {(r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_scores_federated(shards, QS, cfg,
                                           round_dp=6).collect()}
    full_rows = full.collect()
    assert full_rows and all(
        flat[(r["query_id"], r["doc_id"])] == r["score"] for r in full_rows
    )
    assert len(flat) == len(full_rows)

    # brute collapse over the federated ranking (federation docmap)
    from searchengine_spark.query.federated import _doc_bases

    docmap = {}
    for s, b in zip(shards, _doc_bases(shards)):
        for r in s.docmap.select("doc_id", "conv_id").collect():
            docmap[r["doc_id"] + b] = r["conv_id"]
    best: dict = {}
    for r in full_rows:
        key = (r["query_id"], docmap[r["doc_id"]])
        cand = (r["score"], -r["doc_id"])
        if key not in best or cand > best[key]:
            best[key] = cand
    expect: dict = {}
    for (qid, conv), (s, nid) in best.items():
        expect.setdefault(qid, []).append((s, -nid, conv))
    expect = {
        qid: [(conv, d, s) for s, d, conv in
              sorted(rows, key=lambda x: (-x[0], x[1]))[:6]]
        for qid, rows in expect.items()
    }
    got = _got(collapse_topk_federated(shards, QS, cfg, k=6, round_dp=6))
    assert got == expect
    # one row per conversation even though every conv spans both shards
    for rows in got.values():
        convs = [c for c, _, _ in rows]
        assert len(convs) == len(set(convs))


def test_inner_hits_consistent_with_collapse(packed, cfg):
    """collapse + inner_hits: group order/reps == collapse_topk exactly
    (the hit_rank=1 rows ARE the representatives); within-group hits
    ordered (score desc, doc_id asc), capped at n_inner, and equal to
    the brute per-group ranking."""
    from searchengine_spark.query.collapse import collapse_inner_hits_packed

    k, n_inner = 5, 3
    base = {(r["query_id"], r["rank"]): (r["conv_id"], r["doc_id"],
                                         r["score"])
            for r in collapse_topk_packed(packed, QS, cfg, k=k,
                                          round_dp=6).collect()}
    rows = collapse_inner_hits_packed(packed, QS, cfg, k=k,
                                      n_inner=n_inner,
                                      round_dp=6).collect()
    # reps: hit_rank 1 row per (query, group_rank) matches collapse
    reps = {(r["query_id"], r["group_rank"]):
            (r["conv_id"], r["doc_id"], r["score"])
            for r in rows if r["hit_rank"] == 1}
    assert reps == base
    # within-group order + cap, against the exhaustive brute
    n = packed.manifest["n_docs"]
    full = bm25_topk_packed_batch(packed, QS, cfg, k=n, round_dp=6,
                                  exhaustive=True).collect()
    dm = {r["doc_id"]: r["conv_id"]
          for r in packed.docmap.select("doc_id", "conv_id").collect()}
    per_group: dict = {}
    for r in full:
        per_group.setdefault(
            (r["query_id"], dm[r["doc_id"]]), []).append(
            (-float(r["score"]), int(r["doc_id"])))
    for key in per_group:
        per_group[key].sort()
    got_groups: dict = {}
    for r in rows:
        got_groups.setdefault((r["query_id"], r["conv_id"]), []).append(
            (r["hit_rank"], int(r["doc_id"]), float(r["score"])))
    assert got_groups  # non-empty
    for (qid, conv), hits in got_groups.items():
        hits.sort()
        want = per_group[(qid, conv)][:n_inner]
        assert [(d, s) for _, d, s in hits] == \
            [(d, -s) for s, d in want]
        assert len(hits) <= n_inner
        assert [h[0] for h in hits] == list(range(1, len(hits) + 1))
    import pytest as _pt
    with _pt.raises(ValueError, match="n_inner"):
        collapse_inner_hits_packed(packed, QS, cfg, n_inner=0)
