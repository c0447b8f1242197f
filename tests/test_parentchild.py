"""Parent-child gates (query/parentchild.py): has_child equals a brute
Python combine of the gated score-all surface at every score_mode,
min/max_children bound the qualifying set exactly, has_parent's doc
filter composed into BM25 equals direct conversation-restricted
retrieval, and conversation_stats matches the docmap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.parentchild import (
    conversation_stats,
    has_child_topk,
    has_parent_doc_filter,
)
from searchengine_spark.query.wand import (
    bm25_scores_packed_batch,
    bm25_topk_packed_batch,
)
from searchengine_spark.tokenizer import TokenizerConfig

QUERIES = ["greatest rock album", "guitar solo"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def packed(spark, cfg, tmp_path_factory):
    corpus = transcripts_df(spark, n_conv=15, n_partitions=4)
    path = str(tmp_path_factory.mktemp("pc") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=128)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def turn_scores(packed, cfg):
    scores = bm25_scores_packed_batch(packed, QUERIES, cfg, round_dp=6)
    conv = {r["doc_id"]: r["conv_id"] for r in packed.docmap.collect()}
    out: dict = {}
    for r in scores.collect():
        out.setdefault((r["query_id"], conv[r["doc_id"]]), []).append(
            r["score"])
    return out


@pytest.mark.parametrize("mode", ["max", "sum", "min", "avg"])
def test_matches_brute_combine(packed, cfg, turn_scores, mode):
    got = {}
    out = has_child_topk(packed, QUERIES, cfg, score_mode=mode, k=1000)
    for r in out.collect():
        got[(r["query_id"], r["conv_id"])] = (
            r["score"], r["n_matching"], r["rank"])
    want = {}
    for key, ss in turn_scores.items():
        if mode == "max":
            s = max(ss)
        elif mode == "min":
            s = min(ss)
        elif mode == "sum":
            s = sum(ss)
        else:
            s = sum(ss) / len(ss)
        want[key] = (round(s, 6), len(ss))
    assert set(got) == set(want)
    tol = 2e-6 if mode == "avg" else 1e-9  # avg: Spark half-up round vs
    # Python half-even on decimal-boundary quotients (repo-known policy
    # split; the ORACLE side mirrors Spark exactly, this brute does not)
    for key, (s, n) in want.items():
        gs, gn, _ = got[key]
        assert gn == n and abs(gs - s) <= tol, key
    # ranks follow (score desc, conv asc) per query, using the ENGINE's
    # own rounded scores (mode-independent check)
    for qid in range(len(QUERIES)):
        ranked = sorted(
            ((k_[1], v) for k_, v in got.items() if k_[0] == qid),
            key=lambda cv: cv[1][2])
        resorted = sorted(ranked, key=lambda cv: (-cv[1][0], cv[0]))
        assert ranked == resorted


def test_children_bounds(packed, cfg, turn_scores):
    out = has_child_topk(packed, QUERIES, cfg, score_mode="max",
                         min_children=3, max_children=5, k=1000)
    got = {(r["query_id"], r["conv_id"]) for r in out.collect()}
    want = {key for key, ss in turn_scores.items() if 3 <= len(ss) <= 5}
    assert got == want


def test_has_parent_filter_composes(spark, packed, cfg):
    stats = conversation_stats(packed)
    doc_filter = has_parent_doc_filter(packed, stats, "n_turns >= 60")
    allowed_convs = {r["conv_id"] for r in
                     stats.filter("n_turns >= 60").collect()}
    assert allowed_convs  # fixture must exercise the predicate
    topk = bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, round_dp=6, doc_filter=doc_filter)
    conv = {r["doc_id"]: r["conv_id"] for r in packed.docmap.collect()}
    rows = topk.collect()
    assert rows and all(conv[r["doc_id"]] in allowed_convs for r in rows)
    # equals retrieval restricted via an explicit docmap-derived filter
    direct = packed.docmap.filter(
        F.col("conv_id").isin(sorted(allowed_convs))).select("doc_id")
    want = bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, round_dp=6, doc_filter=direct)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want.collect()))


def test_stats_and_validation(packed, cfg):
    stats = {r["conv_id"]: (r["n_turns"], r["first_turn"], r["last_turn"])
             for r in conversation_stats(packed).collect()}
    docmap: dict = {}
    for r in packed.docmap.collect():
        docmap.setdefault(r["conv_id"], []).append(r["turn_idx"])
    assert set(stats) == set(docmap)
    for c, turns in docmap.items():
        assert stats[c] == (len(turns), min(turns), max(turns))
    with pytest.raises(ValueError):
        has_child_topk(packed, QUERIES, cfg, score_mode="geometric")
    with pytest.raises(ValueError):
        has_child_topk(packed, QUERIES, cfg, min_children=0)
    with pytest.raises(ValueError):
        has_child_topk(packed, QUERIES, cfg, min_children=3, max_children=2)


def test_inner_hits(packed, cfg, turn_scores):
    from searchengine_spark.query.parentchild import has_child_inner_hits

    out = has_child_inner_hits(
        packed, QUERIES, cfg, score_mode="sum", k=5, n_inner=2)
    rows = out.collect()
    assert rows
    parents = has_child_topk(
        packed, QUERIES, cfg, score_mode="sum", k=5)
    prank = {(r["query_id"], r["conv_id"]): r["rank"]
             for r in parents.collect()}
    scores = bm25_scores_packed_batch(packed, QUERIES, cfg, round_dp=6)
    conv = {r["doc_id"]: r["conv_id"] for r in packed.docmap.collect()}
    per_group: dict = {}
    for r in scores.collect():
        key = (r["query_id"], conv[r["doc_id"]])
        if key in prank:
            per_group.setdefault(key, []).append((-r["score"], r["doc_id"]))
    got: dict = {}
    for r in rows:
        key = (r["query_id"], r["conv_id"])
        assert r["group_rank"] == prank[key]
        got.setdefault(key, []).append((r["hit_rank"], r["doc_id"], r["score"]))
    for key, hits in per_group.items():
        want = [(i + 1, d, -s) for i, (s, d) in enumerate(sorted(hits)[:2])]
        assert sorted(got[key]) == want, key


def test_federated_matches_shard_local_combine(spark, cfg, tmp_path_factory):
    """Conversation-coherent shards (split BY conv_id): the federated
    has_child equals the union of per-shard has_child results ranked
    globally — and every conversation appears exactly once."""
    from pyspark.sql import functions as F

    from searchengine_spark.query.federated import has_child_topk_federated

    corpus = transcripts_df(spark, n_conv=14, n_partitions=4)
    convs = sorted(r["conv_id"] for r in
                   corpus.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    base = tmp_path_factory.mktemp("pc_shards")
    shards = []
    for i, pred in enumerate((F.col("conv_id").isin(sorted(half)),
                              ~F.col("conv_id").isin(sorted(half)))):
        p = str(base / f"s{i}")
        build_packed_index(corpus.filter(pred), cfg, p, chunk_docs=128)
        shards.append(load_packed_index(spark, p))
    fed = has_child_topk_federated(
        shards, QUERIES, cfg, score_mode="sum", min_children=2, k=1000,
        assume_coherent=True)
    got = {(r["query_id"], r["conv_id"]): (r["score"], r["n_matching"])
           for r in fed.collect()}
    assert len(got) == fed.count()  # each conversation exactly once
    want = {}
    for s in shards:
        rows = has_child_topk(s, QUERIES, cfg, score_mode="sum",
                              min_children=2, k=1000).collect()
        for r in rows:
            key = (r["query_id"], r["conv_id"])
            assert key not in want  # conversation-coherence
            want[key] = (r["score"], r["n_matching"])
    assert got == want and got
    # global rank order respects (score desc, conv asc)
    ranked = sorted(((r["query_id"], r["rank"], r["conv_id"], r["score"])
                     for r in fed.collect()))
    for (q1, r1, c1, s1), (q2, r2, c2, s2) in zip(ranked, ranked[1:]):
        if q1 == q2:
            assert (-s1, c1) <= (-s2, c2)


def test_federated_bounded_merge_tie_at_k(spark, cfg, tmp_path_factory):
    """The bounded per-shard emission (rank() <= k by score — top-k plus
    kth-score ties) merges bit-identically to the unbounded full-set
    merge, on a federation CONSTRUCTED to tie across the k boundary:
    shard B is a conv_id-renamed mirror of shard A, so every combined
    score has an equal twin in the other shard and the kth score always
    ties cross-shard. Also asserts the emission bound itself: each
    shard ships at most (k-1) + width(kth score) rows per query."""
    from pyspark.sql import Window

    from searchengine_spark.query.federated import has_child_topk_federated
    from searchengine_spark.query.parentchild import has_child_grouped

    corpus = transcripts_df(spark, n_conv=8, n_partitions=2)
    mirror = corpus.withColumn(
        "conv_id", F.concat(F.lit("zz_"), F.col("conv_id")))
    base = tmp_path_factory.mktemp("pc_tie")
    shards = []
    for name, df in (("a", corpus), ("b", mirror)):
        p = str(base / name)
        build_packed_index(df, cfg, p, chunk_docs=128)
        shards.append(load_packed_index(spark, p))
    k = 3
    fed = has_child_topk_federated(
        shards, QUERIES, cfg, score_mode="max", k=k, assume_coherent=True)
    got = sorted(tuple(r) for r in fed.collect())

    # unbounded reference merge: full qualifying sets, one global window
    grouped = [has_child_grouped(s, QUERIES, cfg, score_mode="max")
               for s in shards]
    full = grouped[0].unionByName(grouped[1])
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("conv_id"))
    want = sorted(
        tuple(r) for r in full.withColumn(
            "rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "conv_id", "score", "n_matching", "rank")
        .collect())
    assert got == want and got

    per_shard = [
        {}, {},
    ]
    for i, g in enumerate(grouped):
        for r in g.collect():
            per_shard[i].setdefault(r["query_id"], []).append(r["score"])
    # the construction really ties across the boundary: shard B's score
    # multiset equals shard A's (mirror corpora, shard-local dl_norm
    # identical), so the global kth score exists in BOTH shards
    assert {q: sorted(s) for q, s in per_shard[0].items()} == \
           {q: sorted(s) for q, s in per_shard[1].items()}
    # emission bound: rank() <= k ships (k-1) + width(kth score) at most
    wk = Window.partitionBy("query_id").orderBy(F.desc("score"))
    for g, byq in zip(grouped, per_shard):
        emitted: dict = {}
        for r in (g.withColumn("_r", F.rank().over(wk))
                   .filter(F.col("_r") <= k).collect()):
            emitted.setdefault(r["query_id"], []).append(r["score"])
        for q, scores in emitted.items():
            ranked = sorted(byq[q], reverse=True)
            if len(ranked) < k:
                assert sorted(scores) == sorted(ranked)
                continue
            s_k = ranked[k - 1]
            width = sum(1 for s in ranked if s == s_k)
            assert len(scores) <= (k - 1) + width
            assert min(scores) >= s_k


def test_federated_coherence_validation(spark, cfg, tmp_path_factory):
    """Arbitrary shard sets (no shard_coherent_by attestation) refuse
    loudly; build_shard_indexes-built shards carry the manifest flag and
    serve without assume_coherent."""
    from searchengine_spark.indexing.shards import (
        build_shard_indexes,
        shard_paths,
    )
    from searchengine_spark.query.federated import has_child_topk_federated

    corpus = transcripts_df(spark, n_conv=10, n_partitions=2)
    base = tmp_path_factory.mktemp("pc_coh")
    p = str(base / "plain")
    build_packed_index(corpus, cfg, p, chunk_docs=128)
    plain = load_packed_index(spark, p)
    with pytest.raises(ValueError, match="shard_coherent_by"):
        has_child_topk_federated([plain, plain], QUERIES, cfg, k=3)

    shard_dir = str(base / "sharded")
    build_shard_indexes(corpus, cfg, shard_dir, 2, chunk_docs=128)
    shards = [load_packed_index(spark, sp)
              for sp in shard_paths(shard_dir, 2)]
    assert all(s.manifest["shard_coherent_by"] == "conv_id" for s in shards)
    fed = has_child_topk_federated(shards, QUERIES, cfg, k=5)
    rows = fed.collect()
    assert rows
    # still one row per conversation (coherent shards never split one)
    keys = [(r["query_id"], r["conv_id"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_children_terms_agg(spark, packed, cfg, turn_scores):
    """ES children agg: counts cover the qualifying conversations'
    WHOLE turn sets (matched or not), bucketed by a child attribute,
    top-size by (count desc, value asc); NULL values skip."""
    from searchengine_spark.query.parentchild import children_terms_agg

    # child attr keyed by the index's external ids, derived
    # deterministically: role = 'user' for even turn_idx, 'assistant'
    # for odd, NULL every 7th
    attrs = packed.docmap.select(
        "conv_id", "turn_idx",
        F.when(F.col("turn_idx") % 7 == 0, None)
        .when(F.col("turn_idx") % 2 == 0, "user")
        .otherwise("assistant").alias("role"))
    out = children_terms_agg(
        packed, QUERIES, cfg, attrs, "role", score_mode="max", size=5)
    got = {(r["query_id"], r["value"]): (r["n"], r["rank"])
           for r in out.collect()}

    conv_turns: dict = {}
    for r in packed.docmap.collect():
        conv_turns.setdefault(r["conv_id"], []).append(r["turn_idx"])
    for qid in range(len(QUERIES)):
        quals = {c for (q, c) in turn_scores if q == qid}
        counts: dict = {}
        for c in quals:
            for t in conv_turns[c]:
                if t % 7 == 0:
                    continue
                v = "user" if t % 2 == 0 else "assistant"
                counts[v] = counts.get(v, 0) + 1
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        want = {(qid, v): (n, i + 1) for i, (v, n) in enumerate(ranked)}
        assert {k: v for k, v in got.items() if k[0] == qid} == want
        assert want  # fixture exercises the agg


def test_children_agg_refuses_key_column(packed, cfg):
    from searchengine_spark.query.parentchild import children_terms_agg

    attrs = packed.docmap.select("conv_id", "turn_idx")
    with pytest.raises(ValueError, match="external id"):
        children_terms_agg(packed, QUERIES, cfg, attrs, "turn_idx")


def test_children_agg_is_delete_aware(spark, cfg, tmp_path_factory):
    """Tombstoned turns never count in the children buckets — the
    delete-aware serving contract the scoring pass already has."""
    from searchengine_spark.indexing.deletes import delete_docs
    from searchengine_spark.query.parentchild import children_terms_agg

    corpus = transcripts_df(spark, n_conv=10, n_partitions=2)
    path = str(tmp_path_factory.mktemp("pc_del") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=128)
    pidx = load_packed_index(spark, path)
    attrs = pidx.docmap.select(
        "conv_id", "turn_idx",
        F.when(F.col("turn_idx") % 2 == 0, "user")
        .otherwise("assistant").alias("role"))
    before = {(r["query_id"], r["value"]): r["n"] for r in
              children_terms_agg(pidx, QUERIES, cfg, attrs, "role",
                                 size=10).collect()}
    assert before
    # tombstone every even turn, reload, re-aggregate
    delete_docs(spark, path, where="turn_idx % 2 = 0")
    pidx2 = load_packed_index(spark, path)
    after = {(r["query_id"], r["value"]): r["n"] for r in
             children_terms_agg(pidx2, QUERIES, cfg, attrs, "role",
                                size=10).collect()}
    # no 'user' (even-turn) buckets survive; assistant counts can only
    # shrink-or-equal (some parents may drop out of the qualifying set)
    assert all(v != "user" for (_, v) in after)
    for key, n in after.items():
        assert key in before and n <= before[key]
    assert after  # odd-turn matches keep some conversations qualifying
