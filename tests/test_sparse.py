"""sparse_vector / text_expansion gates (query/sparse.py): retrieval
equals a brute Python dot product over the pairs table, the scan
prunes by the query's terms (pushed In filter, no join in the plan),
weighted-OR semantics (any-token match scores; absent tokens add 0),
integer-weight validation, and the deterministic expansion stand-in is
stable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.sparse import (
    build_sparse_index,
    expand_text_deterministic,
    sparse_topk_batch,
)

PAIRS = [
    # term, doc, weight_micro
    ("alpha", 1, 800_000), ("alpha", 2, 300_000), ("alpha", 5, 500_000),
    ("beta", 1, 200_000), ("beta", 3, 900_000),
    ("gamma", 2, 700_000), ("gamma", 4, 100_000), ("gamma", 5, 700_000),
    ("delta", 9, 1_000_000),
]
QUERIES = [
    {"alpha": 1_000_000, "gamma": 500_000},
    {"beta": 2_000_000},
    {"nosuch": 700_000},
]


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sparse") / "idx")
    pairs = spark.createDataFrame(PAIRS, "term string, doc_id long, weight_micro long")
    build_sparse_index(pairs, path, n_partitions=4)
    return path


def _brute(qw, k=10):
    scores: dict = {}
    for t, d, w in PAIRS:
        if t in qw:
            scores[d] = scores.get(d, 0) + w * qw[t]
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, s, i + 1) for i, (d, s) in enumerate(ranked)]


def test_matches_brute_dot_product(spark, index_path):
    out = sparse_topk_batch(spark, index_path, QUERIES, k=10)
    got: dict = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score_micro2"], r["rank"]))
    for qid, qw in enumerate(QUERIES):
        assert sorted(got.get(qid, []), key=lambda t: t[2]) == _brute(qw), qid
    assert 2 not in got  # no-token-matches query emits nothing


def test_plan_prunes_and_is_join_free(spark, index_path):
    from contextlib import redirect_stdout
    import io

    df = sparse_topk_batch(spark, index_path, QUERIES[:1], k=5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "In(term" in plan and "PushedFilters" in plan
    assert "Join" not in plan  # literal-map fan-out, not a join


def test_integer_validation(spark, index_path):
    with pytest.raises(ValueError):
        sparse_topk_batch(spark, index_path, [{"alpha": 0.5}], k=5)
    with pytest.raises(ValueError):
        sparse_topk_batch(spark, index_path, QUERIES, k=0)


def test_deterministic_expansion():
    a = expand_text_deterministic(["rock", "album", "rock"])
    b = expand_text_deterministic(["rock", "album"])
    assert a == b
    assert all(500_000 <= w < 1_500_000 for w in a.values())
    assert expand_text_deterministic(["rock"], salt="x") != \
        expand_text_deterministic(["rock"], salt="y")


# ---- pruning_config (ES 8.15 sparse_vector prune + rescore) ----

PRUNE_PAIRS = (
    # 'the' is FAT: in 12 of 16 docs; signal terms are rare
    [("the", d, 100_000 + d * 1_000) for d in range(12)]
    + [("alpha", 1, 900_000), ("alpha", 7, 700_000),
       ("beta", 2, 800_000), ("beta", 9, 600_000),
       ("gamma", 3, 500_000)]
)


@pytest.fixture(scope="module")
def pruned_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sparse_prune") / "idx")
    pairs = spark.createDataFrame(
        PRUNE_PAIRS, "term string, doc_id long, weight_micro long")
    man = build_sparse_index(pairs, path, n_partitions=2)
    return path, man


def test_manifest_and_stats(spark, pruned_index):
    path, man = pruned_index
    assert man["n_terms"] == 4 and man["total_postings"] == len(PRUNE_PAIRS)
    stats = {r["term"]: (r["df"], r["max_weight_micro"]) for r in
             spark.read.parquet(f"{path}/term_stats").collect()}
    assert stats["the"] == (12, 111_000)
    assert stats["alpha"] == (2, 900_000)


def test_prune_decision_replay(spark, pruned_index):
    from searchengine_spark.query.sparse import prune_query_tokens

    path, man = pruned_index
    dfs = {"the": 12, "alpha": 2, "beta": 2, "gamma": 1}
    # avg df = 17/4; 'the' df 12 > 5 * 4.25? 12*4=48 > 5*17=85 -> NOT
    # frequent at ratio 5 on this tiny fixture; use ratio 2: 48 > 34 ✓
    qw = {"the": 100_000, "alpha": 1_000_000}
    kept, pruned = prune_query_tokens(
        qw, dfs, man["n_terms"], man["total_postings"],
        freq_ratio_threshold=2, weight_threshold_micro=400_000)
    # avg qw = 550_000; 'the' weight 100k < 0.4*550k=220k ✓ -> pruned
    assert pruned == {"the": 100_000} and kept == {"alpha": 1_000_000}
    # heavy 'the' is frequent but NOT weak -> kept
    kept2, pruned2 = prune_query_tokens(
        {"the": 900_000, "alpha": 1_000_000}, dfs, man["n_terms"],
        man["total_postings"], 2, 400_000)
    assert pruned2 == {} and "the" in kept2
    # OOV never prunes
    kept3, _ = prune_query_tokens(
        {"zzz": 1_000, "alpha": 1_000_000}, dfs, man["n_terms"],
        man["total_postings"], 2, 990_000)
    assert "zzz" in kept3


def test_pruned_retrieval_two_phase(spark, pruned_index):
    from searchengine_spark.query.sparse import sparse_topk_pruned_batch

    path, man = pruned_index
    qw = {"the": 100_000, "alpha": 1_000_000, "beta": 900_000}
    # replay: kept = {alpha, beta} (the: df 12, frequent at ratio 2;
    # weight 100k < 0.4 * avg(666_666)) -> phase1 docs = {1,7,2,9};
    # rescore scores them with the FULL query incl. 'the'
    out = sparse_topk_pruned_batch(
        spark, path, [qw], k=4, freq_ratio_threshold=2,
        weight_threshold_micro=400_000, rescore=True, rescore_mult=2)
    got = {r["doc_id"]: r["score_micro2"] for r in out.collect()}
    full = {}
    for t, d, w in PRUNE_PAIRS:
        if t in qw:
            full[d] = full.get(d, 0) + w * qw[t]
    cand = {1, 7, 2, 9}
    assert set(got) == cand
    for d in cand:
        assert got[d] == full[d], d  # rescore = exact full-query score
    # doc 3 (gamma only) and pure-'the' docs never appear: no phase-1 signal
    # without rescore: scores exclude the pruned token
    out2 = sparse_topk_pruned_batch(
        spark, path, [qw], k=4, freq_ratio_threshold=2,
        weight_threshold_micro=400_000, rescore=False)
    got2 = {r["doc_id"]: r["score_micro2"] for r in out2.collect()}
    pruned_only = {}
    for t, d, w in PRUNE_PAIRS:
        if t in ("alpha", "beta"):
            pruned_only[d] = pruned_only.get(d, 0) + w * qw[t]
    assert got2 == pruned_only


def test_all_pruned_query_empty(spark, pruned_index):
    from searchengine_spark.query.sparse import sparse_topk_pruned_batch

    path, _ = pruned_index
    out = sparse_topk_pruned_batch(
        spark, path, [{"the": 100_000}], k=5, freq_ratio_threshold=2,
        weight_threshold_micro=2_000_000)
    assert out.count() == 0


@pytest.fixture(scope="module")
def chunked_index(spark, tmp_path_factory):
    """A larger deterministic corpus across MANY chunks (chunk_docs=16,
    600 docs -> 38 chunks) so block-max pruning really skips chunks."""
    import hashlib

    path = str(tmp_path_factory.mktemp("sparse_bm") / "idx")
    rows = []
    for d in range(600):
        for t in range(12):
            h = int(hashlib.md5(f"{d}|{t}".encode()).hexdigest()[:8], 16)
            if h % 3 == 0:
                rows.append((f"tok{t}", d, 1 + h % 2_000_000))
    pairs = spark.createDataFrame(
        rows, "term string, doc_id long, weight_micro long")
    build_sparse_index(pairs, path, n_partitions=4, chunk_docs=16)
    return path, rows


@pytest.mark.parametrize("seed_chunks", [1, 4])
def test_blockmax_matches_exact(spark, chunked_index, seed_chunks):
    """Block-max (seed -> θ -> chunk prune) is bit-identical to the
    exact scorer for full pages, short pages (θ undefined -> no
    pruning), OOV-only and empty queries."""
    from searchengine_spark.query.sparse import sparse_topk_blockmax_batch

    path, _rows = chunked_index
    qws = [
        expand_text_deterministic(["tok0", "tok3", "tok7"]),
        expand_text_deterministic(["tok1"]),
        {"tok11": 1},            # weak weights, many ties
        {"nosuch": 500_000},     # OOV only
        {},                      # empty
    ]
    a = sparse_topk_batch(spark, path, qws, k=10)
    b = sparse_topk_blockmax_batch(spark, path, qws, k=10,
                                   seed_chunks=seed_chunks)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb and ra


def test_blockmax_guards(spark, chunked_index, index_path, tmp_path):
    from searchengine_spark.query.sparse import sparse_topk_blockmax_batch

    path, _ = chunked_index
    with pytest.raises(ValueError, match="non-negative"):
        sparse_topk_blockmax_batch(spark, path, [{"tok0": -1}], k=3)
    with pytest.raises(ValueError, match="micro-units"):
        sparse_topk_blockmax_batch(spark, path, [{"tok0": 0.5}], k=3)
    # a layout without the chunk_stats sidecar refuses loudly
    import shutil

    bare = str(tmp_path / "bare")
    shutil.copytree(path, bare)
    shutil.rmtree(bare + "/chunk_stats")
    with pytest.raises(ValueError, match="chunk_stats"):
        sparse_topk_blockmax_batch(spark, bare, [{"tok0": 1}], k=3)


def test_chunk_stats_sidecar_contents(spark, chunked_index):
    """chunk_stats holds the exact per-(term, chunk) max weight."""
    path, rows = chunked_index
    want: dict = {}
    for t, d, w in rows:
        key = (t, d // 16)
        want[key] = max(want.get(key, 0), w)
    got = {
        (r["term"], r["chunk"]): r["max_weight_micro"]
        for r in spark.read.parquet(path + "/chunk_stats").collect()
    }
    assert got == want
