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
