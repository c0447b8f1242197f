"""Context-window expansion gates (query/context.py): the emitted
window rows match a brute Python replay (conversation edges truncate,
never pad; offsets are ctx - hit; cross-conversation turns never
leak), overlapping hit windows both emit, zero-width windows return
exactly the hit turns, and the big side is never shuffled (broadcast
join, plan-gated)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.context import with_context_turns

CORPUS = [
    ("c1", 0, "user", "t10"), ("c1", 1, "assistant", "t11"),
    ("c1", 2, "user", "t12"), ("c1", 3, "assistant", "t13"),
    ("c2", 0, "user", "t20"), ("c2", 1, "tool", "t21"),
]
HITS = [
    (0, 1, "c1", 0),   # window clipped at conversation start
    (0, 2, "c1", 3),   # clipped at end
    (1, 1, "c1", 2),   # interior
    (1, 2, "c2", 1),
]


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(
        CORPUS, "conv_id string, turn_idx int, role string, text string")
    hits = spark.createDataFrame(
        HITS, "query_id int, rank int, conv_id string, turn_idx int")
    return corpus, hits


def _replay(n_before, n_after):
    turns = {(c, t): (r, x) for c, t, r, x in CORPUS}
    out = set()
    for qid, rank, conv, hit in HITS:
        for ct in range(hit - n_before, hit + n_after + 1):
            if (conv, ct) in turns:
                role, text = turns[(conv, ct)]
                out.add((qid, rank, conv, hit, ct, ct - hit, role, text))
    return out


@pytest.mark.parametrize("nb,na", [(1, 1), (2, 0), (0, 0), (5, 5)])
def test_matches_replay(spark, frames, nb, na):
    corpus, hits = frames
    got = {tuple(r) for r in
           with_context_turns(hits, corpus, nb, na).collect()}
    assert got == _replay(nb, na)


def test_zero_window_is_hits_only(spark, frames):
    corpus, hits = frames
    rows = with_context_turns(hits, corpus, 0, 0).collect()
    assert len(rows) == len(HITS)
    assert all(r["offset"] == 0 and r["ctx_turn_idx"] == r["turn_idx"]
               for r in rows)


def test_corpus_not_shuffled(spark, frames):
    from contextlib import redirect_stdout
    import io

    corpus, hits = frames
    df = with_context_turns(hits, corpus, 1, 1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_validation(spark, frames):
    corpus, hits = frames
    with pytest.raises(ValueError):
        with_context_turns(hits, corpus, -1, 0)
    with pytest.raises(ValueError):
        with_context_turns(hits, corpus, 1, 1, payload_cols=("nope",))
