"""Training-sequence packing gates (textops/packing.py).

Contract: concat-and-chunk = per-bucket head-to-tail cumsum cut into
fixed windows (documents straddle — chunk_first..chunk_last, integer
div); greedy = no-split first-fit-in-order (whole docs, overlong docs
take a sequence alone and close it, exactly-full is not truncated);
bucket assignment is the cross-engine md5-hex15-mod rule; zero-token
docs drop from both plans.
"""

import hashlib

import pytest

from searchengine_spark.textops.packing import (
    pack_concat_chunks,
    pack_greedy,
    packing_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    # ws token counts by construction: 3, 5, 2, 9, 4, 1, 0 (drops)
    rows = [
        (1, "a b c"),
        (2, "a b c d e"),
        (3, "a b"),
        (4, "a b c d e f g h i"),
        (5, "a b c d"),
        (6, "a"),
        (7, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_concat_chunks_offsets_and_straddle(spark, docs):
    got = {r["id"]: (r["tok_start"], r["tok_end"],
                     r["chunk_first"], r["chunk_last"])
           for r in pack_concat_chunks(docs, max_tokens=8,
                                       n_buckets=1).collect()}
    # one bucket, id order: cum starts 0,3,8,10,19,23; doc 4 (9 tokens,
    # [10,19)) straddles chunks 1..2 — the concat semantics
    assert got == {
        1: (0, 3, 0, 0),
        2: (3, 8, 0, 0),
        3: (8, 10, 1, 1),
        4: (10, 19, 1, 2),
        5: (19, 23, 2, 2),
        6: (23, 24, 2, 2),
    }
    # id 7 (zero tokens) dropped
    with pytest.raises(ValueError, match="max_tokens"):
        pack_concat_chunks(docs, max_tokens=0, n_buckets=1)
    with pytest.raises(ValueError, match="n_buckets"):
        pack_concat_chunks(docs, max_tokens=8, n_buckets=0)


def test_greedy_first_fit(spark, docs):
    got = {r["id"]: (r["seq"], r["seq_offset"], r["truncated"])
           for r in pack_greedy(docs, max_tokens=8, n_buckets=1).collect()}
    # 3 -> seq0@0; 5 -> seq0@3 (fills to exactly 8); 2 -> seq1@0;
    # 9 >= 8 -> alone in seq2, truncated, closed; 4 -> seq3@0; 1 -> seq3@4
    assert got == {
        1: (0, 0, False),
        2: (0, 3, False),
        3: (1, 0, False),
        4: (2, 0, True),
        5: (3, 0, False),
        6: (3, 4, False),
    }


def test_greedy_exactly_full_not_truncated(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e f g h"), (3, "a b")],
        "doc_id long, text string")
    got = {r["id"]: (r["seq"], r["seq_offset"], r["truncated"])
           for r in pack_greedy(docs, max_tokens=8, n_buckets=1).collect()}
    # doc 2 has exactly 8 tokens: takes seq1 alone, NOT truncated,
    # and closes it — doc 3 opens seq2
    assert got == {1: (0, 0, False), 2: (1, 0, False), 3: (2, 0, False)}


def test_bucket_assignment_cross_engine_rule(spark, docs):
    got = {r["id"]: r["bucket"]
           for r in pack_concat_chunks(docs, max_tokens=8,
                                       n_buckets=4).collect()}
    for i, b in got.items():
        expect = int(hashlib.md5(str(i).encode()).hexdigest()[:15],
                     16) % 4
        assert b == expect, (i, b, expect)
    # greedy uses the same assignment
    got2 = {r["id"]: r["bucket"]
            for r in pack_greedy(docs, max_tokens=8,
                                 n_buckets=4).collect()}
    assert got2 == got


def test_token_count_col_passthrough(spark):
    docs = spark.createDataFrame(
        [(1, "ignored", 5), (2, "ignored", 6), (3, "ignored", 0)],
        "doc_id long, text string, n_tok long")
    got = {r["id"]: (r["seq"], r["seq_offset"])
           for r in pack_greedy(docs, max_tokens=8, n_buckets=1,
                                token_count_col="n_tok").collect()}
    # packs by the provided counts, never re-tokenizes; 0-count drops
    assert got == {1: (0, 0), 2: (1, 0)}


def test_packing_stats(spark, docs):
    packed = pack_greedy(docs, max_tokens=8, n_buckets=1)
    [r] = packing_stats(packed, max_tokens=8).collect()
    # 4 seqs x 8 budget = 32; capped doc tokens 3+5+2+8+4+1 = 23 -> pad 9
    assert (r["n_seqs"], r["n_docs"], r["n_tokens"], r["pad_tokens"]) \
        == (4, 6, 24, 9)


# ---- property gates over the pure first-fit kernel (the exact state
# machine pack_greedy runs per bucket and the DuckDB oracle replays)

from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.textops.packing import greedy_assign


@given(
    n=st.lists(st.integers(min_value=1, max_value=40), max_size=120),
    budget=st.integers(min_value=1, max_value=25),
)
@settings(max_examples=300, deadline=None)
def test_greedy_assign_invariants(n, budget):
    seqs, offs = greedy_assign(n, budget)
    assert len(seqs) == len(offs) == len(n)
    # sequence ids: start at 0, nondecreasing, no gaps
    if seqs:
        assert seqs[0] == 0
        for a, b in zip(seqs, seqs[1:]):
            assert a <= b <= a + 1
    from collections import defaultdict
    per_seq = defaultdict(list)
    for i, (s, o) in enumerate(zip(seqs, offs)):
        per_seq[s].append((o, n[i]))
    for s, items in per_seq.items():
        total = sum(t for _, t in items)
        if len(items) == 1:
            # a singleton may be overlong (it is the ONLY way a
            # sequence exceeds the budget), and always starts at 0
            assert items[0][0] == 0
        else:
            # multi-doc sequences never exceed the budget and no
            # member is overlong
            assert total <= budget
            assert all(t < budget for _, t in items)
        # offsets are the running fill: contiguous, in order
        fill = 0
        for o, t in items:
            assert o == fill
            fill += t
    # overlong docs are alone in their sequence
    for i, t in enumerate(n):
        if t >= budget:
            assert len(per_seq[seqs[i]]) == 1


@given(
    n=st.lists(st.integers(min_value=1, max_value=40), min_size=1,
               max_size=120),
    budget=st.integers(min_value=1, max_value=25),
)
@settings(max_examples=200, deadline=None)
def test_greedy_assign_first_fit_tightness(n, budget):
    """A new sequence only ever opens because the previous one could
    not hold the doc — no sequence is closed early (first-fit, not
    best-fit): whenever seq increments for a non-overlong doc, the
    previous sequence's fill + this doc must exceed the budget."""
    seqs, offs = greedy_assign(n, budget)
    fill_of = {}
    for i, (s, o) in enumerate(zip(seqs, offs)):
        fill_of[s] = o + n[i] if n[i] < budget else budget
    for i in range(1, len(n)):
        if seqs[i] == seqs[i - 1] + 1 and n[i] < budget:
            prev_closing_doc = n[i - 1]
            # the previous sequence ended with some fill; this doc
            # must not have fit there (unless the previous seq was an
            # overlong singleton, which is always closed)
            if prev_closing_doc < budget:
                assert fill_of[seqs[i - 1]] + n[i] > budget


def test_greedy_ffd_order(spark):
    """FFD: the same state machine fed (n_tokens DESC, id); on the
    classic instance it packs tighter than first-fit-in-order."""
    from pyspark.sql import functions as F

    from searchengine_spark.textops.packing import pack_greedy

    # budget 10 with the NEXT-fit state machine (one open sequence):
    # in-order [5, 6, 5, 6] -> [5],[6],[5],[6] = 4 seqs;
    # decreasing [6, 6, 5, 5] -> [6],[6],[5,5] = 3 seqs
    rows = [(0, "a", 5), (1, "b", 6), (2, "c", 5), (3, "d", 6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n long")
    ff = pack_greedy(docs, max_tokens=10, n_buckets=1,
                     token_count_col="n").collect()
    ffd = pack_greedy(docs, max_tokens=10, n_buckets=1,
                      token_count_col="n", order="length_desc").collect()
    assert len({r["seq"] for r in ff}) == 4
    assert len({r["seq"] for r in ffd}) == 3
    by_id = {r["id"]: (r["seq"], r["seq_offset"]) for r in ffd}
    assert by_id == {1: (0, 0), 3: (1, 0), 0: (2, 0), 2: (2, 5)}
    # validity: no sequence overflows, offsets are contiguous per seq
    fill: dict = {}
    for r in sorted(ffd, key=lambda r: (r["seq"], r["seq_offset"])):
        assert r["seq_offset"] == fill.get(r["seq"], 0)
        fill[r["seq"]] = r["seq_offset"] + r["n_tokens"]
        assert fill[r["seq"]] <= 10
    with pytest.raises(ValueError, match="order"):
        pack_greedy(docs, max_tokens=10, n_buckets=1,
                    token_count_col="n", order="nope")
