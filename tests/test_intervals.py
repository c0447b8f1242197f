"""ES intervals gates (query/intervals.py): the pure kernels equal a
brute containment-definition enumeration on random position lists, the
vectorized kernels equal the pure ones on random multi-doc streams,
exact path == packed path on the fixture corpus, and max_gaps
degenerates sensibly (0 = adjacent runs, huge = all covering docs ==
the minspan doc set)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import build_index
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.intervals import (
    _filter_count,
    _ordered_vec,
    _unordered_vec,
    intervals_topk_batch,
    intervals_topk_packed_batch,
    ordered_intervals,
    unordered_intervals,
)
from searchengine_spark.query.spans import minspan_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig

QUERIES = ["rock album", "greatest rock album", "guitar solo live"]


def _covers_unordered(pos_sets, lo, hi):
    return all(any(lo <= p <= hi for p in ps) for ps in pos_sets)


def _covers_ordered(pos_lists, lo, hi):
    def chain(j, frm):
        if j == len(pos_lists):
            return True
        return any(frm < p <= hi and chain(j + 1, p)
                   for p in pos_lists[j] if p >= lo)
    return any(lo == p and chain(1, p) for p in pos_lists[0] if p <= hi)


def _brute(pos_lists, ordered):
    cover = _covers_ordered if ordered else _covers_unordered
    allp = sorted({p for ps in pos_lists for p in ps})
    matching = [(lo, hi) for lo in allp for hi in allp if lo <= hi
                and cover(pos_lists, lo, hi)]
    return sorted(
        (a, b) for a, b in matching
        if not any((c, d) != (a, b) and a <= c and d <= b
                   for c, d in matching)
    )


@pytest.mark.parametrize("ordered", [False, True])
def test_pure_kernels_match_brute(ordered):
    rng = random.Random(42 + ordered)
    kernel = ordered_intervals if ordered else unordered_intervals
    for _ in range(120):
        k = rng.randint(1, 3)
        universe = list(range(rng.randint(3, 14)))
        lists = []
        taken = set()
        for _ in range(k):
            avail = [p for p in universe if p not in taken]
            ps = rng.sample(avail, min(len(avail), rng.randint(0, 4)))
            taken.update(ps)
            lists.append(sorted(ps))
        got = kernel(lists)
        if any(not ps for ps in lists):
            assert got == []
            continue
        want = _brute(lists, ordered)
        assert sorted(got) == want, (lists, ordered)


@pytest.mark.parametrize("ordered", [False, True])
def test_vectorized_matches_pure(ordered):
    rng = random.Random(7 + ordered)
    kernel_p = ordered_intervals if ordered else unordered_intervals
    kernel_v = _ordered_vec if ordered else _unordered_vec
    for _ in range(40):
        k = rng.randint(1, 3)
        docs_l, pos_l, tid_l = [], [], []
        want = {}
        for d in range(rng.randint(1, 6)):
            universe = list(range(rng.randint(3, 20)))
            taken = set()
            lists = []
            for t in range(k):
                avail = [p for p in universe if p not in taken]
                ps = rng.sample(avail, min(len(avail), rng.randint(0, 5)))
                taken.update(ps)
                lists.append(sorted(ps))
                for p in ps:
                    docs_l.append(d)
                    pos_l.append(p)
                    tid_l.append(t)
            wins = kernel_p(lists)
            if wins:
                want[d] = sorted(wins)
        if not docs_l:
            continue
        vd, vlo, vhi = kernel_v(
            np.array(docs_l, np.int64), np.array(pos_l, np.int64),
            np.array(tid_l, np.int64), k)
        got: dict = {}
        for d, lo, hi in zip(vd, vlo, vhi):
            got.setdefault(int(d), []).append((int(lo), int(hi)))
        got = {d: sorted(v) for d, v in got.items()}
        assert got == want, (ordered, k)


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=20, n_partitions=4)


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("intervals") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=128, positional=True)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def exact(spark, corpus, cfg):
    return build_index(corpus, cfg, positional=True)


@pytest.mark.parametrize("ordered,max_gaps", [(False, 2), (True, 5), (False, 0)])
def test_packed_equals_exact(packed, exact, cfg, ordered, max_gaps):
    a = intervals_topk_packed_batch(
        packed, QUERIES, cfg, ordered=ordered, max_gaps=max_gaps, k=10)
    b = intervals_topk_batch(
        exact, QUERIES, cfg, ordered=ordered, max_gaps=max_gaps, k=10)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b and rows_a


def test_huge_gaps_unordered_matches_minspan_docset(packed, cfg):
    iv = intervals_topk_packed_batch(
        packed, QUERIES, cfg, ordered=False, max_gaps=1 << 20, k=None)
    ms = minspan_topk_packed_batch(packed, QUERIES, cfg, k=None)
    got = {(r["query_id"], r["doc_id"]) for r in iv.collect()}
    want = {(r["query_id"], r["doc_id"]) for r in ms.collect()}
    assert got == want and got


def test_validation(packed, cfg):
    with pytest.raises(ValueError):
        intervals_topk_packed_batch(packed, QUERIES, cfg, max_gaps=-1)


@pytest.fixture(scope="module")
def shard_pair(spark, corpus, cfg, tmp_path_factory):
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("iv_shards")
    paths = []
    for i, pred in enumerate((F.col("turn_idx") % 2 == 0,
                              F.col("turn_idx") % 2 == 1)):
        p = str(base / f"s{i}")
        build_packed_index(corpus.filter(pred), cfg, p, chunk_docs=128,
                           positional=True)
        paths.append(p)
    return [load_packed_index(spark, p) for p in paths]


@pytest.mark.parametrize("ordered", [False, True])
def test_federated_matches_merged_corpus_semantics(
        spark, corpus, cfg, packed, shard_pair, ordered):
    """Federation must return the same (external doc, count) ranking as
    the single merged index — resolve both to (conv_id, turn_idx)."""
    from searchengine_spark.query.federated import (
        intervals_topk_federated,
        resolve_docs_federated,
    )

    fed = intervals_topk_federated(
        shard_pair, QUERIES, cfg, ordered=ordered, max_gaps=4, k=None)
    fed_ext = resolve_docs_federated(
        shard_pair, fed.withColumnRenamed("n_intervals", "score"))
    got = {(r["query_id"], r["conv_id"], r["turn_idx"]): r["score"]
           for r in fed_ext.collect()}
    single = intervals_topk_packed_batch(
        packed, QUERIES, cfg, ordered=ordered, max_gaps=4, k=None)
    ext = single.join(packed.docmap, "doc_id")
    want = {(r["query_id"], r["conv_id"], r["turn_idx"]): r["n_intervals"]
            for r in ext.collect()}
    assert got == want and got


@pytest.mark.parametrize("ordered", [False, True])
def test_local_equals_packed(packed, cfg, ordered):
    from searchengine_spark.query.intervals import local_intervals
    from searchengine_spark.query.serve import LocalSearcher

    want_rows = intervals_topk_packed_batch(
        packed, QUERIES, cfg, ordered=ordered, max_gaps=4, k=10).collect()
    want: dict = {}
    for r in want_rows:
        want[(r["query_id"], r["doc_id"])] = (r["n_intervals"], r["rank"])
    searcher = LocalSearcher(packed, preload=False, cfg=cfg)
    for qid, q in enumerate(QUERIES):
        rows = local_intervals(searcher, q, ordered=ordered, max_gaps=4,
                               k=10, resolve=False)
        got = {(qid, r["doc_id"]): (r["n_intervals"], r["rank"])
               for r in rows}
        assert got == {kk: v for kk, v in want.items() if kk[0] == qid}, q
