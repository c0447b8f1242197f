"""Minimal-window span retrieval gates: brute-force oracle on the
transcripts fixture, handcrafted expectations, exact ≡ packed ≡ local
three-way parity, and a pure-python property test for min_span itself."""

from __future__ import annotations

import itertools
import random

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import build_index
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.serve import LocalSearcher
from searchengine_spark.query.spans import (
    local_minspan,
    min_span,
    minspan_topk_batch,
    minspan_topk_packed_batch,
)
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

N_CONV = 60


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=N_CONV, n_partitions=4)


@pytest.fixture(scope="module")
def exact(corpus, cfg):
    return build_index(corpus, cfg, positional=True).cache()


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spanspacked") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=256, positional=True)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def doc_tokens(exact):
    return {
        int(r["doc_id"]): list(r["tokens"])
        for r in exact.docs.select("doc_id", "tokens").collect()
    }


def brute_min_span(pos_lists):
    """Exponential reference: best combination of one position per list."""
    if not pos_lists or any(not p for p in pos_lists):
        return None
    best = None
    for combo in itertools.product(*pos_lists):
        lo, hi = min(combo), max(combo)
        key = (hi - lo, lo)
        if best is None or key < best:
            best = key
    return (best[1], best[0] + best[1])


def brute_spans(doc_tokens, terms):
    out = {}
    for doc_id, toks in doc_tokens.items():
        lists = [[i for i, t in enumerate(toks) if t == q] for q in terms]
        span = brute_min_span(lists)
        if span is not None:
            out[doc_id] = (span[1] - span[0] + 1, span[0], span[1])
    return out


def test_min_span_property():
    rng = random.Random(20260817)
    for trial in range(300):
        k = rng.randint(1, 4)
        lists = [
            sorted(rng.sample(range(30), rng.randint(0, 5))) for _ in range(k)
        ]
        want = brute_min_span(lists)
        got = min_span(lists)
        if want is None:
            assert got is None, lists
        else:
            # same span length AND the lowest-lo optimal window
            assert got == (want[0], want[0] + (want[1] - want[0])), (
                lists, got, want,
            )


def test_vectorized_matches_min_span():
    """The all-docs numpy kernel must agree with the per-doc merge (and so
    with the exponential brute) on random multi-doc streams."""
    import numpy as np

    from searchengine_spark.query.spans import _min_spans_vectorized

    rng = random.Random(20260818)
    for trial in range(200):
        k = rng.randint(1, 4)
        n_docs = rng.randint(1, 6)
        docs_l, pos_l, tid_l, want = [], [], [], {}
        for d in range(n_docs):
            lists = [
                sorted(rng.sample(range(40), rng.randint(0, 6)))
                for _ in range(k)
            ]
            # occupancy conflict: a position may host only one term
            seen = set()
            lists = [
                [p for p in ps if p not in seen and not seen.add(p)]
                for ps in lists
            ]
            for ti, ps in enumerate(lists):
                for p in ps:
                    docs_l.append(d)
                    pos_l.append(p)
                    tid_l.append(ti)
            span = min_span(lists)
            if span is not None:
                want[d] = (span[1] - span[0] + 1, span[0], span[1])
        got_doc, got_span, got_lo, got_hi = _min_spans_vectorized(
            np.array(docs_l, dtype=np.int64),
            np.array(pos_l, dtype=np.int64),
            np.array(tid_l, dtype=np.int64),
            k,
        )
        got = {
            int(d): (int(s), int(lo), int(hi))
            for d, s, lo, hi in zip(got_doc, got_span, got_lo, got_hi)
        }
        assert got == want, (trial, k)


def test_min_span_handcrafted():
    assert min_span([[0, 10], [2, 12]]) == (0, 2)
    assert min_span([[5]]) == (5, 5)
    assert min_span([[1, 9], [4], [5, 20]]) == (1, 5)
    assert min_span([[3], []]) is None
    assert min_span([]) is None


def _rows(df):
    return {
        (r["query_id"], r["doc_id"]): (
            r["span_len"], r["lo"], r["hi"], r["rank"]
        )
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def queries(doc_tokens):
    toks_by_len = sorted(doc_tokens.items(), key=lambda kv: -len(kv[1]))
    long_doc = toks_by_len[0][1]
    uniq = list(dict.fromkeys(long_doc))
    return [
        f"{uniq[0]} {uniq[3]}",            # common pair
        f"{uniq[1]} {uniq[4]} {uniq[2]}",  # triple
        uniq[0],                           # single term: span_len == 1
        f"zzzzunseen {uniq[0]}",           # absent term -> empty (AND)
    ]


def test_exact_vs_brute(exact, doc_tokens, queries, cfg):
    got = _rows(minspan_topk_batch(exact, queries, cfg, k=None))
    for qid, q in enumerate(queries):
        terms = list(dict.fromkeys(tokenize_text(q, cfg)))
        want = brute_spans(doc_tokens, terms) if "zzzz" not in q else {}
        got_q = {d: v[:3] for (i, d), v in got.items() if i == qid}
        assert got_q == want, q
        ranked = sorted(
            ((d, v) for (i, d), v in got.items() if i == qid),
            key=lambda kv: kv[1][3],
        )
        assert [d for d, _ in ranked] == [
            d for d, _ in sorted(want.items(), key=lambda kv: (kv[1][0], kv[0]))
        ], q


def test_packed_equals_exact(exact, packed, queries, cfg):
    want = _rows(minspan_topk_batch(exact, queries, cfg, k=10))
    got = _rows(minspan_topk_packed_batch(packed, queries, cfg, k=10))
    assert got == want and got


def test_local_equals_packed(packed, queries, cfg):
    want = _rows(minspan_topk_packed_batch(packed, queries, cfg, k=10))
    searcher = LocalSearcher(packed, preload=False, cfg=cfg)
    for qid, q in enumerate(queries):
        rows = local_minspan(searcher, q, k=10, resolve=False)
        got = {
            (qid, r["doc_id"]): (r["span_len"], r["lo"], r["hi"], r["rank"])
            for r in rows
        }
        assert got == {kk: v for kk, v in want.items() if kk[0] == qid}, q


def test_local_resolves(packed, queries, cfg):
    searcher = LocalSearcher(packed, preload=False, cfg=cfg)
    rows = local_minspan(searcher, queries[0], k=5)
    assert rows and all("conv_id" in r and "turn_idx" in r for r in rows)


def test_nonpositional_refuses(corpus, cfg):
    it = build_index(corpus, cfg, positional=False)
    with pytest.raises(ValueError, match="positional"):
        minspan_topk_batch(it, ["merge sort"], cfg)


def test_minspan_kernel_doc_id_guard():
    # docs*2^32+pos must fit int64: numpy wraps silently past 2^31 docs,
    # so the kernel refuses instead of corrupting the sort order
    import numpy as np

    from searchengine_spark.query.spans import _min_spans_vectorized

    docs = np.array([1 << 31], dtype=np.int64)
    pos = np.array([0], dtype=np.int64)
    tid = np.array([0], dtype=np.int64)
    with pytest.raises(ValueError, match="doc_id exceeds"):
        _min_spans_vectorized(docs, pos, tid, 1)
