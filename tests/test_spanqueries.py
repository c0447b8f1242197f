"""span_first / span_not gates: brute-force twins on the transcripts
fixture, exact ≡ packed ≡ local three-way parity, kernel property tests,
and the refusal contracts (non-positional index, multi-token clause,
include == exclude)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import build_index
from searchengine_spark.indexing.packed import (
    build_packed_index,
    load_packed_index,
)
from searchengine_spark.query.serve import LocalSearcher
from searchengine_spark.query.spanqueries import (
    _span_first_kernel,
    _span_not_kernel,
    local_span_first,
    local_span_not,
    span_first_topk_batch,
    span_first_topk_packed_batch,
    span_not_topk_batch,
    span_not_topk_packed_batch,
)
from searchengine_spark.tokenizer import TokenizerConfig

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
    path = str(tmp_path_factory.mktemp("spanq") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=256, positional=True)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def doc_tokens(exact):
    return {
        int(r["doc_id"]): list(r["tokens"])
        for r in exact.docs.select("doc_id", "tokens").collect()
    }


@pytest.fixture(scope="module")
def terms(doc_tokens):
    # two common terms (appear in many docs) + one mid-frequency term
    from collections import Counter

    df = Counter()
    for toks in doc_tokens.values():
        df.update(set(toks))
    common = [t for t, _ in df.most_common(8)]
    return common


@pytest.fixture(scope="module")
def first_queries(terms):
    return [(terms[0], 3), (terms[1], 1), (terms[2], 10), ("zzzzunseen", 5)]


@pytest.fixture(scope="module")
def not_queries(terms):
    return [(terms[0], terms[1]), (terms[2], terms[0]), (terms[3], "zzzzunseen")]


def brute_first(doc_tokens, term, end):
    out = {}
    for d, toks in doc_tokens.items():
        pos = [i for i, t in enumerate(toks) if t == term and i < end]
        if pos:
            out[d] = (len(pos), pos[0])
    return out


def brute_not(doc_tokens, inc, exc, pre, post):
    out = {}
    for d, toks in doc_tokens.items():
        ip = [i for i, t in enumerate(toks) if t == inc]
        ep = [i for i, t in enumerate(toks) if t == exc]
        clear = [
            p for p in ip
            if not any(p - pre <= e <= p + post for e in ep)
        ]
        if clear:
            out[d] = (len(clear), clear[0])
    return out


def _rows(df, metric, first_col):
    return {
        (r["query_id"], r["doc_id"]): (r[metric], r[first_col], r["rank"])
        for r in df.collect()
    }


# ------------------------------------------------------------- kernels


def test_span_first_kernel_property():
    rng = random.Random(20260820)
    for _ in range(200):
        n = rng.randint(0, 40)
        docs = np.array([rng.randint(0, 5) for _ in range(n)], dtype=np.int64)
        pos = np.array([rng.randint(0, 30) for _ in range(n)], dtype=np.int64)
        end = rng.randint(1, 25)
        want = {}
        for d in set(docs.tolist()):
            ps = sorted(int(p) for dd, p in zip(docs, pos) if dd == d and p < end)
            if ps:
                want[d] = (len(ps), ps[0])
        gd, gn, gf = _span_first_kernel(docs, pos, end)
        got = {int(d): (int(n_), int(f)) for d, n_, f in zip(gd, gn, gf)}
        assert got == want


def test_span_not_kernel_property():
    rng = random.Random(20260821)
    for _ in range(200):
        ni, ne = rng.randint(0, 30), rng.randint(0, 30)
        idocs = np.array([rng.randint(0, 4) for _ in range(ni)], dtype=np.int64)
        ipos = np.array([rng.randint(0, 25) for _ in range(ni)], dtype=np.int64)
        edocs = np.array([rng.randint(0, 4) for _ in range(ne)], dtype=np.int64)
        epos = np.array([rng.randint(0, 25) for _ in range(ne)], dtype=np.int64)
        pre, post = rng.randint(0, 4), rng.randint(0, 4)
        want = {}
        for d in set(idocs.tolist()):
            ip = sorted(int(p) for dd, p in zip(idocs, ipos) if dd == d)
            ep = [int(p) for dd, p in zip(edocs, epos) if dd == d]
            clear = [
                p for p in ip if not any(p - pre <= e <= p + post for e in ep)
            ]
            if clear:
                want[d] = (len(clear), clear[0])
        gd, gn, gf = _span_not_kernel(idocs, ipos, edocs, epos, pre, post)
        got = {int(d): (int(n_), int(f)) for d, n_, f in zip(gd, gn, gf)}
        assert got == want


# ------------------------------------------------------------ span_first


def test_first_exact_vs_brute(exact, doc_tokens, first_queries, cfg):
    got = _rows(
        span_first_topk_batch(exact, first_queries, cfg, k=None),
        "n_within",
        "first_pos",
    )
    for qid, (term, end) in enumerate(first_queries):
        want = brute_first(doc_tokens, term, end)
        got_q = {d: v[:2] for (i, d), v in got.items() if i == qid}
        assert got_q == want, (term, end)
        # rank order: first_pos asc, doc_id asc
        ranked = sorted(
            ((d, v) for (i, d), v in got.items() if i == qid),
            key=lambda kv: kv[1][2],
        )
        assert [d for d, _ in ranked] == [
            d for d, _ in sorted(want.items(), key=lambda kv: (kv[1][1], kv[0]))
        ]


def test_first_packed_equals_exact(exact, packed, first_queries, cfg):
    want = _rows(
        span_first_topk_batch(exact, first_queries, cfg, k=10),
        "n_within", "first_pos",
    )
    got = _rows(
        span_first_topk_packed_batch(packed, first_queries, cfg, k=10),
        "n_within", "first_pos",
    )
    assert got == want and got


def test_first_local_equals_packed(packed, first_queries, cfg):
    want = _rows(
        span_first_topk_packed_batch(packed, first_queries, cfg, k=10),
        "n_within", "first_pos",
    )
    searcher = LocalSearcher(packed, preload=False, cfg=cfg)
    for qid, (term, end) in enumerate(first_queries):
        rows = local_span_first(searcher, term, end, k=10, resolve=False)
        got = {
            (qid, r["doc_id"]): (r["n_within"], r["first_pos"], r["rank"])
            for r in rows
        }
        assert got == {kk: v for kk, v in want.items() if kk[0] == qid}


# ------------------------------------------------------------- span_not


def test_not_exact_vs_brute(exact, doc_tokens, not_queries, cfg):
    for pre, post in ((0, 0), (2, 2), (1, 3)):
        got = _rows(
            span_not_topk_batch(exact, not_queries, cfg, pre=pre, post=post,
                                k=None),
            "n_clear", "first_clear",
        )
        for qid, (inc, exc) in enumerate(not_queries):
            want = brute_not(doc_tokens, inc, exc, pre, post)
            got_q = {d: v[:2] for (i, d), v in got.items() if i == qid}
            assert got_q == want, (inc, exc, pre, post)


def test_not_packed_equals_exact(exact, packed, not_queries, cfg):
    want = _rows(
        span_not_topk_batch(exact, not_queries, cfg, pre=2, post=2, k=10),
        "n_clear", "first_clear",
    )
    got = _rows(
        span_not_topk_packed_batch(packed, not_queries, cfg, pre=2, post=2,
                                   k=10),
        "n_clear", "first_clear",
    )
    assert got == want and got


def test_not_local_equals_packed(packed, not_queries, cfg):
    want = _rows(
        span_not_topk_packed_batch(packed, not_queries, cfg, pre=1, post=3,
                                   k=10),
        "n_clear", "first_clear",
    )
    searcher = LocalSearcher(packed, preload=False, cfg=cfg)
    for qid, (inc, exc) in enumerate(not_queries):
        rows = local_span_not(searcher, inc, exc, pre=1, post=3, k=10,
                              resolve=False)
        got = {
            (qid, r["doc_id"]): (r["n_clear"], r["first_clear"], r["rank"])
            for r in rows
        }
        assert got == {kk: v for kk, v in want.items() if kk[0] == qid}


def test_not_excluded_everywhere(exact, doc_tokens, cfg, terms):
    """A huge window excludes every include occurrence in docs holding
    both terms — those docs must vanish, doc holding only include stay."""
    inc, exc = terms[0], terms[1]
    got = _rows(
        span_not_topk_batch(exact, [(inc, exc)], cfg, pre=10**6, post=10**6,
                            k=None),
        "n_clear", "first_clear",
    )
    want = brute_not(doc_tokens, inc, exc, 10**6, 10**6)
    assert {d: v[:2] for (_, d), v in got.items()} == want
    both = {
        d for d, toks in doc_tokens.items() if inc in toks and exc in toks
    }
    assert both.isdisjoint({d for (_, d) in got})


# ------------------------------------------------------------- refusals


def test_refusals(corpus, cfg, exact, packed):
    nonpos = build_index(corpus, cfg, positional=False)
    with pytest.raises(ValueError, match="positional"):
        span_first_topk_batch(nonpos, [("merge", 5)], cfg)
    with pytest.raises(ValueError, match="positional"):
        span_not_topk_batch(nonpos, [("merge", "sort")], cfg)
    with pytest.raises(ValueError, match="exactly one term"):
        span_first_topk_batch(exact, [("merge sort", 5)], cfg)
    with pytest.raises(ValueError, match="same term"):
        span_not_topk_batch(exact, [("merge", "merge")], cfg)
    with pytest.raises(ValueError, match="positive"):
        span_first_topk_batch(exact, [("merge", 0)], cfg)
    with pytest.raises(ValueError, match=">= 0"):
        span_not_topk_batch(exact, [("merge", "sort")], cfg, pre=-1)
    searcher = LocalSearcher(packed, preload=False, cfg=cfg)
    with pytest.raises(ValueError, match="same term"):
        local_span_not(searcher, "merge", "merge")


def _brute_within_containing(doc_tokens, a, b, c, width):
    """Python twin of the enumerable-window contract."""
    within, containing = {}, {}
    for did, toks in doc_tokens.items():
        pa = [i for i, t in enumerate(toks) if t == a]
        pb = [i for i, t in enumerate(toks) if t == b]
        pc = [i for i, t in enumerate(toks) if t == c]
        if not (pa and pb and pc):
            continue
        wins = [(x, y) for x in pa for y in pb if x < y <= x + width]
        w_hits = [p for p in pc if any(x <= p <= y for x, y in wins)]
        c_hits = [(x, y) for x, y in wins if any(x <= p <= y for p in pc)]
        if w_hits:
            within[did] = (len(w_hits), min(w_hits))
        if c_hits:
            containing[did] = (len(c_hits), min(x for x, _ in c_hits))
    return within, containing


def test_within_containing_vs_brute(exact, doc_tokens, terms, cfg):
    from searchengine_spark.query.spanqueries import (
        span_containing_topk_batch,
        span_within_topk_batch,
    )

    a, b, c = terms[0], terms[1], terms[2]
    queries = [(a, b, c, 6), (b, a, c, 3)]
    got_w = span_within_topk_batch(exact, queries, cfg, k=None).collect()
    got_c = span_containing_topk_batch(exact, queries, cfg, k=None).collect()
    for qid, (qa, qb, qc, width) in enumerate(queries):
        ww, cc = _brute_within_containing(doc_tokens, qa, qb, qc, width)
        gw = {r["doc_id"]: (r["n_within"], r["first_within"])
              for r in got_w if r["query_id"] == qid}
        gc = {r["doc_id"]: (r["n_containing"], r["first_pos"])
              for r in got_c if r["query_id"] == qid}
        assert gw == ww and gw, (qid, "within")
        assert gc == cc and gc, (qid, "containing")
    # ranks follow (count desc, doc asc)
    for rows, ncol in ((got_w, "n_within"), (got_c, "n_containing")):
        for qid in range(len(queries)):
            rq = sorted(((r["rank"], r["doc_id"], r[ncol])
                         for r in rows if r["query_id"] == qid))
            resorted = sorted(rq, key=lambda t: (-t[2], t[1]))
            assert [r[0] for r in rq] == list(range(1, len(rq) + 1))
            assert rq == resorted


def test_within_refusals(exact, cfg):
    from searchengine_spark.query.spanqueries import (
        span_containing_topk_batch,
        span_within_topk_batch,
    )

    with pytest.raises(ValueError, match="width"):
        span_within_topk_batch(exact, [("merge", "sort", "hash", 0)], cfg)
    with pytest.raises(ValueError, match="distinct"):
        span_containing_topk_batch(exact, [("merge", "merge", "hash", 3)],
                                   cfg)
    with pytest.raises(ValueError, match="one term"):
        span_within_topk_batch(exact, [("merge sort", "hash", "join", 3)],
                               cfg)


def test_within_containing_packed_equals_exact(exact, packed, terms, cfg):
    from searchengine_spark.query.spanqueries import (
        span_containing_topk_batch,
        span_containing_topk_packed_batch,
        span_within_topk_batch,
        span_within_topk_packed_batch,
    )

    queries = [(terms[0], terms[1], terms[2], 6),
               (terms[1], terms[0], terms[2], 3)]
    for f_ex, f_pk in ((span_within_topk_batch,
                        span_within_topk_packed_batch),
                       (span_containing_topk_batch,
                        span_containing_topk_packed_batch)):
        ex = sorted(map(tuple, f_ex(exact, queries, cfg, k=10).collect()))
        pk = sorted(map(tuple, f_pk(packed, queries, cfg, k=10).collect()))
        assert ex == pk and ex, f_ex.__name__


def test_within_containing_local_equals_packed(packed, terms, cfg):
    from searchengine_spark.query.spanqueries import (
        local_span_containing,
        local_span_within,
        span_containing_topk_packed_batch,
        span_within_topk_packed_batch,
    )

    a, b, c = terms[0], terms[1], terms[2]
    searcher = LocalSearcher(packed, preload=False, cfg=cfg)
    lw = local_span_within(searcher, a, b, c, width=6, k=10, resolve=False)
    pw = span_within_topk_packed_batch(
        packed, [(a, b, c, 6)], cfg, k=10).collect()
    assert [(r["doc_id"], r["n_within"], r["first_within"], r["rank"])
            for r in lw] == \
           [(r["doc_id"], r["n_within"], r["first_within"], r["rank"])
            for r in sorted(pw, key=lambda r: r["rank"])]
    lc = local_span_containing(searcher, a, b, c, width=6, k=10,
                               resolve=False)
    pc = span_containing_topk_packed_batch(
        packed, [(a, b, c, 6)], cfg, k=10).collect()
    assert [(r["doc_id"], r["n_containing"], r["first_pos"], r["rank"])
            for r in lc] == \
           [(r["doc_id"], r["n_containing"], r["first_pos"], r["rank"])
            for r in sorted(pc, key=lambda r: r["rank"])]
    assert lw and lc
