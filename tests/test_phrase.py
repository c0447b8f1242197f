"""Exact-phrase retrieval gates: handcrafted expectations on a tiny corpus,
brute-force Python oracle on the transcripts fixture, and three-way parity
exact ≡ packed ≡ LocalSearcher."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import build_index
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.phrase import (
    local_phrase,
    phrase_topk_batch,
    phrase_topk_packed_batch,
)
from searchengine_spark.query.serve import LocalSearcher
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
    path = str(tmp_path_factory.mktemp("phrasepacked") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=256, positional=True)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def doc_tokens(exact):
    return {
        int(r["doc_id"]): list(r["tokens"])
        for r in exact.docs.select("doc_id", "tokens").collect()
    }


@pytest.fixture(scope="module")
def phrases(doc_tokens, cfg):
    """Real phrases harvested from the corpus plus known-tricky shapes."""
    toks_by_len = sorted(doc_tokens.items(), key=lambda kv: -len(kv[1]))
    long_doc = toks_by_len[0][1]
    got = [
        " ".join(long_doc[2:4]),      # present bigram
        " ".join(long_doc[5:8]),      # present trigram
        long_doc[0],                  # single-term phrase: occurrences == tf
        " ".join([long_doc[1]] * 2),  # repeated-term phrase
        "zzzzunseen " + long_doc[0],  # absent term -> empty
    ]
    assert all(tokenize_text(p, cfg) for p in got[:4])
    return got


def brute_phrase(doc_tokens, slots):
    n = len(slots)
    out = {}
    for doc_id, toks in doc_tokens.items():
        starts = [
            p
            for p in range(len(toks) - n + 1)
            if all(toks[p + i] == slots[i] for i in range(n))
        ]
        if starts:
            out[doc_id] = (len(starts), starts[0])
    return out


def _rows(df):
    return {
        (r["query_id"], r["doc_id"]): (r["n_occurrences"], r["first_pos"], r["rank"])
        for r in df.collect()
    }


def test_tiny_corpus_handcrafted(spark, stop_words):
    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words)
    rows = [
        ("c0", 0, "user", "merge sort beats quick sort", None, None),
        ("c1", 0, "user", "merge the sort keys", None, None),  # stop word gap
        ("c2", 0, "user", "merge merge sort merge sort", None, None),
        ("c3", 0, "user", "sort merge", None, None),
        ("c4", 0, "user", "nothing relevant here", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    it = build_index(df, cfg, positional=True)
    got = _rows(phrase_topk_batch(it, ["merge sort"], cfg, k=None))
    # 'the' is a stop word -> c1 tokenizes to [merge, sort, keys]: adjacent
    # post-filter. c2 = [merge, merge, sort, merge, sort] has TWO
    # occurrences (starts 1 and 3); c3 is reversed -> no match.
    assert got == {
        (0, 2): (2, 1, 1),  # two occurrences -> rank 1
        (0, 0): (1, 0, 2),  # one occurrence at start 0, doc tie-break
        (0, 1): (1, 0, 3),
    }


def test_exact_vs_brute(exact, doc_tokens, phrases, cfg):
    got = _rows(phrase_topk_batch(exact, phrases, cfg, k=None))
    for qid, p in enumerate(phrases):
        slots = tokenize_text(p, cfg)
        want = brute_phrase(doc_tokens, slots) if slots else {}
        got_q = {d: v for (q, d), v in got.items() if q == qid}
        assert {d: v[:2] for d, v in got_q.items()} == want, p
        # rank ordering: by occurrences desc then doc_id
        ranked = sorted(got_q.items(), key=lambda kv: kv[1][2])
        assert [d for d, _ in ranked] == [
            d for d, _ in sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))
        ]


def test_packed_equals_exact(exact, packed, phrases, cfg):
    want = _rows(phrase_topk_batch(exact, phrases, cfg, k=10))
    got = _rows(phrase_topk_packed_batch(packed, phrases, cfg, k=10))
    assert got == want


def test_local_equals_packed(packed, phrases, cfg):
    want = _rows(phrase_topk_packed_batch(packed, phrases, cfg, k=10))
    searcher = LocalSearcher(packed, preload=False, cfg=cfg)
    for qid, p in enumerate(phrases):
        rows = local_phrase(searcher, p, k=10, resolve=False)
        got = {
            (qid, r["doc_id"]): (r["n_occurrences"], r["first_pos"], r["rank"])
            for r in rows
        }
        assert got == {kk: v for kk, v in want.items() if kk[0] == qid}, p


def test_local_resolves_external_ids(packed, phrases, cfg):
    searcher = LocalSearcher(packed, preload=False, cfg=cfg)
    rows = local_phrase(searcher, phrases[0], k=5)
    assert rows and all("conv_id" in r and "turn_idx" in r for r in rows)


def test_nonpositional_refuses(corpus, cfg, spark, tmp_path_factory):
    it = build_index(corpus, cfg, positional=False)
    with pytest.raises(ValueError, match="positional"):
        phrase_topk_batch(it, ["merge sort"], cfg)


def test_empty_and_stopword_phrases(exact, packed, cfg):
    """No phrases / phrases that tokenize to nothing: empty frame, not an
    AnalysisException (create_map() with zero entries cannot type-check)."""
    for phrases in ([], ["the", "of the"]):  # stop words vanish entirely
        assert phrase_topk_batch(exact, phrases, cfg).count() == 0
        assert phrase_topk_packed_batch(packed, phrases, cfg).count() == 0


def test_phrase_random_property(spark, cfg):
    """Seeded-random corpora over a tiny vocabulary (so phrases repeat and
    overlap) vs the brute-force oracle — exercises repeated terms,
    multi-occurrence docs and absent slots far beyond the harvested cases."""
    import random

    rng = random.Random(20260817)
    vocab = ["alpha", "beta", "gamma", "delta", "alpha"]  # skewed
    rows = [
        ("c%02d" % (i // 8), i % 8, "user",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))),
         None, None)
        for i in range(48)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    it = build_index(df, cfg, positional=True).cache()
    toks = {
        int(r["doc_id"]): list(r["tokens"])
        for r in it.docs.select("doc_id", "tokens").collect()
    }
    phrases = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4)))
        for _ in range(12)
    ]
    got = _rows(phrase_topk_batch(it, phrases, cfg, k=None))
    for qid, p in enumerate(phrases):
        want = brute_phrase(toks, tokenize_text(p, cfg))
        got_q = {d: v[:2] for (q, d), v in got.items() if q == qid}
        assert got_q == want, p
    it.unpersist()


def test_phrase_on_appended_index(spark, cfg, tmp_path):
    """Streaming-append interaction: phrase retrieval over base+appended
    epochs equals a positional rebuild of the union corpus (appended
    same-chunk rows and widened manifests feed the same aggregation)."""
    import datetime as dt

    from searchengine_spark.streaming.incremental import append_batch

    corpus = transcripts_df(spark, n_conv=10)
    idx = str(tmp_path / "pidx")
    build_packed_index(corpus, cfg, idx, chunk_docs=256, positional=True)
    rows = [
        ("zzconv", i, "user", f"merge sort appended turn {i} merge sort",
         None, dt.datetime(2026, 7, 1, 0, 0, i))
        for i in range(3)
    ]
    batch = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    append_batch(batch, idx, cfg, batch_id=0)
    pidx = load_packed_index(spark, idx)

    rebuilt = build_index(corpus.unionByName(batch), cfg, positional=True)
    want = _rows(phrase_topk_batch(rebuilt, ["merge sort"], cfg, k=None))
    got = _rows(phrase_topk_packed_batch(pidx, ["merge sort"], cfg, k=None))
    assert got == want
    n_base = int(corpus.count())
    assert any(d >= n_base for (_, d) in got), "appended docs must match"
    # the LocalSearcher tier sees the appended epoch too
    searcher = LocalSearcher(pidx, preload=False, cfg=cfg)
    local = {
        (0, r["doc_id"]): (r["n_occurrences"], r["first_pos"], r["rank"])
        for r in local_phrase(searcher, "merge sort", k=None, resolve=False)
    }
    assert local == want


def test_phrase_kernel_doc_id_guard():
    # doc*2^32+start must fit int64 — the kernel refuses past 2^31 docs
    import numpy as np
    from types import SimpleNamespace

    from searchengine_spark.query.phrase import _phrase_group

    docs = np.array([1 << 31], dtype=np.int64)
    tfs = np.array([1], dtype=np.int64)
    row = SimpleNamespace(postings=b"", positions=b"")
    with pytest.raises(ValueError, match="doc_id exceeds"):
        _phrase_group(
            ["alpha"],
            {0: [row]},
            lambda buf: (docs, tfs, None),
            lambda buf, t: (
                np.zeros(1, dtype=np.int64),
                np.zeros(1, dtype=np.int64),
            ),
        )


# ---------------------------------------------------------------- slop

def brute_sloppy(doc_tokens, slots, slop):
    """Greedy ordered-span matcher (Lucene span_near in_order=true): from
    each slot-0 position take the smallest next position per slot; match
    iff span <= n-1+slop. Greedy-min provably minimizes the span."""
    n = len(slots)
    out = {}
    for doc_id, toks in doc_tokens.items():
        pos_by_slot = [[p for p, t in enumerate(toks) if t == slots[i]]
                       for i in range(n)]
        starts = []
        for p0 in pos_by_slot[0]:
            prev, ok = p0, True
            for i in range(1, n):
                nxt = [p for p in pos_by_slot[i] if p > prev]
                if not nxt:
                    ok = False
                    break
                prev = min(nxt)
            if ok and prev - p0 - (n - 1) <= slop:
                starts.append(p0)
        if starts:
            out[doc_id] = (len(starts), starts[0])
    return out


@pytest.fixture(scope="module")
def slop_phrases(doc_tokens, cfg):
    """Gapped phrases harvested from the corpus: token pairs/triples at
    distance 2-3, so slop=0 misses them and slop>=1 finds them."""
    toks_by_len = sorted(doc_tokens.items(), key=lambda kv: -len(kv[1]))
    long_doc = toks_by_len[0][1]
    got = [
        f"{long_doc[2]} {long_doc[4]}",                 # gap 1 -> slop 1
        f"{long_doc[5]} {long_doc[6]} {long_doc[9]}",   # gap 2 -> slop 2
        " ".join(long_doc[2:4]),                        # adjacent control
    ]
    assert all(tokenize_text(p, cfg) for p in got)
    return got


def test_sloppy_vs_brute(packed, doc_tokens, slop_phrases, cfg):
    for slop in (0, 1, 2, 5):
        got = _rows(phrase_topk_packed_batch(packed, slop_phrases, cfg,
                                             k=None, slop=slop))
        for qid, p in enumerate(slop_phrases):
            want = brute_sloppy(doc_tokens, tokenize_text(p, cfg), slop)
            have = {d: (v[0], v[1]) for (q, d), v in got.items() if q == qid}
            assert have == want, (p, slop)
    # the harvested gaps really exercise slop: widening it finds MORE
    # docs for the gapped query (the planted gap-1 doc at minimum)
    at0 = _rows(phrase_topk_packed_batch(packed, slop_phrases, cfg,
                                         k=None, slop=0))
    at1 = _rows(phrase_topk_packed_batch(packed, slop_phrases, cfg,
                                         k=None, slop=1))
    n0 = sum(1 for q, _ in at0 if q == 0)
    n1 = sum(1 for q, _ in at1 if q == 0)
    assert n1 > n0


def test_slop_zero_equals_exact(exact, packed, phrases, cfg):
    """slop=0 through the sloppy kernel == the exact-phrase contract
    (greedy-min degenerates to adjacency)."""
    from searchengine_spark.query import phrase as phrase_mod

    want = _rows(phrase_topk_batch(exact, phrases, cfg, k=10))
    orig = phrase_mod._phrase_group

    def force_sloppy(toks, rows_by_slot, dec, dec_pos, slop=0):
        return phrase_mod._sloppy_group(toks, rows_by_slot, dec, dec_pos, 0)

    phrase_mod._phrase_group = force_sloppy
    try:
        got = _rows(phrase_topk_packed_batch(packed, phrases, cfg, k=10))
    finally:
        phrase_mod._phrase_group = orig
    assert got == want


def test_slop_monotone_and_local_parity(packed, slop_phrases, cfg):
    searcher = LocalSearcher(packed, preload=False, cfg=cfg)
    prev: set = set()
    for slop in (0, 1, 2, 4):
        got = _rows(phrase_topk_packed_batch(packed, slop_phrases, cfg,
                                             k=None, slop=slop))
        # match sets grow monotonically with slop
        assert prev <= set(got)
        prev = set(got)
        for qid, p in enumerate(slop_phrases):
            rows = local_phrase(searcher, p, k=None, resolve=False,
                                slop=slop)
            have = {(qid, r["doc_id"]): (r["n_occurrences"], r["first_pos"])
                    for r in rows}
            assert have == {kk: (v[0], v[1]) for kk, v in got.items()
                            if kk[0] == qid}, (p, slop)


def test_slop_refusals(exact, packed, cfg):
    with pytest.raises(NotImplementedError, match="packed tier"):
        phrase_topk_batch(exact, ["rock album"], cfg, slop=1)
    with pytest.raises(ValueError, match="slop"):
        phrase_topk_packed_batch(packed, ["rock album"], cfg, slop=-1)
