"""Sliding-window chunking gates (textops/chunking.py): the span plan
matches a brute Python replay of the boundary contract on every doc,
the coverage/overlap/size invariants hold, chunk_text is the exact
token-slice join, short docs emit one chunk, empty docs none, and the
plan is shuffle-free (narrow — no Exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.textops.chunking import sliding_chunks
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

CFG = TokenizerConfig(min_token_length=2)

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "one two three"),
    (2, ""),
    (3, "!!! ??? ..."),
    (4, " ".join(f"tok{i:03d}" for i in range(57))),
    (5, "exactly four tokens here"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _replay(text, max_tokens, stride):
    toks = tokenize_text(text, CFG)
    n = len(toks)
    if n == 0:
        return []
    if n <= max_tokens:
        n_chunks = 1
    else:
        n_chunks = 1 + (n - max_tokens + stride - 1) // stride
    out = []
    for i in range(n_chunks):
        start = i * stride
        end = min(start + max_tokens, n)
        out.append((i, start, end - start, " ".join(toks[start:end])))
    return out


@pytest.mark.parametrize("max_tokens,stride", [(8, 4), (8, 8), (5, 2), (1, 1)])
def test_matches_replay_and_invariants(spark, docs, max_tokens, stride):
    got: dict = {}
    rows = sliding_chunks(docs, CFG, max_tokens, stride).collect()
    for r in rows:
        got.setdefault(r["id"], []).append(
            (r["chunk_idx"], r["start_token"], r["n_tokens"], r["chunk_text"]))
    for did, text in DOCS:
        want = _replay(text, max_tokens, stride)
        have = sorted(got.get(did, []))
        assert have == want, (did, max_tokens, stride)
        toks = tokenize_text(text, CFG)
        covered = set()
        for _, start, n_toks, _ in have:
            assert 1 <= n_toks <= max_tokens
            covered.update(range(start, start + n_toks))
        assert covered == set(range(len(toks)))
        for (i1, s1, n1, _), (i2, s2, n2, _) in zip(have, have[1:]):
            assert s2 - s1 == stride  # fixed stride
            assert s2 + n2 > s1 + n1  # never contained in predecessor


def test_short_doc_single_chunk(spark, docs):
    rows = [r for r in sliding_chunks(docs, CFG, 100, 10).collect()
            if r["id"] == 0]
    assert len(rows) == 1 and rows[0]["start_token"] == 0


def test_plan_is_narrow(spark, docs):
    from contextlib import redirect_stdout
    import io

    df = sliding_chunks(docs, CFG, 8, 4, with_text=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        sliding_chunks(docs, CFG, 0, 1)
    with pytest.raises(ValueError):
        sliding_chunks(docs, CFG, 4, 5)
    with pytest.raises(ValueError):
        sliding_chunks(docs, CFG, 4, 0)
