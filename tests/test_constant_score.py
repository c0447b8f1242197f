"""ES constant_score gates (query/boolquery.py constant_score_topk):
the matched set equals the already-gated boolean retrieval cut to k by
doc_id, every score is exactly the boost literal, and the physical plan
never touches term_stats / doc-length norms — the ES filter-context
contract (matching without scoring statistics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.boolquery import constant_score_topk
from searchengine_spark.query.wand import boolean_search_packed
from searchengine_spark.tokenizer import TokenizerConfig

QUERIES = ["the search engine", "vector index", "nosuchword atall"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def packed(spark, cfg, tmp_path_factory):
    corpus = transcripts_df(spark, n_conv=20, n_partitions=4)
    path = str(tmp_path_factory.mktemp("cscore") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=128)
    return load_packed_index(spark, path)


@pytest.mark.parametrize("op", ["and", "or"])
def test_matches_boolean_set_cut_by_docid(packed, cfg, op):
    out = constant_score_topk(packed, QUERIES, cfg, boost=2.5, op=op, k=5)
    rows = out.collect()
    got = {}
    for r in rows:
        assert r["score"] == 2.5
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    want_full = {}
    for r in boolean_search_packed(packed, QUERIES, cfg, op=op).collect():
        want_full.setdefault(r["query_id"], []).append(r["doc_id"])
    for qid, docs in want_full.items():
        want = sorted(docs)[:5]
        gotq = [d for _, d in sorted(got.get(qid, []))]
        assert gotq == want, (op, qid)
        # ranks are 1..n contiguous
        assert [i for i, _ in sorted(got.get(qid, []))] == list(
            range(1, len(want) + 1))
    # zero-match query emits nothing
    assert 2 not in got


def test_plan_is_scoring_free(packed, cfg):
    from contextlib import redirect_stdout
    import io

    df = constant_score_topk(packed, QUERIES[:1], cfg, boost=1.0, op="and", k=10)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "term_stats" not in plan
    assert "doc_norms" not in plan


def test_k_validation(packed, cfg):
    with pytest.raises(ValueError):
        constant_score_topk(packed, QUERIES, cfg, k=0)
