"""THE rank-identical gate (BASELINE.json north_rule).

Build both engines over the same synthetic transcripts corpus (FIXTURES.md
F1) with the reference tokenizer config (min_token_length=3, reference
stop_words.txt, no stemming — F3 minus nltk), run the 15 reference queries
(/root/reference/queries.relevance.txt), and require top-10 docIDs AND BM25
scores identical under the deterministic tie policy (score desc, doc_id asc;
SURVEY.md §2.6.6), scores to 1e-9.

The reference side is the REAL engine (tests/ref_oracle.py drives its disk
pipeline); docIDs align because the oracle feeds docs in (conv_id, turn_idx)
order = our dense docID order.
"""

import pytest

from searchengine_spark.fixtures import REFERENCE_QUERIES, generate_transcripts_pdf, transcripts_df
from searchengine_spark.indexing.build import Bm25Params, build_index
from searchengine_spark.query.bm25 import bm25_topk, bm25_topk_batch
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

from ref_oracle import ref_build_and_search

N_CONV = 150
SEED = 20260816
TOPK = 10


def _key(rows):
    """deterministic compare key: (-score rounded 1e-9, doc_id)"""
    return sorted(((round(-s, 9), d) for d, s in rows))[:TOPK]


@pytest.fixture(scope="module")
def corpus(spark, stop_words):
    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words)
    pdf = generate_transcripts_pdf(n_conv=N_CONV, seed=SEED)
    t = transcripts_df(spark, n_conv=N_CONV, seed=SEED)
    tables = build_index(t, cfg, n_partitions=6).cache()
    return cfg, pdf, tables


@pytest.fixture(scope="module")
def reference_results(corpus, tmp_path_factory):
    cfg, pdf, _ = corpus
    doc_tokens = [tokenize_text(t, cfg) for t in pdf["text"]]
    query_tokens = [tokenize_text(q, cfg) for q in REFERENCE_QUERIES]
    results, meta = ref_build_and_search(
        str(tmp_path_factory.mktemp("ref")),
        doc_tokens,
        query_tokens,
        n=50,  # over-fetch so boundary ties resolve under OUR tie policy
        ranking_method="BM25",
        k=1.2,
        b=0.75,
    )
    assert meta["ranker"] == "BM25"
    return results


def test_rank_identical_top10_all_queries(corpus, reference_results):
    cfg, _, tables = corpus
    batch = bm25_topk_batch(tables, REFERENCE_QUERIES, cfg, k=50, params=Bm25Params(1.2, 0.75))
    ours = {}
    for r in batch.collect():
        ours.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))

    n_matched = 0
    for qid, query in enumerate(REFERENCE_QUERIES):
        ref_top = _key(reference_results[qid])
        our_top = _key(ours.get(qid, []))
        assert our_top == ref_top, f"query {query!r}: {our_top} != {ref_top}"
        if ref_top:
            n_matched += 1
    # the fixture plants every query's phrase -> all 15 must have results
    assert n_matched == len(REFERENCE_QUERIES)


def test_single_query_api_matches_batch(corpus):
    cfg, _, tables = corpus
    q = REFERENCE_QUERIES[0]
    single = [(r["doc_id"], round(r["score"], 9)) for r in bm25_topk(tables, q, cfg, k=TOPK).collect()]
    batch = bm25_topk_batch(tables, [q], cfg, k=TOPK)
    b = [
        (r["doc_id"], round(r["score"], 9))
        for r in batch.orderBy("rank").collect()
    ]
    assert single == b
    assert len(single) > 0
