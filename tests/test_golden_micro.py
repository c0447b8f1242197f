"""Golden micro-corpus gate (FIXTURES.md F5, SURVEY.md §2.7).

4 docs, whitespace tokenization (min_token_length=0, no stop words/stemming,
like the reference's own test entry src/test.py:69,91), BM25 k=1.2 b=0.75.
Expected values were produced by *executing the reference* and are also
re-derived here live via tests/ref_oracle.py, so the pin can never drift.
"""

import math

import pytest

from searchengine_spark.fixtures.transcripts import TRANSCRIPTS_SCHEMA
from searchengine_spark.indexing.build import Bm25Params, build_index
from searchengine_spark.query.bm25 import bm25_score_terms
from searchengine_spark.tokenizer import TokenizerConfig

from ref_oracle import ref_build_and_search, ref_index_stats

DOCS = [
    "good games for kids",
    "good old games games",
    "haha lols are funny",
    "old games are good for kids kids kids",
]
QUERY = "good old games games"  # duplicate term: must count once (§2.6.2)

# pinned from the executed reference (SURVEY.md §2.7)
GOLDEN_BM25 = [(1, 1.488018490590781), (3, 1.018905109489051), (0, 0.6273267326732673)]
GOLDEN_IDF = {
    "games": 0.288, "good": 0.288,
    "old": 0.693, "are": 0.693, "for": 0.693, "kids": 0.693,
    "funny": 1.386, "haha": 1.386, "lols": 1.386,
}
GOLDEN_DL_NORM = {0: 0.8, 1: 0.8, 2: 0.8, 3: 1.6}

CFG = TokenizerConfig(min_token_length=None, stop_words=None, stem_lang=None)


import datetime as dt


def _micro_df(spark):
    rows = [
        (f"c{0:03d}", i, "user", text, None, dt.datetime(2026, 1, 1, 0, 0, i))
        for i, text in enumerate(DOCS)
    ]
    return spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)


@pytest.fixture(scope="module")
def tables(spark):
    return build_index(_micro_df(spark), CFG, n_partitions=2).cache()


def test_index_stats_match_reference(tables, tmp_path):
    assert tables.n_docs == 4
    assert tables.avgdl == 5.0
    idf = {r["term"]: r["idf"] for r in tables.term_stats.collect()}
    assert idf == GOLDEN_IDF
    dln = {r["doc_id"]: r["dl_norm"] for r in tables.doc_lengths.collect()}
    assert dln == GOLDEN_DL_NORM
    postings = {
        (r["term"], r["doc_id"]): r["tf"] for r in tables.index.collect()
    }
    assert postings[("games", 1)] == 2 and postings[("kids", 3)] == 3

    # live re-derivation from the actual reference build
    ref = ref_index_stats(str(tmp_path), [d.split(" ") for d in DOCS])
    assert ref["idf"] == idf
    assert ref["dl_norm"] == dln
    for term, plist in ref["postings"].items():
        for d, tf in plist.items():
            assert postings[(term, d)] == tf
    assert sum(len(p) for p in ref["postings"].values()) == len(postings)


def test_bm25_scores_match_golden(tables):
    # query tokenized by whitespace split like the reference test (test.py:91)
    got = (
        bm25_score_terms(tables, QUERY.split(" "), Bm25Params(1.2, 0.75))
        .orderBy("score", ascending=False)
        .collect()
    )
    assert [(r["doc_id"], r["score"]) for r in got] == pytest.approx(GOLDEN_BM25)
    for (gd, gs), r in zip(GOLDEN_BM25, got):
        assert r["doc_id"] == gd
        assert math.isclose(r["score"], gs, rel_tol=0, abs_tol=1e-12)


def test_bm25_matches_live_reference(tables, tmp_path):
    ref_results, meta = ref_build_and_search(
        str(tmp_path),
        [d.split(" ") for d in DOCS],
        [QUERY.split(" ")],
        n=10,
        ranking_method="BM25",
    )
    got = (
        bm25_score_terms(tables, QUERY.split(" "), Bm25Params(1.2, 0.75))
        .orderBy("score", ascending=False)
        .collect()
    )
    ref_sorted = sorted(ref_results[0], key=lambda t: (-t[1], t[0]))
    assert len(got) == len(ref_sorted)
    for (rd, rs), r in zip(ref_sorted, got):
        assert r["doc_id"] == rd
        assert math.isclose(r["score"], rs, rel_tol=0, abs_tol=1e-12)
