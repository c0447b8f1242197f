"""Attribute-filtered retrieval gates (Lucene filtered-search analog).

The filter must apply BEFORE the top-k heap — post-filtering an unfiltered
top-k silently returns < k rows (or the wrong docs) whenever the true
filtered hits rank below the global cut. These gates pin:

- filtered WAND == brute filtered re-rank of exhaustive full scores
- pruning safety under a filter (chunk bounds hold for any doc subset)
- all-docs filter == unfiltered; empty filter == empty results
- composition with tombstone deletes
- LocalSearcher filter_docs == distributed doc_filter (bm25 + boolean)
- filter_doc_ids predicate resolution through the docmap
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import Bm25Params
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.serve import LocalSearcher
from searchengine_spark.query.wand import (
    bm25_topk_packed_batch,
    boolean_search_packed,
    filter_doc_ids,
)
from searchengine_spark.tokenizer import TokenizerConfig

PARAMS = Bm25Params(k=1.2, b=0.75)
QUERIES = ["greatest rock album", "house party songs", "guitar solo"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=120, n_partitions=8)


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("filtered") / "idx")
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def user_docs(packed, corpus):
    """doc_ids of role='user' turns, via the predicate resolver."""
    return filter_doc_ids(packed, corpus, "role = 'user'")


@pytest.fixture(scope="module")
def user_ids(user_docs):
    return {int(r["doc_id"]) for r in user_docs.collect()}


def _topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 6))
        )
    return {q: sorted(v) for q, v in out.items()}


def _brute_filtered(packed, cfg, allowed_ids, k=10):
    """Exhaustive full scores -> keep allowed -> re-rank in pandas."""
    n = int(packed.manifest["n_docs"])
    full = bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=n, exhaustive=True, round_dp=6
    ).toPandas()
    full = full[full["doc_id"].isin(allowed_ids)]
    rows = []
    for qid, g in full.groupby("query_id"):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        for i, r in enumerate(g.itertuples(index=False), start=1):
            rows.append((qid, int(r.doc_id), round(float(r.score), 6), i))
    return {
        q: sorted((rk, d, s) for (qq, d, s, rk) in rows if qq == q)
        for q in {r[0] for r in rows}
    }


def test_filtered_equals_brute(packed, cfg, user_docs, user_ids):
    got = _topk_map(
        bm25_topk_packed_batch(
            packed, QUERIES, cfg, k=10, round_dp=6, doc_filter=user_docs
        )
    )
    want = _brute_filtered(packed, cfg, user_ids)
    assert got == want
    # the filter actually bites: some unfiltered top-10 doc is not a user turn
    unf = _topk_map(bm25_topk_packed_batch(packed, QUERIES, cfg, k=10, round_dp=6))
    assert any(
        d not in user_ids for v in unf.values() for (_, d, _) in v
    ), "fixture too weak: unfiltered top-10 is all user turns"
    for v in got.values():
        assert all(d in user_ids for (_, d, _) in v)


def test_pruning_safe_under_filter(packed, cfg, user_docs):
    pruned = _topk_map(
        bm25_topk_packed_batch(
            packed, QUERIES, cfg, k=10, round_dp=6, doc_filter=user_docs
        )
    )
    exh = _topk_map(
        bm25_topk_packed_batch(
            packed, QUERIES, cfg, k=10, round_dp=6, doc_filter=user_docs,
            exhaustive=True,
        )
    )
    assert pruned == exh


def test_all_docs_filter_equals_unfiltered(packed, cfg):
    everything = packed.docmap.select("doc_id")
    got = _topk_map(
        bm25_topk_packed_batch(
            packed, QUERIES, cfg, k=10, round_dp=6, doc_filter=everything
        )
    )
    want = _topk_map(bm25_topk_packed_batch(packed, QUERIES, cfg, k=10, round_dp=6))
    assert got == want


def test_empty_filter_empty_results(spark, packed, cfg):
    empty = spark.createDataFrame([], "doc_id long")
    out = bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, round_dp=6, doc_filter=empty
    )
    assert out.count() == 0


def test_filter_composes_with_deletes(spark, corpus, cfg, user_docs, user_ids,
                                      tmp_path):
    from searchengine_spark.indexing.deletes import delete_docs

    path = str(tmp_path / "idx_del")
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    pidx0 = load_packed_index(spark, path)
    base = _topk_map(
        bm25_topk_packed_batch(
            pidx0, QUERIES, cfg, k=10, round_dp=6, doc_filter=user_docs
        )
    )
    victims = sorted({d for v in base.values() for (_, d, _) in v})[:3]
    delete_docs(spark, path, doc_ids=victims)
    pidx = load_packed_index(spark, path)
    got = _topk_map(
        bm25_topk_packed_batch(
            pidx, QUERIES, cfg, k=10, round_dp=6, doc_filter=user_docs
        )
    )
    # non-vacuous: every query still returns filtered survivors, all of
    # them user docs, none tombstoned
    assert got and all(v for v in got.values())
    for v in got.values():
        assert all(d not in victims and d in user_ids for (_, d, _) in v)


def test_local_searcher_filter_matches_packed(packed, cfg, user_docs, user_ids):
    ls = LocalSearcher(packed, preload=True, cfg=cfg)
    dist = _topk_map(
        bm25_topk_packed_batch(
            packed, QUERIES, cfg, k=10, round_dp=6, doc_filter=user_docs
        )
    )
    for qid, q in enumerate(QUERIES):
        rows = ls.search(q, k=10, ranker="bm25", round_dp=6,
                         filter_docs=sorted(user_ids), resolve=False)
        got = sorted(
            (r["rank"], r["doc_id"], round(r["score"], 6)) for r in rows
        )
        assert got == dist.get(qid, []), q


def test_local_boolean_filter(packed, cfg, user_ids):
    ls = LocalSearcher(packed, preload=True, cfg=cfg)
    q = "guitar solo"
    unfiltered = {r["doc_id"] for r in
                  ls.search(q, ranker="boolean_and", resolve=False)}
    filtered = {r["doc_id"] for r in
                ls.search(q, ranker="boolean_and", resolve=False,
                          filter_docs=sorted(user_ids))}
    assert filtered == (unfiltered & user_ids)
    assert filtered != unfiltered, "fixture too weak: AND set all user turns"


def test_boolean_packed_composes_with_filter_semijoin(packed, cfg, user_docs):
    # boolean retrieval has no top-k, so a post semi-join IS correct there;
    # pin that the documented composition gives the same set as the local
    # filtered path
    ls = LocalSearcher(packed, preload=True, cfg=cfg)
    q = "guitar solo"
    dist = boolean_search_packed(packed, [q], cfg, op="and").join(
        user_docs, "doc_id"
    )
    got = {int(r["doc_id"]) for r in dist.collect()}
    want = {r["doc_id"] for r in
            ls.search(q, ranker="boolean_and", resolve=False,
                      filter_docs=[int(r["doc_id"]) for r in user_docs.collect()])}
    assert got == want


def test_filter_doc_ids_validates_columns(packed, corpus):
    with pytest.raises(ValueError, match="external-id columns"):
        filter_doc_ids(packed, corpus.select("role", "text"), "role = 'user'")


def test_local_refuses_unwired_rankers(packed, cfg):
    ls = LocalSearcher(packed, preload=True, cfg=cfg)
    with pytest.raises(NotImplementedError, match="filter_docs"):
        ls.search("guitar solo", ranker="tfidf", filter_docs=[1, 2, 3])


def test_suggest_terms_matches_brute(packed):
    from searchengine_spark.query.wand import suggest_terms

    stats = {r["term"]: int(r["df"]) for r in
             packed.term_stats.select("term", "df").collect()}
    want = sorted(
        ((t, d) for t, d in stats.items() if t.startswith("gu") and d > 0),
        key=lambda td: (-td[1], td[0]),
    )[:5]
    got = [(r["term"], int(r["df"]))
           for r in suggest_terms(packed, "gu", k=5).collect()]
    assert got == want and got, "prefix 'gu' should hit guitar/... vocab"
    with pytest.raises(ValueError):
        suggest_terms(packed, "")


def test_local_suggest_matches_distributed(packed, cfg):
    from searchengine_spark.query.wand import suggest_terms

    ls = LocalSearcher(packed, preload=True, cfg=cfg)
    lazy = LocalSearcher(packed, preload=False, cfg=cfg)
    want = [{"term": r["term"], "df": int(r["df"])}
            for r in suggest_terms(packed, "s", k=8).collect()]
    assert ls.suggest("s", k=8) == want
    assert lazy.suggest("s", k=8) == want


# ---------------------------------------------------------- conjunctive

def test_conjunctive_equals_brute(packed, cfg):
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    n = int(packed.manifest["n_docs"])
    and_sets: dict[int, set] = {}
    for r in boolean_search_packed(packed, QUERIES, cfg, op="and").collect():
        and_sets.setdefault(r["query_id"], set()).add(int(r["doc_id"]))
    full = bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=n, exhaustive=True, round_dp=6
    ).toPandas()
    want: dict[int, list] = {}
    for qid in and_sets:
        g = full[(full["query_id"] == qid)
                 & full["doc_id"].isin(and_sets[qid])]
        g = g.sort_values(["score", "doc_id"], ascending=[False, True]).head(10)
        want[qid] = sorted(
            (i + 1, int(r.doc_id), round(float(r.score), 6))
            for i, r in enumerate(g.itertuples(index=False))
        )
    got = _topk_map(
        bm25_topk_packed_batch(
            packed, QUERIES, cfg, k=10, round_dp=6, conjunctive=True
        )
    )
    assert got == want
    assert any(want.values()), "fixture too weak: no conjunctive matches"


def test_conjunctive_oov_term_empty(packed, cfg):
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    out = bm25_topk_packed_batch(
        packed, ["guitar zzzunknownzzz"], cfg, k=10, conjunctive=True
    )
    assert out.count() == 0


def test_local_conjunctive_matches_packed(packed, cfg):
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    ls = LocalSearcher(packed, preload=True, cfg=cfg)
    dist = _topk_map(
        bm25_topk_packed_batch(
            packed, QUERIES, cfg, k=10, round_dp=6, conjunctive=True
        )
    )
    for qid, q in enumerate(QUERIES):
        rows = ls.search(q, k=10, ranker="bm25_and", round_dp=6, resolve=False)
        got = sorted((r["rank"], r["doc_id"], round(r["score"], 6)) for r in rows)
        assert got == dist.get(qid, []), q
    assert ls.search("guitar zzzunknownzzz", ranker="bm25_and") == []


def test_conjunctive_composes_with_filter(packed, cfg, user_docs, user_ids):
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    out = bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, round_dp=6, conjunctive=True,
        doc_filter=user_docs,
    )
    and_sets: dict[int, set] = {}
    for r in boolean_search_packed(packed, QUERIES, cfg, op="and").collect():
        and_sets.setdefault(r["query_id"], set()).add(int(r["doc_id"]))
    rows = out.collect()
    assert rows  # non-vacuous: the composition really returns hits
    for r in rows:
        d = int(r["doc_id"])
        assert d in user_ids and d in and_sets[r["query_id"]]


def test_new_ops_on_maintained_index(spark, corpus, cfg, tmp_path):
    """Interplay gate: conjunctive / filtered / suggest stay internally
    consistent over an index that has seen appends AND deletes (appended
    docs retrievable, tombstoned docs gone, df live-exact)."""
    import datetime as dt

    from searchengine_spark.fixtures.transcripts import TRANSCRIPTS_SCHEMA
    from searchengine_spark.indexing.deletes import delete_docs
    from searchengine_spark.query.wand import (
        bm25_topk_packed_batch,
        suggest_terms,
    )
    from searchengine_spark.streaming.incremental import append_batch

    path = str(tmp_path / "m_idx")
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    rows = [
        ("zzconv", i, "user", f"greatest rock album encore {i}", None,
         dt.datetime(2026, 3, 1, 0, 0, i))
        for i in range(5)
    ]
    append_batch(
        spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA), path, cfg, batch_id=0
    )
    pidx = load_packed_index(spark, path)
    appended = sorted(
        int(r["doc_id"]) for r in
        pidx.docmap.filter(F.col("conv_id") == "zzconv").collect()
    )
    assert len(appended) == 5
    delete_docs(spark, path, doc_ids=[appended[0]])
    pidx = load_packed_index(spark, path)

    q = ["greatest rock album"]
    got = _topk_map(
        bm25_topk_packed_batch(pidx, q, cfg, k=10, round_dp=6,
                               conjunctive=True)
    )[0]
    got_ids = {d for (_, d, _) in got}
    assert set(appended[1:]) <= got_ids, "appended conjunctive docs missing"
    assert appended[0] not in got_ids, "tombstoned doc resurfaced"
    # brute: exhaustive OR scores restricted to the boolean-AND set
    and_set = {int(r["doc_id"]) for r in
               boolean_search_packed(pidx, q, cfg, op="and").collect()}
    assert and_set and appended[0] not in and_set
    n = int(pidx.manifest["n_docs"])
    full = bm25_topk_packed_batch(
        pidx, q, cfg, k=n, exhaustive=True, round_dp=6
    ).toPandas()
    g = full[full["doc_id"].isin(and_set)].sort_values(
        ["score", "doc_id"], ascending=[False, True]).head(10)
    want = sorted(
        (i + 1, int(r.doc_id), round(float(r.score), 6))
        for i, r in enumerate(g.itertuples(index=False))
    )
    assert got == want

    # suggest df is live-exact: 'encore' appears in 4 live appended docs
    sug = {r["term"]: int(r["df"])
           for r in suggest_terms(pidx, "encore", k=5).collect()}
    assert sug.get("encore") == 4

    # filtered retrieval over base+appended attrs
    attrs = corpus.unionByName(
        spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA))
    allowed = filter_doc_ids(pidx, attrs, "conv_id = 'zzconv'")
    f = _topk_map(
        bm25_topk_packed_batch(pidx, q, cfg, k=10, round_dp=6,
                               doc_filter=allowed)
    )[0]
    assert {d for (_, d, _) in f} == set(appended[1:])


# ---------------------------------------------------------- doc boosts

BOOST_EXPR = ("CASE WHEN role = 'user' THEN 1.5 "
              "WHEN role = 'tool' THEN 0.25 ELSE 1.0 END")


@pytest.fixture(scope="module")
def role_boost(packed, corpus):
    from searchengine_spark.query.wand import boost_doc_ids

    return boost_doc_ids(packed, corpus, BOOST_EXPR)


def test_boosted_equals_brute(packed, cfg, corpus, role_boost):
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    boosts = {int(r["doc_id"]): float(r["boost"]) for r in role_boost.collect()}
    assert boosts and all(b != 1.0 for b in boosts.values())
    n = int(packed.manifest["n_docs"])
    raw = bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=n, exhaustive=True
    ).toPandas()
    want: dict[int, list] = {}
    for qid, g in raw.groupby("query_id"):
        scored = sorted(
            ((round(float(r.score) * boosts.get(int(r.doc_id), 1.0), 6),
              int(r.doc_id)) for r in g.itertuples(index=False)),
            key=lambda x: (-x[0], x[1]),
        )[:10]
        want[qid] = sorted((i + 1, d, s) for i, (s, d) in enumerate(scored))
    got = _topk_map(
        bm25_topk_packed_batch(
            packed, QUERIES, cfg, k=10, round_dp=6, doc_boost=role_boost
        )
    )
    assert got == want
    unb = _topk_map(bm25_topk_packed_batch(packed, QUERIES, cfg, k=10, round_dp=6))
    assert got != unb, "fixture too weak: boosting changed nothing"


def test_boost_pruning_safe(packed, cfg, spark):
    # stress the bound scaling: huge boosts on docs that are NOT in the
    # unboosted top-k must still surface (a chunk the old bound would
    # skip now wins)
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    unb = _topk_map(bm25_topk_packed_batch(packed, QUERIES, cfg, k=10, round_dp=6))
    n = int(packed.manifest["n_docs"])
    raw = bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=n, exhaustive=True).toPandas()
    top_ids = {d for v in unb.values() for (_, d, _) in v}
    losers = sorted(set(raw["doc_id"].astype(int)) - top_ids)[:5]
    assert losers
    bdf = spark.createDataFrame([(d, 50.0) for d in losers],
                                "doc_id long, boost double")
    pruned = _topk_map(bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, round_dp=6, doc_boost=bdf))
    exh = _topk_map(bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, round_dp=6, doc_boost=bdf,
        exhaustive=True))
    assert pruned == exh
    boosted_ids = {d for v in pruned.values() for (_, d, _) in v}
    assert set(losers) & boosted_ids, "boosted losers should surface"


def test_boost_identity_and_negative(packed, cfg, spark):
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    ones = packed.docmap.select("doc_id").withColumn("boost", F.lit(1.0))
    got = _topk_map(bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, round_dp=6, doc_boost=ones))
    want = _topk_map(bm25_topk_packed_batch(packed, QUERIES, cfg, k=10,
                                            round_dp=6))
    assert got == want
    neg = spark.createDataFrame([(0, -1.0)], "doc_id long, boost double")
    with pytest.raises(Exception, match="non-negative"):
        bm25_topk_packed_batch(
            packed, ["guitar solo"], cfg, k=5, doc_boost=neg).collect()


def test_boost_composes_with_filter_and_conjunctive(packed, cfg, user_docs,
                                                    user_ids, role_boost):
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    out = bm25_topk_packed_batch(
        packed, QUERIES, cfg, k=10, round_dp=6, conjunctive=True,
        doc_filter=user_docs, doc_boost=role_boost,
    )
    and_sets: dict[int, set] = {}
    for r in boolean_search_packed(packed, QUERIES, cfg, op="and").collect():
        and_sets.setdefault(r["query_id"], set()).add(int(r["doc_id"]))
    rows = out.collect()
    assert rows
    for r in rows:
        d = int(r["doc_id"])
        assert d in user_ids and d in and_sets[r["query_id"]]


def test_local_boost_matches_distributed(packed, cfg, role_boost):
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    boosts = {int(r["doc_id"]): float(r["boost"]) for r in role_boost.collect()}
    dist = _topk_map(
        bm25_topk_packed_batch(
            packed, QUERIES, cfg, k=10, round_dp=6, doc_boost=role_boost
        )
    )
    ls = LocalSearcher(packed, preload=True, cfg=cfg)
    for qid, q in enumerate(QUERIES):
        rows = ls.search(q, k=10, ranker="bm25", round_dp=6,
                         boost_docs=boosts, resolve=False)
        got = sorted((r["rank"], r["doc_id"], round(r["score"], 6))
                     for r in rows)
        assert got == dist.get(qid, []), q
    with pytest.raises(NotImplementedError):
        ls.search("guitar solo", ranker="tfidf", boost_docs={0: 2.0})
