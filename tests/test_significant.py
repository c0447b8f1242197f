"""Significant-terms gates (query/significant.py; ES significant_terms
JLH): brute-force Python ground truth over the stored token streams,
min_doc_count floor, positive-lift-only, query-term exclusion, and the
deterministic (round(score,6) desc, term asc) order."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.build import Bm25Params
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.significant import (
    significant_terms,
    significant_terms_for_queries,
)
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text

PARAMS = Bm25Params(k=1.2, b=0.75)


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def packed(spark, corpus, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sigpacked") / "idx")
    build_packed_index(corpus, cfg, path, params=PARAMS, chunk_docs=256)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=80, n_partitions=8)


def _brute(pidx, hits_by_q, min_fg, exclude=None, k_terms=10):
    """Python ground truth from the stored token streams + live stats."""
    toks = {int(r["doc_id"]): list(r["tokens"])
            for r in pidx.doc_tokens().collect()}
    df = {r["term"]: int(r["df"]) for r in
          pidx.term_stats.select("term", "df").collect()}
    n = int(pidx.manifest.get("n_docs_live", pidx.manifest["n_docs"]))
    out = {}
    for qid, docs in hits_by_q.items():
        fg = {}
        for d in docs:
            for t in set(toks[d]):
                fg[t] = fg.get(t, 0) + 1
        cands = []
        for t, c in fg.items():
            if c < min_fg or (exclude and t in exclude.get(qid, ())):
                continue
            fr = c / len(docs)
            br = df[t] / n
            s = (fr - br) * (fr / br)
            if s > 0.0:
                cands.append((t, c, df[t], round(s, 6)))
        cands.sort(key=lambda x: (-x[3], x[0]))
        out[qid] = cands[:k_terms]
    return out


def _collect(df):
    out = {}
    for r in sorted(df.collect(), key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append(
            (r["term"], r["fg_count"], r["df"], r["score"]))
    return out


def test_significant_matches_bruteforce(spark, packed, cfg):
    queries = ["greatest rock album", "drummer tour"]
    base = bm25_topk_packed_batch(packed, queries, cfg, k=10, round_dp=6)
    hits_by_q = {}
    for r in base.collect():
        hits_by_q.setdefault(int(r["query_id"]), []).append(int(r["doc_id"]))
    got = _collect(significant_terms(packed, base, k_terms=10, min_fg=2))
    want = _brute(packed, hits_by_q, min_fg=2)
    assert got == want
    # every reported term has positive lift and clears the floor
    for rows in got.values():
        for t, c, d, s in rows:
            assert c >= 2 and s > 0


def test_min_fg_floor(spark, packed, cfg):
    base = bm25_topk_packed_batch(packed, ["guitar solo"], cfg, k=10,
                                  round_dp=6)
    loose = _collect(significant_terms(packed, base, k_terms=1000, min_fg=1))
    tight = _collect(significant_terms(packed, base, k_terms=1000, min_fg=5))
    assert all(c >= 5 for t, c, d, s in tight.get(0, []))
    tight_terms = {t for t, *_ in tight.get(0, [])}
    loose_terms = {t for t, *_ in loose.get(0, [])}
    assert tight_terms <= loose_terms and len(loose_terms) > len(tight_terms)
    with pytest.raises(ValueError, match="min_fg"):
        significant_terms(packed, base, min_fg=0)


def test_query_term_exclusion(spark, packed, cfg):
    q = "greatest rock album"
    out = significant_terms_for_queries(packed, [q], cfg, k=10, k_terms=20)
    qterms = set(tokenize_text(q, cfg))
    got_terms = {r["term"] for r in out.collect()}
    assert got_terms and not (got_terms & qterms)
    # without exclusion the searched terms (maximally lifted) show up
    raw = significant_terms_for_queries(packed, [q], cfg, k=10, k_terms=20,
                                        exclude_query_terms=False)
    assert {r["term"] for r in raw.collect()} & qterms


def test_federated_significant_equals_merged(spark, corpus, cfg,
                                             tmp_path_factory):
    from pyspark.sql import functions as F

    from searchengine_spark.indexing.merge import merge_packed_indexes
    from searchengine_spark.query.federated import bm25_topk_federated
    from searchengine_spark.query.significant import (
        significant_terms_federated,
    )

    base = tmp_path_factory.mktemp("sigfed")
    shards = []
    for i, part in enumerate(
        [corpus.filter(F.col("turn_idx") % 2 == 0),
         corpus.filter(F.col("turn_idx") % 2 == 1)]
    ):
        p = str(base / f"s{i}")
        build_packed_index(part, cfg, p, params=PARAMS, chunk_docs=256)
        shards.append(load_packed_index(spark, p))
    merged_path = str(base / "merged")
    merge_packed_indexes(spark, [s.path for s in shards], merged_path)
    merged = load_packed_index(spark, merged_path)

    # one shared hit set: every lift input (fg counts, df, N) is
    # corpus-global, so the federated result must equal the merged-index
    # result bit for bit — hits map between the two docID namespaces
    # (chunk-aligned federation bases vs dense merged ids) by external id
    from searchengine_spark.query.federated import resolve_docs_federated

    hits = bm25_topk_federated(shards, ["greatest rock album", "drummer"],
                               cfg, k=10, round_dp=6)
    fed = _collect(significant_terms_federated(shards, hits, k_terms=10))
    ext = resolve_docs_federated(shards, hits)
    merged_hits = ext.select("query_id", "conv_id", "turn_idx").join(
        merged.docmap, ["conv_id", "turn_idx"]).select("query_id", "doc_id")
    one = _collect(significant_terms(merged, merged_hits, k_terms=10))
    assert fed == one and fed


def test_significant_attr_values(spark):
    """significant_terms over ATTRIBUTE fields: JLH lift of a result
    set's attr values vs the whole-corpus background — the
    over-represented value wins, uniform values score 0 lift and drop,
    NULLs skip, min_fg gates."""
    from searchengine_spark.query.significant import significant_attr_values

    # corpus: 10 docs; tag 'x' on 2 docs, 'y' on 8. A query whose 4
    # hits are both x docs + two y docs: x is over-represented
    # (fg 2/4 = .5 vs bg 2/10 = .2), y UNDER-represented (lift <= 0).
    attrs = spark.createDataFrame(
        [(i, "x" if i < 2 else "y", "same") for i in range(10)]
        + [(10, None, "same")],
        "ext_id long, tag string, uni string")
    hits = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (0, 3)], "query_id int, ext_id long")
    got = significant_attr_values(hits, attrs, ["tag", "uni"],
                                  ["ext_id"], k=5, min_fg=2).collect()
    rows = {(r["facet"], r["value"]): r for r in got}
    assert ("tag", "x") in rows
    r = rows[("tag", "x")]
    assert (r["fg_count"], r["bg_count"], r["rank"]) == (2, 2, 1)
    fg, bg = 2 / 4, 2 / 11  # bg_total counts every attrs row (11)
    assert float(r["score"]) == pytest.approx(
        round((fg - bg) * (fg / bg), 6))
    # y: fg 2/4 = .5 vs bg 8/11 — negative lift, dropped
    assert ("tag", "y") not in rows
    # 'uni' is uniform: hits rate 4/4 = 1 vs bg 11/11... NULL tag rows
    # still carry uni='same', so fg_rate(1.0) > bg_rate(1.0)? equal ->
    # lift 0 -> dropped
    assert all(f != "uni" for f, _ in rows)
    with pytest.raises(ValueError, match="min_fg"):
        significant_attr_values(hits, attrs, ["tag"], ["ext_id"], min_fg=0)
    with pytest.raises(ValueError, match="lacks columns"):
        significant_attr_values(hits, attrs, ["nope"], ["ext_id"])
