"""Attribute-sorted retrieval gates (query/sortby.py — the ES ``sort``
clause).

Contract: the query decides WHICH docs match (OR / conjunctive AND over
the score-all surface — never a WAND top-k-by-score cut), the attribute
decides the ORDER (asc/desc, then score desc, then doc_id asc);
missing-attribute matches still appear and sort per ``missing``
(_last default / _first); cross-path brute oracle via the EXACT index.
"""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing import build_index
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.sortby import sort_by_attr_packed
from searchengine_spark.tokenizer import TokenizerConfig

QUERY = "guitar solo drum"
AND_QUERY = "guitar solo"  # 3-term AND is empty at this corpus size


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=6)


@pytest.fixture(scope="module")
def pidx(spark, cfg, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("srt") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=64)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def attrs(spark, corpus):
    """Deterministic attribute table: price = (turn_idx*7) mod 50 with
    ties, NULL every 11th turn, every 13th turn ABSENT entirely (the
    LEFT-join miss)."""
    return (
        corpus.select("conv_id", "turn_idx")
        .filter(F.col("turn_idx") % 13 != 0)
        .withColumn(
            "price",
            F.when(F.col("turn_idx") % 11 == 0, None)
            .otherwise((F.col("turn_idx") * 7) % 50).cast("long"))
    )


def _brute(spark, corpus, cfg, attrs, ascending, missing, conjunctive,
           query=QUERY):
    """Cross-path oracle: EXACT index matched set + scores, attrs joined
    and sorted in Python."""
    from searchengine_spark.query.bm25 import bm25_topk
    from searchengine_spark.tokenizer import tokenize_text

    it = build_index(corpus, cfg, n_partitions=4)
    rows = bm25_topk(it, query, cfg, k=1 << 20).collect()
    if conjunctive:
        terms = set(dict.fromkeys(tokenize_text(query, cfg)))
        cover = {
            int(r["doc_id"]): int(r["n"])
            for r in it.index.filter(F.col("term").isin(list(terms)))
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("n")).collect()
        }
        rows = [r for r in rows if cover.get(int(r["doc_id"])) == len(terms)]
    amap = {(r["conv_id"], r["turn_idx"]): r["price"]
            for r in attrs.collect()}
    dm = {int(r["doc_id"]): (r["conv_id"], int(r["turn_idx"]))
          for r in it.docmap.collect()}
    out = []
    for r in rows:
        key = dm[int(r["doc_id"])]
        out.append((amap.get(key), round(float(r["score"]), 6),
                    int(r["doc_id"])))

    def srt(t):
        v, s, d = t
        # missing group sorts wholly before (_first) / after (_last)
        pos = (0 if (v is None and missing == "first")
               else 2 if v is None else 1)
        return (pos, 0 if v is None else (v if ascending else -v), -s, d)

    out.sort(key=srt)
    return [(d, v) for v, s, d in out]


@pytest.mark.parametrize("ascending,missing,conjunctive", [
    (False, "last", False),
    (True, "last", False),
    (True, "first", False),
    (False, "last", True),
])
def test_sort_matches_brute(spark, corpus, cfg, pidx, attrs,
                            ascending, missing, conjunctive):
    q = AND_QUERY if conjunctive else QUERY
    got = sort_by_attr_packed(
        pidx, [q], cfg, attrs, "price", k=25, ascending=ascending,
        missing=missing, conjunctive=conjunctive, round_dp=6).collect()
    got = [(int(r["doc_id"]),
            None if r["sort_value"] is None else int(r["sort_value"]))
           for r in sorted(got, key=lambda r: r["rank"])]
    want = _brute(spark, corpus, cfg, attrs, ascending, missing,
                  conjunctive, query=q)[:25]
    assert got == want
    assert len(got) > 0


def test_missing_matches_still_appear(spark, pidx, cfg, attrs, corpus):
    """NULL-priced and absent-from-attrs matches are matches: with k =
    matched-set size, every matched doc appears exactly once."""
    from searchengine_spark.query.wand import bm25_scores_packed_batch

    n_matched = (bm25_scores_packed_batch(pidx, [QUERY], cfg)
                 .count())
    rows = sort_by_attr_packed(pidx, [QUERY], cfg, attrs, "price",
                               k=1 << 20).collect()
    assert len(rows) == n_matched
    assert any(r["sort_value"] is None for r in rows)
    # _last default: every NULL sorts after every valued row
    ranks_null = [r["rank"] for r in rows if r["sort_value"] is None]
    ranks_val = [r["rank"] for r in rows if r["sort_value"] is not None]
    assert min(ranks_null) > max(ranks_val)


def test_validation(pidx, cfg, attrs):
    with pytest.raises(ValueError, match="missing must be"):
        sort_by_attr_packed(pidx, [QUERY], cfg, attrs, "price",
                            missing="bottom")
    with pytest.raises(ValueError, match="lacks columns"):
        sort_by_attr_packed(pidx, [QUERY], cfg, attrs, "nope")


def test_federated_sort_matches_brute(spark, corpus, cfg, attrs,
                                      tmp_path_factory):
    """Turn-parity shards: federated sort equals a Python brute over the
    federated score-all surface (global idf, shard-local dl_norm)
    joined to the attrs table — matched set preserved, missing-attr
    matches still appear, (sort, score desc, doc asc) order."""
    from searchengine_spark.query.federated import (
        _doc_bases,
        bm25_scores_federated,
    )
    from searchengine_spark.query.sortby import sort_by_attr_federated

    base = tmp_path_factory.mktemp("srtfed")
    shards = []
    for i, part in enumerate(
        [corpus.filter(F.col("turn_idx") % 2 == 0),
         corpus.filter(F.col("turn_idx") % 2 == 1)]
    ):
        p = str(base / f"s{i}")
        build_packed_index(part, cfg, p, chunk_docs=64)
        shards.append(load_packed_index(spark, p))

    flat = bm25_scores_federated(shards, [QUERY], cfg, round_dp=6).collect()
    dm = {}
    for s, b in zip(shards, _doc_bases(shards)):
        for r in s.docmap.collect():
            dm[int(r["doc_id"]) + b] = (r["conv_id"], int(r["turn_idx"]))
    amap = {(r["conv_id"], r["turn_idx"]): r["price"]
            for r in attrs.collect()}
    out = []
    for r in flat:
        v = amap.get(dm[int(r["doc_id"])])
        out.append((v, float(r["score"]), int(r["doc_id"])))
    out.sort(key=lambda t: (
        2 if t[0] is None else 1,
        0 if t[0] is None else -t[0],  # descending
        -t[1], t[2]))
    want = [(d, v) for v, s, d in out[:8]]

    got_rows = sort_by_attr_federated(
        shards, [QUERY], cfg, attrs, "price", k=8, round_dp=6).collect()
    got = [(int(r["doc_id"]), r["sort_value"])
           for r in sorted(got_rows, key=lambda r: r["rank"])]
    assert got == want and got
    # missing-attr matches appear (fixture guarantees some in-window)
    assert any(v is None for _, v in got) or all(
        v is not None for v, _, _ in out[:8])
