"""Hot-term / long-conversation skew gates (north_rule: explicit handling).

The packed build's skew story is structural: the range shuffle keys on
(term, doc_id), so a stop-word-like term occupying most documents is SPLIT
across range partitions at doc_id boundaries, and the chunk layout
(doc_id // chunk_docs) bounds every encoded posting row. These tests build
a pathologically skewed corpus and assert both properties plus end-to-end
correctness on it.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import TRANSCRIPTS_SCHEMA
from searchengine_spark.indexing.build import Bm25Params, build_index
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.bm25 import bm25_topk_batch
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(min_token_length=2)
PARAMS = Bm25Params(1.2, 0.75)
N_DOCS = 3000
CHUNK = 128


def _skewed_df(spark):
    """'hot' appears in ~95% of docs (multiple times); one conversation has
    80% of all turns (long-conversation skew)."""
    rows = []
    n_long = int(N_DOCS * 0.8)
    for i in range(N_DOCS):
        conv = "conv_long" if i < n_long else f"conv{i:05d}"
        turn = i if i < n_long else 0
        body = f"word{i % 97} word{i % 31} filler{i % 7}"
        if i % 20 != 0:  # 95%
            body = "hot hot hot " + body
        rows.append(
            (conv, turn, "user", body, None, dt.datetime(2026, 3, 1) + dt.timedelta(seconds=i))
        )
    return spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)


@pytest.fixture(scope="module")
def packed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skew") / "idx")
    # disable AQE partition coalescing for this build: at toy scale it
    # (correctly) merges the tiny shuffle outputs into one partition, which
    # would hide the range split this suite asserts
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        build_packed_index(
            _skewed_df(spark), CFG, path, params=PARAMS, chunk_docs=CHUNK, n_partitions=8
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    return load_packed_index(spark, path)


def test_hot_term_is_chunk_split(packed):
    rows = packed.index.filter(F.col("term") == "hot").collect()
    # the hot term's postings are bounded per row by the chunk layout …
    assert len(rows) >= N_DOCS // CHUNK  # split into many chunk rows
    assert all(r["df_chunk"] <= CHUNK for r in rows)
    # … and cover ~95% of the corpus in total
    assert sum(r["df_chunk"] for r in rows) == N_DOCS - N_DOCS // 20


def test_no_partition_holds_whole_hot_term(spark, packed):
    """The range shuffle must SPLIT the hot term across output files —
    no single task/file materializes all its postings."""
    import os

    from pyspark.sql import functions as F

    idx_dir = os.path.join(packed.path, "index")
    per_file = (
        spark.read.parquet(idx_dir)
        .filter(F.col("term") == "hot")
        .withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(F.sum("df_chunk").alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in per_file)
    assert len(per_file) >= 2, "hot term landed in a single file"
    assert max(r["n"] for r in per_file) < total


def test_skewed_corpus_scores_exactly(spark, packed):
    """End-to-end: WAND over the skewed packed index == M1 exact scorer."""
    exact = build_index(_skewed_df(spark), CFG, n_partitions=8).cache()
    queries = ["hot word3", "hot filler2 word30", "word5 word31"]
    wand = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk_packed_batch(packed, queries, CFG, k=10, params=PARAMS).collect()
    }
    m1 = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk_batch(exact, queries, CFG, k=10, params=PARAMS).collect()
    }
    assert wand == m1
