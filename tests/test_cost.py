"""Circuit-breaker gates (query/cost.py): the estimate equals the
exact Σ df from the index's own statistics (OOV terms cost 0, unique-
terms quirk honored), the breaker trips on any over-budget query with
the full per-query accounting, and under-budget batches pass through
with their estimates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.cost import (
    CostBudgetExceeded,
    check_cost_budget,
    estimate_query_cost,
)
from searchengine_spark.tokenizer import TokenizerConfig, tokenize_text


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def packed(spark, cfg, tmp_path_factory):
    corpus = transcripts_df(spark, n_conv=15, n_partitions=4)
    path = str(tmp_path_factory.mktemp("cost") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=128)
    return load_packed_index(spark, path)


def test_estimate_is_exact_df_sum(packed, cfg):
    dfs = {r["term"]: int(r["df"])
           for r in packed.term_stats.select("term", "df").collect()}
    queries = ["rock album", "rock rock zzzoov", ""]
    est = estimate_query_cost(packed, queries, cfg)
    for e, q in zip(est, queries):
        terms = list(dict.fromkeys(tokenize_text(q, cfg)))
        assert e["cost"] == sum(dfs.get(t, 0) for t in terms), q
        assert e["terms"] == {t: dfs.get(t, 0) for t in terms}
    assert est[2]["cost"] == 0
    assert "zzzoov" in est[1]["terms"] and est[1]["terms"]["zzzoov"] == 0


def test_breaker_trips_and_passes(packed, cfg):
    est = estimate_query_cost(packed, ["rock album"], cfg)
    cost = est[0]["cost"]
    assert cost > 0
    # passes at budget == cost
    out = check_cost_budget(packed, ["rock album"], cfg, budget=cost)
    assert out[0]["cost"] == cost
    # trips just below, message carries the worst query
    with pytest.raises(CostBudgetExceeded) as ei:
        check_cost_budget(packed, ["rock album", "music"], cfg,
                          budget=cost - 1)
    assert "rock album" in str(ei.value) or "music" in str(ei.value)
    assert ei.value.budget == cost - 1
    with pytest.raises(ValueError):
        check_cost_budget(packed, ["x"], cfg, budget=0)
