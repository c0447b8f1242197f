"""Plan-shape regression gates: the optimizations we rely on must stay in
the physical plan (SURVEY.md §4 / README scale design)."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(min_token_length=3)


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "idx")
    build_packed_index(transcripts_df(spark, n_conv=30), CFG, path, chunk_docs=256)
    return load_packed_index(spark, path)


def explain_str(df) -> str:
    from contextlib import redirect_stdout
    import io

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_wand_scan_pushes_term_filter(pidx):
    df = bm25_topk_packed_batch(pidx, ["greatest rock album"], CFG, k=5)
    plan = explain_str(df)
    # the literal In(term, …) predicate must reach the parquet scan: that is
    # the reference's sorted-file binary search (index.py:93-131) done by
    # row-group pruning
    assert "PushedFilters" in plan
    assert "In(term" in plan


def test_wand_is_join_free(pidx):
    """The serving batch is join-FREE: query-id fan-out is a literal map
    projection and idf rides the scorer closure — no broadcast exchanges,
    no join operators at all (single-query latency = one scan job)."""
    df = bm25_topk_packed_batch(pidx, ["greatest rock album"], CFG, k=5)
    plan = explain_str(df)
    assert "Join" not in plan
    assert "BroadcastExchange" not in plan


def test_wand_single_shuffle(pidx):
    df = bm25_topk_packed_batch(pidx, ["greatest rock album"], CFG, k=5)
    plan = explain_str(df)
    # one hash exchange (groupBy query_id into the scorer); broadcast
    # exchanges excluded
    assert plan.count("Arguments: hashpartitioning") == 1, plan


def test_boolean_packed_plan(pidx):
    """Boolean packed search: pushed term filter + broadcast query side;
    the only wide exchange is the (query_id, doc_id) count-distinct agg."""
    from searchengine_spark.query.wand import boolean_search_packed

    df = boolean_search_packed(pidx, ["greatest rock album"], CFG, op="and")
    plan = explain_str(df)
    assert "PushedFilters" in plan and "In(term" in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_tfidf_packed_plan(spark, tmp_path_factory):
    """TF-IDF packed serving: pushed term filter, broadcast query joins;
    the doc_norms join runs over the bounded candidate set (no cartesian)."""
    from searchengine_spark.query.proximity import tfidf_topk_packed_batch

    path = str(tmp_path_factory.mktemp("plans_tfidf") / "idx")
    build_packed_index(
        transcripts_df(spark, n_conv=30), CFG, path, chunk_docs=256,
        tfidf_sidecar=True,
    )
    pidx = load_packed_index(spark, path)
    df = tfidf_topk_packed_batch(pidx, ["greatest rock album"], CFG, k=5)
    plan = explain_str(df)
    assert "PushedFilters" in plan and "In(term" in plan
    assert "CartesianProduct" not in plan


def test_phrase_packed_plan(spark, tmp_path_factory):
    """Packed phrase retrieval: pushed term filter (only the phrase terms'
    chunks are scanned), broadcast slot join, no cartesian; the shuffle
    moves CHUNK rows into the (query_id, chunk) group scorer — exactly two
    wide exchanges (group scorer + rank window), never per-posting hits."""
    from searchengine_spark.query.phrase import phrase_topk_packed_batch

    path = str(tmp_path_factory.mktemp("plans_phrase") / "idx")
    build_packed_index(
        transcripts_df(spark, n_conv=30), CFG, path, chunk_docs=256,
        positional=True,
    )
    pidx = load_packed_index(spark, path)
    df = phrase_topk_packed_batch(pidx, ["greatest rock album"], CFG, k=5)
    plan = explain_str(df)
    assert "PushedFilters" in plan and "In(term" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Arguments: hashpartitioning") <= 2, plan
    assert "FlatMapGroupsInPandas" in plan  # the per-chunk group scorer
    # no per-posting explode before the exchange: the only generator-free
    # path from scan to scorer carries (chunk, postings, positions) rows
    assert ") Generate" not in plan, plan


def test_simhash_plan_is_bit_parallel(spark):
    """SimHash signature build must not explode rows 64x: no cross join /
    cartesian / explode-of-bit-indices in the plan — exactly ONE exchange
    (the id groupBy carrying the 64 partial sums as columns), and exactly
    one generator (the tokens explode)."""
    from pyspark.sql import functions as F

    from searchengine_spark.textops import simhash_table
    from searchengine_spark.tokenizer import tokens_column

    docs = spark.createDataFrame(
        [(0, "some text here"), (1, "more text there")], "doc_id long, text string"
    )
    df = simhash_table(docs, tokens_column(F.col("text"), CFG), id_col="doc_id")
    plan = explain_str(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    # formatted explain lists each node once in the tree and once as a
    # "(N) Generate" detail header — exactly one generator node = the
    # tokens explode, no bit-index explode
    assert plan.count(") Generate") == 1, plan
    assert "partial_sum" in plan  # map-side combine of the 64 bit sums


def test_exact_scorer_reads_pruned_columns(spark, pidx):
    # column pruning: scoring never reads the postings blob's siblings it
    # doesn't need (df_chunk/first_doc/last_doc stay, but e.g. docmap cols
    # never enter the scan)
    df = bm25_topk_packed_batch(pidx, ["rock"], CFG, k=5)
    plan = explain_str(df)
    assert "conv_id" not in plan


def test_compaction_is_single_wide_shuffle(spark, pidx, tmp_path_factory):
    """The compaction index rewrite must be exactly a build's index stage:
    decode (narrow) -> ONE range exchange -> encode. No joins, no hash
    exchanges, no generators."""
    import numpy as np

    from searchengine_spark.indexing.compact import merged_index_plan
    from searchengine_spark.indexing.deletes import DeleteMask

    mask = DeleteMask(np.array([3, 7], dtype=np.int64))
    df = merged_index_plan(
        spark, pidx.manifest, [pidx.path + "/index"], mask
    )
    plan = explain_str(df)
    assert plan.count("Arguments: rangepartitioning") == 1, plan
    assert "Arguments: hashpartitioning" not in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert ") Generate" not in plan, plan  # decode is mapInPandas, not explode


def test_masked_wand_keeps_join_free_plan(spark, tmp_path_factory):
    """Tombstones ride the scorer closure: a deleted index must serve with
    the SAME plan shape as a clean one (no tombstone join, no extra
    exchange, filter still pushed)."""
    from searchengine_spark.indexing.deletes import delete_docs

    path = str(tmp_path_factory.mktemp("plansdel") / "idx")
    build_packed_index(transcripts_df(spark, n_conv=10), CFG, path, chunk_docs=256)
    delete_docs(spark, path, where="doc_id % 4 = 0")
    pidx = load_packed_index(spark, path)
    assert pidx.delete_mask() is not None
    df = bm25_topk_packed_batch(pidx, ["greatest rock album"], CFG, k=5)
    plan = explain_str(df)
    assert "Join" not in plan and "BroadcastExchange" not in plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "PushedFilters" in plan and "In(term" in plan


def test_filtered_wand_plan(pidx, spark, tmp_path):
    """Filtered retrieval on the production shape (attrs from parquet):
    the predicate PUSHES DOWN to the attrs scan, the In(term) pruning is
    intact, and the only additions are the docmap-resolution join and the
    per-chunk allowed-set join — the filter never rides a
    closure/broadcast-collect."""
    from searchengine_spark.query.wand import filter_doc_ids

    apath = str(tmp_path / "attrs")
    transcripts_df(spark, n_conv=30).write.mode("overwrite").parquet(apath)
    attrs = spark.read.parquet(apath)
    allowed = filter_doc_ids(pidx, attrs, "role = 'user'")
    df = bm25_topk_packed_batch(
        pidx, ["greatest rock album"], CFG, k=5, doc_filter=allowed
    )
    plan = explain_str(df)
    assert "In(term" in plan                      # scan pruning intact
    assert "EqualTo(role,user)" in plan, plan     # predicate at the scan
    # conjunctive / unweighted paths add no plan operators at all
    base = explain_str(
        bm25_topk_packed_batch(pidx, ["greatest rock album"], CFG, k=5,
                               conjunctive=True)
    )
    assert "Join" not in base and "BroadcastExchange" not in base


def test_suggest_plan_is_stats_only(pidx):
    """suggest never scans the postings: its only file source is the
    term_stats sidecar, with the prefix pushed down."""
    from searchengine_spark.query.wand import suggest_terms

    plan = explain_str(suggest_terms(pidx, "gr", k=5))
    assert "StringStartsWith(term,gr)" in plan, plan
    assert "term_stats" in plan
    assert "/index" not in plan.replace("term_stats", "")


def test_collocations_bigram_extraction_no_pre_agg_exchange(spark):
    """The pair stream must reach its groupBy straight from the scan: the
    only exchanges in the whole plan are the two count aggregations and
    the post-floor unigram joins (no positional self-join of the corpus)."""
    from pyspark.sql import functions as F

    from searchengine_spark.textops.collocations import bigram_collocations
    from searchengine_spark.tokenizer import tokens_column

    toks = transcripts_df(spark, n_conv=10).select(
        tokens_column(F.col("text"), CFG).alias("tokens")
    )
    plan = explain_str(bigram_collocations(toks, min_count=2, k=10))
    # no window functions, no cartesian/positional self-join of token rows
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_textops_bind_tokens_once(spark):
    """Tokenize expressions must be BOUND to a column before any
    interpreted higher-order lambda references them: HOFs get no
    common-subexpression elimination, so an inline tokenize re-runs per
    element reference (measured 26x on minhash shingles). Gate: the
    tokenizer's regexp appears in each optimized plan a bounded number of
    times (one binding projection per input branch), not once per lambda
    reference."""
    from pyspark.sql import functions as F

    from searchengine_spark.textops.dedup import minhash_lsh_candidates
    from searchengine_spark.textops.quality import repetition_stats
    from searchengine_spark.tokenizer import tokens_column

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    toks = tokens_column(F.col("text"), CFG)
    for df, cap in (
        (minhash_lsh_candidates(docs, toks), 3),
        (repetition_stats(docs, toks), 3),
    ):
        plan = explain_str(df)
        # the tokenizer's punct->space translate pass; the formatted plan
        # lists the binding Project in <= 3 sections, the broken inline
        # form repeats it once per lambda reference (>> cap)
        n = plan.count("translate(")
        assert 1 <= n <= cap, f"tokenize evaluated {n} times:\n{plan[:2000]}"
    # winnowing: the kgram md5 array must be bound before the window-min
    # lambda slices it (inline => O(n^2) hashes per doc)
    from searchengine_spark.textops.quality import doc_fingerprints

    plan = explain_str(doc_fingerprints(docs))
    n = plan.count("substr(")
    assert 1 <= n <= 3, f"kgram array evaluated {n} times:\n{plan[:2000]}"


def test_score_all_single_shuffle_join_free(pidx):
    """The score-ALL surface (collapse/dis_max substrate) keeps the WAND
    batch's plan discipline: pushed term filter, join-free, exactly ONE
    hash exchange (groupBy (query_id, chunk) into the flat scorer)."""
    from searchengine_spark.query.wand import bm25_scores_packed_batch

    df = bm25_scores_packed_batch(pidx, ["greatest rock album"], CFG)
    plan = explain_str(df)
    assert "PushedFilters" in plan and "In(term" in plan
    assert "Join" not in plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan


def test_collapse_plan_shape(pidx):
    """Collapse: the group argmax must be a partial-aggregable hash
    aggregate over the docmap join (max-of-struct), never a window over
    raw docs — the window appears exactly once, over the aggregated
    groups. No cartesian products, no extra joins beyond the one docmap
    key join."""
    from searchengine_spark.query.collapse import collapse_topk_packed

    import re

    df = collapse_topk_packed(pidx, ["greatest rock album"], CFG, k=5)
    plan = explain_str(df)
    # exactly ONE Window node (over aggregated groups); the
    # WindowGroupLimit nodes beside it are Spark's rank<=k pushdown —
    # the top-k cut happens pre-shuffle, which is exactly what we want
    assert len(set(re.findall(r"\((\d+)\) Window\b", plan))) == 1, plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    # partial agg before the exchange: struct-max lands in a Sort/
    # ObjectHash aggregate (still partial+final two-phase)
    assert re.search(r"(Hash|Sort|ObjectHash)Aggregate", plan), plan


def test_dismax_plan_shape(pidx):
    """dis_max: ONE scan feeds every (query, sub) pair (the fan-out is a
    literal map, not one job per subquery) — a single pushed-filter scan
    node and no joins."""
    from searchengine_spark.query.dismax import dismax_topk_packed

    import re

    df = dismax_topk_packed(
        pidx, [["greatest rock album", "guitar solo"]], CFG, k=5)
    plan = explain_str(df)
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", plan))) == 1, plan
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_sort_by_attr_window_is_group_limit(pidx, spark):
    """--sort: the rank<=k window over the matched set must push down as
    WindowGroupLimit (a per-partition top-k heap on the sort key), never
    a full sort of the matched set."""
    from pyspark.sql import functions as F

    from searchengine_spark.query.sortby import sort_by_attr_packed

    attrs = spark.createDataFrame(
        [("conv000000000", 1, 10)], "conv_id string, turn_idx int, p long")
    df = sort_by_attr_packed(pidx, ["greatest rock album"], CFG, attrs,
                             "p", k=10)
    plan = explain_str(df)
    assert "WindowGroupLimit" in plan, plan


def test_decay_and_fvf_add_no_window_blowup(pidx, spark):
    """function_score members: one score-all + resolve/attrs joins + the
    same WindowGroupLimit top-k — no extra exchanges beyond those."""
    from searchengine_spark.query.decay import (
        decay_score_packed,
        field_value_factor_packed,
    )

    attrs = spark.createDataFrame(
        [("conv000000000", 1, 10)], "conv_id string, turn_idx int, p long")
    for df in (
        decay_score_packed(pidx, ["greatest rock album"], CFG, attrs, "p",
                           50.0, 10.0, fn="linear", k=10),
        field_value_factor_packed(pidx, ["greatest rock album"], CFG,
                                  attrs, "p", modifier="sqrt", k=10),
    ):
        plan = explain_str(df)
        assert "WindowGroupLimit" in plan, plan


def test_filters_agg_single_exchange(pidx, spark):
    """filters/missing aggregations: ONE partial-aggregable hash
    exchange on query_id — the conditional sums combine map-side."""
    from searchengine_spark.query.aggregations import filters_agg

    hits = spark.createDataFrame([(0, "c", 1)],
                                 "query_id int, conv_id string, turn_idx int")
    attrs = spark.createDataFrame(
        [("c", 1, "en")], "conv_id string, turn_idx int, lang string")
    df = filters_agg(hits, attrs, [("en", "lang = 'en'")],
                     ["conv_id", "turn_idx"])
    plan = explain_str(df)
    # the conditional sums combine MAP-SIDE (partial_sum) and meet at
    # exactly ONE query_id hash exchange; the only other hash exchanges
    # are the bounded hit<->attrs join's (AQE broadcasts those in real
    # use), the trailing one is the cosmetic orderBy range partition
    assert "partial_sum(CASE WHEN" in plan, plan
    assert plan.count("hashpartitioning(query_id") == 1, plan


def test_url_filter_is_exchange_free(spark):
    """The URL gate is row-local codegen: no exchange, no UDF."""
    from searchengine_spark.textops.urlfilter import url_filter

    docs = spark.createDataFrame(
        [(0, "https://a.example.com/x")], "doc_id long, url string")
    df = url_filter(docs, blocked_domains=["b.org"],
                    blocked_substrings=["zz"])
    plan = explain_str(df)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_packing_plans(spark):
    """Concat-and-chunk must stay UDF-free (one window cumsum per
    bucket); greedy's only Python is the one FlatMapGroupsInPandas
    batch per bucket — no row-at-a-time eval anywhere."""
    from searchengine_spark.textops.packing import (
        pack_concat_chunks,
        pack_greedy,
    )

    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(20)], "doc_id long, text string")
    chunk_plan = explain_str(pack_concat_chunks(docs, 8, 4))
    assert "EvalPython" not in chunk_plan  # no Python in the scale path
    assert "Window" in chunk_plan
    greedy_plan = explain_str(pack_greedy(docs, 8, 4))
    # formatted explain names each node twice (tree + detail): count
    # tree lines only — exactly ONE grouped-Arrow batch stage
    assert greedy_plan.count("FlatMapGroupsInPandas (") == 1
    assert "BatchEvalPython" not in greedy_plan  # Arrow batches only


def test_span_first_exact_plan_is_all_native(spark):
    """span_first exact path: higher-order filter/array_min inside the
    plan, NO Python evaluation node, query side broadcast."""
    from searchengine_spark.fixtures.transcripts import transcripts_df
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.query.spanqueries import span_first_topk_batch

    it = build_index(transcripts_df(spark, n_conv=10), CFG, positional=True)
    df = span_first_topk_batch(it, [("album", 5)], CFG, k=10)
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan


def test_span_not_exact_plan_is_all_native(spark):
    from searchengine_spark.fixtures.transcripts import transcripts_df
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.query.spanqueries import span_not_topk_batch

    it = build_index(transcripts_df(spark, n_conv=10), CFG, positional=True)
    df = span_not_topk_batch(it, [("album", "rock")], CFG, pre=2, post=2,
                             k=10)
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pq_encode_plan_zero_shuffle_zero_python(spark):
    """PQ encode: the argmin over codebook structs compiles to native
    expressions — no exchange, no Python node."""
    from searchengine_spark.textops.pq import pq_encode

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0, 0.5]) for i in range(50)],
        "vec_id long, embedding array<float>")
    books = [[[0, 0], [1000, 1000]], [[0, 0], [500, 500]]]
    df = pq_encode(emb, books)
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_terms_set_exact_single_aggregate(spark):
    """terms_set exact path: score AND coverage come from ONE aggregate
    — exactly two hash exchanges total (the groupBy partials + the
    rank window), no second scoring pass."""
    from pyspark.sql import functions as F

    from searchengine_spark.fixtures.transcripts import transcripts_df
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.query.termsset import terms_set_topk_batch

    it = build_index(transcripts_df(spark, n_conv=10), CFG)
    req = it.doc_lengths.select("doc_id", F.lit(1).alias("required"))
    df = terms_set_topk_batch(it, ["greatest rock album"], req, CFG, k=10)
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_federated_has_child_windows_are_group_limits(spark, pidx,
                                                      tmp_path_factory):
    """The bounded federated has_child merge: BOTH rank windows (the
    per-shard rank()<=k tie-safe cut and the global row_number<=k) must
    compile to WindowGroupLimit per-partition heaps — shard emissions
    are k+ties-bounded BEFORE the union shuffle, never full qualifying
    sets."""
    from searchengine_spark.indexing.shards import (
        build_shard_indexes,
        shard_paths,
    )
    from searchengine_spark.query.federated import has_child_topk_federated

    base = tmp_path_factory.mktemp("hc_plan")
    out = str(base / "sharded")
    build_shard_indexes(
        transcripts_df(spark, n_conv=12), CFG, out, 2, chunk_docs=256)
    shards = [load_packed_index(spark, p) for p in shard_paths(out, 2)]
    df = has_child_topk_federated(
        shards, ["greatest rock album"], CFG, k=5)
    plan = explain_str(df)
    import re

    windows = set(re.findall(r"\((\d+)\) Window\b", plan))
    group_limits = plan.count("WindowGroupLimit")
    # one window per shard cut + one global = 3 Window nodes; every one
    # of them guarded by WindowGroupLimit pushdown (partial+final pairs)
    assert len(windows) == 3, plan
    assert group_limits >= len(windows), plan
    assert "CartesianProduct" not in plan


def test_multi_match_prune_scans_eq_fields_join_free(spark, tmp_path_factory):
    """Block-max multi_match: exactly ONE pushed scan per field index
    (the fan-out is a literal map, idf a literal-map column — no
    term_stats join, no docmap join) and one exchange into the scorer."""
    import re

    from searchengine_spark.query.multimatch import (
        build_field_indexes,
        load_field_indexes,
        multi_match_topk,
    )

    root = str(tmp_path_factory.mktemp("mmplan") / "root")
    build_field_indexes(
        transcripts_df(spark, n_conv=10), CFG, root, ["text", "role"],
        chunk_docs=128)
    fidx = load_field_indexes(spark, root)
    # the query must hit BOTH dictionaries (role holds user/assistant/
    # tool) or the empty field legitimately drops out of the plan
    df = multi_match_topk(fidx, ["greatest rock assistant"], CFG, k=5,
                          mode="best_fields", tie_breaker=0.3,
                          round_dp=6, prune=True)
    plan = explain_str(df)
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", plan))) == 2, plan
    assert "Join" not in plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan
