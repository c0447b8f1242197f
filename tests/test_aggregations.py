"""Numeric result-set aggregation gates (query/aggregations.py).

Contract: histogram buckets are floor(value/interval)*interval (ES
bucket_key — FLOOR, so negatives land below zero), NULLs skip, empty
buckets are not emitted; stats rows are exact (BIGINT count, integer
attributes exact through the DOUBLE melt); both compose with any
resolved result frame exactly like facets.
"""

import pytest

from searchengine_spark.query.aggregations import (
    cardinality_agg,
    date_histogram_counts,
    histogram_counts,
    percentiles_agg,
    range_agg,
    stats_agg,
)


@pytest.fixture(scope="module")
def frames(spark):
    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 4)],
        "query_id int, ext_id long",
    )
    attrs = spark.createDataFrame(
        [(1, 95, -7.5), (2, 100, 2.5), (3, 139, None), (4, None, -0.1)],
        "ext_id long, n_chars long, delta double",
    )
    return hits, attrs


def test_histogram_buckets(spark, frames):
    hits, attrs = frames
    got = {(r["query_id"], r["col"], r["bucket"]): r["n"]
           for r in histogram_counts(hits, attrs, ["n_chars", "delta"],
                                     ["ext_id"], interval=50).collect()}
    assert got == {
        (0, "n_chars", 50.0): 1,    # 95
        (0, "n_chars", 100.0): 2,   # 100, 139
        (0, "delta", -50.0): 1,     # -7.5 floors BELOW zero (ES semantics)
        (0, "delta", 0.0): 1,       # 2.5
        (1, "n_chars", 100.0): 1,   # doc 2 counts again for query 1
        (1, "delta", 0.0): 1,
        (1, "delta", -50.0): 1,     # -0.1 -> bucket -50
    }
    # NULL values skipped: doc 3's delta and doc 4's n_chars appear nowhere


def test_histogram_validation(spark, frames):
    hits, attrs = frames
    with pytest.raises(ValueError, match="interval"):
        histogram_counts(hits, attrs, ["n_chars"], ["ext_id"], interval=0)
    with pytest.raises(ValueError, match="lacks columns"):
        histogram_counts(hits, attrs, ["nope"], ["ext_id"], interval=10)
    with pytest.raises(ValueError, match="at least one"):
        histogram_counts(hits, attrs, [], ["ext_id"], interval=10)


def test_stats_exact(spark, frames):
    hits, attrs = frames
    got = {(r["query_id"], r["col"]): (r["n"], r["min"], r["max"], r["sum"])
           for r in stats_agg(hits, attrs, ["n_chars", "delta"],
                              ["ext_id"]).collect()}
    assert got[(0, "n_chars")] == (3, 95.0, 139.0, 334.0)
    assert got[(0, "delta")] == (2, -7.5, 2.5, -5.0)
    assert got[(1, "n_chars")] == (1, 100.0, 100.0, 100.0)
    assert got[(1, "delta")] == (2, -0.1, 2.5, 2.4)


def test_percentiles_nearest_rank(spark, frames):
    hits, attrs = frames
    got = {(r["query_id"], r["col"], r["pct"]): r["value"]
           for r in percentiles_agg(hits, attrs, ["n_chars", "delta"],
                                    ["ext_id"],
                                    percents=(50, 100)).collect()}
    # q0 n_chars sorted [95, 100, 139]: p50 -> ceil(1.5)=idx 2 -> 100;
    # p100 -> idx 3 -> 139. delta sorted [-7.5, 2.5]: p50 -> idx 1.
    assert got == {
        (0, "n_chars", 50): 100.0, (0, "n_chars", 100): 139.0,
        (0, "delta", 50): -7.5, (0, "delta", 100): 2.5,
        (1, "n_chars", 50): 100.0, (1, "n_chars", 100): 100.0,
        (1, "delta", 50): -0.1, (1, "delta", 100): 2.5,
    }
    # brute cross-check of the nearest-rank index arithmetic
    import math
    vals = [95.0, 100.0, 139.0]
    for p in (50, 100):
        idx = max(1, (p * len(vals) + 99) // 100)
        assert idx == max(1, math.ceil(p * len(vals) / 100))
        assert got[(0, "n_chars", p)] == vals[idx - 1]
    with pytest.raises(ValueError, match="percents"):
        percentiles_agg(hits, attrs, ["n_chars"], ["ext_id"], percents=(0,))
    with pytest.raises(ValueError, match="percents"):
        percentiles_agg(hits, attrs, ["n_chars"], ["ext_id"],
                        percents=(101,))


def test_date_histogram_fixed_and_calendar(spark):
    import datetime as dt

    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 1)], "query_id int, ext_id long")
    base = dt.datetime(2026, 1, 1)  # epoch 1767225600 (UTC container)
    attrs = spark.createDataFrame(
        [(1, base), (2, base + dt.timedelta(seconds=90)),
         (3, base + dt.timedelta(days=1, seconds=5)), (4, None)],
        "ext_id long, ts timestamp",
    )
    e0 = 1767225600
    got = {(r["query_id"], r["bucket_epoch"]): r["n"]
           for r in date_histogram_counts(hits, attrs, ["ts"], ["ext_id"],
                                          interval="day").collect()}
    assert got == {(0, e0): 2, (0, e0 + 86400): 1, (1, e0): 1}
    got = {(r["query_id"], r["bucket_epoch"]): r["n"]
           for r in date_histogram_counts(hits, attrs, ["ts"], ["ext_id"],
                                          interval=60).collect()}
    assert got == {(0, e0): 1, (0, e0 + 60): 1, (0, e0 + 86400): 1,
                   (1, e0): 1}
    with pytest.raises(ValueError, match="interval"):
        date_histogram_counts(hits, attrs, ["ts"], ["ext_id"],
                              interval="fortnight")
    with pytest.raises(ValueError, match="seconds"):
        date_histogram_counts(hits, attrs, ["ts"], ["ext_id"], interval=0)

    # calendar intervals (week/month/quarter/year): date_trunc buckets,
    # exact civil-calendar boundaries under the UTC session
    import calendar as _cal

    def _e(*ymd):
        return _cal.timegm(dt.datetime(*ymd).timetuple())

    hits2 = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 4)], "query_id int, ext_id long")
    attrs2 = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 15, 7, 30)),
         (2, dt.datetime(2026, 1, 31, 23, 59, 59)),
         (3, dt.datetime(2026, 2, 1, 0, 0, 1)),
         (4, dt.datetime(2025, 12, 31, 12))],
        "ext_id long, ts timestamp",
    )
    got = {(r["query_id"], r["bucket_epoch"]): r["n"]
           for r in date_histogram_counts(hits2, attrs2, ["ts"], ["ext_id"],
                                          interval="month").collect()}
    assert got == {(0, _e(2026, 1, 1)): 2, (0, _e(2026, 2, 1)): 1,
                   (1, _e(2025, 12, 1)): 1}
    got = {(r["query_id"], r["bucket_epoch"]): r["n"]
           for r in date_histogram_counts(hits2, attrs2, ["ts"], ["ext_id"],
                                          interval="year").collect()}
    assert got == {(0, _e(2026, 1, 1)): 3, (1, _e(2025, 1, 1)): 1}
    # week truncates to the ISO Monday: 2026-01-15 (Thu) -> 01-12,
    # 2026-01-31 (Sat) -> 01-26, 2026-02-01 (Sun) -> 01-26 TOO (a
    # calendar week straddling the month boundary is one bucket),
    # 2025-12-31 (Wed) -> 12-29
    got = {(r["query_id"], r["bucket_epoch"]): r["n"]
           for r in date_histogram_counts(hits2, attrs2, ["ts"], ["ext_id"],
                                          interval="week").collect()}
    assert got == {(0, _e(2026, 1, 12)): 1, (0, _e(2026, 1, 26)): 2,
                   (1, _e(2025, 12, 29)): 1}
    got = {(r["query_id"], r["bucket_epoch"]): r["n"]
           for r in date_histogram_counts(hits2, attrs2, ["ts"], ["ext_id"],
                                          interval="quarter").collect()}
    assert got == {(0, _e(2026, 1, 1)): 3, (1, _e(2025, 10, 1)): 1}


def test_cardinality_exact(spark):
    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 3), (1, 4)],
        "query_id int, ext_id long",
    )
    attrs = spark.createDataFrame(
        [(1, "en", "web"), (2, "en", "book"), (3, "de", None),
         (4, "de", "web")],
        "ext_id long, lang string, source string",
    )
    got = {(r["query_id"], r["col"]): r["n_distinct"]
           for r in cardinality_agg(hits, attrs, ["lang", "source"],
                                    ["ext_id"]).collect()}
    assert got == {
        (0, "lang"): 2,    # en, de
        (0, "source"): 2,  # web, book — doc 3's NULL skipped
        (1, "lang"): 1,    # de, de
        (1, "source"): 1,  # NULL + web
    }
    with pytest.raises(ValueError, match="lacks columns"):
        cardinality_agg(hits, attrs, ["nope"], ["ext_id"])


def test_range_buckets(spark, frames):
    """ES range semantics: from inclusive / to exclusive, None unbounded,
    overlapping ranges both count, EVERY bucket emits (n=0 included)."""
    hits, attrs = frames
    ranges = [(None, 100.0), (100.0, 200.0), (90.0, 140.0), (500.0, None)]
    got = {(r["query_id"], r["col"], r["range_from"], r["range_to"]): r["n"]
           for r in range_agg(hits, attrs, ["n_chars"], ["ext_id"],
                              ranges).collect()}
    # q0 n_chars = [95, 100, 139]; q1 n_chars = [100] (doc 4's NULL skips)
    assert got == {
        (0, "n_chars", None, 100.0): 1,    # 95 (100 excluded: to-exclusive)
        (0, "n_chars", 100.0, 200.0): 2,   # 100 (from-inclusive), 139
        (0, "n_chars", 90.0, 140.0): 3,    # overlap: all three count again
        (0, "n_chars", 500.0, None): 0,    # empty bucket still emits
        (1, "n_chars", None, 100.0): 0,
        (1, "n_chars", 100.0, 200.0): 1,
        (1, "n_chars", 90.0, 140.0): 1,
        (1, "n_chars", 500.0, None): 0,
    }
    # a query whose hits ALL have NULL attr values still emits buckets
    hits2 = spark.createDataFrame([(7, 4)], "query_id int, ext_id long")
    z = {(r["range_from"], r["range_to"]): r["n"]
         for r in range_agg(hits2, attrs, ["n_chars"], ["ext_id"],
                            [(0.0, 10.0)]).collect()}
    assert z == {(0.0, 10.0): 0}


def test_range_validation(spark, frames):
    hits, attrs = frames
    with pytest.raises(ValueError, match="unbounded on both"):
        range_agg(hits, attrs, ["n_chars"], ["ext_id"], [(None, None)])
    with pytest.raises(ValueError, match="from >= to"):
        range_agg(hits, attrs, ["n_chars"], ["ext_id"], [(5.0, 5.0)])
    with pytest.raises(ValueError, match="at least one"):
        range_agg(hits, attrs, ["n_chars"], ["ext_id"], [])
    with pytest.raises(ValueError, match="lacks columns"):
        range_agg(hits, attrs, ["nope"], ["ext_id"], [(0.0, 1.0)])


@pytest.fixture(scope="module")
def comp_frames(spark):
    hits = spark.createDataFrame(
        [(0, d) for d in range(1, 8)] + [(1, 2), (1, 3), (1, 7)],
        "query_id int, ext_id long",
    )
    attrs = spark.createDataFrame(
        [(1, "web", "en"), (2, "web", "de"), (3, "book", "en"),
         (4, "web", "en"), (5, "book", None), (6, "news", "en"),
         (7, "book", "de")],
        "ext_id long, source string, lang string",
    )
    return hits, attrs


def _comp_brute(hits, attrs, ids_by_q, after=None):
    """Full bucket list per query, lexicographic tuple order — ground
    truth for any page."""
    amap = {r["ext_id"]: (r["source"], r["lang"]) for r in attrs.collect()}
    out = {}
    for q, ids in ids_by_q.items():
        counts: dict = {}
        for d in ids:
            s, l = amap[d]
            if s is None or l is None:
                continue  # missing_bucket: false
            counts[(s, l)] = counts.get((s, l), 0) + 1
        keys = sorted(counts)
        if after is not None:
            keys = [k for k in keys if k > after]
        out[q] = [(k[0], k[1], counts[k]) for k in keys]
    return out


def test_composite_first_page(spark, comp_frames):
    from searchengine_spark.query.aggregations import composite_agg

    hits, attrs = comp_frames
    ids_by_q = {0: range(1, 8), 1: [2, 3, 7]}
    brute = _comp_brute(hits, attrs, ids_by_q)
    got = composite_agg(hits, attrs, ["source", "lang"], ["ext_id"],
                        size=3).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["source"], r["lang"], r["n"], r["bucket_rank"]))
    for q, full in brute.items():
        page = [(s, l, n, i + 1) for i, (s, l, n) in enumerate(full[:3])]
        assert by_q[q] == page
    # doc 5's NULL lang dropped it from every bucket (missing_bucket=false)
    assert all(r["lang"] is not None for r in got)


def test_composite_after_key_pages_partition(spark, comp_frames):
    """Walking pages with after = the previous page's last tuple
    partitions the full bucket list exactly (the ES after_key walk)."""
    from searchengine_spark.query.aggregations import composite_agg

    hits, attrs = comp_frames
    full = _comp_brute(hits, attrs, {0: range(1, 8)})[0]
    q0 = hits.filter("query_id = 0")
    walked, after = [], None
    for _ in range(10):
        rows = composite_agg(q0, attrs, ["source", "lang"], ["ext_id"],
                             size=2, after=after).collect()
        if not rows:
            break
        assert [r["bucket_rank"] for r in rows] == list(
            range(1, len(rows) + 1))  # page-relative ranks
        walked.extend((r["source"], r["lang"], r["n"]) for r in rows)
        after = (rows[-1]["source"], rows[-1]["lang"])
    assert walked == full and len(full) > 2
    # lexicographic strictly-greater: mid-prefix after key resumes right
    mid = _comp_brute(hits, attrs, {0: range(1, 8)}, after=("book", "en"))[0]
    got = composite_agg(q0, attrs, ["source", "lang"], ["ext_id"],
                        size=100, after=("book", "en")).collect()
    assert [(r["source"], r["lang"], r["n"]) for r in got] == mid


def test_composite_validation(spark, comp_frames):
    from searchengine_spark.query.aggregations import composite_agg

    hits, attrs = comp_frames
    with pytest.raises(ValueError, match="size"):
        composite_agg(hits, attrs, ["source"], ["ext_id"], size=0)
    with pytest.raises(ValueError, match="at least one"):
        composite_agg(hits, attrs, [], ["ext_id"], size=2)
    with pytest.raises(ValueError, match="one value per source"):
        composite_agg(hits, attrs, ["source", "lang"], ["ext_id"],
                      size=2, after=("web",))
    with pytest.raises(ValueError, match="lacks columns"):
        composite_agg(hits, attrs, ["nope"], ["ext_id"], size=2)


def test_composes_with_retrieval(spark, stop_words, tmp_path):
    """End-to-end: packed retrieval -> resolve -> histogram over the hit
    set equals a Python recompute from the collected results."""
    from searchengine_spark.fixtures import transcripts_df
    from searchengine_spark.indexing.packed import (
        build_packed_index,
        load_packed_index,
    )
    from searchengine_spark.query.wand import bm25_topk_packed_batch, resolve_docs
    from searchengine_spark.tokenizer import TokenizerConfig

    from pyspark.sql import functions as F

    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words)
    corpus = transcripts_df(spark, n_conv=6).withColumn(
        "n_chars", F.length("text")
    )
    path = str(tmp_path / "idx")
    build_packed_index(corpus.drop("n_chars"), cfg, path, chunk_docs=64)
    pidx = load_packed_index(spark, path)
    res = resolve_docs(pidx, bm25_topk_packed_batch(
        pidx, ["greatest rock album", "guitar solo"], cfg, k=10, round_dp=6))
    ext = ["conv_id", "turn_idx"]
    got = {(r["query_id"], r["bucket"]): r["n"]
           for r in histogram_counts(res, corpus, ["n_chars"], ext,
                                     interval=25).collect()}
    rows = res.collect()
    lens = {
        (r["conv_id"], r["turn_idx"]): r["n_chars"]
        for r in corpus.select("conv_id", "turn_idx", "n_chars").collect()
    }
    expect: dict = {}
    for r in rows:
        b = (lens[(r["conv_id"], r["turn_idx"])] // 25) * 25
        key = (r["query_id"], float(b))
        expect[key] = expect.get(key, 0) + 1
    assert got == expect and len(got) > 0


def test_extended_stats_exact(spark, frames):
    from searchengine_spark.query.aggregations import extended_stats_agg

    hits, attrs = frames
    got = {(r["query_id"], r["col"]): (r["n"], r["sum"], r["sum_sq"],
                                       r["var_num"])
           for r in extended_stats_agg(hits, attrs, ["n_chars", "delta"],
                                       ["ext_id"]).collect()}
    # q0 n_chars = [95, 100, 139] (exact integers)
    n, s, ss = 3, 95 + 100 + 139, 95**2 + 100**2 + 139**2
    assert got[(0, "n_chars")] == (n, s, ss, n * ss - s * s)
    # brute variance agrees with the numerator contract
    vals = [95, 100, 139]
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / n
    assert abs((n * ss - s * s) / n**2 - var) < 1e-9
    # fractional attrs floor first: q0 delta = [-7.5, 2.5] -> [-8, 2]
    n2, s2, ss2 = 2, -8 + 2, 64 + 4
    assert got[(0, "delta")] == (n2, s2, ss2, n2 * ss2 - s2 * s2)


def test_matrix_stats_exact(spark):
    from searchengine_spark.query.aggregations import matrix_stats_agg

    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], "query_id int, ext_id long")
    attrs = spark.createDataFrame(
        [(1, 2, 10), (2, 4, 20), (3, 6, 31), (4, None, 40)],
        "ext_id long, x long, y long")
    got = {(r["query_id"], r["col_a"], r["col_b"]): (r["n"], r["cov_num"])
           for r in matrix_stats_agg(hits, attrs, ["x", "y"],
                                     ["ext_id"]).collect()}
    # pairwise-complete: doc 4's NULL x drops the pair row
    xs, ys = [2, 4, 6], [10, 20, 31]
    n = 3
    cov_num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    assert got == {(0, "x", "y"): (n, cov_num)}
    # population covariance identity
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / n
    assert abs(cov_num / n**2 - cov) < 1e-9
    with pytest.raises(ValueError, match="two columns"):
        matrix_stats_agg(hits, attrs, ["x"], ["ext_id"])


@pytest.fixture(scope="module")
def bucket_frames(spark):
    """Hits + attrs with a string column, NULLs, and a hit (ext_id 9)
    entirely ABSENT from the attrs table (the LEFT-join 'field not
    present' case the filters/missing/adjacency contracts hinge on)."""
    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 9), (1, 2), (1, 4)],
        "query_id int, ext_id long",
    )
    attrs = spark.createDataFrame(
        [(1, "en", 95), (2, "en", 100), (3, None, 139), (4, "fr", None)],
        "ext_id long, lang string, n_chars long",
    )
    return hits, attrs


def test_filters_agg_all_buckets_emit(spark, bucket_frames):
    from searchengine_spark.query.aggregations import filters_agg

    hits, attrs = bucket_frames
    got = {(r["query_id"], r["filter_name"]): r["n"]
           for r in filters_agg(
               hits, attrs,
               [("english", "lang = 'en'"),
                ("long", "n_chars >= 100"),
                ("german", "lang = 'de'")],
               ["ext_id"]).collect()}
    # q0 hits {1 en/95, 2 en/100, 3 NULL/139, 9 absent}: NULL predicate
    # rows (doc 3's lang, doc 9 entirely) never count — WHERE semantics
    assert got == {
        (0, "english"): 2, (0, "long"): 2, (0, "german"): 0,
        (1, "english"): 1, (1, "long"): 1, (1, "german"): 0,
    }
    with pytest.raises(ValueError, match="unique"):
        filters_agg(hits, attrs, [("a", "1=1"), ("a", "2=2")], ["ext_id"])
    with pytest.raises(ValueError, match="at least one"):
        filters_agg(hits, attrs, [], ["ext_id"])


def test_missing_agg_counts_absent_and_null(spark, bucket_frames):
    from searchengine_spark.query.aggregations import missing_agg

    hits, attrs = bucket_frames
    got = {(r["query_id"], r["col"]): r["n"]
           for r in missing_agg(hits, attrs, ["lang", "n_chars"],
                                ["ext_id"]).collect()}
    # q0: doc 3 has NULL lang, doc 9 is absent from attrs -> 2 missing
    # langs; only doc 9 misses n_chars. q1: doc 4's NULL n_chars. n=0
    # rows emit (q1 lang) — the ES missing bucket is always present.
    assert got == {
        (0, "lang"): 2, (0, "n_chars"): 1,
        (1, "lang"): 0, (1, "n_chars"): 1,
    }
    with pytest.raises(ValueError, match="at least one"):
        missing_agg(hits, attrs, [], ["ext_id"])
    with pytest.raises(ValueError, match="lacks columns"):
        missing_agg(hits, attrs, ["nope"], ["ext_id"])


def test_rare_terms_long_tail(spark):
    from searchengine_spark.query.aggregations import rare_terms_agg

    hits = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "query_id int, ext_id long")
    attrs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "c")],
        "ext_id long, tag string")
    rows = rare_terms_agg(hits, attrs, ["tag"], ["ext_id"],
                          max_doc_count=1).collect()
    # only the count<=1 tail, rarest-first order; 'a' (n=3) excluded
    assert [(r["value"], r["n"]) for r in rows] == [("b", 1), ("c", 1)]
    rows2 = rare_terms_agg(hits, attrs, ["tag"], ["ext_id"],
                           max_doc_count=3).collect()
    assert [(r["value"], r["n"]) for r in rows2] == [
        ("b", 1), ("c", 1), ("a", 3)]
    with pytest.raises(ValueError, match="max_doc_count"):
        rare_terms_agg(hits, attrs, ["tag"], ["ext_id"], max_doc_count=0)


def test_adjacency_matrix_pairs(spark, bucket_frames):
    from searchengine_spark.query.aggregations import adjacency_matrix_agg

    hits, attrs = bucket_frames
    got = {(r["query_id"], r["key_a"], r["key_b"]): r["n"]
           for r in adjacency_matrix_agg(
               hits, attrs,
               [("english", "lang = 'en'"),
                ("long", "n_chars >= 100"),
                ("german", "lang = 'de'")],
               ["ext_id"]).collect()}
    # q0: english={1,2}, long={2,3}, german={} -> singletons + the one
    # intersection {2}; empty buckets (german, english&german, ...)
    # never emit — the ES adjacency_matrix contract
    assert got == {
        (0, "english", "english"): 2,
        (0, "long", "long"): 2,
        (0, "english", "long"): 1,
        (1, "english", "english"): 1,
        (1, "long", "long"): 1,
        (1, "english", "long"): 1,
    }
    # key pair is name-sorted regardless of filter order
    swapped = {(r["query_id"], r["key_a"], r["key_b"]): r["n"]
               for r in adjacency_matrix_agg(
                   hits, attrs,
                   [("long", "n_chars >= 100"),
                    ("english", "lang = 'en'")],
                   ["ext_id"]).collect()}
    assert swapped == {k: v for k, v in got.items()}


def test_weighted_avg_exact(spark, frames):
    from searchengine_spark.query.aggregations import weighted_avg_agg

    hits, attrs = frames
    got = {r["query_id"]: (r["n"], r["wsum"], r["wtot"])
           for r in weighted_avg_agg(hits, attrs, "n_chars", "delta",
                                     ["ext_id"]).collect()}
    # q0: doc1 (95, -7.5) + doc2 (100, 2.5); doc3's NULL weight skips the
    # pair entirely (ES needs weight.missing to count it). q1: doc2 only
    # (doc4's value is NULL -> skipped).
    assert got == {
        0: (2, 95 * -7.5 + 100 * 2.5, -5.0),
        1: (1, 250.0, 2.5),
    }
    # weighted average derives client-side: wsum / wtot
    assert got[0][1] / got[0][2] == pytest.approx(92.5)


def test_top_metrics_sorted(spark, frames):
    from searchengine_spark.query.aggregations import top_metrics_agg

    hits, attrs = frames
    rows = top_metrics_agg(hits, attrs, "n_chars", ["delta"], ["ext_id"],
                           size=2).collect()
    got = [(r["query_id"], r["pos"], r["n_chars"], r["delta"])
           for r in rows]
    # q0 n_chars desc: doc3 (139, delta NULL passes through), doc2 (100);
    # q1: doc2 only (doc4's NULL sort value is skipped, never ranked)
    assert got == [
        (0, 1, 139, None),
        (0, 2, 100, 2.5),
        (1, 1, 100, 2.5),
    ]
    asc = top_metrics_agg(hits, attrs, "n_chars", ["delta"], ["ext_id"],
                          size=1, ascending=True).collect()
    assert [(r["query_id"], r["n_chars"], r["delta"]) for r in asc] == [
        (0, 95, -7.5), (1, 100, 2.5)]
    with pytest.raises(ValueError, match="size"):
        top_metrics_agg(hits, attrs, "n_chars", ["delta"], ["ext_id"],
                        size=0)


def test_top_metrics_ties_break_by_ext_id(spark):
    from searchengine_spark.query.aggregations import top_metrics_agg

    hits = spark.createDataFrame(
        [(0, 2), (0, 1), (0, 3)], "query_id int, ext_id long")
    attrs = spark.createDataFrame(
        [(1, 100, "a"), (2, 100, "b"), (3, 100, "c")],
        "ext_id long, v long, m string")
    rows = top_metrics_agg(hits, attrs, "v", ["m"], ["ext_id"],
                           size=2).collect()
    # all sort values tie -> deterministic ext_id-ascending order
    assert [(r["pos"], r["m"]) for r in rows] == [(1, "a"), (2, "b")]


def test_percentile_ranks_count_pairs(spark, frames):
    from searchengine_spark.query.aggregations import percentile_ranks_agg

    hits, attrs = frames
    got = {(r["query_id"], r["col"], r["value"]): (r["n_le"], r["n"])
           for r in percentile_ranks_agg(
               hits, attrs, ["n_chars", "delta"], ["ext_id"],
               values=(99, 139)).collect()}
    # q0 n_chars [95, 100, 139]; q1 [100] (doc4 NULL skips)
    assert got[(0, "n_chars", 99.0)] == (1, 3)
    assert got[(0, "n_chars", 139.0)] == (3, 3)
    assert got[(1, "n_chars", 99.0)] == (0, 1)
    assert got[(1, "n_chars", 139.0)] == (1, 1)
    # rank percent derives client-side: 100 * n_le / n
    assert 100 * got[(0, "n_chars", 99.0)][0] / 3 == pytest.approx(33.333, abs=1e-3)
    with pytest.raises(ValueError, match="probe"):
        percentile_ranks_agg(hits, attrs, ["n_chars"], ["ext_id"],
                             values=())


def test_boxplot_nearest_rank(spark, frames):
    from searchengine_spark.query.aggregations import boxplot_agg

    hits, attrs = frames
    got = {(r["query_id"], r["col"]):
           (r["min"], r["q1"], r["q2"], r["q3"], r["max"])
           for r in boxplot_agg(hits, attrs, ["n_chars", "delta"],
                                ["ext_id"]).collect()}
    # q0 n_chars [95,100,139]: quartile idx (p*3+99) div 100 -> 1,2,3
    assert got[(0, "n_chars")] == (95.0, 95.0, 100.0, 139.0, 139.0)
    assert got[(1, "n_chars")] == (100.0,) * 5
    # q0 delta [-7.5, 2.5]: q1/q2 -> idx 1, q3 -> idx 2
    assert got[(0, "delta")] == (-7.5, -7.5, -7.5, 2.5, 2.5)


def test_mad_exact(spark, frames):
    from searchengine_spark.query.aggregations import (
        median_absolute_deviation_agg,
    )

    hits, attrs = frames
    got = {(r["query_id"], r["col"]): (r["median"], r["mad"])
           for r in median_absolute_deviation_agg(
               hits, attrs, ["n_chars"], ["ext_id"]).collect()}
    # q0 [95,100,139]: median 100, |x-100| sorted [0,5,39] -> mad 5
    assert got[(0, "n_chars")] == (100.0, 5.0)
    assert got[(1, "n_chars")] == (100.0, 0.0)


def test_multi_terms_tuple_buckets(spark):
    from searchengine_spark.query.aggregations import multi_terms_agg

    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 1)],
        "query_id int, ext_id long")
    attrs = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "a", "x"), (4, "b", "y"),
         (5, None, "x")],
        "ext_id long, t1 string, t2 string")
    rows = multi_terms_agg(hits, attrs, ["t1", "t2"], ["ext_id"],
                           size=10).collect()
    got = [(r["query_id"], r["rank"], r["t1"], r["t2"], r["n"])
           for r in rows]
    # doc5's NULL t1 drops it entirely (ES multi_terms contract);
    # count tie (a,x)=2 vs (b,y)=2 breaks by the value tuple ascending
    assert got == [
        (0, 1, "a", "x", 2),
        (0, 2, "b", "y", 2),
        (1, 1, "a", "x", 1),
    ]
    cut = multi_terms_agg(hits, attrs, ["t1", "t2"], ["ext_id"],
                          size=1).collect()
    assert [(r["query_id"], r["t1"]) for r in cut] == [(0, "a"), (1, "a")]
    with pytest.raises(ValueError, match="size"):
        multi_terms_agg(hits, attrs, ["t1", "t2"], ["ext_id"], size=0)
    with pytest.raises(ValueError, match=">= 2"):
        multi_terms_agg(hits, attrs, ["t1"], ["ext_id"])


def test_t_test_moments(spark, frames):
    from searchengine_spark.query.aggregations import t_test_agg

    hits, attrs = frames
    got = {r["query_id"]: (r["n_a"], r["sum_a"], r["sum_sq_a"],
                           r["n_b"], r["sum_b"], r["sum_sq_b"])
           for r in t_test_agg(hits, attrs, "n_chars",
                               "delta < 0", "delta >= 0",
                               ["ext_id"]).collect()}
    # q0: group a (delta<0) = doc1 (95); group b = doc2 (100); doc3's
    # NULL delta matches neither predicate, doc values floor to BIGINT
    assert got[0] == (1, 95, 9025, 1, 100, 10000)
    # q1: doc2 -> b; doc4 (delta<0) has NULL n_chars -> excluded from a
    assert got[1] == (0, 0, 0, 1, 100, 10000)
    # welch t derives client-side from the exact moments
    with pytest.raises(ValueError, match="lacks column"):
        t_test_agg(hits, attrs, "nope", "delta < 0", "delta >= 0",
                   ["ext_id"])


def test_string_stats_lengths(spark):
    from searchengine_spark.query.aggregations import string_stats_agg

    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2)], "query_id int, ext_id long")
    attrs = spark.createDataFrame(
        [(1, "ab", "xyz"), (2, "abcd", None), (3, "a", "pq")],
        "ext_id long, s1 string, s2 string")
    got = {(r["query_id"], r["col"]):
           (r["n"], r["len_min"], r["len_max"], r["len_sum"])
           for r in string_stats_agg(hits, attrs, ["s1", "s2"],
                                     ["ext_id"]).collect()}
    assert got[(0, "s1")] == (3, 1, 4, 7)
    assert got[(0, "s2")] == (2, 2, 3, 5)   # doc2's NULL s2 skips
    assert got[(1, "s1")] == (1, 4, 4, 4)
    # avg_length derives client-side: len_sum / n
    assert got[(0, "s1")][3] / got[(0, "s1")][0] == pytest.approx(7 / 3)


def test_string_stats_entropy_num(spark):
    import math

    from searchengine_spark.query.aggregations import string_stats_agg

    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 4)], "query_id int, ext_id long")
    attrs = spark.createDataFrame(
        [(1, "aab"), (2, "abb"), (3, "aaaa"), (4, "")],
        "ext_id long, s string")
    got = {r["query_id"]: (r["entropy_num"], r["len_sum"])
           for r in string_stats_agg(hits, attrs, ["s"],
                                     ["ext_id"]).collect()}
    # q0 chars: a x3, b x3 -> Σ c*floor(1e6 ln c) = 2 * 3*floor(1e6 ln3)
    want0 = 2 * 3 * math.floor(1e6 * math.log(3))
    assert got[0] == (want0, 6)
    # q1: a x4 -> 4*floor(1e6 ln4); client-side H = ln(4)-num/(1e6*4) = 0
    want1 = 4 * math.floor(1e6 * math.log(4))
    assert got[1] == (want1, 4)
    h_nats = math.log(4) - want1 / (1e6 * 4)
    assert abs(h_nats) < 1e-5
    # q0's derived entropy ~ ln 2 (uniform over two chars)
    h0 = math.log(6) - want0 / (1e6 * 6)
    assert abs(h0 - math.log(2)) < 1e-5
    # empty-string bucket: no chars, entropy_num 0
    assert got[2] == (0, 0)


def test_auto_date_histogram_picks_interval(spark):
    import datetime as dt

    from searchengine_spark.query.aggregations import (
        auto_date_histogram_counts,
    )

    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 1), (1, 2)],
        "query_id int, ext_id long")
    base = dt.datetime(2026, 1, 1)  # epoch 1767225600 (UTC container)
    attrs = spark.createDataFrame(
        [(1, base), (2, base + dt.timedelta(seconds=200)),
         (3, base + dt.timedelta(seconds=3000))],
        "ext_id long, ts timestamp")
    e0 = 1767225600
    rows = auto_date_histogram_counts(hits, attrs, ["ts"], ["ext_id"],
                                      target_buckets=8).collect()
    got = {(r["query_id"], r["bucket_epoch"]): (r["interval_sec"], r["n"])
           for r in rows}
    # q0 spans 3000s: 600s rung gives 6 buckets (<= 8); smaller rungs
    # give 11/101/...; q1 spans 200s: 30s rung gives 7 buckets
    assert got == {
        (0, e0): (600, 2),            # 0 and 200 share the first bucket
        (0, e0 + 3000): (600, 1),
        (1, e0): (30, 1),
        (1, e0 + 180): (30, 1),
    }
    with pytest.raises(ValueError, match="target_buckets"):
        auto_date_histogram_counts(hits, attrs, ["ts"], ["ext_id"],
                                   target_buckets=0)


def test_diversified_sample_caps_per_value(spark):
    from searchengine_spark.query.aggregations import diversified_sample

    hits = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (0, 4, 4), (0, 5, 5),
         (1, 3, 1), (1, 4, 2)],
        "query_id int, ext_id long, rank int")
    attrs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None), (5, None)],
        "ext_id long, src string")
    kept = diversified_sample(hits, attrs, "src", ["ext_id"],
                              max_per_value=1).collect()
    got = [(r["query_id"], r["ext_id"]) for r in kept]
    # q0: 'a' keeps best-ranked doc1 (doc2 dropped), 'b' keeps doc3,
    # NULL-field docs 4 and 5 BOTH pass (ES: missing field not deduped)
    assert got == [(0, 1), (0, 3), (0, 4), (0, 5), (1, 3), (1, 4)]
    kept2 = diversified_sample(hits, attrs, "src", ["ext_id"],
                               max_per_value=2).collect()
    assert [(r["query_id"], r["ext_id"]) for r in kept2] == [
        (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 3), (1, 4)]
    with pytest.raises(ValueError, match="rank"):
        diversified_sample(hits.drop("rank"), attrs, "src", ["ext_id"])


def test_plain_sample_cut_and_order(spark):
    from searchengine_spark.query.aggregations import plain_sample

    rows = [(0, 10, 1), (0, 11, 2), (0, 12, 3), (0, 13, 4),
            (1, 20, 1), (1, 21, 2)]
    res = spark.createDataFrame(rows, "query_id int, doc_id long, rank long")
    got = plain_sample(res, ["doc_id"], size=2).collect()
    assert {(r["query_id"], r["doc_id"]) for r in got} == {
        (0, 10), (0, 11), (1, 20), (1, 21)}
    # rank-0 sets (boolean) break ties by the external id
    res0 = spark.createDataFrame(
        [(0, 12, 0), (0, 10, 0), (0, 11, 0)],
        "query_id int, doc_id long, rank long")
    got0 = plain_sample(res0, ["doc_id"], size=2).collect()
    assert {r["doc_id"] for r in got0} == {10, 11}
    import pytest as _pt
    with _pt.raises(ValueError, match="size"):
        plain_sample(res, ["doc_id"], size=0)
    with _pt.raises(ValueError, match="rank"):
        plain_sample(res.drop("rank"), ["doc_id"], size=1)
