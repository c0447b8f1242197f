"""Pipeline aggregations (query/pipeline_aggs.py) — the ES derivative /
cumulative_sum / moving_fn / serial_diff / bucket_sort / bucket_selector /
stats_bucket analogs over a bucketed first-stage aggregation.

Hand-computed fixtures (tiny bucket frames — the module is pure window
arithmetic, retrieval composition is gated by the driver entries) plus
the structural invariants: densify extent/zero-fill, cumsum total ==
series total, derivative telescopes to last-minus-first, moving frames
at both shifts, sort truncation, selector == WHERE.
"""

from __future__ import annotations

import pytest

from searchengine_spark.query.pipeline_aggs import (
    bucket_selector,
    bucket_sort,
    cumulative_sum,
    densify_buckets,
    derivative,
    moving_sum,
    serial_diff,
    stats_bucket,
)

# two series: q0 has a GAP at 1200 (densify must fill it), q1 is dense
ROWS = [
    ("q0", "ts", 600, 3),
    ("q0", "ts", 1800, 1),
    ("q0", "ts", 2400, 4),
    ("q1", "ts", 0, 2),
    ("q1", "ts", 600, 2),
    ("q1", "ts", 1200, 5),
]
SCHEMA = "query_id string, col string, bucket_epoch long, n long"


@pytest.fixture(scope="module")
def buckets(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_densify_fills_gaps_with_zero(buckets):
    dense = densify_buckets(buckets, 600)
    got = _rows(dense, "query_id", "bucket_epoch", "n")
    assert got == sorted([
        ("q0", 600, 3), ("q0", 1200, 0), ("q0", 1800, 1), ("q0", 2400, 4),
        ("q1", 0, 2), ("q1", 600, 2), ("q1", 1200, 5),
    ])


def test_densify_rejects_bad_interval(buckets):
    with pytest.raises(ValueError, match="interval"):
        densify_buckets(buckets, 0)


def test_shape_check_names_missing_column(spark):
    bad = spark.createDataFrame([("q0", 1, 2)], "query_id string, b long, n long")
    with pytest.raises(ValueError, match="bucket_epoch"):
        cumulative_sum(bad)


def test_cumulative_sum_running_total(buckets):
    got = _rows(cumulative_sum(buckets), "query_id", "bucket_epoch", "cum")
    assert got == sorted([
        ("q0", 600, 3), ("q0", 1800, 4), ("q0", 2400, 8),
        ("q1", 0, 2), ("q1", 600, 4), ("q1", 1200, 9),
    ])


def test_cumsum_last_equals_series_total(buckets):
    cum = cumulative_sum(buckets)
    last = {r["query_id"]: r["cum"]
            for r in cum.orderBy("query_id", "bucket_epoch").collect()}
    totals = {r["query_id"]: r["t"]
              for r in buckets.groupBy("query_id")
              .agg({"n": "sum"}).withColumnRenamed("sum(n)", "t").collect()}
    assert last == totals


def test_derivative_skips_first_and_diffs(buckets):
    dense = densify_buckets(buckets, 600)
    got = _rows(derivative(dense), "query_id", "bucket_epoch", "dn")
    assert got == sorted([
        ("q0", 1200, -3), ("q0", 1800, 1), ("q0", 2400, 3),
        ("q1", 600, 0), ("q1", 1200, 3),
    ])


def test_derivative_telescopes(buckets):
    dense = densify_buckets(buckets, 600)
    d = derivative(dense)
    sums = {r["query_id"]: r["s"] for r in
            d.groupBy("query_id").agg({"dn": "sum"})
            .withColumnRenamed("sum(dn)", "s").collect()}
    # sum of first differences == last - first
    assert sums == {"q0": 4 - 3, "q1": 5 - 2}


def test_serial_diff_lag2(buckets):
    dense = densify_buckets(buckets, 600)
    got = _rows(serial_diff(dense, 2), "query_id", "bucket_epoch", "dn")
    assert got == sorted([
        ("q0", 1800, -2), ("q0", 2400, 4),
        ("q1", 1200, 3),
    ])


def test_serial_diff_lag1_equals_derivative(buckets):
    dense = densify_buckets(buckets, 600)
    assert (_rows(serial_diff(dense, 1), "query_id", "bucket_epoch", "dn")
            == _rows(derivative(dense), "query_id", "bucket_epoch", "dn"))


def test_moving_sum_shift0_excludes_current(buckets):
    dense = densify_buckets(buckets, 600)
    got = _rows(moving_sum(dense, 2, shift=0),
                "query_id", "bucket_epoch", "mvsum", "wn")
    # frame = previous 2 buckets, current excluded; first bucket emits
    # nothing (empty frame)
    assert got == sorted([
        ("q0", 1200, 3, 1), ("q0", 1800, 3, 2), ("q0", 2400, 1, 2),
        ("q1", 600, 2, 1), ("q1", 1200, 4, 2),
    ])


def test_moving_sum_shift1_includes_current(buckets):
    dense = densify_buckets(buckets, 600)
    got = _rows(moving_sum(dense, 2, shift=1),
                "query_id", "bucket_epoch", "mvsum", "wn")
    assert got == sorted([
        ("q0", 600, 3, 1), ("q0", 1200, 3, 2), ("q0", 1800, 1, 2),
        ("q0", 2400, 5, 2),
        ("q1", 0, 2, 1), ("q1", 600, 4, 2), ("q1", 1200, 7, 2),
    ])


def test_moving_sum_rejects_bad_shift(buckets):
    with pytest.raises(ValueError, match="shift"):
        moving_sum(buckets, 2, shift=2)


def test_bucket_sort_truncates_by_count(buckets):
    got = _rows(bucket_sort(buckets, size=2),
                "query_id", "pos", "bucket_epoch", "n")
    assert got == sorted([
        ("q0", 1, 2400, 4), ("q0", 2, 600, 3),
        ("q1", 1, 1200, 5), ("q1", 2, 0, 2),  # tie 2/2 -> bucket asc
    ])


def test_bucket_sort_from_offsets_absolute_pos(buckets):
    got = _rows(bucket_sort(buckets, size=2, from_=1),
                "query_id", "pos", "bucket_epoch")
    assert got == sorted([
        ("q0", 2, 600), ("q0", 3, 1800),
        ("q1", 2, 0), ("q1", 3, 600),
    ])


def test_bucket_selector_is_where(buckets):
    got = _rows(bucket_selector(buckets, "n >= 3"),
                "query_id", "bucket_epoch", "n")
    assert got == sorted([("q0", 600, 3), ("q0", 2400, 4), ("q1", 1200, 5)])
    with pytest.raises(ValueError, match="predicate"):
        bucket_selector(buckets, "  ")


def test_stats_bucket_sibling_summary(buckets):
    got = _rows(stats_bucket(buckets),
                "query_id", "n_buckets", "min_n", "max_n", "sum_n")
    assert got == sorted([("q0", 3, 1, 4, 8), ("q1", 3, 2, 5, 9)])


def test_stats_bucket_gap_sensitivity_documented(buckets):
    # densified series sees the zero bucket in min_n — the documented
    # gap policy (run on the view matching the question)
    dense = densify_buckets(buckets, 600)
    got = {r["query_id"]: r["min_n"] for r in stats_bucket(dense).collect()}
    assert got == {"q0": 0, "q1": 2}


def test_bucket_script_integer_expr(buckets):
    from searchengine_spark.query.pipeline_aggs import bucket_script

    got = _rows(bucket_script(buckets, "n * 2 + bucket_epoch div 600"),
                "query_id", "bucket_epoch", "val")
    assert got == sorted([
        ("q0", 600, 7), ("q0", 1800, 5), ("q0", 2400, 12),
        ("q1", 0, 4), ("q1", 600, 5), ("q1", 1200, 12),
    ])


def test_bucket_script_null_drops(buckets):
    from searchengine_spark.query.pipeline_aggs import bucket_script

    got = bucket_script(buckets, "CASE WHEN n >= 3 THEN n * 10 END")
    assert _rows(got, "query_id", "bucket_epoch", "val") == sorted([
        ("q0", 600, 30), ("q0", 2400, 40), ("q1", 1200, 50),
    ])
    with pytest.raises(ValueError, match="expr"):
        bucket_script(buckets, "  ")


def test_percentiles_bucket_nearest_rank(buckets):
    from searchengine_spark.query.pipeline_aggs import percentiles_bucket

    # q0 sorted ns = [1, 3, 4]; q1 = [2, 2, 5]
    got = _rows(percentiles_bucket(buckets, (50, 100)),
                "query_id", "pct", "value")
    assert got == sorted([
        ("q0", 50, 3), ("q0", 100, 4),
        ("q1", 50, 2), ("q1", 100, 5),
    ])
    with pytest.raises(ValueError, match="percents"):
        percentiles_bucket(buckets, (0,))


def test_percentiles_bucket_matches_result_percentiles_rule(buckets):
    # same nearest-rank index arithmetic as aggregations.percentiles_agg
    from searchengine_spark.query.pipeline_aggs import percentiles_bucket

    rows = percentiles_bucket(buckets, (1, 34, 67, 100)).collect()
    ns = {"q0": [1, 3, 4], "q1": [2, 2, 5]}
    for r in rows:
        vals = ns[r["query_id"]]
        idx = max(1, (r["pct"] * len(vals) + 99) // 100)
        assert r["value"] == vals[idx - 1], r


def test_extreme_bucket_keys_with_ties(spark):
    from searchengine_spark.query.pipeline_aggs import extreme_bucket_keys

    tied = spark.createDataFrame([
        ("q0", "ts", 0, 5), ("q0", "ts", 600, 1),
        ("q0", "ts", 1200, 5), ("q0", "ts", 1800, 1),
    ], SCHEMA)
    got = {
        (r["query_id"], r["kind"]): (r["n"], list(r["keys"]))
        for r in extreme_bucket_keys(tied).collect()
    }
    assert got == {
        ("q0", "min"): (1, [600, 1800]),
        ("q0", "max"): (5, [0, 1200]),
    }


def test_extreme_bucket_keys_constant_series(spark):
    from searchengine_spark.query.pipeline_aggs import extreme_bucket_keys

    const = spark.createDataFrame(
        [("q0", "ts", 0, 2), ("q0", "ts", 600, 2)], SCHEMA)
    got = {
        (r["query_id"], r["kind"]): (r["n"], list(r["keys"]))
        for r in extreme_bucket_keys(const).collect()
    }
    # min == max: both kinds emit, same value, same keys
    assert got == {
        ("q0", "min"): (2, [0, 600]),
        ("q0", "max"): (2, [0, 600]),
    }


def test_normalize_buckets_methods(spark):
    from searchengine_spark.query.pipeline_aggs import (
        NORMALIZE_METHODS,
        normalize_buckets,
    )

    rows = [(0, "ts", 0, 2), (0, "ts", 600, 6), (0, "ts", 1200, 2),
            (1, "ts", 0, 5)]
    buckets = spark.createDataFrame(
        rows, "query_id int, col string, bucket_epoch long, n long")

    def got(method):
        return {(r["query_id"], r["bucket_epoch"]):
                (r["norm_num"], r["norm_den"])
                for r in normalize_buckets(buckets, method).collect()}

    # rescale_0_1: (n-min)/(max-min); q1 degenerate -> den 0
    assert got("rescale_0_1") == {
        (0, 0): (0, 4), (0, 600): (4, 4), (0, 1200): (0, 4),
        (1, 0): (0, 0)}
    assert got("rescale_0_100") == {
        (0, 0): (0, 4), (0, 600): (400, 4), (0, 1200): (0, 4),
        (1, 0): (0, 0)}
    assert got("percent_of_sum") == {
        (0, 0): (2, 10), (0, 600): (6, 10), (0, 1200): (2, 10),
        (1, 0): (5, 5)}
    # mean: (n*cnt - sum)/((max-min)*cnt); q0: cnt=3 sum=10
    assert got("mean") == {
        (0, 0): (-4, 12), (0, 600): (8, 12), (0, 1200): (-4, 12),
        (1, 0): (0, 0)}
    assert set(NORMALIZE_METHODS) == {
        "rescale_0_1", "rescale_0_100", "percent_of_sum", "mean"}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="z_score"):
        normalize_buckets(buckets, "z_score")
