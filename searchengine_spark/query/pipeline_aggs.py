"""Pipeline aggregations — the ES ``derivative`` / ``cumulative_sum`` /
``moving_fn`` / ``serial_diff`` / ``bucket_sort`` / ``bucket_selector`` /
``*_bucket`` sibling analogs, second-stage aggregations over a FIRST
aggregation's buckets (the trend lines a dashboard draws on top of a
date_histogram).

Composition contract: the input is any BUCKETED frame — the output of
``aggregations.histogram_counts`` / ``date_histogram_counts`` (or the
densified view below), i.e. ``(query_id, col, <bucket>, n)`` rows with
one row per (query, column, bucket). Everything here is a window
function over (query_id, col) partitions ordered by the bucket key:

- Plan shape: ONE window exchange partitioned by (query_id, col). The
  frame is bounded by queries × columns × buckets — corpus size never
  appears, and partitioning by query keeps the sort distributed (no
  single-partition global window).
- Cross-engine arithmetic: every emitted value is BIGINT arithmetic
  over BIGINT doc counts (sums, lags, differences) — nothing to drift
  between Spark and DuckDB. Ratios (moving AVERAGE, avg_bucket) are
  deliberately left to the client as sum/count pairs, the repo's
  exact-arithmetic discipline (see ``aggregations.stats_agg``).

Gap policy (the ES footgun, made explicit): ES pipeline aggs over a
histogram require ``min_doc_count: 0`` — a derivative across a GAP in
emitted buckets is not the derivative of the series. Our first-stage
histograms emit non-empty buckets only (min_doc_count=1), so
``densify_buckets`` is the explicit bridge: it zero-fills every missing
bucket between each group's min and max key. Positional pipelines
(derivative / moving / serial_diff) should run on the densified frame;
order-statistic pipelines (bucket_sort / bucket_selector / stats over
buckets) are gap-indifferent.

No reference counterpart (the reference serves ranked lists only);
the ES semantics follow the public Elasticsearch pipeline-aggregation
documentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _wspec(bucket_col: str):
    return Window.partitionBy("query_id", "col").orderBy(bucket_col)


def _check_bucket_col(buckets: DataFrame, bucket_col: str) -> None:
    for c in ("query_id", "col", bucket_col, "n"):
        if c not in buckets.columns:
            raise ValueError(
                f"bucketed frame lacks column {c!r} (expected the "
                f"(query_id, col, {bucket_col}, n) shape histogram_counts/"
                "date_histogram_counts emit)")


def densify_buckets(
    buckets: DataFrame,
    interval: int,
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """-> the same (query_id, col, bucket, n) shape with every missing
    bucket between each (query_id, col) group's min and max key emitted
    as n=0 — the ES ``min_doc_count: 0`` view positional pipeline aggs
    are defined over (within the observed extent; ES's
    ``extended_bounds`` beyond it is a presentation concern).

    Integer bucket keys only (epoch seconds, or integer histogram keys):
    the fill is ``sequence(min, max, interval)`` and float steps would
    reintroduce the drift the integer bucket arithmetic avoids. The
    sequence is per-group and ascending by construction (min <= max), so
    the descending-``sequence`` trap never arises. Plan: one bounded
    groupBy for the extents, a generate+explode, one LEFT join back —
    all bounded by the bucket frame, never the corpus."""
    _check_bucket_col(buckets, bucket_col)
    ival = int(interval)
    if ival <= 0:
        raise ValueError(f"interval must be > 0, got {interval}")
    b = F.col(bucket_col).cast("long")
    extents = (
        buckets.groupBy("query_id", "col")
        .agg(F.min(b).alias("_mn"), F.max(b).alias("_mx"))
    )
    dense = extents.select(
        "query_id", "col",
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.lit(ival))
        ).alias(bucket_col),
    )
    return (
        dense.join(
            buckets.select(
                "query_id", "col",
                b.alias(bucket_col), F.col("n").cast("long").alias("_n")),
            ["query_id", "col", bucket_col], "left")
        .select("query_id", "col", bucket_col,
                F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n"))
    )


def cumulative_sum(
    buckets: DataFrame, bucket_col: str = "bucket_epoch"
) -> DataFrame:
    """-> (query_id, col, bucket, n, cum): ES ``cumulative_sum`` pipeline
    aggregation — running BIGINT total of ``n`` in bucket order within
    each (query_id, col) series. Every input bucket emits (the first
    bucket's cum is its own n). Gap-indifferent for the total but
    usually drawn on the densified frame."""
    _check_bucket_col(buckets, bucket_col)
    w = _wspec(bucket_col).rowsBetween(Window.unboundedPreceding, 0)
    return buckets.select(
        "query_id", "col", bucket_col, F.col("n").cast("long").alias("n"),
        F.sum(F.col("n").cast("long")).over(w).cast("long").alias("cum"),
    ).orderBy("query_id", "col", bucket_col)


def derivative(
    buckets: DataFrame, bucket_col: str = "bucket_epoch"
) -> DataFrame:
    """-> (query_id, col, bucket, dn): ES ``derivative`` pipeline
    aggregation — first difference ``n - lag(n)`` in bucket order within
    each (query_id, col) series. The first bucket of a series emits
    NOTHING (ES omits the derivative there rather than inventing one).
    Run on ``densify_buckets`` output: a difference across a gap in
    emitted buckets is not the series derivative (the ES
    min_doc_count=0 requirement, enforced here by composition rather
    than silently)."""
    _check_bucket_col(buckets, bucket_col)
    w = _wspec(bucket_col)
    prev = F.lag(F.col("n").cast("long"), 1).over(w)
    return (
        buckets.select(
            "query_id", "col", bucket_col,
            (F.col("n").cast("long") - prev).alias("dn"))
        .filter(F.col("dn").isNotNull())
        .orderBy("query_id", "col", bucket_col)
    )


def serial_diff(
    buckets: DataFrame, lag: int, bucket_col: str = "bucket_epoch"
) -> DataFrame:
    """-> (query_id, col, bucket, dn): ES ``serial_diff`` pipeline
    aggregation — lagged difference ``n - lag(n, L)`` (seasonality
    removal; L=1 degenerates to ``derivative``). The first L buckets of
    each series emit nothing. Same densify caveat as derivative."""
    _check_bucket_col(buckets, bucket_col)
    l = int(lag)
    if l <= 0:
        raise ValueError(f"lag must be > 0, got {lag}")
    w = _wspec(bucket_col)
    prev = F.lag(F.col("n").cast("long"), l).over(w)
    return (
        buckets.select(
            "query_id", "col", bucket_col,
            (F.col("n").cast("long") - prev).alias("dn"))
        .filter(F.col("dn").isNotNull())
        .orderBy("query_id", "col", bucket_col)
    )


def moving_sum(
    buckets: DataFrame,
    window: int,
    shift: int = 0,
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """-> (query_id, col, bucket, mvsum, wn): ES ``moving_fn`` pipeline
    aggregation with the sum function — a sliding window of ``window``
    buckets over each (query_id, col) series. ``shift`` follows the ES
    contract's two useful settings: shift=0 (the ES default) offers the
    window ENDING JUST BEFORE the current bucket (rows
    [-window, -1]); shift=1 slides it to include the current bucket
    (rows [-window+1, 0]). ``wn`` is how many buckets actually fell in
    the frame (< window near the series head) so a moving AVERAGE is
    the client-side mvsum/wn — exact, per the repo's no-float-ratio
    discipline. Buckets whose frame is EMPTY (the first bucket at
    shift=0) emit nothing, matching ES's null there. Run on densified
    buckets for ES semantics."""
    _check_bucket_col(buckets, bucket_col)
    win = int(window)
    if win <= 0:
        raise ValueError(f"window must be > 0, got {window}")
    if shift not in (0, 1):
        raise ValueError(
            f"shift must be 0 (window before current) or 1 (window ends "
            f"at current), got {shift}")
    lo, hi = (-win, -1) if shift == 0 else (-win + 1, 0)
    w = _wspec(bucket_col).rowsBetween(lo, hi)
    nn = F.col("n").cast("long")
    return (
        buckets.select(
            "query_id", "col", bucket_col,
            F.sum(nn).over(w).cast("long").alias("mvsum"),
            F.count(nn).over(w).cast("long").alias("wn"))
        .filter(F.col("wn") > 0)
        .orderBy("query_id", "col", bucket_col)
    )


def bucket_sort(
    buckets: DataFrame,
    size: int,
    from_: int = 0,
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """-> (query_id, col, bucket, n, pos): ES ``bucket_sort`` pipeline
    aggregation — reorder each (query_id, col) series by doc count
    (n DESC, bucket ASC tiebreak — deterministic) and truncate to
    ``size`` buckets after skipping ``from_`` (the ES from/size pair).
    ``pos`` is the 1-based post-sort position, absolute (from_+1 is the
    first emitted pos), so pages compose like search paging does.
    Gap-indifferent: a zero bucket never outranks a non-zero one."""
    _check_bucket_col(buckets, bucket_col)
    sz = int(size)
    fr = int(from_)
    if sz <= 0:
        raise ValueError(f"size must be > 0, got {size}")
    if fr < 0:
        raise ValueError(f"from_ must be >= 0, got {from_}")
    w = Window.partitionBy("query_id", "col").orderBy(
        F.col("n").cast("long").desc(), F.col(bucket_col).asc())
    return (
        buckets.select(
            "query_id", "col", bucket_col,
            F.col("n").cast("long").alias("n"),
            F.row_number().over(w).cast("long").alias("pos"))
        .filter((F.col("pos") > fr) & (F.col("pos") <= fr + sz))
        .orderBy("query_id", "col", "pos")
    )


def bucket_selector(
    buckets: DataFrame,
    predicate: str,
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """-> the input shape filtered to buckets where ``predicate`` holds:
    ES ``bucket_selector`` pipeline aggregation (the HAVING clause of
    the aggregation world). The predicate is a SQL boolean expression
    over the bucket row (``n`` and the bucket-key column), restricted by
    CONVENTION to the Spark∩DuckDB dialect (comparisons, AND/OR/NOT —
    the filters_agg discipline) so an oracle replicates it verbatim. A
    NULL predicate drops the bucket, exactly like WHERE."""
    _check_bucket_col(buckets, bucket_col)
    if not predicate or not str(predicate).strip():
        raise ValueError("predicate must be a non-empty SQL boolean "
                         "expression over (n, bucket)")
    return (
        buckets.select(
            "query_id", "col", bucket_col,
            F.col("n").cast("long").alias("n"))
        .filter(F.expr(predicate))
        .orderBy("query_id", "col", bucket_col)
    )


def bucket_script(
    buckets: DataFrame,
    expr: str,
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """-> (query_id, col, bucket, n, val): ES ``bucket_script`` pipeline
    aggregation — a derived per-bucket value computed from the bucket
    row (``n`` and the bucket-key column). The expression is a SQL
    INTEGER expression restricted by CONVENTION to the Spark∩DuckDB
    dialect (the bucket_selector/filters_agg discipline: arithmetic,
    CASE, comparisons — no float functions), cast to BIGINT, so an
    oracle replicates it verbatim with no float policy. A NULL result
    drops the bucket — exactly ES's skip-the-bucket rule for a script
    returning null (and the engine-wide NULLs-skip rule)."""
    _check_bucket_col(buckets, bucket_col)
    if not expr or not str(expr).strip():
        raise ValueError("expr must be a non-empty SQL integer "
                         "expression over (n, bucket)")
    return (
        buckets.select(
            "query_id", "col", bucket_col,
            F.col("n").cast("long").alias("n"))
        .withColumn("val", F.expr(expr).cast("long"))
        .filter(F.col("val").isNotNull())
        .orderBy("query_id", "col", bucket_col)
    )


def percentiles_bucket(
    buckets: DataFrame,
    percents=(25, 50, 75, 100),
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """-> (query_id, col, pct, value): ES ``percentiles_bucket`` pipeline
    aggregation — percentiles of the bucket doc counts across each
    (query_id, col) series, by the repo-wide EXACT nearest-rank rule
    (value at 1-based sorted index ``(pct*n + 99) div 100`` floored at
    1 — the aggregations.percentiles_agg convention; ES documents
    percentiles_bucket as exact over the bucket list too, interpolation
    is only its t-digest metric cousin). All-BIGINT. Gap-sensitive:
    densify first if zero buckets should count."""
    _check_bucket_col(buckets, bucket_col)
    ps = [int(p) for p in percents]
    if not ps or any(p <= 0 or p > 100 for p in ps):
        raise ValueError(
            f"percents must be integers in (0, 100], got {list(percents)}"
        )
    arr = buckets.groupBy("query_id", "col").agg(
        F.sort_array(F.collect_list(F.col("n").cast("long"))).alias("vals")
    )
    fanned = arr.select(
        "query_id", "col",
        F.explode(F.array(*[F.lit(p) for p in sorted(set(ps))])).alias("pct"),
        "vals",
    )
    idx = F.greatest(F.lit(1), F.expr("(pct * size(vals) + 99) div 100"))
    return (
        fanned.select(
            "query_id", "col",
            F.col("pct").cast("long").alias("pct"),
            F.element_at("vals", idx.cast("int")).cast("long").alias("value"),
        )
        .orderBy("query_id", "col", "pct")
    )


def extreme_bucket_keys(
    buckets: DataFrame, bucket_col: str = "bucket_epoch"
) -> DataFrame:
    """-> (query_id, col, kind, n, keys): ES ``min_bucket`` /
    ``max_bucket`` pipeline aggregations — per (query_id, col) series
    one row per kind ('min', 'max') carrying the extreme doc count AND
    the sorted array of bucket keys achieving it (ES returns a keys
    LIST precisely because ties are legal). stats_bucket gives the
    values only; this is the keys-of-extremes complement. All-BIGINT +
    deterministic sorted keys, so the driver oracle hash-gates it."""
    _check_bucket_col(buckets, bucket_col)
    nn = F.col("n").cast("long")
    b = F.col(bucket_col).cast("long")
    ext = buckets.groupBy("query_id", "col").agg(
        F.min(nn).alias("_mn"), F.max(nn).alias("_mx")
    )
    keyed = buckets.select(
        "query_id", "col", b.alias("_b"), nn.alias("_n")
    ).join(ext, ["query_id", "col"])
    out = keyed.select(
        "query_id", "col",
        F.explode(
            F.array(
                F.struct(F.lit("min").alias("kind"), F.col("_mn").alias("tgt")),
                F.struct(F.lit("max").alias("kind"), F.col("_mx").alias("tgt")),
            )
        ).alias("e"),
        "_b", "_n",
    ).filter(F.col("_n") == F.col("e.tgt"))
    return (
        out.groupBy("query_id", "col", F.col("e.kind").alias("kind"))
        .agg(
            F.first("_n").cast("long").alias("n"),
            F.sort_array(F.collect_list("_b")).alias("keys"),
        )
        .orderBy("query_id", "col", "kind")
    )


def stats_bucket(
    buckets: DataFrame, bucket_col: str = "bucket_epoch"
) -> DataFrame:
    """-> (query_id, col, n_buckets, min_n, max_n, sum_n): the ES
    sibling pipeline aggregations (``stats_bucket``, subsuming
    min_bucket / max_bucket / sum_bucket; ``avg_bucket`` is the
    client-side sum_n/n_buckets, the exact-arithmetic discipline) — one
    summary row per (query_id, col) series over its bucket doc counts.
    All BIGINT. Gap-sensitive only through min_n (a densified frame can
    contribute 0s); run on whichever view matches the question being
    asked, like ES."""
    _check_bucket_col(buckets, bucket_col)
    nn = F.col("n").cast("long")
    return (
        buckets.groupBy("query_id", "col")
        .agg(F.count(nn).cast("long").alias("n_buckets"),
             F.min(nn).cast("long").alias("min_n"),
             F.max(nn).cast("long").alias("max_n"),
             F.sum(nn).cast("long").alias("sum_n"))
        .orderBy("query_id", "col")
    )


#: the rational members of ES's normalize-method set; z_score (sqrt of a
#: variance) and softmax (exp) are irrational/libm and refused — the
#: gauss-decay precedent
NORMALIZE_METHODS = ("rescale_0_1", "rescale_0_100", "percent_of_sum", "mean")


def normalize_buckets(
    buckets: DataFrame,
    method: str = "rescale_0_1",
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """-> (query_id, col, bucket, n, norm_num, norm_den): ES
    ``normalize`` pipeline aggregation — each bucket's count rescaled
    within its (query_id, col) series, emitted as the EXACT integer
    numerator/denominator pair (the no-float-ratio discipline: the
    float value is norm_num/norm_den client-side; a degenerate series
    — max == min, or a zero sum — emits norm_den = 0 and the client
    decides, where ES emits null). Methods (all pure BIGINT):

    - ``rescale_0_1``:    (n - min) / (max - min)
    - ``rescale_0_100``:  100·(n - min) / (max - min)
    - ``percent_of_sum``: n / Σn
    - ``mean``:           (n - avg) / (max - min), as the cross-
      multiplied exact pair (n·cnt - Σn) / ((max - min)·cnt)

    z_score and softmax are refused (irrational/libm — the repo's
    exact-arithmetic policy). One window exchange over (query_id, col),
    bounded by the bucket frame."""
    _check_bucket_col(buckets, bucket_col)
    if method not in NORMALIZE_METHODS:
        raise ValueError(
            f"method must be one of {NORMALIZE_METHODS} (z_score/softmax "
            f"are irrational — refused), got {method!r}")
    nn = F.col("n").cast("long")
    wq = Window.partitionBy("query_id", "col")
    b = (
        buckets.select("query_id", "col", bucket_col, nn.alias("n"))
        .withColumn("_mn", F.min("n").over(wq))
        .withColumn("_mx", F.max("n").over(wq))
        .withColumn("_sum", F.sum("n").over(wq))
        .withColumn("_cnt", F.count("n").over(wq))
    )
    if method == "rescale_0_1":
        num, den = F.expr("n - _mn"), F.expr("_mx - _mn")
    elif method == "rescale_0_100":
        num, den = F.expr("100 * (n - _mn)"), F.expr("_mx - _mn")
    elif method == "percent_of_sum":
        num, den = F.col("n"), F.col("_sum")
    else:  # mean
        num = F.expr("n * _cnt - _sum")
        den = F.expr("(_mx - _mn) * _cnt")
    return b.select(
        "query_id", "col", bucket_col, "n",
        num.cast("long").alias("norm_num"),
        den.cast("long").alias("norm_den"),
    ).orderBy("query_id", "col", bucket_col)
