"""Numeric result-set aggregations — the ES ``histogram`` and ``stats``
aggregation analogs over any query's result set (the metric sidebars a
search UI hangs next to the facet drill-downs).

Same composition contract as facets (query/facets.py): the input is any
RESOLVED result frame (``resolve_docs`` / ``resolve_docs_federated``
output, ranked or boolean) plus the attribute table keyed by the index's
external ids — attributes live in the lakehouse table, never the index.
Plan shape: ONE exchange joining the bounded hit set (queries x k rows
for ranked retrieval) to the pruned attrs scan, a zero-exchange melt to
(column, value) pairs, then ONE partial-aggregable groupBy — corpus size
never appears.

Cross-engine arithmetic (the repo's exact-arithmetic discipline):

- ``histogram``: bucket = ``floor(value / interval) * interval`` — the
  ES histogram bucket_key formula exactly, floor (not truncate) so
  negative values land in the bucket BELOW zero like ES. Buckets emit
  as DOUBLE keys (ES emits doubles) but the arithmetic is
  float-division + floor, identical in Spark and DuckDB on the integer/
  small-double attributes this serves. Empty buckets are not emitted
  (ES ``min_doc_count: 1`` default; dense zero-filled histograms are a
  presentation concern).
- ``stats``: count / min / max / sum as exact types (BIGINT count;
  min/max/sum aggregate as DOUBLE — integer attributes up to 2^53 stay
  exact, so there is no float drift). avg is deliberately NOT
  emitted: it is sum/count, and emitting it would force a float-rounding
  policy on an otherwise exact row — compute it client-side.

No reference counterpart (the reference serves ranked lists only).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# - ``percentiles``: EXACT nearest-rank percentiles (the classic
#   definition: the value at 1-based index ceil(p*n/100), computed as
#   the integer (p*n + 99) div 100 so Spark and DuckDB agree bit-for-bit
#   — never interpolated: ES's t-digest is approximate BY DESIGN at
#   corpus scale, but a result set is bounded by queries x k, where
#   exact is both cheaper and reproducible). The per-group collect is
#   bounded by the result-set size, never the corpus.
# - ``cardinality``: exact distinct-value counts per column (the ES
#   cardinality aggregation analog; ES's HLL sketch exists for UNBOUNDED
#   streams — over a bounded hit window exact countDistinct is one
#   partial-aggregable exchange). NULLs don't count (ES skips missing).


def _checked_join(
    results: DataFrame,
    attrs: DataFrame,
    num_cols: Sequence[str],
    ext_cols: Sequence[str],
) -> DataFrame:
    if not num_cols:
        raise ValueError("num_cols must name at least one column")
    missing = [c for c in list(ext_cols) + list(num_cols)
               if c not in attrs.columns]
    if missing:
        raise ValueError(f"attrs table lacks columns {missing}")
    hits = results.select("query_id", *ext_cols)
    return hits.join(attrs.select(*ext_cols, *num_cols), list(ext_cols))


def _melt_numeric(joined: DataFrame, num_cols: Sequence[str]) -> DataFrame:
    melt = []
    for c in num_cols:
        melt.extend([F.lit(c), F.col(c).cast("double")])
    return joined.select(
        "query_id",
        F.explode(F.create_map(*melt)).alias("col", "value"),
    ).filter(F.col("value").isNotNull())


def histogram_counts(
    results: DataFrame,
    attrs: DataFrame,
    num_cols: Sequence[str],
    ext_cols: Sequence[str],
    interval: float,
) -> DataFrame:
    """-> (query_id, col, bucket, n): ES ``histogram`` aggregation over
    each query's result set — per numeric column, docs bucketed by
    ``floor(value / interval) * interval``, one row per non-empty bucket,
    ordered bucket-asc (deterministic; a doc counts once per query
    regardless of rank/score). NULL attribute values are skipped (the ES
    ``missing`` option is opt-in)."""
    if not interval or interval <= 0:
        raise ValueError(f"interval must be > 0, got {interval}")
    pairs = _melt_numeric(
        _checked_join(results, attrs, num_cols, ext_cols), num_cols
    )
    bucket = (F.floor(F.col("value") / F.lit(float(interval)))
              * F.lit(float(interval)))
    return (
        pairs.select("query_id", "col", bucket.alias("bucket"))
        .groupBy("query_id", "col", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("query_id", "col", "bucket")
    )


#: fixed-span sugar for date_histogram_counts — fixed UTC spans (the ES
#: fixed_interval units)
_CALENDAR_SECONDS = {"day": 86400, "hour": 3600, "minute": 60}

#: true calendar intervals (the ES calendar_interval units that are NOT
#: fixed spans): bucket by date_trunc, which Spark and DuckDB both
#: implement with exact civil-calendar arithmetic — no libm. week
#: truncates to the ISO Monday in both engines.
_CALENDAR_TRUNC = ("week", "month", "quarter", "year")


def date_histogram_counts(
    results: DataFrame,
    attrs: DataFrame,
    ts_cols: Sequence[str],
    ext_cols: Sequence[str],
    interval="day",
) -> DataFrame:
    """-> (query_id, col, bucket_epoch, n): ES ``date_histogram`` over
    each query's result set — timestamps bucket by
    ``floor(epoch_seconds / interval) * interval`` (the fixed_interval
    semantics; ``'day'``/``'hour'``/``'minute'`` are sugar for their UTC
    second spans, any positive int is a fixed span in seconds). Buckets
    emit as BIGINT epoch seconds: integer arithmetic end to end, no
    tz/format round-trip (timestamps are instants; epoch < 2^53 stays
    exact through the shared melt).

    CALENDAR intervals (``'week'``/``'month'``/``'quarter'``/``'year'``
    — the ES calendar_interval units that are not fixed spans) bucket by
    ``date_trunc`` instead: exact civil-calendar arithmetic, identical
    in Spark and DuckDB, no libm. The bucket still emits as the BIGINT
    epoch second of the truncated boundary. date_trunc interprets the
    instant in the SESSION timezone — the cross-engine/UTC contract
    holds under ``spark.sql.session.timeZone=UTC`` (what tests, bench
    and the driver entries pin); other sub-month irregular intervals
    remain refused."""
    if isinstance(interval, str) and interval in _CALENDAR_TRUNC:
        joined = _checked_join(results, attrs, ts_cols, ext_cols)
        melt = []
        for c in ts_cols:
            melt.extend([F.lit(c), F.col(c).cast("timestamp")])
        pairs = joined.select(
            "query_id",
            F.explode(F.create_map(*melt)).alias("col", "value"),
        ).filter(F.col("value").isNotNull())
        bucket = F.unix_timestamp(F.date_trunc(interval, F.col("value")))
        return (
            pairs.select(
                "query_id", "col",
                bucket.cast("long").alias("bucket_epoch"))
            .groupBy("query_id", "col", "bucket_epoch")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy("query_id", "col", "bucket_epoch")
        )
    if isinstance(interval, str):
        if interval not in _CALENDAR_SECONDS:
            raise ValueError(
                f"interval must be one of {sorted(_CALENDAR_SECONDS)}, "
                f"one of {sorted(_CALENDAR_TRUNC)}, or a fixed number of "
                f"seconds, got {interval!r}"
            )
        ival = _CALENDAR_SECONDS[interval]
    else:
        ival = int(interval)
        if ival <= 0:
            raise ValueError(f"interval must be > 0 seconds, got {interval}")
    # timestamp -> DOUBLE casts to (fractional) epoch seconds in Spark,
    # so the numeric-histogram core applies unchanged; re-emit the
    # bucket as BIGINT epoch seconds
    hist = histogram_counts(results, attrs, ts_cols, ext_cols,
                            interval=float(ival))
    return hist.select(
        "query_id",
        "col",
        F.col("bucket").cast("long").alias("bucket_epoch"),
        "n",
    )


def percentiles_agg(
    results: DataFrame,
    attrs: DataFrame,
    num_cols: Sequence[str],
    ext_cols: Sequence[str],
    percents: Sequence[int] = (25, 50, 75, 95),
) -> DataFrame:
    """-> (query_id, col, pct, value): ES ``percentiles`` aggregation
    over each query's result set, EXACT nearest-rank (value at 1-based
    sorted index ``(pct*n + 99) div 100``, floored at 1 — pure integer
    rank arithmetic, so any engine lands on the same element; pct=100 is
    the max, pct=50 the lower median). NULLs are skipped; a (query, col)
    group with no values emits nothing. The sorted collect is bounded by
    the result-set size (queries x k), never the corpus."""
    ps = [int(p) for p in percents]
    if not ps or any(p <= 0 or p > 100 for p in ps):
        raise ValueError(
            f"percents must be integers in (0, 100], got {list(percents)}"
        )
    pairs = _melt_numeric(
        _checked_join(results, attrs, num_cols, ext_cols), num_cols
    )
    arr = pairs.groupBy("query_id", "col").agg(
        F.sort_array(F.collect_list("value")).alias("vals")
    )
    fanned = arr.select(
        "query_id",
        "col",
        F.explode(F.array(*[F.lit(p) for p in sorted(set(ps))])).alias("pct"),
        "vals",
    )
    idx = F.greatest(F.lit(1), F.expr("(pct * size(vals) + 99) div 100"))
    return (
        fanned.select(
            "query_id",
            "col",
            F.col("pct").cast("long").alias("pct"),
            F.element_at("vals", idx.cast("int")).alias("value"),
        )
        .orderBy("query_id", "col", "pct")
    )


def cardinality_agg(
    results: DataFrame,
    attrs: DataFrame,
    cols: Sequence[str],
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, col, n_distinct): ES ``cardinality`` aggregation
    over each query's result set — exact distinct-value counts per named
    attribute column (NULLs skipped, a doc's value counts once per query
    regardless of rank). One partial-aggregable exchange; sketching
    (ES's HLL) buys nothing on a k-bounded hit window."""
    joined = _checked_join(results, attrs, cols, ext_cols)
    agg = joined.groupBy("query_id").agg(
        *[F.countDistinct(c).cast("long").alias(c) for c in cols]
    )
    melt = []
    for c in cols:
        melt.extend([F.lit(c), F.col(c)])
    return (
        agg.select(
            "query_id",
            F.explode(F.create_map(*melt)).alias("col", "n_distinct"),
        )
        .orderBy("query_id", "col")
    )


def range_agg(
    results: DataFrame,
    attrs: DataFrame,
    num_cols: Sequence[str],
    ext_cols: Sequence[str],
    ranges: Sequence[tuple],
) -> DataFrame:
    """-> (query_id, col, range_from, range_to, n): ES ``range``
    aggregation over each query's result set — per numeric column, docs
    counted into EXPLICIT buckets ``[from, to)`` (from inclusive, to
    exclusive — the ES range contract; ``None`` on either side means
    unbounded). Ranges may overlap: a value counts in EVERY range that
    contains it, exactly like ES. Unlike histogram, every specified
    range emits for every query in the result frame — n=0 buckets
    included (the ES range agg always returns all its buckets; only a
    zero-hit query emits nothing, since it contributes no result rows).
    NULL attribute values are skipped. Comparisons only — no bucket
    arithmetic, so there is nothing to drift cross-engine. Plan: the
    shared melt, a broadcast theta-join against the tiny literal ranges
    frame, one partial-aggregable groupBy, then a broadcast fan-out of
    the full bucket list per (query, col) to restore empty buckets."""
    rs = []
    for i, (lo, hi) in enumerate(ranges):
        lo = None if lo is None else float(lo)
        hi = None if hi is None else float(hi)
        if lo is None and hi is None:
            raise ValueError(f"range {i} is unbounded on both sides")
        if lo is not None and hi is not None and lo >= hi:
            raise ValueError(f"range {i} has from >= to ({lo} >= {hi})")
        rs.append((i, lo, hi))
    if not rs:
        raise ValueError("ranges must name at least one (from, to) pair")
    pairs = _melt_numeric(
        _checked_join(results, attrs, num_cols, ext_cols), num_cols
    )
    spark = results.sparkSession
    rdf = spark.createDataFrame(
        rs, "range_idx int, range_from double, range_to double")
    contains = (
        (F.col("range_from").isNull() | (F.col("value") >= F.col("range_from")))
        & (F.col("range_to").isNull() | (F.col("value") < F.col("range_to")))
    )
    counts = (
        pairs.join(F.broadcast(rdf), contains)
        .groupBy("query_id", "col", "range_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # every (query in the result frame) x (column) x (range) emits —
    # including n=0 buckets and queries whose hits all have NULL attrs
    cols_lit = F.explode(
        F.array(*[F.lit(c) for c in num_cols])).alias("col")
    base = (
        results.select("query_id").distinct()
        .select("query_id", cols_lit)
        .crossJoin(F.broadcast(rdf))
    )
    return (
        base.join(counts, ["query_id", "col", "range_idx"], "left")
        .select(
            "query_id", "col", "range_from", "range_to",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("query_id", "col",
                 F.col("range_from").asc_nulls_first(),
                 F.col("range_to").asc_nulls_last())
    )


def composite_agg(
    results: DataFrame,
    attrs: DataFrame,
    group_cols: Sequence[str],
    ext_cols: Sequence[str],
    size: int,
    after: Sequence | None = None,
) -> DataFrame:
    """-> (query_id, *group_cols, n, bucket_rank): ES ``composite``
    aggregation over each query's result set — the PAGINATED bucket
    enumerator. Buckets are the distinct tuples of ``group_cols`` values
    among the query's hits, in lexicographic tuple order (each source
    asc — the ES default), doc counts per bucket; a page is the first
    ``size`` buckets strictly AFTER the ``after`` key (the previous
    page's last tuple — ES ``after_key``), ranks page-relative 1..size.

    This exists for the retrieval modes whose hit sets are NOT
    k-bounded: boolean retrieval keeps the single-index set contract (no
    top-k cut), so its bucket space can be corpus-scale — terms/facet
    aggregations hold every bucket at once, composite holds one page.
    The after-filter composes with partial aggregation: the lexicographic
    strictly-greater predicate prunes BEFORE the bucket groupBy, and the
    page cut is a rank<=size window over buckets (Spark pushes it down as
    WindowGroupLimit — a per-partition top-``size`` heap, never a full
    sort). Walking pages with after = the previous page's last tuple
    partitions the full bucket list exactly (gated).

    ES contract points kept: any NULL source value drops the doc from
    every bucket (``missing_bucket: false``, the default); a doc counts
    once per query regardless of rank; ``after`` needs one value per
    source. Comparisons only — nothing to drift cross-engine."""
    from functools import reduce as _reduce

    from pyspark.sql import Window

    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must name at least one column")
    if int(size) <= 0:
        raise ValueError(f"size must be > 0, got {size}")
    if after is not None and len(after) != len(gcols):
        raise ValueError(
            f"after key wants one value per source column "
            f"({len(gcols)}), got {len(after)}"
        )
    joined = _checked_join(results, attrs, gcols, ext_cols)
    for c in gcols:
        joined = joined.filter(F.col(c).isNotNull())
    if after is not None:
        # lexicographic strictly-greater: OR over prefix-equal branches —
        # applied BEFORE the bucket groupBy so pruning is map-side
        branches = []
        for i, c in enumerate(gcols):
            eqs = [F.col(gcols[j]) == F.lit(after[j]) for j in range(i)]
            branches.append(
                _reduce(lambda a, b: a & b, eqs, F.col(c) > F.lit(after[i]))
            )
        joined = joined.filter(_reduce(lambda a, b: a | b, branches))
    buckets = joined.groupBy("query_id", *gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("query_id").orderBy(
        *[F.col(c).asc() for c in gcols]
    )
    return (
        buckets.withColumn(
            "bucket_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("bucket_rank") <= int(size))
        .orderBy("query_id", "bucket_rank")
    )


def extended_stats_agg(
    results: DataFrame,
    attrs: DataFrame,
    num_cols: Sequence[str],
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, col, n, sum, sum_sq, var_num): ES ``extended_stats``
    in the repo's exact-arithmetic discipline — for INTEGER attributes
    the moments aggregate as BIGINT (exact, summation-order-free), and
    the variance ships as its integer NUMERATOR
    ``var_num = n*sum_sq - sum^2`` (population variance = var_num/n^2,
    std = sqrt/n — client-side floats, like stats_agg's avg policy;
    emitting a rounded float variance would force a cross-engine
    rounding policy on an otherwise exact row). Values are floored to
    BIGINT first (``floor(value)``), so fractional attributes get the
    documented floor-truncation treatment rather than silent float
    drift. NULLs skip."""
    pairs = _melt_numeric(
        _checked_join(results, attrs, num_cols, ext_cols), num_cols
    ).select(
        "query_id", "col", F.floor("value").cast("long").alias("v")
    )
    agg = pairs.groupBy("query_id", "col").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sum"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("sum_sq"),
    )
    return agg.select(
        "query_id", "col", "n", "sum", "sum_sq",
        (F.col("n") * F.col("sum_sq") - F.col("sum") * F.col("sum"))
        .cast("long").alias("var_num"),
    ).orderBy("query_id", "col")


def matrix_stats_agg(
    results: DataFrame,
    attrs: DataFrame,
    num_cols: Sequence[str],
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, col_a, col_b, n, cov_num): ES ``matrix_stats``
    covariance analog, exact-integer like extended_stats — for each
    UNORDERED column pair (col_a < col_b), the covariance NUMERATOR
    ``cov_num = n*sum_xy - sum_x*sum_y`` over the query's hits that have
    BOTH values non-NULL (ES matrix_stats is pairwise-complete too);
    population covariance = cov_num/n^2, correlation =
    cov_num/sqrt(var_num_a*var_num_b) — client-side. Values floor to
    BIGINT first (the extended_stats policy)."""
    cols = list(num_cols)
    if len(cols) < 2:
        raise ValueError("matrix_stats wants at least two columns")
    joined = _checked_join(results, attrs, cols, ext_cols)
    floored = joined.select(
        "query_id",
        *[F.floor(F.col(c).cast("double")).cast("long").alias(c)
          for c in cols],
    )
    parts = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            both = floored.filter(
                F.col(a).isNotNull() & F.col(b).isNotNull())
            parts.append(
                both.groupBy("query_id").agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum(a).cast("long").alias("_sx"),
                    F.sum(b).cast("long").alias("_sy"),
                    F.sum(F.col(a) * F.col(b)).cast("long").alias("_sxy"),
                ).select(
                    "query_id", F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"), "n",
                    (F.col("n") * F.col("_sxy")
                     - F.col("_sx") * F.col("_sy"))
                    .cast("long").alias("cov_num"),
                )
            )
    from functools import reduce as _reduce

    return _reduce(DataFrame.unionByName, parts).orderBy(
        "query_id", "col_a", "col_b")


def _checked_filters(filters) -> list:
    """Validate an ordered (name, sql_predicate) filter list — unique
    non-empty names, non-empty predicate strings."""
    fs = [(str(n), str(p)) for n, p in filters]
    if not fs:
        raise ValueError("filters must name at least one (name, predicate)")
    names = [n for n, _ in fs]
    if len(set(names)) != len(names):
        raise ValueError(f"filter names must be unique, got {names}")
    if any(not n or not p.strip() for n, p in fs):
        raise ValueError("filter names and predicates must be non-empty")
    return fs


def _left_joined(
    results: DataFrame,
    attrs: DataFrame,
    cols: Sequence[str],
    ext_cols: Sequence[str],
) -> DataFrame:
    """Hit set LEFT-joined to the pruned attrs scan: a hit whose external
    id is absent from the attrs table keeps its row with NULL attributes
    (it still exists as a document — the ES doc-count contracts below
    need it), unlike the inner ``_checked_join`` the value aggregations
    use (where a NULL value row contributes nothing anyway)."""
    missing = [c for c in list(ext_cols) + list(cols)
               if c not in attrs.columns]
    if missing:
        raise ValueError(f"attrs table lacks columns {missing}")
    hits = results.select("query_id", *ext_cols)
    return hits.join(
        attrs.select(*ext_cols, *cols), list(ext_cols), "left")


def filters_agg(
    results: DataFrame,
    attrs: DataFrame,
    filters,
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, filter_name, n): ES ``filters`` aggregation over
    each query's result set — one NAMED bucket per SQL predicate over the
    attribute columns, doc counts per bucket. Every named bucket emits
    for every query in the result frame, n=0 included (the ES filters
    agg always returns all its buckets). ``filters`` is an ordered
    sequence of (name, predicate) pairs; predicates are SQL boolean
    expressions over the attrs columns, restricted by CONVENTION to the
    Spark∩DuckDB dialect (comparisons, AND/OR/NOT, IN, IS NULL — the
    same discipline the PII regexes follow) so an oracle can replicate
    them verbatim. A predicate that is NULL for a row (NULL attribute,
    or a hit missing from the attrs table — LEFT join) does not count,
    exactly like a WHERE clause. Plan: one bounded join, ONE
    partial-aggregable conditional-sum groupBy, a zero-exchange melt —
    corpus size never appears."""
    fs = _checked_filters(filters)
    joined = _left_joined(
        results, attrs,
        [c for c in attrs.columns if c not in ext_cols], ext_cols)
    sums = [
        F.sum(F.when(F.expr(pred), F.lit(1)).otherwise(F.lit(0)))
        .cast("long").alias(f"_f{i}")
        for i, (_, pred) in enumerate(fs)
    ]
    agg = joined.groupBy("query_id").agg(*sums)
    melt = []
    for i, (name, _) in enumerate(fs):
        melt.extend([F.lit(name), F.col(f"_f{i}")])
    return (
        agg.select(
            "query_id",
            F.explode(F.create_map(*melt)).alias("filter_name", "n"),
        )
        .orderBy("query_id", "filter_name")
    )


def missing_agg(
    results: DataFrame,
    attrs: DataFrame,
    cols: Sequence[str],
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, col, n): ES ``missing`` aggregation over each
    query's result set — per attribute column, how many of the query's
    hits have NO value (NULL, or the hit's external id absent from the
    attrs table entirely — LEFT join, the ES "field not present"
    case). Every (query, col) pair emits, n=0 included (the ES missing
    agg is a single always-present bucket). The mirror image of every
    other aggregation here (they SKIP NULLs; this counts nothing
    else)."""
    cs = list(cols)
    if not cs:
        raise ValueError("cols must name at least one column")
    joined = _left_joined(results, attrs, cs, ext_cols)
    sums = [
        F.sum(F.when(F.col(c).isNull(), F.lit(1)).otherwise(F.lit(0)))
        .cast("long").alias(f"_m{i}")
        for i, c in enumerate(cs)
    ]
    agg = joined.groupBy("query_id").agg(*sums)
    melt = []
    for i, c in enumerate(cs):
        melt.extend([F.lit(c), F.col(f"_m{i}")])
    return (
        agg.select(
            "query_id",
            F.explode(F.create_map(*melt)).alias("col", "n"),
        )
        .orderBy("query_id", "col")
    )


def rare_terms_agg(
    results: DataFrame,
    attrs: DataFrame,
    facet_cols: Sequence[str],
    ext_cols: Sequence[str],
    max_doc_count: int = 1,
) -> DataFrame:
    """-> (query_id, facet, value, n): ES ``rare_terms`` aggregation over
    each query's result set — the long-tail mirror of the terms
    aggregation (query/facets.py facet_counts): per facet column, the
    values whose doc count is <= ``max_doc_count``, ordered count-ASC
    then value-asc (rarest first — the ES rare_terms order). NULLs skip
    (ES ``missing`` is opt-in); a doc counts once per query regardless
    of rank. ES bounds its version with a CuckooFilter because corpus-
    scale long tails are unbounded; over a k-bounded hit window the
    exact groupBy IS the cheap path (boolean result sets ride the same
    partial-aggregable exchange the facet path does)."""
    if int(max_doc_count) < 1:
        raise ValueError(
            f"max_doc_count must be >= 1, got {max_doc_count}")
    cs = list(facet_cols)
    if not cs:
        raise ValueError("facet_cols must name at least one column")
    missing = [c for c in list(ext_cols) + cs if c not in attrs.columns]
    if missing:
        raise ValueError(f"attrs table lacks columns {missing}")
    hits = results.select("query_id", *ext_cols)
    joined = hits.join(attrs.select(*ext_cols, *cs), list(ext_cols))
    melt = []
    for c in cs:
        melt.extend([F.lit(c), F.col(c).cast("string")])
    pairs = joined.select(
        "query_id",
        F.explode(F.create_map(*melt)).alias("facet", "value"),
    ).filter(F.col("value").isNotNull())
    return (
        pairs.groupBy("query_id", "facet", "value")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") <= int(max_doc_count))
        .orderBy("query_id", "facet", F.asc("n"), "value")
    )


def adjacency_matrix_agg(
    results: DataFrame,
    attrs: DataFrame,
    filters,
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, key_a, key_b, n): ES ``adjacency_matrix``
    aggregation over each query's result set — named SQL predicate sets
    plus every pairwise INTERSECTION count. ``key_a == key_b`` rows are
    the singleton buckets; ``key_a < key_b`` (name order) rows count
    docs matching BOTH predicates. Only non-empty buckets emit (the ES
    contract — unlike filters_agg, which always returns its buckets).
    Predicates follow the filters_agg dialect convention; NULL
    predicate rows (NULL attrs / LEFT-join misses) match nothing. Plan:
    one bounded join, ONE conditional-sum groupBy carrying all
    |F|·(|F|+1)/2 cells (partial-aggregable — |F| is the handful of
    named filters, never data-sized), a zero-exchange struct explode."""
    fs = _checked_filters(filters)
    joined = _left_joined(
        results, attrs,
        [c for c in attrs.columns if c not in ext_cols], ext_cols)
    flags = joined.select(
        "query_id",
        *[
            F.when(F.expr(pred), F.lit(1)).otherwise(F.lit(0)).alias(f"_b{i}")
            for i, (_, pred) in enumerate(fs)
        ],
    )
    cells = []
    sums = []
    for i, (na, _) in enumerate(fs):
        for j, (nb, _) in enumerate(fs):
            if j < i:
                continue
            a, b = sorted((na, nb))
            col = f"_c{i}_{j}"
            sums.append(
                F.sum(F.col(f"_b{i}") * F.col(f"_b{j}"))
                .cast("long").alias(col))
            cells.append((a, b, col))
    agg = flags.groupBy("query_id").agg(*sums)
    structs = F.array(*[
        F.struct(
            F.lit(a).alias("key_a"),
            F.lit(b).alias("key_b"),
            F.col(col).alias("n"),
        )
        for a, b, col in cells
    ])
    return (
        agg.select("query_id", F.explode(structs).alias("cell"))
        .select("query_id", "cell.key_a", "cell.key_b", "cell.n")
        .filter(F.col("n") > 0)
        .orderBy("query_id", "key_a", "key_b")
    )


def stats_agg(
    results: DataFrame,
    attrs: DataFrame,
    num_cols: Sequence[str],
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, col, n, min, max, sum): ES ``stats`` aggregation
    (minus avg — exact-arithmetic discipline: avg = sum/n client-side)
    over each query's result set. Values aggregate as DOUBLE uniformly
    (one melt for mixed column types); integer attributes up to 2^53
    stay exact."""
    pairs = _melt_numeric(
        _checked_join(results, attrs, num_cols, ext_cols), num_cols
    )
    return (
        pairs.groupBy("query_id", "col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.sum("value").alias("sum"),
        )
        .orderBy("query_id", "col")
    )


def weighted_avg_agg(
    results: DataFrame,
    attrs: DataFrame,
    value_col: str,
    weight_col: str,
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, n, wsum, wtot): ES ``weighted_avg`` aggregation over
    each query's result set — the weighted average of ``value_col``
    weighted by ``weight_col``, emitted as its EXACT numerator/denominator
    pair (wsum = Σ value·weight, wtot = Σ weight, both DOUBLE sums of
    the column product — integer attributes stay exact to 2^53) so the
    average is the client-side wsum/wtot, the repo's no-float-ratio
    discipline (see ``stats_agg``). Skip policy follows ES: a hit whose
    VALUE is NULL is skipped entirely; a non-NULL value with a NULL
    weight is skipped too (ES requires ``weight.missing`` to opt into
    counting those — a default weight parameter here would silently
    change wtot, so refusal-by-skip is the conservative analog). ``n``
    counts the (value, weight) pairs that contributed. One bounded join
    + one partial-aggregable groupBy — corpus size never appears."""
    joined = _checked_join(results, attrs, [value_col, weight_col],
                           ext_cols)
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    pairs = joined.filter(v.isNotNull() & w.isNotNull())
    return (
        pairs.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(v * w).alias("wsum"),
            F.sum(w).alias("wtot"),
        )
        .orderBy("query_id")
    )


def top_metrics_agg(
    results: DataFrame,
    attrs: DataFrame,
    sort_col: str,
    metric_cols: Sequence[str],
    ext_cols: Sequence[str],
    size: int = 1,
    ascending: bool = False,
) -> DataFrame:
    """-> (query_id, pos, <sort_col>, <metric_cols...>): ES
    ``top_metrics`` aggregation over each query's result set — the
    metric column values carried by the hit(s) with the largest (or
    smallest, ``ascending``) ``sort_col``, ``size`` rows per query with
    1-based ``pos``. Deterministic: ties on the sort value break by the
    external id columns ascending (ES leaves sort-tie order unspecified
    per shard — unacceptable for a hash-gated contract). Hits with a
    NULL sort value are skipped (the ES default); NULL metric values
    pass through as NULL (top_metrics reports what the top doc has,
    missing included). The window runs over the bounded hit set —
    corpus size never appears."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    cols = [sort_col] + [c for c in metric_cols if c != sort_col]
    joined = _checked_join(results, attrs, cols, ext_cols)
    sort = (F.col(sort_col).asc() if ascending
            else F.col(sort_col).desc())
    w = Window.partitionBy("query_id").orderBy(
        sort, *[F.col(c).asc() for c in ext_cols])
    return (
        joined.filter(F.col(sort_col).isNotNull())
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= size)
        .select("query_id", "pos", sort_col,
                *[c for c in metric_cols if c != sort_col])
        .orderBy("query_id", "pos")
    )


def percentile_ranks_agg(
    results: DataFrame,
    attrs: DataFrame,
    num_cols: Sequence[str],
    ext_cols: Sequence[str],
    values: Sequence[float],
) -> DataFrame:
    """-> (query_id, col, value, n_le, n): ES ``percentile_ranks``
    aggregation over each query's result set — the inverse of
    ``percentiles``: for each probe ``value``, what fraction of the
    observed values is <= it. Exact by construction: the row carries
    the COUNT PAIR (n_le = #observed <= value, n = #observed) and the
    percent derives client-side as 100*n_le/n — emitting the float
    would force a rounding policy on comparisons-only arithmetic (ES
    itself t-digest-interpolates; over a bounded hit window the exact
    empirical CDF is strictly better). NULLs skip; every requested
    probe value emits for every (query, col) with >= 1 observation.
    One partial-aggregable exchange after the probe fan-out."""
    vs = sorted({float(v) for v in values})
    if not vs:
        raise ValueError("values must name at least one probe value")
    pairs = _melt_numeric(
        _checked_join(results, attrs, num_cols, ext_cols), num_cols
    )
    fanned = pairs.select(
        "query_id", "col", "value",
        F.explode(F.array(*[F.lit(v) for v in vs])).alias("probe"),
    )
    return (
        fanned.groupBy("query_id", "col", "probe")
        .agg(
            F.sum(F.when(F.col("value") <= F.col("probe"), 1)
                  .otherwise(0)).cast("long").alias("n_le"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select("query_id", "col", F.col("probe").alias("value"),
                "n_le", "n")
        .orderBy("query_id", "col", "value")
    )


def _nearest_rank_idx(pct: int, arr_col: str):
    """1-based nearest-rank index ``(pct*n + 99) div 100`` floored at 1
    over ``size(arr_col)`` — the percentiles_agg arithmetic (integer
    ``div``, never float division), shared by boxplot/MAD."""
    return F.greatest(
        F.lit(1),
        F.expr(f"({int(pct)} * size({arr_col}) + 99) div 100"),
    ).cast("int")


def boxplot_agg(
    results: DataFrame,
    attrs: DataFrame,
    num_cols: Sequence[str],
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, col, min, q1, q2, q3, max): ES ``boxplot``
    aggregation over each query's result set — five-number summary per
    numeric column, quartiles by the EXACT nearest-rank rule
    (percentiles_agg's (p*n+99) div 100 — ES's t-digest interpolates;
    a bounded hit window wants an actual observed element so nothing
    drifts cross-engine). NULLs skip; a (query, col) group with no
    values emits nothing. One sorted collect bounded by queries x k."""
    pairs = _melt_numeric(
        _checked_join(results, attrs, num_cols, ext_cols), num_cols
    )
    arr = pairs.groupBy("query_id", "col").agg(
        F.sort_array(F.collect_list("value")).alias("vals")
    )
    n = F.size("vals")
    return (
        arr.select(
            "query_id", "col",
            F.element_at("vals", 1).alias("min"),
            F.element_at("vals", _nearest_rank_idx(25, "vals")).alias("q1"),
            F.element_at("vals", _nearest_rank_idx(50, "vals")).alias("q2"),
            F.element_at("vals", _nearest_rank_idx(75, "vals")).alias("q3"),
            F.element_at("vals", n).alias("max"),
        )
        .orderBy("query_id", "col")
    )


def median_absolute_deviation_agg(
    results: DataFrame,
    attrs: DataFrame,
    num_cols: Sequence[str],
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, col, median, mad): ES
    ``median_absolute_deviation`` aggregation over each query's result
    set — median(|x - median(x)|) per numeric column, BOTH medians by
    the exact nearest-rank rule (ES approximates via t-digest; over a
    bounded window the deviations |x - m| of integer-valued doubles
    are exact, so the whole row is reproducible bit-for-bit). NULLs
    skip. Zero extra exchange beyond the shared sorted collect: the
    deviation array derives from the collected values with
    higher-order functions (transform -> array_sort -> element_at)."""
    pairs = _melt_numeric(
        _checked_join(results, attrs, num_cols, ext_cols), num_cols
    )
    arr = pairs.groupBy("query_id", "col").agg(
        F.sort_array(F.collect_list("value")).alias("vals")
    )
    med = F.element_at("vals", _nearest_rank_idx(50, "vals"))
    with_med = arr.select("query_id", "col", "vals",
                          med.alias("median"))
    devs = F.array_sort(F.transform(
        "vals", lambda v: F.abs(v - F.col("median"))))
    return (
        with_med.select(
            "query_id", "col", "median",
            F.element_at(devs, _nearest_rank_idx(50, "vals"))
            .alias("mad"),
        )
        .orderBy("query_id", "col")
    )


def multi_terms_agg(
    results: DataFrame,
    attrs: DataFrame,
    cols: Sequence[str],
    ext_cols: Sequence[str],
    size: int = 10,
) -> DataFrame:
    """-> (query_id, rank, <cols...>, n): ES ``multi_terms``
    aggregation over each query's result set — bucket counts per TUPLE
    of attribute values (the composite-key sibling of the terms/facet
    aggregation), count-descending with the top-``size`` cut. A doc
    with a NULL in ANY source column drops from the bucketing entirely
    (the ES multi_terms contract — same rule as composite). Ties on
    the count break by the value tuple ascending (ES leaves tie order
    to shard luck; the tiebreak is this engine's contract so the row
    set hash-gates). One partial-aggregable groupBy + one bounded
    window."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if len(cols) < 2:
        raise ValueError("multi_terms wants >= 2 source columns "
                         "(use facets/terms for one)")
    joined = _checked_join(results, attrs, cols, ext_cols)
    for c in cols:
        joined = joined.filter(F.col(c).isNotNull())
    counted = joined.groupBy("query_id", *cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("n").desc(), *[F.col(c).asc() for c in cols])
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= size)
        .select("query_id", "rank", *cols, "n")
        .orderBy("query_id", "rank")
    )


def t_test_agg(
    results: DataFrame,
    attrs: DataFrame,
    value_col: str,
    filter_a: str,
    filter_b: str,
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, n_a, sum_a, sum_sq_a, n_b, sum_b, sum_sq_b): ES
    ``t_test`` aggregation (unpaired form) over each query's result set
    — the two populations are the hits passing ``filter_a`` / ``filter_b``
    (SQL predicates in the Spark∩DuckDB dialect, the filters_agg
    discipline; a hit may land in both, either, or neither — ES's
    filter-based t_test allows overlap). The row carries the EXACT
    BIGINT moments of each group (values floor to BIGINT first, the
    extended_stats rule), so Student's or Welch's t derives client-side:
    m = sum/n, var_num = n*sum_sq - sum^2, var = var_num/n^2,
    t = (m_a - m_b) / sqrt(var_a/n_a + var_b/n_b) — emitting the float
    t would force a libm sqrt into an otherwise exact row. NULL values
    skip; a query with no hits in a group emits n=0 with zero sums.
    One bounded join + ONE partial-aggregable conditional groupBy."""
    if value_col not in attrs.columns:
        raise ValueError(f"attrs table lacks column {value_col!r}")
    pred_cols = [c for c in attrs.columns if c not in ext_cols]
    joined = _left_joined(results, attrs, pred_cols, ext_cols)
    v = F.floor(F.col(value_col)).cast("long")
    outs = []
    for tag, pred in (("a", filter_a), ("b", filter_b)):
        inb = F.expr(pred) & v.isNotNull()
        outs.extend([
            F.sum(F.when(inb, 1).otherwise(0)).cast("long")
            .alias(f"n_{tag}"),
            F.sum(F.when(inb, v).otherwise(0)).cast("long")
            .alias(f"sum_{tag}"),
            F.sum(F.when(inb, v * v).otherwise(0)).cast("long")
            .alias(f"sum_sq_{tag}"),
        ])
    return joined.groupBy("query_id").agg(*outs).orderBy("query_id")


def string_stats_agg(
    results: DataFrame,
    attrs: DataFrame,
    str_cols: Sequence[str],
    ext_cols: Sequence[str],
) -> DataFrame:
    """-> (query_id, col, n, len_min, len_max, len_sum, entropy_num): ES
    ``string_stats`` aggregation over each query's result set — exact
    character-length statistics per string attribute column (lengths in
    code points: Spark ``length`` and DuckDB ``length`` agree on
    VARCHAR). avg_length derives client-side as len_sum/n (the stats_agg
    no-float-ratio rule). NULLs skip.

    ES's Shannon entropy ships as an EXACT INTEGER NUMERATOR instead of
    a float (the ccnet-perplexity micro-nat trick): over the bucket's
    whole character distribution,
    ``entropy_num = Σ_ch count_ch * floor(1e6 * ln(count_ch))`` — one
    floor-quantized libm log per DISTINCT character count, BIGINT sums,
    reproducible bit-for-bit in Spark/DuckDB. The float entropy derives
    client-side: ``H_nats = ln(T) - entropy_num/(1e6*T)`` with
    ``T = len_sum`` (total chars), ``H_bits = H_nats/ln 2`` (what ES
    emits). A bucket whose values are all empty has entropy_num 0.
    Characters split per UTF-16 code unit on the JVM side — the BMP
    attribute strings this serves are unaffected (astral chars would
    split; documented).

    One melt + two partial-aggregable groupBys (chars bounded by the
    result set's total string length), rename-joined (the shared-parent
    self-join rule)."""
    joined = _checked_join(results, attrs, str_cols, ext_cols)
    melt = []
    for c in str_cols:
        melt.extend([F.lit(c), F.col(c).cast("string")])
    pairs = joined.select(
        "query_id",
        F.explode(F.create_map(*melt)).alias("col", "value"),
    ).filter(F.col("value").isNotNull())
    ln = F.length("value").cast("long")
    base = (
        pairs.groupBy("query_id", "col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(ln).alias("len_min"),
            F.max(ln).alias("len_max"),
            F.sum(ln).alias("len_sum"),
        )
    )
    chars = pairs.select(
        "query_id", "col",
        F.explode(F.split(F.col("value"), "")).alias("ch"),
    ).filter(F.length("ch") > 0)
    counts = chars.groupBy("query_id", "col", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    ent = counts.groupBy("query_id", "col").agg(
        F.sum(
            F.col("c")
            * F.floor(F.log(F.col("c").cast("double"))
                      * F.lit(1_000_000.0)).cast("long")
        ).cast("long").alias("_entropy_num"))
    ent = ent.select(
        F.col("query_id").alias("_eq"), F.col("col").alias("_ec"),
        "_entropy_num")
    return (
        base.join(
            ent,
            (F.col("query_id") == F.col("_eq"))
            & (F.col("col") == F.col("_ec")),
            "left",
        )
        .select(
            "query_id", "col", "n", "len_min", "len_max", "len_sum",
            F.coalesce(F.col("_entropy_num"), F.lit(0)).cast("long")
            .alias("entropy_num"),
        )
        .orderBy("query_id", "col")
    )


# the auto_date_histogram interval ladder: FIXED spans only (seconds) —
# the repo's date_histogram contract refuses calendar months/years, so
# the ladder tops out at fixed multiples of days (30/90/365-day spans
# stand in for ES's 1M/3M/1y rungs; documented deviation)
AUTO_INTERVAL_LADDER = (
    1, 5, 10, 30, 60, 300, 600, 1800, 3600, 10800, 43200,
    86400, 604800, 2592000, 7776000, 31536000,
)


def auto_date_histogram_counts(
    results: DataFrame,
    attrs: DataFrame,
    ts_cols: Sequence[str],
    ext_cols: Sequence[str],
    target_buckets: int = 10,
) -> DataFrame:
    """-> (query_id, col, interval_sec, bucket_epoch, n): ES
    ``auto_date_histogram`` over each query's result set — per timestamp
    column, the SMALLEST ladder interval whose bucket span
    (max_epoch div i - min_epoch div i + 1) fits ``target_buckets``,
    then the ordinary fixed-span bucketing at that interval
    (floor-to-BIGINT epochs, integer div — the date_histogram
    arithmetic). The picked interval can differ per (query, col) —
    exactly ES's behavior (each aggregation context auto-scales
    independently). Empty buckets are not emitted (histogram rule);
    NULLs skip. Ladder spans are FIXED seconds only (30/90/365-day
    rungs stand in for calendar months/years — the repo's
    date_histogram contract). Plan: one bounded min/max groupBy to pick
    the interval, broadcast back over the bounded hit window, one
    partial-aggregable count — corpus size never appears."""
    if target_buckets < 1:
        raise ValueError(
            f"target_buckets must be >= 1, got {target_buckets}")
    joined = _checked_join(results, attrs, ts_cols, ext_cols)
    melt = []
    for c in ts_cols:
        melt.extend([F.lit(c),
                     F.col(c).cast("timestamp").cast("double")])
    pairs = joined.select(
        "query_id",
        F.explode(F.create_map(*melt)).alias("col", "_ts"),
    ).filter(F.col("_ts").isNotNull()).select(
        "query_id", "col", F.floor("_ts").cast("long").alias("epoch"))
    spans = pairs.groupBy("query_id", "col").agg(
        F.min("epoch").alias("_lo"), F.max("epoch").alias("_hi"))
    # smallest ladder rung with (hi div i - lo div i + 1) <= target:
    # the ladder is a tiny literal array — pure expression, no join
    ladder = F.array(*[F.lit(int(i)) for i in AUTO_INTERVAL_LADDER])
    # bucket span at rung i = hi div i - lo div i + 1; the subtraction
    # (x - x%i)/i is the integer div (exact: the numerator is an exact
    # multiple of i and everything is < 2^53)
    fits = F.filter(
        ladder,
        lambda i: ((F.col("_hi") - F.pmod(F.col("_hi"), i)) / i
                   - (F.col("_lo") - F.pmod(F.col("_lo"), i)) / i
                   + 1) <= target_buckets,
    )
    picked = spans.select(
        "query_id", "col",
        F.coalesce(F.element_at(fits, 1),
                   F.lit(int(AUTO_INTERVAL_LADDER[-1])))
        .cast("long").alias("interval_sec"),
    )
    bucketed = pairs.join(F.broadcast(picked), ["query_id", "col"])
    bucket = (F.col("epoch")
              - F.pmod(F.col("epoch"), F.col("interval_sec")))
    return (
        bucketed.groupBy("query_id", "col", "interval_sec",
                         bucket.cast("long").alias("bucket_epoch"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("query_id", "col", "bucket_epoch")
    )


def plain_sample(
    results: DataFrame,
    ext_cols: Sequence[str],
    size: int,
) -> DataFrame:
    """-> the results frame cut to each query's ``size`` BEST-RANKED
    hits — the ES ``sampler`` aggregation (the un-diversified sibling
    of :func:`diversified_sample`): sub-aggregations run over only the
    highest-relevance slice of the hit window. Deterministic on every
    ranker: rank asc, external-id ascending tiebreak (boolean retrieval
    emits rank 0 for the whole set). Composes BEFORE
    ``diversified_sample`` — exactly ES's sampler > diversified_sampler
    nesting. One bounded window."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if "rank" not in results.columns:
        raise ValueError("results frame lacks a 'rank' column "
                         "(sampling needs retrieval order)")
    w = Window.partitionBy("query_id").orderBy(
        "rank", *[F.col(c).asc() for c in ext_cols])
    return (
        results.withColumn("_sp", F.row_number().over(w))
        .filter(F.col("_sp") <= size)
        .select(*results.columns)
        .orderBy("query_id", "rank")
    )


def diversified_sample(
    results: DataFrame,
    attrs: DataFrame,
    field: str,
    ext_cols: Sequence[str],
    max_per_value: int = 1,
) -> DataFrame:
    """-> the results frame filtered to at most ``max_per_value`` hits
    per ``field`` value per query — the ES ``diversified_sampler``
    aggregation's de-duplication step. Which hits survive is
    deterministic: the BEST-RANKED per value (the results frame's
    ``rank`` column — retrieval order, exactly ES's top-of-the-sample
    semantics); rank ties (boolean retrieval emits rank 0 for the whole
    set) break by the external id columns ascending, so the sample is
    deterministic on every ranker. Hits with a NULL field value are NOT de-duplicated —
    each passes (ES: docs lacking the de-dup field are not dropped).
    Downstream aggregations (facets, stats, significant) compose over
    the returned frame exactly like the full result set. One bounded
    join + one bounded window."""
    if max_per_value < 1:
        raise ValueError(
            f"max_per_value must be >= 1, got {max_per_value}")
    if "rank" not in results.columns:
        raise ValueError("results frame lacks a 'rank' column "
                         "(diversified sampling needs retrieval order)")
    if field not in attrs.columns:
        raise ValueError(f"attrs table lacks column {field!r}")
    joined = results.join(
        attrs.select(*ext_cols, F.col(field).alias("_dedup")),
        list(ext_cols), "left")
    w = Window.partitionBy("query_id", "_dedup").orderBy(
        "rank", *[F.col(c).asc() for c in ext_cols])
    kept = (
        joined.withColumn(
            "_pv",
            F.when(F.col("_dedup").isNull(), F.lit(1))
            .otherwise(F.row_number().over(w)))
        .filter(F.col("_pv") <= max_per_value)
    )
    return kept.select(*results.columns).orderBy("query_id", "rank")
