"""Geo aggregations over attribute tables: ES ``geohash_grid`` and
``geo_bounding_box`` analogs in EXACT integer arithmetic.

Coordinates are **micro-degrees** (BIGINT: lat in [-90e6, 90e6], lon in
[-180e6, 180e6]) — the repo-wide integer protocol (CLAUDE.md float
policy): geohash encoding is pure bit arithmetic over scaled integers,
so Spark, DuckDB and Python produce bit-identical cells and the driver
oracle hash-gates the whole aggregation. (ES stores geo_points at ~1e-7
precision internally; micro-degrees are the same idea one digit
coarser, honest to ~11 cm.)

Geohash (public spec, geohash.org encoding as described in the
Wikipedia "Geohash" article; no reference counterpart — the reference
is text-only): a precision-P hash is 5·P bits interleaving longitude
(even bit positions, starting with the first) and latitude (odd), each
axis's bits being its binary-bisection path — equivalently the top
``n`` bits of ``floor((coord - lo) / span * 2^n)``; the closed form
used here, exact in BIGINT because ``(lon_micro + 180e6) * 2^30 <
2^59``. Bits are emitted as base-32 digits over the geohash alphabet
(0-9, b-z skipping a/i/l/o).

The grid agg follows the terms-agg contract (query/facets.py): buckets
per query over the result set's joined attribute rows, count desc then
cell asc, NULL coordinates skipped, one partial-aggregable groupBy.
``geo_bounding_box`` is a pure comparison predicate (two BETWEENs) that
pushes down to the attrs scan; boxes crossing the antimeridian split
into the standard west/east OR (the ES contract: left > right means
wraparound).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

LAT_SPAN = 180_000_000  # micro-degrees
LON_SPAN = 360_000_000
LAT_LO = -90_000_000
LON_LO = -180_000_000


def _axis_bits(precision: int) -> tuple[int, int]:
    total = 5 * precision
    n_lon = (total + 1) // 2  # lon leads the interleave
    n_lat = total // 2
    return n_lon, n_lat


def _check_precision(precision: int) -> None:
    # n_lon=12 -> (lon+180e6) * 2^12 ... up to precision 9 stays far
    # inside BIGINT ((360e6) << 23 < 2^55); ES caps geohash_grid at 12,
    # we cap where the micro-degree resolution is exhausted
    if not 1 <= precision <= 9:
        raise ValueError(f"precision must be in [1, 9], got {precision}")


def _axis_cell(micro: Column, lo: int, span: int, n_bits: int) -> Column:
    """floor((micro - lo) * 2^n / span), clamped to 2^n - 1 (the +max
    boundary belongs to the last cell) — EXACT integer quotient: Spark's
    ``/`` on BIGINTs is double division (53-bit mantissa — off-by-one at
    cell boundaries once the numerator passes 2^53), so subtract the
    exact ``%`` remainder first; the resulting ratio is an exact integer
    <= 2^n, which IEEE division reproduces exactly."""
    a = (micro.cast("long") - F.lit(lo)) * F.lit(1 << n_bits)
    cell = ((a - a % F.lit(span)) / F.lit(span)).cast("long")
    return F.least(cell, F.lit((1 << n_bits) - 1))


def geohash_col(lat_micro: Column, lon_micro: Column, precision: int) -> Column:
    """Geohash string of a micro-degree point — a native (codegen'd)
    bit-interleave + base-32 expression, no UDF."""
    _check_precision(precision)
    n_lon, n_lat = _axis_bits(precision)
    x = _axis_cell(lon_micro, LON_LO, LON_SPAN, n_lon)
    y = _axis_cell(lat_micro, LAT_LO, LAT_SPAN, n_lat)
    total = 5 * precision
    bits = F.lit(0).cast("long")
    for i in range(n_lon):
        bit = F.shiftright(x, n_lon - 1 - i).bitwiseAND(F.lit(1))
        bits = bits.bitwiseOR(F.shiftleft(bit, total - 1 - 2 * i))
    for j in range(n_lat):
        bit = F.shiftright(y, n_lat - 1 - j).bitwiseAND(F.lit(1))
        bits = bits.bitwiseOR(F.shiftleft(bit, total - 2 - 2 * j))
    chars = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            (F.shiftright(bits, 5 * (precision - 1 - c))
             .bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"),
            1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int) -> str:
    """The DuckDB twin of :func:`geohash_col` — the SAME closed form
    emitted as SQL (shared constants, shared bit layout), so driver
    oracles replay the encoding verbatim."""
    _check_precision(precision)
    n_lon, n_lat = _axis_bits(precision)
    total = 5 * precision
    x = (f"least((({lon_expr})::BIGINT - ({LON_LO})) * {1 << n_lon} "
         f"// {LON_SPAN}, {(1 << n_lon) - 1})")
    y = (f"least((({lat_expr})::BIGINT - ({LAT_LO})) * {1 << n_lat} "
         f"// {LAT_SPAN}, {(1 << n_lat) - 1})")
    # NOTE: DuckDB/Postgres give ALL bitwise operators equal precedence,
    # left-associative — every shifted term must be fully parenthesized
    # or `a << p1 | b << p2` parses as `((a << p1) | b) << p2`
    parts = []
    for i in range(n_lon):
        parts.append(
            f"(((({x}) >> {n_lon - 1 - i}) & 1) << {total - 1 - 2 * i})")
    for j in range(n_lat):
        parts.append(
            f"(((({y}) >> {n_lat - 1 - j}) & 1) << {total - 2 - 2 * j})")
    bits = "(" + " | ".join(parts) + ")"
    chars = [
        f"substr('{GEOHASH_ALPHABET}', "
        f"((({bits}) >> {5 * (precision - 1 - c)}) & 31)::INT + 1, 1)"
        for c in range(precision)
    ]
    return " || ".join(chars)


def geohash_encode(lat_micro: int, lon_micro: int, precision: int) -> str:
    """Pure-Python twin (tests / in-process serving)."""
    _check_precision(precision)
    n_lon, n_lat = _axis_bits(precision)
    x = min((lon_micro - LON_LO) * (1 << n_lon) // LON_SPAN, (1 << n_lon) - 1)
    y = min((lat_micro - LAT_LO) * (1 << n_lat) // LAT_SPAN, (1 << n_lat) - 1)
    total = 5 * precision
    bits = 0
    for i in range(n_lon):
        bits |= ((x >> (n_lon - 1 - i)) & 1) << (total - 1 - 2 * i)
    for j in range(n_lat):
        bits |= ((y >> (n_lat - 1 - j)) & 1) << (total - 2 - 2 * j)
    return "".join(
        GEOHASH_ALPHABET[(bits >> (5 * (precision - 1 - c))) & 31]
        for c in range(precision)
    )


def geo_bounding_box_pred(
    lat_col: Column,
    lon_col: Column,
    top: int,
    left: int,
    bottom: int,
    right: int,
) -> Column:
    """ES geo_bounding_box as a pushable predicate (micro-degrees):
    lat in [bottom, top], lon in [left, right]; ``left > right`` means
    the box crosses the antimeridian and splits into the standard OR."""
    if bottom > top:
        raise ValueError("bottom must be <= top")
    lat_ok = (lat_col >= F.lit(bottom)) & (lat_col <= F.lit(top))
    if left <= right:
        lon_ok = (lon_col >= F.lit(left)) & (lon_col <= F.lit(right))
    else:  # wraparound
        lon_ok = (lon_col >= F.lit(left)) | (lon_col <= F.lit(right))
    return lat_ok & lon_ok


def geohash_grid_agg(
    results: DataFrame,
    attrs: DataFrame,
    lat_col: str,
    lon_col: str,
    ext_cols: Sequence[str],
    precision: int = 5,
    k: int = 10,
    bbox: "tuple[int, int, int, int] | None" = None,
) -> DataFrame:
    """-> (query_id, geohash, n, rank): ES geohash_grid buckets per
    query over the result set (terms-agg contract: count desc, cell asc,
    NULL coordinates skipped, top-``k`` cut). ``bbox`` = (top, left,
    bottom, right) micro-degrees applies geo_bounding_box BEFORE
    bucketing (the ES filter + grid composition); the predicate sits on
    the joined attrs scan, so it pushes down."""
    missing = [c for c in [*ext_cols, lat_col, lon_col]
               if c not in attrs.columns]
    if missing:
        raise ValueError(f"attrs table lacks columns {missing}")
    hits = results.select("query_id", *ext_cols)
    att = attrs.select(*ext_cols, lat_col, lon_col).filter(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
    if bbox is not None:
        top, left, bottom, right = bbox
        att = att.filter(geo_bounding_box_pred(
            F.col(lat_col), F.col(lon_col), top, left, bottom, right))
    joined = hits.join(att, list(ext_cols))
    cells = joined.select(
        "query_id",
        geohash_col(F.col(lat_col), F.col(lon_col), precision).alias("geohash"),
    )
    counts = cells.groupBy("query_id", "geohash").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("query_id").orderBy(F.desc("n"), F.asc("geohash"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "geohash", "n", "rank")
    )
