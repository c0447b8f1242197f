"""Geo family gates (query/geo.py): the closed-form integer geohash
equals (a) the published test vector, (b) an independently-written
classic bisection encoder over random points, (c) the Spark native
column, and (d) the DuckDB SQL twin — the four-way agreement that lets
driver oracles replay the encoding verbatim. Plus bounding-box
(incl. antimeridian wraparound) and grid-agg counting gates."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.geo import (
    GEOHASH_ALPHABET,
    geo_bounding_box_pred,
    geohash_col,
    geohash_encode,
    geohash_grid_agg,
    geohash_sql,
)


def _bisect_encode(lat: float, lon: float, precision: int) -> str:
    """Independent classic implementation: alternate lon/lat interval
    bisection, msb-first, base-32 — written from the public algorithm
    description, no shared code with geohash_encode."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    nbits = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits = (bits << 1) | 1
                lon_lo = mid
            else:
                bits <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = (bits << 1) | 1
                lat_lo = mid
            else:
                bits <<= 1
                lat_hi = mid
        even = not even
        nbits += 1
        if nbits == 5:
            out.append(GEOHASH_ALPHABET[bits])
            bits, nbits = 0, 0
    return "".join(out)


def test_published_vector():
    # the canonical example: (57.64911, 10.40744) -> u4pruydqqvj
    lat, lon = 57_649_110, 10_407_440
    for p in range(1, 10):
        assert geohash_encode(lat, lon, p) == "u4pruydqqvj"[:p]


def test_matches_independent_bisection():
    rng = random.Random(20260821)
    for _ in range(300):
        lat = rng.randrange(-90_000_000, 90_000_001)
        lon = rng.randrange(-180_000_000, 180_000_001)
        for p in (1, 3, 5, 7, 9):
            got = geohash_encode(lat, lon, p)
            want = _bisect_encode(lat / 1e6, lon / 1e6, p)
            assert got == want, (lat, lon, p)


def test_spark_column_and_duckdb_twin(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(-90_000_000, 90_000_001),
             rng.randrange(-180_000_000, 180_000_001)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, lat long, lon long")
    for p in (2, 5, 9):
        got = {r["id"]: r["gh"] for r in df.select(
            "id", geohash_col(F.col("lat"), F.col("lon"), p).alias("gh")
        ).collect()}
        con = duckdb.connect()
        con.execute("create table t(id bigint, lat bigint, lon bigint)")
        con.executemany("insert into t values (?,?,?)", rows)
        sql = geohash_sql("lat", "lon", p)
        duck = dict(con.execute(f"select id, {sql} from t").fetchall())
        for i, lat, lon in rows:
            want = geohash_encode(lat, lon, p)
            assert got[i] == want, (i, p)
            assert duck[i] == want, (i, p)


def test_bounding_box_and_wraparound(spark):
    rows = [(0, 0, 0), (1, 50_000_000, 170_000_000), (2, 50_000_000, -170_000_000),
            (3, -80_000_000, 10_000_000)]
    df = spark.createDataFrame(rows, "id long, lat long, lon long")
    plain = df.filter(geo_bounding_box_pred(
        F.col("lat"), F.col("lon"),
        top=60_000_000, left=-20_000_000, bottom=-10_000_000,
        right=20_000_000))
    assert sorted(r["id"] for r in plain.collect()) == [0]
    wrap = df.filter(geo_bounding_box_pred(
        F.col("lat"), F.col("lon"),
        top=60_000_000, left=160_000_000, bottom=0, right=-160_000_000))
    assert sorted(r["id"] for r in wrap.collect()) == [1, 2]
    with pytest.raises(ValueError):
        geo_bounding_box_pred(F.col("lat"), F.col("lon"), 0, 0, 10, 0)


def test_grid_agg_counts(spark):
    rng = random.Random(99)
    attrs_rows = [(i, rng.randrange(-90_000_000, 90_000_001),
                   rng.randrange(-180_000_000, 180_000_001))
                  for i in range(400)]
    attrs = spark.createDataFrame(attrs_rows, "doc_id long, lat long, lon long")
    results = spark.createDataFrame(
        [(0, i) for i in range(400)] + [(1, i) for i in range(0, 400, 2)],
        "query_id int, doc_id long")
    out = geohash_grid_agg(results, attrs, "lat", "lon", ["doc_id"],
                           precision=1, k=8)
    got: dict = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["geohash"], r["n"]))
    for qid, step in ((0, 1), (1, 2)):
        counts: dict = {}
        for i, lat, lon in attrs_rows:
            if i % step == 0:
                gh = geohash_encode(lat, lon, 1)
                counts[gh] = counts.get(gh, 0) + 1
        want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
        assert sorted(got[qid]) == [
            (i + 1, gh, n) for i, (gh, n) in enumerate(want)]


def test_precision_validation():
    with pytest.raises(ValueError):
        geohash_encode(0, 0, 0)
    with pytest.raises(ValueError):
        geohash_sql("lat", "lon", 10)
