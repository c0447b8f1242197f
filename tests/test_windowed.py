"""Watermarked windowed aggregation gates (streaming/windowed.py).

Contract: APPEND mode emits a (window, group) row exactly once, when
the watermark passes the window end; events older than the watermark
DROP and can never change a finalized window; successive availableNow
runs over a shared checkpoint resume — re-draining with no new data
emits nothing.
"""

from datetime import datetime, timezone

import pytest

from searchengine_spark.streaming.windowed import stream_windowed_counts


def _ts(minute: int):
    return datetime(2026, 1, 1, minute // 60, minute % 60,
                    tzinfo=timezone.utc).replace(tzinfo=None)


def _write(spark, path, rows):
    # ONE file per round: availableNow may otherwise split a round
    # into several batches in arbitrary file order, advancing the
    # watermark mid-round and changing which windows finalize when
    spark.createDataFrame(rows, "ts timestamp, source string").coalesce(
        1).write.mode("append").parquet(path)


def _read(spark, out):
    try:
        return sorted(
            (r["window_start"].minute + r["window_start"].hour * 60,
             r["source"], int(r["n"]))
            for r in spark.read.parquet(f"{out}/windows").collect()
        )
    except Exception:
        return []


def test_finalize_once_and_drop_late(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    # round 1: events 00..59 for a; one b at 20. window 15m, mark 10m.
    _write(spark, src, [(_ts(m), "a") for m in (1, 5, 16, 31, 59)]
           + [(_ts(20), "b")])
    stream_windowed_counts(spark, src, out, window="15 minutes",
                           watermark="10 minutes")
    got1 = _read(spark, out)
    # max event 00:59 -> watermark 00:49 -> windows ending <= 49
    # finalize: [0,15) a:2, [15,30) a:1 b:1, [30,45) a:1. [45,60) stays
    # open (ends at 60 > 49).
    assert got1 == [(0, "a", 2), (15, "a", 1), (15, "b", 1),
                    (30, "a", 1)]

    # round 2: a fresh event at 01:30 advances the watermark to 01:20
    # (finalizing [45,60)); a LATE event at 00:05 — behind the round-1
    # watermark — must DROP: the finalized [0,15) row never re-emits or
    # changes.
    _write(spark, src, [(_ts(90), "a"), (_ts(5), "a")])
    stream_windowed_counts(spark, src, out, window="15 minutes",
                           watermark="10 minutes")
    got2 = _read(spark, out)
    assert (45, "a", 1) in got2          # newly finalized
    assert got2.count((0, "a", 2)) == 1  # exactly once, unchanged
    assert (0, "a", 3) not in got2       # the late event dropped

    # round 3: nothing new -> nothing emitted
    before = _read(spark, out)
    stream_windowed_counts(spark, src, out, window="15 minutes",
                           watermark="10 minutes")
    assert _read(spark, out) == before


def test_validation(spark, tmp_path):
    src = str(tmp_path / "in2")
    _write(spark, src, [(_ts(1), "a")])
    with pytest.raises(ValueError, match="lacks column"):
        stream_windowed_counts(spark, src, str(tmp_path / "o2"),
                               group_col="nope")
