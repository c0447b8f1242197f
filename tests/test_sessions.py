"""Streaming sessionization gates (streaming/sessions.py — the
applyInPandasWithState custom stateful operator).

Contract: sessions split on event-time gaps > gap; a closed-by-split
prefix emits immediately, an idle open session emits via the
event-time TIMEOUT once the watermark passes end+gap; each session
emits exactly once; state survives across availableNow runs through
the checkpoint; re-draining with no new data emits nothing.
"""

from datetime import datetime, timezone

import pytest

from searchengine_spark.streaming.sessions import stream_sessionize


def _ts(minute: int):
    return datetime(2026, 2, 1, minute // 60, minute % 60,
                    tzinfo=timezone.utc).replace(tzinfo=None)


def _write(spark, path, rows):
    # ONE file per round (same batching determinism note as
    # test_windowed._write)
    spark.createDataFrame(rows, "conv_id string, ts timestamp").coalesce(
        1).write.mode("append").parquet(path)


def _read(spark, out):
    try:
        return sorted(
            (r["key"], r["session_start"] % 86400 // 60,
             r["session_end"] % 86400 // 60, int(r["n_events"]),
             r["closed_by"])
            for r in spark.read.parquet(f"{out}/sessions").collect()
        )
    except Exception:
        return []


def test_gap_split_timeout_and_resume(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    # round 1, one batch: conv A at 0,5,10 then a GAP to 40,42 (gap 15m)
    # -> the 0-10 session closes by SPLIT in-function; 40-42 stays open.
    # conv B at 3 -> open.
    _write(spark, src, [("A", _ts(m)) for m in (0, 5, 10, 40, 42)]
           + [("B", _ts(3))])
    stream_sessionize(spark, src, out, gap="15 minutes",
                      watermark="5 minutes")
    got1 = _read(spark, out)
    assert ("A", 0, 10, 3, "gap") in got1
    # open sessions may or may not have timed out depending on the
    # final watermark (42-5=37 < 40+15): B's timeout is 3+15=18 < 37 ->
    # B closed by timeout; A's open session (ends 42) stays.
    assert ("B", 3, 3, 1, "timeout") in got1
    assert len(got1) == 2

    # round 2: a far-future C event advances the watermark past A's
    # timeout -> A's 40-42 session emits by timeout exactly once.
    _write(spark, src, [("C", _ts(300))])
    stream_sessionize(spark, src, out, gap="15 minutes",
                      watermark="5 minutes")
    got2 = _read(spark, out)
    assert ("A", 40, 42, 2, "timeout") in got2
    assert got2.count(("A", 0, 10, 3, "gap")) == 1  # never re-emits
    assert len(got2) == 3  # C's own session still open

    # round 3: nothing new -> nothing emitted
    stream_sessionize(spark, src, out, gap="15 minutes",
                      watermark="5 minutes")
    assert _read(spark, out) == got2


def test_validation(spark, tmp_path):
    src = str(tmp_path / "in2")
    _write(spark, src, [("A", _ts(0))])
    with pytest.raises(ValueError, match="gap wants"):
        stream_sessionize(spark, src, str(tmp_path / "o"), gap="soon")
    with pytest.raises(ValueError, match="lacks column"):
        stream_sessionize(spark, src, str(tmp_path / "o2"),
                          key_col="nope")
