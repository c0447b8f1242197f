"""Streaming sessionization — the CUSTOM stateful operator
(``applyInPandasWithState``): group a conversation's event stream into
SESSIONS split by inactivity gaps, emitting each session exactly once
when it closes. The question every transcript pipeline asks of a live
event feed: "when did this conversation's sitting end, and how many
turns was it?"

Semantics (gated in tests/test_sessions.py):

- a session = consecutive events of one ``key_col`` with no gap >
  ``gap`` between neighbors (event time);
- a session CLOSES two ways: a later event of the same key arrives
  beyond the gap (split detected in-function — the closed prefix emits
  immediately), or the event-time watermark passes session_end + gap
  with nothing new (the state TIMEOUT — the open session emits and the
  state clears);
- emitted once, immutable: (key, session_start, session_end, n_events,
  closed_by) with epoch-second bounds (the integer cross-engine
  policy);
- events older than the watermark drop (standard late-data contract);
  state per key is ONE open session tuple — bounded by live keys, not
  stream length.

Why ``applyInPandasWithState`` and not ``F.session_window``: the
built-in session window exists and covers plain gap-count aggregation;
this operator is the EXTENSIBILITY seam — the state tuple and the
in-function merge are where per-session custom logic (token budgets,
role transitions, cost meters) attaches. The test suite pins the
built-in-equivalent core so the seam stays correct.

availableNow + a shared checkpoint make successive calls resumable,
exactly like streaming/windowed.py.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..indexing import fsio

_OUT_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("session_start", T.LongType(), False),
    T.StructField("session_end", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("closed_by", T.StringType(), False),
])
_STATE_SCHEMA = T.StructType([
    T.StructField("start_s", T.LongType(), False),
    T.StructField("end_s", T.LongType(), False),
    T.StructField("n", T.LongType(), False),
])


def _make_fn(gap_s: int):
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        k = key[0]
        if state.hasTimedOut:
            start_s, end_s, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [k], "session_start": [start_s],
                 "session_end": [end_s], "n_events": [n],
                 "closed_by": ["timeout"]})
            return
        secs: list = []
        for pdf in pdfs:
            secs.extend(
                int(v) for v in
                (pdf["ts"].astype("int64") // 1_000_000_000).tolist())
        secs.sort()
        if state.exists:
            start_s, end_s, n = state.get
        else:
            start_s = end_s = None  # type: ignore[assignment]
            n = 0
        out_rows = []
        for s in secs:
            if start_s is None:
                start_s, end_s, n = s, s, 1
            elif s - end_s > gap_s:
                out_rows.append((k, start_s, end_s, n, "gap"))
                start_s, end_s, n = s, s, 1
            else:
                end_s = max(end_s, s)
                n += 1
        state.update((start_s, end_s, n))
        # close when the watermark passes end + gap with nothing new
        state.setTimeoutTimestamp((end_s + gap_s) * 1000)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["key", "session_start", "session_end",
                         "n_events", "closed_by"])

    return fn


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> int:
    """Drain ``input_dir`` with ONE availableNow pass: gap-split
    sessions per ``key_col`` APPEND to ``output_dir/sessions`` as they
    close (split-detected immediately, idle ones via event-time
    timeout); checkpoint under ``output_dir/checkpoint``. Returns the
    number of batches the pass ran."""
    parts = gap.split()
    if len(parts) != 2 or not parts[0].isdigit():
        raise ValueError(f"gap wants '<n> seconds|minutes|hours', got {gap!r}")
    unit = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}.get(parts[1])
    if unit is None:
        raise ValueError(f"gap wants '<n> seconds|minutes|hours', got {gap!r}")
    gap_s = int(parts[0]) * unit
    schema = spark.read.parquet(input_dir).schema
    for c in (key_col, ts_col):
        if c not in schema.names:
            raise ValueError(f"input lacks column {c!r}")
    src = (
        spark.readStream.schema(schema).parquet(input_dir)
        .select(F.col(key_col).cast("string").alias("key"),
                F.col(ts_col).cast("timestamp").alias("ts"))
        .withWatermark("ts", watermark)
    )
    out = src.groupBy("key").applyInPandasWithState(
        _make_fn(gap_s), _OUT_SCHEMA, _STATE_SCHEMA,
        "append", GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", fsio.join(output_dir, "sessions"))
        .option("checkpointLocation", fsio.join(output_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(q.recentProgress)
