"""Watermarked windowed aggregation — the Structured-Streaming
late-data contract, applied to the ingest-monitoring question every
corpus pipeline asks: "how many documents per source per time window,
given events arrive LATE?"

Semantics (Spark's own, surfaced deliberately; gated in
tests/test_windowed.py):

- event-time tumbling/sliding windows over ``ts_col`` via
  ``F.window``; watermark = how long to wait for stragglers;
- APPEND output mode: a window row is emitted EXACTLY ONCE, when the
  watermark passes its end — the finalized-window contract (a sink
  consumer never sees a count twice or watches it grow);
- an event older than the watermark is DROPPED — it can no longer
  change a finalized window (the documented cost of bounded state);
- state (open windows) is bounded by watermark/slide, not by stream
  length — the property that survives 10^12 turns;
- ``availableNow`` triggers + a shared checkpoint make the stream
  RESUMABLE: each run drains what's new, advances the watermark, and
  finalizes what it can; rerunning with no new data emits nothing.

This completes the streaming trio: exactly-once index APPENDS
(streaming/incremental.py), streaming PERCOLATION alerting
(query/percolate.py --stream), and watermarked windowed AGGREGATION
(here). No reference counterpart (the reference is batch-only).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..indexing import fsio


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    ts_col: str = "ts",
    group_col: str = "source",
    window: str = "15 minutes",
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
) -> int:
    """Drain ``input_dir`` (a growing parquet directory) with ONE
    availableNow pass: watermarked per-(window, group) doc counts
    APPEND to ``output_dir/windows`` as they FINALIZE; checkpoint under
    ``output_dir/checkpoint`` makes successive calls resumable (each
    call emits only newly-finalized windows; late events beyond the
    watermark drop). Returns the number of batches this pass ran.

    Output rows: (window_start, window_end, <group_col>, n) — emitted
    once per window, immutable thereafter."""
    schema = spark.read.parquet(input_dir).schema
    for c in (ts_col, group_col):
        if c not in schema.names:
            raise ValueError(f"input lacks column {c!r}")
    src = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        src.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window, slide or window),
            F.col(group_col),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            group_col,
            "n",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", fsio.join(output_dir, "windows"))
        .option("checkpointLocation", fsio.join(output_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    return len(progress)
