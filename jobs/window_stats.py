#!/usr/bin/env python3
"""spark-submit entrypoint: watermarked windowed ingest stats
(streaming/windowed.py) — per-(event-time window, group) doc counts
over a GROWING input directory, append-once semantics.

Each invocation is one availableNow pass over the shared checkpoint:
it drains what's new, advances the watermark, emits newly-FINALIZED
windows to <output>/windows (exactly once each, immutable thereafter),
and drops events older than the watermark. Re-run on a schedule; the
checkpoint makes it resumable.

    spark-submit --py-files searchengine_spark.zip jobs/window_stats.py \\
        --input <growing parquet dir> --output <dir> \\
        --ts-col ts --group-col source \\
        --window "15 minutes" --watermark "10 minutes"

Prints ONE JSON line: {"batches": N, "windows_total": M}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--group-col", default="source")
    ap.add_argument("--window", default="15 minutes")
    ap.add_argument("--slide", default=None,
                    help="sliding windows (default: tumbling = --window)")
    ap.add_argument("--watermark", default="10 minutes")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchengine_spark.streaming.windowed import stream_windowed_counts

    spark = SparkSession.builder.appName(
        "searchengine_spark.window_stats").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    batches = stream_windowed_counts(
        spark, args.input, args.output, ts_col=args.ts_col,
        group_col=args.group_col, window=args.window, slide=args.slide,
        watermark=args.watermark)
    try:
        total = spark.read.parquet(f"{args.output}/windows").count()
    except Exception:
        total = 0
    print(json.dumps({"batches": batches, "windows_total": int(total)}))


if __name__ == "__main__":
    main()
