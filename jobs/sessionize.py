#!/usr/bin/env python3
"""spark-submit entrypoint: streaming sessionization
(streaming/sessions.py — the applyInPandasWithState custom stateful
operator): gap-split sessions per key over a GROWING event directory,
each session emitted exactly once when it closes (in-batch gap split,
or event-time timeout once the watermark passes session_end + gap).

Each invocation is one resumable availableNow pass over the shared
checkpoint — run it on a schedule like jobs/window_stats.py.

    spark-submit --py-files searchengine_spark.zip jobs/sessionize.py \\
        --input <growing parquet dir> --output <dir> \\
        --key-col conv_id --ts-col ts \\
        --gap "30 minutes" --watermark "10 minutes"

Prints ONE JSON line: {"batches": N, "sessions_total": M}.
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
    ap.add_argument("--key-col", default="conv_id")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--gap", default="30 minutes")
    ap.add_argument("--watermark", default="10 minutes")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchengine_spark.streaming.sessions import stream_sessionize

    spark = SparkSession.builder.appName(
        "searchengine_spark.sessionize").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    batches = stream_sessionize(
        spark, args.input, args.output, key_col=args.key_col,
        ts_col=args.ts_col, gap=args.gap, watermark=args.watermark)
    try:
        total = spark.read.parquet(f"{args.output}/sessions").count()
    except Exception:
        total = 0
    print(json.dumps({"batches": batches, "sessions_total": int(total)}))


if __name__ == "__main__":
    main()
