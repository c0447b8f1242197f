#!/usr/bin/env python3
"""spark-submit entrypoint: training-sequence packing
(textops/packing.py) — assemble fixed-token-budget model inputs from a
document table.

Two modes: ``chunk`` (GPT-style concat-and-chunk — documents lay
head-to-tail per hash bucket and the stream cuts into fixed windows;
docs may straddle) and ``greedy`` (no-split first-fit — whole docs per
sequence, overlong docs take one alone). The packing PLAN (doc ->
bucket/sequence/offset assignment) is what's written — downstream
dataloaders join it back to the text; the packer itself never shuffles
text.

    spark-submit --py-files searchengine_spark.zip jobs/pack_sequences.py \\
        --input docs.parquet --output /tmp/plan \\
        --max-tokens 2048 --buckets 64 --mode greedy [--stats] \\
        [--token-count-col n_tok]

Prints ONE JSON line: {"mode", "docs", "max_tokens", "buckets", and
for greedy: "seqs", "pad_tokens", "fill_pct"}.
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
    ap.add_argument("--mode", choices=["chunk", "greedy"], default="greedy")
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--token-count-col", default=None,
                    help="pack by a precomputed token-count column "
                         "instead of the whitespace proxy")
    ap.add_argument("--order", default="id", choices=("id", "length_desc"),
                    help="greedy-mode scan order: id (in-order) or "
                         "length_desc (decreasing - denser sequences, "
                         "one sort)")
    ap.add_argument("--stats", action="store_true",
                    help="greedy only: print per-run fill accounting")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from searchengine_spark.textops.packing import (
        pack_concat_chunks,
        pack_greedy,
        packing_stats,
    )

    spark = SparkSession.builder.appName(
        "searchengine_spark.pack_sequences").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)
    kw = dict(max_tokens=args.max_tokens, n_buckets=args.buckets,
              id_col=args.id_col, text_col=args.text_col,
              token_count_col=args.token_count_col)
    if args.mode == "chunk":
        plan = pack_concat_chunks(docs, **kw)
    else:
        plan = pack_greedy(docs, order=args.order, **kw)
    # partition the written plan by bucket: a sharded dataloader reads
    # its bucket's sequences without touching the rest
    plan.write.mode("overwrite").partitionBy("bucket").parquet(args.output)
    out = {"mode": args.mode, "max_tokens": args.max_tokens,
           "buckets": args.buckets}
    if args.mode == "greedy":
        out["order"] = args.order
    written = spark.read.parquet(args.output)
    out["docs"] = written.count()
    if args.mode == "greedy" and args.stats:
        agg = packing_stats(written, args.max_tokens).agg(
            F.sum("n_seqs").alias("seqs"),
            F.sum("pad_tokens").alias("pad"),
        ).collect()[0]
        seqs, pad = int(agg["seqs"] or 0), int(agg["pad"] or 0)
        budget = seqs * args.max_tokens
        out.update({
            "seqs": seqs, "pad_tokens": pad,
            "fill_pct": round(100.0 * (budget - pad) / budget, 2)
            if budget else None,
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
