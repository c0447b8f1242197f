#!/usr/bin/env python3
"""spark-submit entrypoint: per-doc sliding-window chunking
(textops/chunking.py) — split long documents into fixed-token windows
with overlap, the RAG / embedding-prep shape (chunks never cross a doc
boundary, unlike jobs/pack_sequences.py's pretraining concat-and-chunk).

    spark-submit --py-files searchengine_spark.zip jobs/chunk_docs.py \\
        --input docs.parquet --output /tmp/chunks \\
        --max-tokens 256 --stride 192 [--no-text] \\
        [--min-token-length 3 --stop-words stop_words.txt]

Prints ONE JSON line: {"docs", "chunks", "max_tokens", "stride",
"overlap"}.
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
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--stride", type=int, default=192)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--no-text", action="store_true",
                    help="emit the span plan only (id, chunk_idx, "
                         "start_token, n_tokens) without chunk text")
    ap.add_argument("--min-token-length", type=int, default=2)
    ap.add_argument("--stop-words", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchengine_spark.textops.chunking import sliding_chunks
    from searchengine_spark.tokenizer import TokenizerConfig

    spark = SparkSession.builder.appName(
        "searchengine_spark.chunk_docs").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    stop = (TokenizerConfig.load_stop_words(args.stop_words)
            if args.stop_words else None)
    cfg = TokenizerConfig(min_token_length=args.min_token_length,
                          stop_words=stop)
    docs = spark.read.parquet(args.input)
    chunks = sliding_chunks(
        docs, cfg, args.max_tokens, args.stride,
        id_col=args.id_col, text_col=args.text_col,
        with_text=not args.no_text)
    chunks.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    print(json.dumps({
        "docs": written.select("id").distinct().count(),
        "chunks": written.count(),
        "max_tokens": args.max_tokens,
        "stride": args.stride,
        "overlap": args.max_tokens - args.stride,
    }))


if __name__ == "__main__":
    main()
