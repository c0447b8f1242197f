#!/usr/bin/env python3
"""spark-submit entrypoint: serve BM25 top-k queries from a packed index.

    spark-submit --py-files searchengine_spark.zip jobs/search.py \\
        --index <index path> --query "greatest rock album" [-n 10] [--exhaustive]

Multiple --query flags run as one batch plan. Prints one JSON line per
query: {"query": ..., "results": [{doc_id, conv_id, turn_idx, score, rank}]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True)
    ap.add_argument("-n", type=int, default=10)
    # tokenizer flags default to the config STORED IN THE INDEX MANIFEST —
    # queries must be tokenized like the docs were, or results silently skew;
    # pass a flag explicitly only to deliberately override the build config
    ap.add_argument("--min-token-length", type=int, default=None)
    ap.add_argument("--stop-words", default=None,
                    help="stop-word file; 'none' disables the manifest list")
    ap.add_argument("--exhaustive", action="store_true",
                    help="disable block-max pruning (exact fallback path)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchengine_spark.indexing.packed import load_packed_index
    from searchengine_spark.query.wand import bm25_topk_packed_batch, resolve_docs
    from searchengine_spark.tokenizer import TokenizerConfig

    spark = SparkSession.builder.appName("searchengine_spark.search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pidx = load_packed_index(spark, args.index)
    cfg = TokenizerConfig.from_manifest(pidx.manifest.get("tokenizer", {}))
    if args.min_token_length is not None:
        cfg = TokenizerConfig(args.min_token_length, cfg.stop_words, cfg.stem_lang)
    if args.stop_words is not None:
        sw = (None if args.stop_words.lower() == "none"
              else TokenizerConfig.load_stop_words(args.stop_words))
        cfg = TokenizerConfig(cfg.min_token_length, sw, cfg.stem_lang)
    topk = bm25_topk_packed_batch(
        pidx, args.query, cfg, k=args.n, exhaustive=args.exhaustive
    )
    rows = resolve_docs(pidx, topk).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in enumerate(args.query):
        res = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        print(
            json.dumps(
                {
                    "query": q,
                    # external-id columns follow the index's order_cols
                    "results": [r.asDict() for r in res],
                },
                default=str,
            )
        )


if __name__ == "__main__":
    main()
