#!/usr/bin/env python3
"""spark-submit entrypoint: hash-shard a corpus and build N packed
indexes — the BUILD half of federated serving (indexing/shards.py).

Cluster usage:

    zip -r searchengine_spark.zip searchengine_spark
    spark-submit --py-files searchengine_spark.zip jobs/build_shards.py \\
        --input <transcripts parquet/Iceberg> --num-shards 16 \\
        --output <dir>            # -> <dir>/shard_0000 ... + federation.json

Then serve without merging:

    python jobs/search.py --shards <dir>          # reads federation.json
    python jobs/search.py --shards <dir>/shard_0000,<dir>/shard_0001,...

or fold to one index later with jobs/merge_index.py. Shard assignment is
md5(conv_id) mod N — deterministic and conversation-coherent, so appends
route to the same shard with indexing.shards.shard_assignment.

The job prints ONE JSON line: the federation manifest (per-shard n_docs,
total docs, the --shards spec string).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts table path (parquet dir)")
    ap.add_argument("--input-format", default="auto",
                    choices=["auto", "parquet", "iceberg"])
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic conversations instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--num-shards", type=int, required=True)
    ap.add_argument("--shard-by", default="conv_id",
                    help="grouping key column: all rows sharing it land in "
                         "one shard (default conv_id keeps conversations whole)")
    ap.add_argument("--min-token-length", type=int, default=3)
    ap.add_argument("--stop-words", default=None)
    ap.add_argument("--language", default=None, help="Snowball stemmer language")
    ap.add_argument("--k", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--chunk-docs", type=int, default=65536)
    ap.add_argument("--positional", action="store_true")
    ap.add_argument("--tfidf-sidecar", action="store_true")
    ap.add_argument("--payload", default="freq",
                    choices=["freq", "boolean", "tfidf"])
    ap.add_argument("--no-staging", action="store_true",
                    help="skip the shard-partitioned staging write and "
                         "filter the input per shard instead (N full input "
                         "scans — only for tiny/cached inputs)")
    ap.add_argument("--keep-staging", action="store_true")
    args = ap.parse_args()
    if not args.synthetic and not args.input:
        ap.error("one of --input / --synthetic is required")

    from pyspark.sql import SparkSession

    from searchengine_spark.indexing.build import Bm25Params
    from searchengine_spark.indexing.shards import build_shard_indexes
    from searchengine_spark.tokenizer import TokenizerConfig

    spark = SparkSession.builder.appName(
        "searchengine_spark.build_shards").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    cfg = TokenizerConfig(
        min_token_length=args.min_token_length,
        stop_words=TokenizerConfig.load_stop_words(args.stop_words)
        if args.stop_words
        else None,
        stem_lang=args.language,
    )
    if args.synthetic:
        from searchengine_spark.fixtures.transcripts import transcripts_distributed

        df = transcripts_distributed(spark, n_conv=args.synthetic)
    else:
        from searchengine_spark.sources import read_transcripts

        df = read_transcripts(spark, args.input, fmt=args.input_format)

    fed = build_shard_indexes(
        df, cfg, args.output, args.num_shards,
        shard_by=args.shard_by,
        params=Bm25Params(k=args.k, b=args.b),
        staging=not args.no_staging,
        keep_staging=args.keep_staging,
        chunk_docs=args.chunk_docs,
        positional=args.positional,
        tfidf_sidecar=args.tfidf_sidecar,
        payload=args.payload,
    )
    # one line, shard manifests reduced to their totals (the per-shard
    # manifest lives in each shard dir)
    fed["shards"] = [
        {"path": p, "n_docs": m["n_docs"], "n_terms": m["n_terms"]}
        for p, m in zip(fed["spec"].split(","), fed["shards"])
    ]
    print(json.dumps(fed))


if __name__ == "__main__":
    main()
