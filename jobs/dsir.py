#!/usr/bin/env python3
"""spark-submit entrypoint: DSIR data selection (textops/dsir.py —
Xie et al. 2023, arXiv:2302.03169): score raw-corpus docs by hashed
n-gram importance weights against a target corpus, optionally keep the
top fraction.

    spark-submit --py-files searchengine_spark.zip jobs/dsir.py \\
        --input <raw docs parquet> --target <target docs parquet> \\
        --output <dir> [--buckets 4096] [--text-col text --id-col doc_id] \\
        [--keep-frac 0.25 | --min-weight W]

Writes (id, n_features, weight_micro[, rank]) to --output and prints a
one-line JSON summary. --keep-frac ranks by (weight desc, id asc) via a
global rank window — exact, one sort exchange; at extreme scale prefer
--min-weight with a threshold picked from a scored sample.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="raw corpus parquet")
    ap.add_argument("--target", required=True, help="target corpus parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=4096)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-token-length", type=int, default=3)
    ap.add_argument("--stop-words", default=None)
    ap.add_argument("--keep-frac", type=float, default=None)
    ap.add_argument("--min-weight", type=int, default=None,
                    help="keep docs with weight_micro >= this")
    args = ap.parse_args()
    if args.keep_frac is not None and not 0 < args.keep_frac <= 1:
        raise SystemExit("--keep-frac must be in (0, 1]")

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from searchengine_spark.textops import dsir_weights, hashed_feature_counts
    from searchengine_spark.tokenizer import TokenizerConfig

    spark = SparkSession.builder.appName("searchengine_dsir").getOrCreate()
    sw = (TokenizerConfig.load_stop_words(args.stop_words)
          if args.stop_words else None)
    cfg = TokenizerConfig(args.min_token_length, sw)
    raw = spark.read.parquet(args.input)
    target = spark.read.parquet(args.target)
    # the model tables are <= n_buckets rows and each costs a full
    # corpus tokenize+hash pass — cache them so model_totals inside
    # dsir_weights and the scoring join don't recompute; cache the
    # scored frame so count + write + keep-cut are one computation
    tc = hashed_feature_counts(target, cfg, args.buckets,
                               text_col=args.text_col).cache()
    rc = hashed_feature_counts(raw, cfg, args.buckets,
                               text_col=args.text_col).cache()
    scored = dsir_weights(raw, tc, rc, cfg, n_buckets=args.buckets,
                          id_col=args.id_col, text_col=args.text_col).cache()
    n_scored = scored.count()
    out = scored
    if args.min_weight is not None:
        out = out.filter(F.col("weight_micro") >= args.min_weight)
    if args.keep_frac is not None:
        k = max(1, int(n_scored * args.keep_frac))
        w = Window.orderBy(F.desc("weight_micro"), F.asc(args.id_col))
        out = (out.withColumn("rank", F.row_number().over(w).cast("long"))
               .filter(F.col("rank") <= k))
    out.write.mode("overwrite").parquet(args.output)
    n_kept = spark.read.parquet(args.output).count()
    print(json.dumps({"n_scored": int(n_scored), "n_kept": int(n_kept),
                      "buckets": args.buckets, "output": args.output}))


if __name__ == "__main__":
    main()
