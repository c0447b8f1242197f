#!/usr/bin/env python3
"""spark-submit entrypoint: sparse_vector / text_expansion serving
(query/sparse.py) — learned-sparse retrieval over a weighted-token
table (the ES ELSER/SPLADE surface; weights arrive as data).

    python jobs/sparse.py build --input pairs.parquet --output /tmp/sidx
    python jobs/sparse.py query --index /tmp/sidx \\
        --weights "alpha:1000000,gamma:500000" -k 10
    python jobs/sparse.py query --index /tmp/sidx \\
        --expand "rock album" [--salt elser]   # deterministic stand-in

build expects (term, doc_id, weight_micro) — integer micro-units
(floor(model_weight * 1e6)).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("action", choices=["build", "query"])
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--index", default=None)
    ap.add_argument("--weights", default=None,
                    help="TERM:MICRO[,TERM:MICRO...] explicit query map")
    ap.add_argument("--expand", default=None,
                    help="text run through the deterministic expansion "
                         "stand-in (expand_text_deterministic)")
    ap.add_argument("--salt", default="elser")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--prune", action="store_true",
                    help="ES pruning_config: drop frequent-AND-weak "
                         "query tokens in phase 1, exact full-query "
                         "rescore of the candidate page")
    ap.add_argument("--prune-freq-ratio", type=int, default=5)
    ap.add_argument("--prune-weight-micro", type=int, default=400_000)
    ap.add_argument("--no-rescore", action="store_true")
    ap.add_argument("--blockmax", action="store_true",
                    help="serve via chunk-upper-bound pruning "
                         "(bit-identical; wins on SKEWED weight "
                         "distributions, loses on uniform ones — see "
                         "BENCH.md)")
    args = ap.parse_args()
    if args.prune and args.blockmax:
        ap.error("--prune and --blockmax are separate tiers — pick one "
                 "(pruning drops query tokens, block-max skips chunks)")

    from pyspark.sql import SparkSession

    from searchengine_spark.query.sparse import (
        build_sparse_index,
        expand_text_deterministic,
        sparse_topk_batch,
    )

    spark = SparkSession.builder.appName(
        "searchengine_spark.sparse").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.action == "build":
        if not args.input or not args.output:
            raise SystemExit("build needs --input and --output")
        man = build_sparse_index(spark.read.parquet(args.input),
                                 args.output, n_partitions=args.partitions)
        print(json.dumps({"output": args.output, **man}))
        return

    if not args.index:
        raise SystemExit("query needs --index")
    if args.weights:
        qw = {}
        for part in args.weights.split(","):
            t, _, w = part.rpartition(":")
            if not t:
                raise SystemExit("--weights wants TERM:MICRO[,...]")
            qw[t.strip()] = int(w)
    elif args.expand:
        qw = expand_text_deterministic(args.expand.split(), salt=args.salt)
    else:
        raise SystemExit("query needs --weights or --expand")
    if args.prune:
        from searchengine_spark.query.sparse import sparse_topk_pruned_batch

        out = sparse_topk_pruned_batch(
            spark, args.index, [qw], k=args.k,
            freq_ratio_threshold=args.prune_freq_ratio,
            weight_threshold_micro=args.prune_weight_micro,
            rescore=not args.no_rescore)
    elif args.blockmax:
        # block-max tier (bit-identical; prunes chunks by exact integer
        # upper bounds). OPT-IN: it pays only when document weights are
        # SKEWED across chunks (real ELSER/SPLADE output is; a uniform
        # weight table gives flat bounds, nothing prunes, and the
        # two-phase scan is pure overhead — measured 2.6x slower on the
        # uniform synthetic bench corpus, BENCH.md sf1.0 table)
        from searchengine_spark.query.sparse import (
            sparse_topk_blockmax_batch,
        )

        out = sparse_topk_blockmax_batch(
            spark, args.index, [qw], k=args.k)
    else:
        out = sparse_topk_batch(spark, args.index, [qw], k=args.k)
    print(json.dumps({
        "query_weights": qw,
        "hits": [r.asDict() for r in out.collect()],
    }))


if __name__ == "__main__":
    main()
