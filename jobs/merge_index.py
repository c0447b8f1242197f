#!/usr/bin/env python3
"""spark-submit entrypoint: merge N packed shard indexes into one.

The distributed-build pattern: partition the corpus, run jobs/build_index.py
per partition in parallel (separate jobs/clusters), then fold the finished
shards into one servable index — bit-identical to a single build over the
concatenated live corpora (indexing/merge.py; gated tests/test_merge.py).

    zip -r searchengine_spark.zip searchengine_spark
    spark-submit --py-files searchengine_spark.zip jobs/merge_index.py \\
        --shards /idx/shard0,/idx/shard1,/idx/shard2 \\
        --output /idx/merged [--partitions N] [--check-disjoint]

Shards must share the build contract (tokenizer, k/b, chunk_docs, payload,
positional, sidecar, order_cols) — mismatches refuse loudly. Each shard's
tombstones are folded; committed epochs are included. The output path is
CLOBBERED (overwrite semantics, like the build's stage writes).

Prints the merged manifest JSON on success.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", required=True,
                    help="comma-separated packed index paths (>= 2)")
    ap.add_argument("--output", required=True,
                    help="merged index path (clobbered; must differ from "
                         "every shard path)")
    ap.add_argument("--partitions", type=int, default=None,
                    help="range partitions for docID assignment and the "
                         "index encode (default: Spark decides)")
    ap.add_argument("--check-disjoint", action="store_true",
                    help="assert no two shards share an order_cols key "
                         "(one count-distinct pass over the union)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchengine_spark.indexing.merge import merge_packed_indexes

    spark = SparkSession.builder.appName(
        "searchengine_spark.merge_index"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    manifest = merge_packed_indexes(
        spark,
        [p for p in args.shards.split(",") if p],
        args.output,
        n_partitions=args.partitions,
        check_disjoint=args.check_disjoint,
    )
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
