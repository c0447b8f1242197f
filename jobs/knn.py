#!/usr/bin/env python3
"""spark-submit entrypoint: the vector-similarity surface
(textops/similarity.py + textops/quantize.py) as a CLI — build the
servable IVF layout, answer kNN queries (brute or partition-pruned IVF,
optionally SQ8-quantized, optionally attribute-PRE-filtered), and emit
near-duplicate pairs.

Cluster usage:

    zip -r searchengine_spark.zip searchengine_spark
    spark-submit --py-files searchengine_spark.zip jobs/knn.py build \\
        --input <embeddings parquet: (vec_id, embedding, ...)> \\
        --output <ivf dir> [--centroids 8 --dim 64 --iters 2 --sq8]
    spark-submit ... jobs/knn.py query --input <parquet> \\
        [--index <ivf dir> [--n-probe 2] [--sq8 [--rescore M]]] \\
        --query-id N [-k 10] [--filter "label = 1"]
    spark-submit ... jobs/knn.py pairs --input <parquet> \\
        --threshold 0.9 [--bucketed [--centroids 8 --dim 64 --iters 2]]
    spark-submit ... jobs/knn.py dedup --input <parquet> \\
        --threshold 0.95 [--centroids 8 --dim 64 --iters 2] \\
        [--output <keeplist dir>]

`query` without --index runs exact brute cosine; with --index it probes
the persisted bucketed layout (partition-pruned scan). --filter is the
ES knn filter contract: PRE-filtering — the k nearest among vectors
PASSING the predicate, never top-k-then-filter. `pairs --bucketed`
trains k-means and restricts candidates to same-cell pairs (the IVF
composition); without it, all-pairs (verification scale only). `dedup`
is SemDeDup (Abbas et al. 2023): k-means clusters, within-cluster
cosine >= threshold pairs, connected components, keep = min-id
representative per semantic-duplicate group.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _query_vec(spark, args):
    if args.query_vec:
        return [float(x) for x in args.query_vec.split(",")]
    if args.query_id is None:
        raise SystemExit("pass --query-id or --query-vec")
    from pyspark.sql import functions as F

    rows = (spark.read.parquet(args.input)
            .filter(F.col(args.id_col) == args.query_id)
            .select(args.vec_col).collect())
    if not rows:
        raise SystemExit(f"{args.id_col}={args.query_id} not in {args.input}")
    return [float(x) for x in rows[0][0]]


def _allowed(spark, args):
    if not args.filter:
        return None
    from pyspark.sql import functions as F

    return (spark.read.parquet(args.input)
            .filter(F.expr(args.filter)).select(args.id_col))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "query", "pairs", "dedup"])
    ap.add_argument("--input", required=True,
                    help="embeddings parquet dir (vec_id, embedding, ...)")
    ap.add_argument("--output", default=None, help="IVF dir (build)")
    ap.add_argument("--index", default=None, help="IVF dir (query)")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--centroids", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--pq", default=None, nargs="?", const="4:8",
                    metavar="M:KSUB",
                    help="build: train+persist a product-quantization "
                         "layout instead of IVF (textops/pq.py); query: "
                         "serve ADC candidates + exact rescore from a "
                         "--index PQ dir")
    ap.add_argument("--ivfpq", default=None, nargs="?", const="4:8",
                    metavar="M:KSUB",
                    help="build: the combined IVFPQ layout (coarse cells "
                         "+ codes_pq column); query: probe cells, ADC "
                         "candidates, exact rescore (textops/pq.py "
                         "ivf_pq_topk)")
    ap.add_argument("--sq8", action="store_true",
                    help="build: also store the int8-range quantized "
                         "column; query: rank candidates by exact integer "
                         "int8 dot, rescore the --rescore window at full "
                         "precision")
    ap.add_argument("--rescore", type=int, default=40)
    ap.add_argument("--query-id", type=int, default=None,
                    help="use this row's embedding as the query vector")
    ap.add_argument("--query-vec", default=None,
                    help="comma-separated floats (instead of --query-id)")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--n-probe", type=int, default=2)
    ap.add_argument("--filter", default=None,
                    help="SQL predicate over the --input columns: "
                         "PRE-filtered kNN (ES knn filter semantics)")
    ap.add_argument("--min-similarity", type=float, default=None,
                    help="ES knn 'similarity' cutoff: drop results below "
                         "this rounded cosine (brute and IVF query paths)")
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--bucketed", action="store_true",
                    help="pairs: restrict candidates to same k-means cell")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("searchengine_knn").getOrCreate()
    emb = spark.read.parquet(args.input)

    if args.mode == "build":
        from searchengine_spark.textops import build_ivf_index

        if not args.output:
            raise SystemExit("build needs --output")
        if args.ivfpq:
            m, _, ksub = args.ivfpq.partition(":")
            man = build_ivf_index(
                emb, args.output, n_centroids=args.centroids, dim=args.dim,
                n_iters=args.iters, id_col=args.id_col,
                vec_col=args.vec_col, sq8=args.sq8,
                pq=(int(m), int(ksub or 8)),
            )
            print(json.dumps({k: man[k] for k in
                              ("format", "n_centroids", "dim", "pq")}
                             | {"output": args.output}))
            return
        if args.pq:
            from searchengine_spark.textops.pq import build_pq_index

            m, _, ksub = args.pq.partition(":")
            man = build_pq_index(
                emb, args.output, m=int(m), ksub=int(ksub or 8),
                dim=args.dim, n_iters=args.iters,
                id_col=args.id_col, vec_col=args.vec_col,
            )
            print(json.dumps({k: man[k] for k in
                              ("format", "m", "ksub", "dim")}
                             | {"output": args.output}))
            return
        man = build_ivf_index(
            emb, args.output, n_centroids=args.centroids, dim=args.dim,
            n_iters=args.iters, id_col=args.id_col, vec_col=args.vec_col,
            sq8=args.sq8,
        )
        print(json.dumps({k: man[k] for k in
                          ("format", "n_centroids", "dim", "sq8")}
                         | {"output": args.output}))
        return

    if args.mode == "query":
        qv = _query_vec(spark, args)
        allowed = _allowed(spark, args)
        exclude = (args.query_id,) if args.query_id is not None else ()
        if args.index and args.ivfpq is not None:
            from searchengine_spark.textops.pq import ivf_pq_topk

            if allowed is not None:
                raise SystemExit("--filter is not wired to the IVFPQ "
                                 "candidate path")
            out = ivf_pq_topk(spark, args.index, qv, k=args.k,
                              n_probe=args.n_probe,
                              rescore_m=args.rescore)
        elif args.index and args.pq:
            from searchengine_spark.textops.pq import pq_topk_indexed

            if allowed is not None:
                raise SystemExit("--filter is not wired to the PQ "
                                 "candidate path (use the full-precision "
                                 "--index or brute query)")
            out = pq_topk_indexed(spark, args.index, emb, qv, k=args.k,
                                  rescore_m=args.rescore)
        elif args.index and args.sq8:
            from searchengine_spark.textops.quantize import ivf_sq8_topk

            if allowed is not None:
                raise SystemExit("--filter is not wired to the SQ8 "
                                 "candidate path (use the full-precision "
                                 "--index or brute query)")
            out = ivf_sq8_topk(spark, args.index, qv, k=args.k,
                               n_probe=args.n_probe,
                               rescore_m=args.rescore)
        elif args.index:
            from searchengine_spark.textops import ivf_topk_indexed

            out = ivf_topk_indexed(spark, args.index, qv, k=args.k,
                                   n_probe=args.n_probe,
                                   exclude_ids=exclude, allowed=allowed,
                                   min_similarity=args.min_similarity)
        else:
            from searchengine_spark.textops import cosine_topk

            out = cosine_topk(emb, qv, k=args.k, id_col=args.id_col,
                              vec_col=args.vec_col, exclude_ids=exclude,
                              allowed=allowed,
                              min_similarity=args.min_similarity)
        for r in out.collect():
            print(json.dumps(r.asDict(), default=str))
        return

    if args.mode == "dedup":
        # SemDeDup (textops/similarity.py semantic_dedup): cluster ->
        # within-cluster cosine pairs -> components -> min-id keep-list;
        # --output streams the keep table without a driver collect
        from searchengine_spark.textops import semantic_dedup

        out = semantic_dedup(
            emb, args.threshold, n_centroids=args.centroids, dim=args.dim,
            n_iters=args.iters, id_col=args.id_col, vec_col=args.vec_col)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            kept = spark.read.parquet(args.output).filter("keep").count()
            total = spark.read.parquet(args.output).count()
        else:
            out = out.cache()
            kept, total = out.filter("keep").count(), out.count()
        print(json.dumps({"threshold": args.threshold, "n_vectors": int(total),
                          "n_kept": int(kept),
                          "n_dropped": int(total - kept),
                          "output": args.output}))
        return

    # pairs
    from searchengine_spark.textops import cosine_near_pairs

    bucket_by = None
    if args.bucketed:
        from searchengine_spark.textops import kmeans_micro

        bucket_by = kmeans_micro(emb, args.centroids, args.dim,
                                 args.iters, args.id_col, args.vec_col)
    pairs = cosine_near_pairs(emb, args.threshold, id_col=args.id_col,
                              vec_col=args.vec_col, bucket_by=bucket_by)
    n = pairs.count()
    print(json.dumps({"threshold": args.threshold,
                      "bucketed": bool(args.bucketed), "n_pairs": int(n)}))
    for r in pairs.orderBy("id_a", "id_b").limit(20).collect():
        print(json.dumps(r.asDict()))


if __name__ == "__main__":
    main()
