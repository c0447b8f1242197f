#!/usr/bin/env python3
"""spark-submit entrypoint: build (or resume) a packed BM25 index.

Cluster usage (north_rule packaging):

    zip -r searchengine_spark.zip searchengine_spark
    spark-submit --py-files searchengine_spark.zip jobs/build_index.py \\
        --input  <parquet/Iceberg path of transcripts> \\
        --output <index path> \\
        --min-token-length 3 --stop-words stop_words.txt \\
        --k 1.2 --b 0.75 [--resume] [--positional] [--chunk-docs 65536]

Local smoke (this sandbox):

    python jobs/build_index.py --synthetic 200 --output /tmp/idx

The job prints the manifest JSON (metrics incl. docs/sec, per-stage times)
on success — the driver-side contract for orchestration systems.
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
                    choices=["auto", "parquet", "iceberg", "tsv"],
                    help="auto: catalog.db.table -> iceberg, path -> parquet")
    ap.add_argument("--tsv-doc-id-column", default="review_id")
    ap.add_argument("--tsv-columns", default="review_headline,review_body")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic conversations instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-token-length", type=int, default=3)
    ap.add_argument("--stop-words", default=None)
    ap.add_argument("--language", default=None, help="Snowball stemmer language")
    ap.add_argument("--k", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--chunk-docs", type=int, default=65536)
    ap.add_argument("--positional", action="store_true",
                    help="store positional payloads (proximity ranking)")
    ap.add_argument("--tfidf-sidecar", action="store_true",
                    help="write per-doc lnc norms (TF-IDF serving)")
    ap.add_argument("--payload", default="freq",
                    choices=["freq", "boolean", "tfidf"],
                    help="boolean = doc-ids-only postings (smaller index); "
                         "tfidf = stored-3dp weights in postings "
                         "(doc:freq/w, joinless TF-IDF serving)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--output-format", default="auto",
                    choices=["auto", "parquet", "iceberg"],
                    help="'iceberg': after the parquet build commits, "
                         "publish the searchable stages as Iceberg tables "
                         "(--iceberg-prefix catalog.db.name required; the "
                         "parquet layout stays the source of truth); "
                         "'auto': publish iff --iceberg-prefix is given")
    ap.add_argument("--iceberg-prefix", default=None,
                    help="Iceberg table identifier prefix for published "
                         "stages: <prefix>_index, <prefix>_term_stats, "
                         "<prefix>_docs[, <prefix>_doc_norms]")
    ap.add_argument("--fields", default=None, metavar="COL[,COL...]",
                    help="multi-field build (query/multimatch.py): one "
                         "packed index PER named column under "
                         "<output>/fields/<name> over the SAME frame "
                         "(aligned docIDs, per-field statistics — the "
                         "ES/Lucene multi_match layout); serve with "
                         "jobs/search.py --multi-match. Excludes the "
                         "single-index payload/positional options")
    args = ap.parse_args()
    if args.fields and (args.positional or args.tfidf_sidecar
                        or args.payload != "freq" or args.resume
                        or args.iceberg_prefix):
        ap.error("--fields builds plain freq field indexes (no "
                 "--positional/--tfidf-sidecar/--payload/--resume/"
                 "--iceberg-prefix)")
    if args.output_format == "iceberg" and not args.iceberg_prefix:
        ap.error("--output-format iceberg requires --iceberg-prefix")
    if not args.synthetic and not args.input:
        ap.error("one of --input / --synthetic is required")

    from pyspark.sql import SparkSession

    from searchengine_spark.indexing.build import Bm25Params
    from searchengine_spark.indexing.packed import build_packed_index
    from searchengine_spark.tokenizer import TokenizerConfig

    spark = SparkSession.builder.appName("searchengine_spark.build_index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    cfg = TokenizerConfig(
        min_token_length=args.min_token_length,
        stop_words=TokenizerConfig.load_stop_words(args.stop_words)
        if args.stop_words
        else None,
        stem_lang=args.language,
    )
    params = Bm25Params(k=args.k, b=args.b)

    order_cols = ("conv_id", "turn_idx")
    if args.synthetic:
        from searchengine_spark.fixtures.transcripts import transcripts_distributed

        df = transcripts_distributed(spark, n_conv=args.synthetic)
    elif args.input_format == "tsv":
        from searchengine_spark.sources import read_tsv_docs

        df = read_tsv_docs(
            spark, args.input, args.tsv_doc_id_column, args.tsv_columns.split(",")
        )
        order_cols = ("ext_id",)
    else:
        from searchengine_spark.sources import read_transcripts

        df = read_transcripts(spark, args.input, fmt=args.input_format)

    if args.fields:
        import time

        from searchengine_spark.query.multimatch import build_field_indexes

        fields = [f.strip() for f in args.fields.split(",") if f.strip()]
        t0 = time.perf_counter()
        build_field_indexes(
            df, cfg, args.output, fields, params=params,
            order_cols=order_cols, chunk_docs=args.chunk_docs,
            n_partitions=args.partitions,
        )
        print(json.dumps({
            "fields": fields,
            "order_cols": list(order_cols),
            "build_seconds": round(time.perf_counter() - t0, 3),
        }))
        return

    manifest = build_packed_index(
        df,
        cfg,
        args.output,
        params=params,
        order_cols=order_cols,
        chunk_docs=args.chunk_docs,
        n_partitions=args.partitions,
        resume=args.resume,
        positional=args.positional,
        tfidf_sidecar=args.tfidf_sidecar,
        payload=args.payload,
    )
    if args.iceberg_prefix and args.output_format in ("auto", "iceberg"):
        from searchengine_spark.sources import publish_index_iceberg

        tables = publish_index_iceberg(spark, args.output, args.iceberg_prefix)
        manifest["iceberg_tables"] = tables
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
