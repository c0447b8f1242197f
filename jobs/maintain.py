#!/usr/bin/env python3
"""spark-submit entrypoint: packed-index maintenance — append, delete,
compact. The lifecycle half the batch-only reference lacks (its answer to
new/removed documents is a rebuild; SURVEY.md §2.5).

    zip -r searchengine_spark.zip searchengine_spark
    spark-submit --py-files searchengine_spark.zip jobs/maintain.py \\
        --index <index path> \\
        [--append <parquet dir of new transcript rows> [--stream]] \\
        [--delete-where "conv_id = 'conv123'" | --delete-ids 7,9,12] \\
        [--compact | --compact-if-debt N]

Actions run in the argument order shown (append -> delete -> compact);
each is exactly-once on retry (epoch/version-keyed; see
streaming/incremental.py and indexing/deletes.py). ``--compact-if-debt N``
compacts only when appends+deletes ledgers hold >= N entries — the knob a
scheduled maintenance job uses so small indexes aren't churned.

Prints the final manifest JSON (ledgers, live counts, compaction version)
— the driver-side contract for orchestration systems.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="packed index path")
    ap.add_argument("--append", default=None,
                    help="parquet dir of new transcript rows to append")
    ap.add_argument("--stream", action="store_true",
                    help="append via Structured Streaming availableNow "
                         "(checkpointed: re-runs no-op until new files "
                         "arrive); default is one batch append")
    ap.add_argument("--batch-id", type=int, default=None,
                    help="epoch id for a non-stream append (default: next)")
    ap.add_argument("--adopt", default=None,
                    help="finished shard INDEX path to append as one epoch "
                         "(O(shard): only its docs stage is read, its "
                         "tombstones fold; indexing/merge.py)")
    ap.add_argument("--delete-where", default=None,
                    help="SQL predicate over the docs stage "
                         "(doc_id, *order_cols, dl)")
    ap.add_argument("--delete-ids", default=None,
                    help="comma-separated internal docIDs to tombstone")
    ap.add_argument("--reindex-where", default=None, metavar="PRED",
                    help="ES _reindex-with-query analog: carve the live "
                         "docs matching PRED (SQL over doc_id, order_cols, "
                         "dl) into a NEW index at --reindex-output — "
                         "stored token streams, never re-tokenizes, "
                         "bit-identical to a fresh build over the "
                         "filtered corpus; tombstones fold")
    ap.add_argument("--reindex-output", default=None,
                    help="destination index dir for --reindex-where")
    ap.add_argument("--compact", action="store_true",
                    help="fold epochs + tombstones into a fresh base")
    ap.add_argument("--compact-if-debt", type=int, default=None, metavar="N",
                    help="compact only when len(appends)+len(deletes) >= N")
    ap.add_argument("--partitions", type=int, default=None,
                    help="range partitions for the compaction re-encode")
    ap.add_argument("--fsck", action="store_true",
                    help="verify index integrity after the actions "
                         "(metadata-level; exits 1 on corruption)")
    ap.add_argument("--fsck-deep", action="store_true",
                    help="fsck + decode every posting row (full-scan cost)")
    ap.add_argument("--stats", action="store_true",
                    help="print a JSON index report: manifest rollup, "
                         "per-stage lineage totals, epoch/tombstone "
                         "ledgers, available snapshots (tiny-sidecar "
                         "reads only — never scans postings)")
    ap.add_argument("--attrs-sidecar", default=None, metavar="COLS",
                    help="comma-separated attribute columns to "
                         "denormalize into the doc_attrs sidecar "
                         "(indexing/attrs.py) — search.py --sort/--decay/"
                         "--fvf then serve them with zero attrs-side "
                         "shuffle (omit --attrs there); needs "
                         "--attrs-table")
    ap.add_argument("--attrs-table", default=None, metavar="PARQUET",
                    help="attribute table (parquet) keyed by the index's "
                         "order_cols, source for --attrs-sidecar")
    args = ap.parse_args()
    if bool(args.attrs_sidecar) != bool(args.attrs_table):
        ap.error("--attrs-sidecar and --attrs-table go together")
    if args.delete_where and args.delete_ids:
        ap.error("pass at most one of --delete-where / --delete-ids")
    if args.append and args.adopt:
        ap.error("pass at most one of --append / --adopt per run")
    if not any((args.append, args.adopt, args.delete_where, args.delete_ids,
                args.reindex_where,
                args.compact, args.compact_if_debt is not None,
                args.fsck, args.fsck_deep, args.stats,
                args.attrs_sidecar)):
        ap.error("nothing to do: pass --append / --adopt / --delete-* / "
                 "--compact / --fsck / --stats / --attrs-sidecar")

    from pyspark.sql import SparkSession

    from searchengine_spark.indexing import fsio
    from searchengine_spark.tokenizer import TokenizerConfig

    spark = SparkSession.builder.appName("searchengine_spark.maintain").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    manifest = json.loads(
        fsio.read_text(spark, fsio.join(args.index, "manifest.json"))
    )
    # build/query tokenizer parity: the manifest is the single source of
    # truth for appends (same rule jobs/search.py applies)
    cfg = TokenizerConfig.from_manifest(manifest.get("tokenizer", {}))

    if args.append:
        if args.stream:
            from searchengine_spark.streaming.incremental import stream_append

            stream_append(spark, args.append, args.index, cfg)
        else:
            from searchengine_spark.streaming.incremental import append_batch

            batch_id = args.batch_id
            if batch_id is None:
                # append_seq survives compactions (which clear the ledger
                # while epoch dirs await group GC) — never restart at 0
                used = {a["batch_id"] for a in manifest.get("appends", [])}
                batch_id = max(
                    int(manifest.get("append_seq", 0)),
                    max(used) + 1 if used else 0,
                )
            append_batch(
                spark.read.parquet(args.append), args.index, cfg,
                batch_id=batch_id,
            )

    if args.adopt:
        from searchengine_spark.indexing.merge import adopt_shard_index

        adopt_shard_index(spark, args.index, args.adopt,
                          batch_id=args.batch_id)

    if args.delete_where or args.delete_ids:
        from searchengine_spark.indexing.deletes import delete_docs

        delete_docs(
            spark,
            args.index,
            where=args.delete_where,
            doc_ids=[int(x) for x in args.delete_ids.split(",")]
            if args.delete_ids
            else None,
        )

    manifest = json.loads(
        fsio.read_text(spark, fsio.join(args.index, "manifest.json"))
    )
    debt = len(manifest.get("appends", [])) + len(manifest.get("deletes", []))
    if args.reindex_where:
        from searchengine_spark.indexing.merge import reindex_filtered

        if not args.reindex_output:
            raise SystemExit("--reindex-where needs --reindex-output")
        new_man = reindex_filtered(
            spark, args.index, args.reindex_output, args.reindex_where,
            n_partitions=args.partitions,
        )
        print(json.dumps({"reindexed": args.reindex_output,
                          "n_docs": new_man["n_docs"]}))
    if args.compact or (
        args.compact_if_debt is not None and debt >= args.compact_if_debt
    ):
        from searchengine_spark.indexing.compact import compact_index

        manifest = compact_index(
            spark, args.index, n_partitions=args.partitions, force=args.compact
        )
    if args.attrs_sidecar:
        from searchengine_spark.indexing.attrs import write_attrs_sidecar
        from searchengine_spark.indexing.packed import load_packed_index

        cols = [c for c in args.attrs_sidecar.split(",") if c]
        aman = write_attrs_sidecar(
            load_packed_index(spark, args.index),
            spark.read.parquet(args.attrs_table), cols,
            n_partitions=args.partitions)
        print(json.dumps({"attrs_sidecar": aman}))
    if args.fsck or args.fsck_deep:
        from searchengine_spark.indexing.fsck import verify_index

        report = verify_index(spark, args.index, deep=args.fsck_deep)
        manifest = dict(manifest)
        manifest["fsck"] = report
        if not report["ok"]:
            print(json.dumps(manifest))
            sys.exit(1)
    if args.stats:
        from pyspark.sql import functions as F

        manifest = dict(manifest)
        lineage = spark.read.parquet(fsio.join(args.index, "lineage"))
        rollup = {
            r["stage"]: {
                "files": int(r["files"]), "rows": int(r["rows"]),
                "min_doc": int(r["min_doc"]), "max_doc": int(r["max_doc"]),
            }
            for r in lineage.groupBy("stage").agg(
                F.count(F.lit(1)).alias("files"),
                F.sum("n_rows").alias("rows"),
                F.min("min_doc").alias("min_doc"),
                F.max("max_doc").alias("max_doc"),
            ).collect()
        }
        idx_lineage = fsio.join(args.index, "lineage_index")
        if fsio.exists(spark, idx_lineage):
            for r in (
                spark.read.parquet(idx_lineage).groupBy("stage").agg(
                    F.count(F.lit(1)).alias("files"),
                    F.sum("n_postings").alias("postings"),
                    F.sum("n_chunks").alias("chunk_rows"),
                    F.sum("postings_bytes").alias("postings_bytes"),
                ).collect()
            ):
                rollup[r["stage"]] = {
                    "files": int(r["files"]),
                    "postings": int(r["postings"]),
                    "chunk_rows": int(r["chunk_rows"]),
                    "postings_bytes": int(r["postings_bytes"]),
                }
        # snapshots are numbered 0..snapshot_seq-1; expired ones raise at
        # load time (delayed-GC retention), the ledger lists what EXISTS
        snapshots = [
            s for s in range(int(manifest.get("snapshot_seq", 0)))
            if fsio.exists(spark, fsio.join(args.index, "snapshots", f"{s}.json"))
        ]
        manifest["stats"] = {
            "lineage": rollup,
            "append_epochs": [a["batch_id"] for a in manifest.get("appends", [])],
            "pending_tombstones": sum(
                int(d.get("n_docs", 0)) for d in manifest.get("deletes", [])
            ),
            "snapshots": snapshots,
        }
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
