"""Packed (M2) index: SPIMI re-expressed as Spark stages, compressed postings.

Reference pipeline being re-expressed (NOT ported): SPIMI block build + k-way
merge (/root/reference/src/models/spimi.py:76-209) producing a sorted
term->postings file with idf sidecar and per-doc dl_norm footer
(src/models/spimi.py:211-271). Here each piece becomes a Spark stage whose
shuffle IS the merge:

  stage docs   : input -> dense docIDs (two-pass, docids.py) + dl + dlq
                 (dlq = round(dl_norm*1000), lossless 3-dp quantization)
  stage index  : explode tokens -> groupBy(term, doc_id) [map-side combine]
                 -> groupBy(term, chunk) applyInPandas varbyte-encode
                 chunk = doc_id // chunk_docs: a term's postings are split
                 into doc-range chunks, so no posting list is ever
                 materialized whole — the hot-term (stop-word-like) skew that
                 would blow a collect_list is bounded by chunk_docs. Chunks
                 double as WAND blocks: (first_doc, last_doc, max_tfsat) per
                 chunk is exact block-max metadata (Ding & Suel 2011).
  stage stats  : term_stats (df, idf=round(ln(N/df),3)) from chunk counts
  stage docmap : doc_id -> (conv_id, turn_idx) resolve table

Each stage writes Parquet + Spark's _SUCCESS marker; ``resume=True`` skips
completed stages (checkpoint-resumable, north_rule). ``lineage`` records
per-partition row counts and doc ranges; ``manifest.json`` (written LAST =
commit marker) records scalars, config, per-stage wall times and throughput.

On a real cluster the same code ships via spark-submit --py-files
(jobs/build_index.py); paths may be any Hadoop-FS URI.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tokenizer import TokenizerConfig, tokens_column
from .build import Bm25Params
from .codec import encode_postings, tf_saturation
from .docids import DOC_ID, with_doc_ids

DEFAULT_CHUNK_DOCS = 1 << 16  # postings chunk = 65536-doc range

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("chunk", T.LongType(), False),
        T.StructField("df_chunk", T.LongType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("max_tfsat", T.DoubleType(), False),
        T.StructField("postings", T.BinaryType(), False),
        T.StructField("positions", T.BinaryType(), True),  # positional mode only
    ]
)


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _stage_dirs(path: str) -> dict:
    return {
        "docs": os.path.join(path, "docs"),
        "index": os.path.join(path, "index"),
        "term_stats": os.path.join(path, "term_stats"),
        "docmap": os.path.join(path, "docmap"),
        "lineage": os.path.join(path, "lineage"),
        "lineage_index": os.path.join(path, "lineage_index"),
        "manifest": os.path.join(path, "manifest.json"),
        "state": os.path.join(path, "build_state.json"),
    }


def _encode_group(params: Bm25Params):
    """Per-(term, chunk) encoder for applyInPandas — used by the streaming
    append path where batches are small. The bulk build uses the vectorized
    partition encoder below (_encode_partition)."""
    k, b = float(params.k), float(params.b)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dlqs = pdf["dlq"].to_numpy(np.int64)
        dl_norm = dlqs.astype(np.float64) / 1000.0
        sat = tf_saturation(tfs, dl_norm, k, b)
        buf = encode_postings(doc_ids, tfs, dlqs)
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "chunk": [int(pdf["chunk"].iloc[0])],
                "df_chunk": [len(doc_ids)],
                "first_doc": [int(doc_ids[0])],
                "last_doc": [int(doc_ids[-1])],
                "max_tfsat": [float(sat.max())],
                "postings": [buf],
                "positions": [None],
            }
        )

    return encode


def _encode_partition(params: Bm25Params, chunk_docs: int = 0, positional: bool = False):
    """Partition-level encoder: input batches are (term, chunk, doc_id)-
    sorted within the partition; groups may straddle Arrow batch
    boundaries, so the trailing (possibly incomplete) group of each batch
    is carried into the next. ONE vectorized varbyte pass per batch
    (codec.encode_posting_groups) instead of one Python call per (term,
    chunk) group — the difference between O(batch) and O(n_terms) Python
    overhead in the build hot path."""
    k, b = float(params.k), float(params.b)

    def encode(batches):
        import numpy as np

        leftover: pd.DataFrame | None = None

        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            n = len(pdf)
            terms = pdf["term"].to_numpy()
            doc_ids = pdf["doc_id"].to_numpy(np.int64)
            # chunk derived from doc_id (monotone) — not shuffled as a column
            chunks = (
                pdf["chunk"].to_numpy(np.int64)
                if "chunk" in pdf.columns
                else doc_ids // chunk_docs
            )
            dlqs = pdf["dlq"].to_numpy(np.int64)
            w = (
                pdf["tf"].to_numpy(np.int64)
                if "tf" in pdf.columns
                else np.ones(n, dtype=np.int64)
            )
            # posting run boundaries: (term, chunk, doc) changes — raw token
            # occurrences compress to (posting, tf=run weight) right here,
            # which is what lets the build skip the pre-agg shuffle entirely
            newp = np.empty(n, dtype=bool)
            newp[0] = True
            newp[1:] = (
                (terms[1:] != terms[:-1])
                | (chunks[1:] != chunks[:-1])
                | (doc_ids[1:] != doc_ids[:-1])
            )
            pstarts = np.flatnonzero(newp)
            tfs = np.add.reduceat(w, pstarts)
            cterms = terms[pstarts]
            cchunks = chunks[pstarts]
            cdocs = doc_ids[pstarts]
            cdlqs = dlqs[pstarts]
            # group boundaries in compressed posting space
            m = len(pstarts)
            newg = np.empty(m, dtype=bool)
            newg[0] = True
            newg[1:] = (cterms[1:] != cterms[:-1]) | (cchunks[1:] != cchunks[:-1])
            starts = np.flatnonzero(newg)
            from .codec import encode_posting_groups, encode_position_groups

            buffers, first, last, counts = encode_posting_groups(
                starts, cdocs, tfs, cdlqs
            )
            if positional:
                pos_bufs = encode_position_groups(
                    pstarts[starts], pstarts, pdf["pos"].to_numpy(np.int64)
                )
            else:
                pos_bufs = None
            sat = tf_saturation(tfs, cdlqs.astype(np.float64) / 1000.0, k, b)
            max_sat = np.maximum.reduceat(sat, starts)
            return pd.DataFrame(
                {
                    "term": cterms[starts],
                    "chunk": cchunks[starts],
                    "df_chunk": counts,
                    "first_doc": first,
                    "last_doc": last,
                    "max_tfsat": max_sat,
                    "postings": buffers,
                    "positions": pos_bufs,
                }
            )

        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
                leftover = None
            if len(pdf) == 0:
                continue
            chunk_col = (
                pdf["chunk"].to_numpy(np.int64)
                if "chunk" in pdf.columns
                else pdf["doc_id"].to_numpy(np.int64) // chunk_docs
            )
            lt = pdf["term"].iloc[-1]
            lc = chunk_col[-1]
            tail = (pdf["term"].to_numpy() == lt) & (chunk_col == int(lc))
            run = int(np.cumprod(tail[::-1]).sum())  # trailing-run length
            cut = len(pdf) - run
            if cut > 0:
                yield emit(pdf.iloc[:cut])
            leftover = pdf.iloc[cut:].copy()
        if leftover is not None and len(leftover):
            yield emit(leftover)

    return encode


def build_packed_index(
    transcripts: DataFrame,
    cfg: TokenizerConfig,
    path: str,
    params: Bm25Params = Bm25Params(),
    text_col: str = "text",
    order_cols=("conv_id", "turn_idx"),
    chunk_docs: int = DEFAULT_CHUNK_DOCS,
    n_partitions: Optional[int] = None,
    resume: bool = False,
    positional: bool = False,
) -> dict:
    """Build the packed index at ``path``; returns the manifest dict."""
    spark = transcripts.sparkSession
    dirs = _stage_dirs(path)
    metrics: dict = {"stages": {}}

    # ---- stage docs: dense docIDs + lengths -------------------------------
    t0 = time.perf_counter()
    if not (resume and _done(dirs["docs"]) and os.path.exists(dirs["state"])):
        docs = with_doc_ids(transcripts, order_cols=order_cols, n_partitions=n_partitions)
        docs = docs.withColumn("tokens", tokens_column(F.col(text_col), cfg))
        docs = docs.withColumn("dl", F.size("tokens").cast("long"))
        docs = docs.select(DOC_ID, *order_cols, text_col, "dl").persist()
        row = docs.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
        n_docs, avgdl = int(row["n"]), float(row["avgdl"])
        # dlq = round(dl/avgdl, 3)*1000 — integerized EXACTLY like the stored
        # footer value (bm25.py:76-81): round-half-even on the double, then *1000
        docs = docs.withColumn(
            "dlq", F.round(F.round(F.col("dl") / F.lit(avgdl), 3) * 1000.0).cast("long")
        )
        docs.write.mode("overwrite").parquet(dirs["docs"])
        docs.unpersist()
        with open(dirs["state"], "w") as fh:
            json.dump({"n_docs": n_docs, "avgdl": avgdl}, fh)
    state = json.load(open(dirs["state"]))
    n_docs, avgdl = state["n_docs"], state["avgdl"]
    metrics["stages"]["docs"] = time.perf_counter() - t0

    docs = spark.read.parquet(dirs["docs"])

    # ---- stage lineage: per-partition counts + doc ranges -----------------
    t0 = time.perf_counter()
    if not (resume and _done(dirs["lineage"])):
        lineage = (
            docs.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(
                F.count("*").alias("n_rows"),
                F.min(DOC_ID).alias("min_doc"),
                F.max(DOC_ID).alias("max_doc"),
                F.sum("dl").alias("n_tokens"),
                F.min("dlq").alias("min_dlq"),
                F.max("dlq").alias("max_dlq"),
            )
            .withColumn("stage", F.lit("docs"))
        )
        lineage.write.mode("overwrite").parquet(dirs["lineage"])
    metrics["stages"]["lineage"] = time.perf_counter() - t0

    # ---- stage index: explode -> tf -> chunked varbyte postings -----------
    t0 = time.perf_counter()
    if not (resume and _done(dirs["index"])):
        if positional:
            tok = docs.select(
                DOC_ID,
                "dlq",
                F.posexplode(tokens_column(F.col(text_col), cfg)).alias("pos", "term"),
            )
        else:
            tok = docs.select(
                DOC_ID, "dlq", F.explode(tokens_column(F.col(text_col), cfg)).alias("term")
            )
        # ONE shuffle: raw token occurrences range-partitioned + sorted by
        # (term, doc_id) — chunk is monotone in doc_id so this order equals
        # (term, chunk, doc_id), and the encoder derives chunk itself (one
        # fewer shuffled column). tf comes out as run lengths, so no
        # (term, doc) pre-agg exchange is needed. The range layout doubles
        # as the merged, sorted on-disk index (spimi.py:211-236 analog);
        # min/max parquet stats on `term` then give point-lookup pruning
        # like the reference's binary search (index.py:93-131).
        sort_cols = ["term", DOC_ID] + (["pos"] if positional else [])
        sorted_tok = tok.repartitionByRange("term", DOC_ID).sortWithinPartitions(
            *sort_cols
        )
        chunks = sorted_tok.mapInPandas(
            _encode_partition(params, chunk_docs, positional), schema=INDEX_SCHEMA
        )
        chunks.write.mode("overwrite").parquet(dirs["index"])
    metrics["stages"]["index"] = time.perf_counter() - t0

    index = spark.read.parquet(dirs["index"])

    # ---- index-stage segment lineage: per-output-file (== per encode
    # partition) metrics — postings written, segment sizes, term ranges
    # (north_rule: per-partition lineage and metrics) --------------------
    t0 = time.perf_counter()
    if not (resume and _done(dirs["lineage_index"])):
        (
            index.withColumn("file", F.input_file_name())
            .groupBy("file")
            .agg(
                F.countDistinct("term").alias("n_terms"),
                F.count("*").alias("n_chunks"),
                F.sum("df_chunk").alias("n_postings"),
                F.sum(F.length("postings")).alias("postings_bytes"),
                F.min("term").alias("term_lo"),
                F.max("term").alias("term_hi"),
            )
            .withColumn("stage", F.lit("index"))
            .write.mode("overwrite")
            .parquet(dirs["lineage_index"])
        )
    metrics["stages"]["lineage_index"] = time.perf_counter() - t0

    # ---- stage stats: df/idf sidecar (the '.tiny', spimi.py:233-242) ------
    t0 = time.perf_counter()
    if not (resume and _done(dirs["term_stats"])):
        ts = index.groupBy("term").agg(F.sum("df_chunk").alias("df"))
        ts = ts.withColumn(
            "idf", F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 3)
        )
        ts.coalesce(8).write.mode("overwrite").parquet(dirs["term_stats"])
    metrics["stages"]["term_stats"] = time.perf_counter() - t0

    # ---- stage docmap ------------------------------------------------------
    t0 = time.perf_counter()
    if not (resume and _done(dirs["docmap"])):
        docs.select(DOC_ID, *order_cols).write.mode("overwrite").parquet(dirs["docmap"])
    metrics["stages"]["docmap"] = time.perf_counter() - t0

    # ---- manifest = commit marker (written last) ---------------------------
    n_chunks, n_postings, n_terms = (
        index.agg(
            F.count("*"), F.sum("df_chunk"), F.countDistinct("term")
        ).collect()[0]
    )
    build_s = sum(metrics["stages"].values())
    conf = spark.conf
    lin = spark.read.parquet(dirs["lineage"])
    dl_row = lin.agg(F.min("min_dlq"), F.max("max_dlq")).collect()[0]
    manifest = {
        "format": "searchengine_spark.packed/1",
        "positional": positional,
        "dl_norm_min": (dl_row[0] or 0) / 1000.0,
        "dl_norm_max": (dl_row[1] or 0) / 1000.0,
        "spark_conf": {
            "shuffle_partitions": conf.get("spark.sql.shuffle.partitions", None),
            "adaptive_enabled": conf.get("spark.sql.adaptive.enabled", None),
            "skew_join_enabled": conf.get(
                "spark.sql.adaptive.skewJoin.enabled", None
            ),
            "default_parallelism": spark.sparkContext.defaultParallelism,
        },
        "n_docs": n_docs,
        "avgdl": avgdl,
        "k": params.k,
        "b": params.b,
        "chunk_docs": chunk_docs,
        "tokenizer": cfg.to_manifest(),
        "order_cols": list(order_cols),
        "n_terms": int(n_terms),
        "n_chunks": int(n_chunks),
        "n_postings": int(n_postings),
        "metrics": {
            "stage_seconds": {s: round(v, 3) for s, v in metrics["stages"].items()},
            "build_seconds": round(build_s, 3),
            "docs_per_sec": round(n_docs / max(build_s, 1e-9), 1),
            "postings_per_sec": round(int(n_postings) / max(build_s, 1e-9), 1),
        },
    }
    with open(dirs["manifest"], "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


class PackedIndex:
    """Handle over an on-disk packed index (lazy DataFrames + manifest)."""

    def __init__(self, spark: SparkSession, path: str):
        dirs = _stage_dirs(path)
        if not os.path.exists(dirs["manifest"]):
            raise FileNotFoundError(f"no committed index at {path} (manifest.json missing)")
        self.path = path
        self.manifest = json.load(open(dirs["manifest"]))
        self.index = spark.read.parquet(dirs["index"])
        self.term_stats = spark.read.parquet(dirs["term_stats"])
        self.docmap = spark.read.parquet(dirs["docmap"])
        self.spark = spark

    @property
    def params(self) -> Bm25Params:
        return Bm25Params(k=self.manifest["k"], b=self.manifest["b"])


def load_packed_index(spark: SparkSession, path: str) -> PackedIndex:
    return PackedIndex(spark, path)


def exploded_view(pidx: PackedIndex, include_positions: bool = False) -> DataFrame:
    """Decode the packed index back to (term, doc_id, tf, dl_norm
    [, positions]) rows — the uncompressed test view (SURVEY.md §1.3);
    gates M2 ≡ M1. ``include_positions`` requires a positional build and
    emits the comma-joined string form ('doc:pos1,pos2,…' payloads,
    positional_posting_list.py:50-51)."""
    fields = [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dl_norm", T.DoubleType(), False),
    ]
    if include_positions:
        fields.append(T.StructField("positions", T.StringType(), False))
    out_schema = T.StructType(fields)

    def decode(batches: Iterable[pd.DataFrame]):
        from .codec import decode_positions, decode_postings

        for pdf in batches:
            frames = []
            for i, (term, buf) in enumerate(zip(pdf["term"], pdf["postings"])):
                doc_ids, tfs, dl_norm = decode_postings(bytes(buf))
                cols = {"term": term, "doc_id": doc_ids, "tf": tfs, "dl_norm": dl_norm}
                if include_positions:
                    flat, occ_starts = decode_positions(
                        bytes(pdf["positions"].iloc[i]), tfs
                    )
                    ends = list(occ_starts[1:]) + [len(flat)]
                    cols["positions"] = [
                        ",".join(map(str, flat[s:e]))
                        for s, e in zip(occ_starts, ends)
                    ]
                frames.append(pd.DataFrame(cols))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return pidx.index.mapInPandas(decode, schema=out_schema)
