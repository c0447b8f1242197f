"""Incremental (streaming) index maintenance over the packed index.

The reference is batch-only (SURVEY.md §2.5); this is our extension for a
continuously-arriving transcript corpus: Structured Streaming
(``availableNow`` trigger + checkpoint) feeds ``foreachBatch`` appends into
the packed index layout (indexing/packed.py).

Semantics (defined by us, recorded in the manifest):
- new docs get docIDs [n_docs, n_docs + batch) — dense rank within the
  batch on (conv_id, turn_idx), offset by the manifest count;
- ``avgdl`` is FROZEN at initial build: appended postings carry dlq
  computed against the frozen avgdl (standard practice for incremental
  IR indexes — a full rebuild re-normalizes);
- ``term_stats`` (df, idf) are recomputed EXACTLY from the full chunk
  table after each append (N grows, so idf shifts — scores stay exact
  w.r.t. the current corpus, unlike frozen-idf designs);
- appends may add a second row for an existing (term, chunk): the WAND
  scorer already concatenates same-chunk rows, and chunk upper bounds
  remain valid upper bounds.

Exactly-once: the streaming checkpoint dedups input batches; the append
itself writes new parquet files then flips the manifest last (same
commit-marker discipline as the batch build).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..indexing.build import Bm25Params
from ..indexing.packed import _encode_group, _stage_dirs, INDEX_SCHEMA
from ..tokenizer import TokenizerConfig, tokens_column
from ..indexing.docids import DOC_ID, with_doc_ids


def append_batch(
    batch: DataFrame,
    path: str,
    cfg: TokenizerConfig,
    text_col: str = "text",
    order_cols=("conv_id", "turn_idx"),
) -> dict:
    """Append one micro-batch of transcript rows to the packed index at
    ``path``; returns the updated manifest."""
    spark = batch.sparkSession
    dirs = _stage_dirs(path)
    manifest = json.load(open(dirs["manifest"]))
    if manifest.get("positional"):
        # _encode_group writes positions=None; appending it to a positional
        # index would silently corrupt positional serving (bytes(None)).
        raise NotImplementedError(
            "streaming append into a positional index is not supported; "
            "rebuild, or build the index with positional=False"
        )
    offset = int(manifest["n_docs"])
    avgdl = float(manifest["avgdl"])  # frozen (module docstring)
    chunk_docs = int(manifest["chunk_docs"])
    params = Bm25Params(k=manifest["k"], b=manifest["b"])

    docs = with_doc_ids(batch, order_cols=order_cols)
    docs = docs.withColumn(DOC_ID, F.col(DOC_ID) + offset)
    docs = docs.withColumn("tokens", tokens_column(F.col(text_col), cfg))
    docs = docs.withColumn("dl", F.size("tokens").cast("long"))
    docs = docs.withColumn(
        "dlq", F.round(F.round(F.col("dl") / F.lit(avgdl), 3) * 1000.0).cast("long")
    ).persist()
    n_new = docs.count()
    if n_new == 0:
        return manifest

    tok = docs.select(DOC_ID, "dlq", F.explode("tokens").alias("term"))
    tf = tok.groupBy("term", DOC_ID, "dlq").agg(F.count("*").alias("tf"))
    tf = tf.withColumn("chunk", (F.col(DOC_ID) / chunk_docs).cast("long"))
    chunks = tf.groupBy("term", "chunk").applyInPandas(
        _encode_group(params), schema=INDEX_SCHEMA
    )
    chunks.write.mode("append").parquet(dirs["index"])
    docs.select(DOC_ID, *order_cols).write.mode("append").parquet(dirs["docmap"])
    # streaming lineage sidecar: per-append doc ranges + counts
    (
        docs.groupBy()
        .agg(
            F.count("*").alias("n_rows"),
            F.min(DOC_ID).alias("min_doc"),
            F.max(DOC_ID).alias("max_doc"),
            F.sum("dl").alias("n_tokens"),
        )
        .withColumn("stage", F.lit("stream_append"))
        .write.mode("append")
        .parquet(os.path.join(path, "lineage_stream"))
    )
    docs.unpersist()

    # exact df/idf recompute over the grown corpus (atomic dir swap)
    n_docs = offset + n_new
    index = spark.read.parquet(dirs["index"])
    ts = index.groupBy("term").agg(F.sum("df_chunk").alias("df"))
    ts = ts.withColumn("idf", F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 3))
    tmp = dirs["term_stats"] + "_tmp_" + uuid.uuid4().hex[:8]
    ts.coalesce(8).write.mode("overwrite").parquet(tmp)
    old = dirs["term_stats"]
    back = old + "_old"
    shutil.rmtree(back, ignore_errors=True)
    os.rename(old, back)
    os.rename(tmp, old)
    shutil.rmtree(back, ignore_errors=True)

    manifest["n_docs"] = n_docs
    manifest["n_postings"] = int(
        index.agg(F.sum("df_chunk")).collect()[0][0]
    )
    manifest.setdefault("appends", []).append({"n_new": n_new})
    with open(dirs["manifest"], "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def stream_append(
    spark: SparkSession,
    input_dir: str,
    path: str,
    cfg: TokenizerConfig,
    schema=None,
    text_col: str = "text",
    order_cols=("conv_id", "turn_idx"),
) -> None:
    """availableNow-run a parquet-directory stream of transcript rows into
    the packed index; the checkpoint (inside the index dir) makes re-runs
    no-ops until new files arrive."""
    if schema is None:
        from ..fixtures.transcripts import TRANSCRIPTS_SCHEMA

        schema = TRANSCRIPTS_SCHEMA
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        append_batch(batch, path, cfg, text_col=text_col, order_cols=order_cols)

    (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(path, "stream_checkpoint"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
