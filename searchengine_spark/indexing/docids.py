"""Dense docID assignment, scale-safe.

Reference analog: a monotonic counter in parse order (src/indexer.py:39,49-53)
— docIDs are dense ints 0..N-1 decoupled from the external id, with the
mapping written out separately (src/indexer.py:52). Our global order is the
stable (conv_id, turn_idx) sort (BASELINE.json input_hint).

A single global ``row_number()`` window has no partition key -> one task at
scale, so the production path is the classic two-pass dense rank:

  1. ``repartitionByRange(order_cols)`` + ``sortWithinPartitions`` — globally
     range-ordered partitions, each internally sorted;
  2. tiny job: per-partition row counts -> exclusive prefix-sum offsets
     (driver-side, O(#partitions));
  3. ``mapInPandas``: doc_id = offset[pid] + local position (order inside a
     partition is preserved batch-to-batch).

Every step is per-partition work + one O(#partitions) collect — this is the
same plan Spark uses for ``zipWithIndex`` but stays in DataFrame/Arrow land.
``with_doc_ids_window`` is the window-based small-scale twin used by tests to
prove equivalence.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOC_ID = "doc_id"


def with_doc_ids(
    df: DataFrame,
    order_cols: Sequence[str] = ("conv_id", "turn_idx"),
    n_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 0-based ``doc_id`` = rank in global ``order_cols`` order."""
    cols = [F.col(c) for c in order_cols]
    if n_partitions:
        ranged = df.repartitionByRange(n_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    part = (
        ranged.sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["cnt"] for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    # NB: StructType.add mutates (and df.schema is cached) — build a fresh
    # StructType so repeated with_doc_ids on one DataFrame stays correct
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(DOC_ID, T.LongType(), False)]
    )
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(offsets)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = bc.value[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[DOC_ID] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    return part.mapInPandas(assign, schema=out_schema)


def with_doc_ids_window(
    df: DataFrame, order_cols: Sequence[str] = ("conv_id", "turn_idx")
) -> DataFrame:
    """Small-scale twin: global row_number window (single-task; tests only)."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(DOC_ID, F.row_number().over(w).cast("long") - 1)


def docmap(df_with_ids: DataFrame, order_cols: Iterable[str] = ("conv_id", "turn_idx")) -> DataFrame:
    """docID -> external id mapping table (reference: cache/mappings lines
    '{counter} {external_id}', src/indexer.py:52)."""
    return df_with_ids.select(DOC_ID, *order_cols)
