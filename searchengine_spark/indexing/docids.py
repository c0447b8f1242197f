"""Dense docID assignment, scale-safe.

Reference analog: a monotonic counter in parse order (src/indexer.py:39,49-53)
— docIDs are dense ints 0..N-1 decoupled from the external id, with the
mapping written out separately (src/indexer.py:52). Our global order is the
stable (conv_id, turn_idx) sort (BASELINE.json input_hint).

A single global ``row_number()`` window has no partition key -> one task at
scale, so the production path is the classic two-pass dense rank:

  1. ``repartitionByRange(order_cols)`` + ``sortWithinPartitions`` — globally
     range-ordered partitions, each internally sorted (persisted so the two
     downstream jobs see identical range bounds);
  2. tiny job: per-partition row counts -> exclusive prefix-sum offsets
     (driver-side, O(#partitions));
  3. pure-JVM assignment: ``monotonically_increasing_id`` encodes
     (partition_id << 33) | row_index_in_partition, so the low 33 bits are
     the local position in sorted order; doc_id = offset[pid] + local.
     The offset lookup is a literal ``create_map`` (O(#partitions) entries)
     — the whole step stays inside whole-stage codegen, no Arrow transfer
     of the (text-heavy) rows.

Note the final docIDs do not depend on where the sampled range bounds fall:
partitions are globally ordered and offsets are cumulative counts, so the
id of a row is always its global sort rank. ``with_doc_ids_window`` is the
window-based small-scale twin used by tests to prove equivalence.
"""

from __future__ import annotations

from typing import Iterable, Sequence

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
    if not counts:  # empty input
        out = part.drop("_pid").withColumn(DOC_ID, F.lit(0).cast("long"))
        out._se_persisted = part  # type: ignore[attr-defined]
        return out
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    # monotonically_increasing_id == (partition_id << 33) | local_row_index;
    # rows were just sorted within partitions, so local index == sorted pos
    offset_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    local = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    out = (
        part.withColumn(
            DOC_ID, (offset_map[F.col("_pid")] + local).cast("long")
        ).drop("_pid")
    )
    # the persist above is load-bearing (stable range bounds across the two
    # passes) but must be releasable by callers once ids are materialized —
    # expose the handle for unpersist_doc_ids()
    out._se_persisted = part  # type: ignore[attr-defined]
    return out


def unpersist_doc_ids(df: DataFrame) -> None:
    """Release the internal persist created by :func:`with_doc_ids`. Call
    after the id-carrying rows are materialized (e.g. written to parquet);
    no-op for DataFrames without the handle.

    The handle lives as a Python attribute on the exact DataFrame object
    ``with_doc_ids`` returned — any ``withColumn``/``select`` creates a NEW
    object without it, silently turning this into a no-op (a real leak we
    shipped once). Either call this on the untransformed return value, or
    thread the handle through derivations with :func:`carry_doc_id_handle`.
    (``df.persist()`` returns ``self``, so it does NOT drop the handle.)
    """
    part = getattr(df, "_se_persisted", None)
    if part is not None:
        part.unpersist()
        df._se_persisted = None  # type: ignore[attr-defined]


def carry_doc_id_handle(src: DataFrame, out: DataFrame) -> DataFrame:
    """Propagate the :func:`with_doc_ids` persist handle from ``src`` onto a
    derived DataFrame ``out`` so ``unpersist_doc_ids(out)`` still releases
    it after ``withColumn``/``select`` chains."""
    part = getattr(src, "_se_persisted", None)
    if part is not None:
        out._se_persisted = part  # type: ignore[attr-defined]
    return out


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
