"""Context-window expansion over conversation transcripts: for every
retrieved turn, attach the surrounding ±N turns of the SAME
conversation — the context-assembly step every transcript-RAG pipeline
runs between retrieval and prompting (a hit turn alone is rarely a
self-contained passage; its neighbors are).

Semantics (gated in tests/test_context.py):

- per hit, emit one row per existing conversation turn with
  ``turn_idx`` in [hit - n_before, hit + n_after] — missing neighbors
  (conversation edges) simply don't emit (no NULL padding rows);
- every context row carries its hit's (query_id, rank, hit turn_idx)
  plus ``offset`` = ctx_turn - hit_turn (0 = the hit itself), so
  downstream assembly can order and attribute;
- overlapping windows of DIFFERENT hits both emit their rows (a turn
  may serve two hits — deduplication is the prompt assembler's policy
  decision, not retrieval's).

Plan shape: hits are queries x k rows (broadcast-sized); the window is
a RANGE join ``corpus.conv_id = hit.conv_id AND corpus.turn_idx
BETWEEN hit.turn_idx - n_before AND hit.turn_idx + n_after`` — Spark
executes it as a broadcast + filtered scan of the corpus (no shuffle
of the big side), and conversation-coherent layouts (the sharded
build's partitionBy) prune further. Equivalently: the snippet-source
pattern (CLAUDE.md --snippet-source) generalized from the hit turn to
its neighborhood.

No reference counterpart (the reference returns ranked ids only);
this is the transcripts-payload analog of ES's highlighting
fetch-phase — enrich the hit page from the source table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_context_turns(
    hits: DataFrame,
    corpus: DataFrame,
    n_before: int = 1,
    n_after: int = 1,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    payload_cols: Sequence[str] = ("role", "text"),
) -> DataFrame:
    """-> (query_id, rank, conv_id, turn_idx, ctx_turn_idx, offset,
    *payload_cols): the ±window rows for every hit.

    ``hits``: a resolved result frame carrying query_id, rank and the
    conversation keys (resolve_docs output). ``corpus``: the source
    transcripts table."""
    if n_before < 0 or n_after < 0:
        raise ValueError("n_before/n_after must be >= 0")
    missing = [c for c in [conv_col, turn_col, *payload_cols]
               if c not in corpus.columns]
    if missing:
        raise ValueError(f"corpus lacks columns {missing}")
    h = hits.select(
        "query_id", "rank",
        F.col(conv_col).alias("_hc"),
        F.col(turn_col).cast("long").alias("_ht"),
    )
    c = corpus.select(
        F.col(conv_col).alias("_cc"),
        F.col(turn_col).cast("long").alias("_ct"),
        *payload_cols,
    )
    joined = c.join(
        F.broadcast(h),
        (F.col("_cc") == F.col("_hc"))
        & (F.col("_ct") >= F.col("_ht") - n_before)
        & (F.col("_ct") <= F.col("_ht") + n_after),
    )
    return joined.select(
        "query_id", "rank",
        F.col("_hc").alias(conv_col),
        F.col("_ht").alias(turn_col),
        F.col("_ct").alias("ctx_turn_idx"),
        (F.col("_ct") - F.col("_ht")).alias("offset"),
        *payload_cols,
    )
