"""Per-document sliding-window chunking with overlap — the RAG /
embedding-prep operator (split long docs into fixed-token windows with
a stride, so neighboring chunks share ``max_tokens - stride`` tokens of
context). The third member of the splitting family:

- textops/packing.py ``chunk`` mode: CROSS-doc concat-and-chunk (GPT
  pretraining — windows straddle doc boundaries);
- textops/packing.py ``greedy``: no-split bin packing;
- THIS: within-doc windows, never crossing a doc boundary — the shape
  retrieval corpora want (a chunk is a self-contained passage of one
  document).

Chunk-boundary contract (deterministic, integer-only, gated in
tests/test_chunking.py):

- ``n <= max_tokens``  ->  ONE chunk [0, n);
- else ``n_chunks = 1 + ceil((n - max_tokens) / stride)``, chunk ``i``
  spans ``[i*stride, min(i*stride + max_tokens, n))`` — so every token
  is covered, every chunk is <= max_tokens, consecutive chunks overlap
  by exactly ``max_tokens - stride`` (the final chunk ends at n and may
  simply be SHORTER than max_tokens — starts are always ``i*stride``,
  never re-pinned backwards), and no chunk is contained in its
  predecessor;
- tokens are the ANALYZED stream (the index's tokenizer chain), chunk
  text is their space-join — the same analyzed-text convention the
  snippet/highlight family documents;
- empty docs (no surviving tokens) emit nothing.

Plan shape: tokenization is bound ONCE to a column before the window
generator references it (the CLAUDE.md HOF-rebind rule); the start
offsets come from ``sequence(0, n_chunks-1)`` + explode — a zero-
exchange generator, so the whole operator is narrow (no shuffle at
all): chunking 100 TB is embarrassingly parallel and this plan keeps
it that way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig, tokens_column


def sliding_chunks(
    docs: DataFrame,
    cfg: TokenizerConfig,
    max_tokens: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_text: bool = True,
) -> DataFrame:
    """-> (id, chunk_idx, start_token, n_tokens [, chunk_text]): the
    sliding-window chunk plan (and optionally the analyzed-text chunks
    themselves) for every doc."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 1 <= stride <= max_tokens:
        raise ValueError(
            f"stride must be in [1, max_tokens]; got stride={stride}, "
            f"max_tokens={max_tokens} (stride > max_tokens would skip tokens)")
    toks = docs.select(
        F.col(id_col).alias("id"),
        tokens_column(F.col(text_col), cfg).alias("_toks"),
    ).select("id", "_toks", F.size("_toks").cast("long").alias("_n"))
    toks = toks.filter(F.col("_n") > 0)
    # ceil((n - max_tokens) / stride) = floor((n - max + stride - 1) / stride)
    # — POSITIVE operands only, so floor == truncate on every engine and
    # the oracle needs no negative-floordiv policy
    n_chunks = F.when(F.col("_n") <= max_tokens, F.lit(1).cast("long")).otherwise(
        F.lit(1) + F.floor(
            (F.col("_n") - max_tokens + stride - 1) / F.lit(stride)
        ).cast("long")
    )
    spans = (
        toks.withColumn("_nc", n_chunks)
        .select(
            "id", "_toks", "_n",
            F.explode(F.sequence(F.lit(0).cast("long"),
                                 F.col("_nc") - 1)).alias("chunk_idx"),
        )
        .select(
            "id", "_toks", "_n", "chunk_idx",
            (F.col("chunk_idx") * stride).alias("start_token"),
        )
        .select(
            "id", "_toks", "chunk_idx", "start_token",
            (F.least(F.col("start_token") + max_tokens, F.col("_n"))
             - F.col("start_token")).alias("n_tokens"),
        )
    )
    cols = ["id", "chunk_idx", "start_token", "n_tokens"]
    if with_text:
        spans = spans.withColumn(
            "chunk_text",
            F.array_join(
                F.slice(F.col("_toks"),
                        (F.col("start_token") + 1).cast("int"),
                        F.col("n_tokens").cast("int")),
                " ",
            ),
        )
        cols.append("chunk_text")
    return spans.select(*cols)
