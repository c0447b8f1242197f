"""Training-sequence packing — assembling fixed-token-budget model
inputs from variable-length documents, the step between a cleaned
corpus and a pretraining dataloader.

Two packing disciplines, both industry-standard:

- ``pack_concat_chunks`` — GPT-style concat-and-chunk: documents are
  laid head-to-tail into a token stream and the stream is cut into
  fixed ``max_tokens`` windows; a document may straddle window
  boundaries. This is the pretraining default (no padding waste).
  Relationship to :func:`~searchengine_spark.textops.dataset.
  pack_sequences`: that one is the dataset-ASSEMBLY bookkeeping form
  (compact (bin, offset) keyed by the salted split-hash so it composes
  with hash_split/stratified_sample); this one is the
  dataloader-facing PLAN — explicit [tok_start, tok_end) stream
  offsets and the full chunk_first..chunk_last straddle span, bucketed
  by the same md5 rule the shard layout uses.
- ``pack_greedy`` — no-split first-fit-in-order: each document lands
  whole in a sequence; a new sequence starts when the current one
  cannot hold the next document. This is the SFT/document-boundary
  discipline (each sequence is a concatenation of WHOLE documents).

Scale shape (the 100-TB question): there is deliberately NO global
token stream — a single global order would serialize the cluster
behind one cumulative sum. Documents hash into ``n_buckets``
independent streams (top-15-hex md5 mod N, the shard_assignment
pattern from indexing/shards.py:52-60 — exact in a signed 64-bit
BIGINT on Spark, DuckDB and Python, so re-runs and cross-engine
oracles agree), ordered by id within the bucket. Each bucket packs
independently: concat-chunk is ONE window cumsum per bucket (a single
range exchange, no recursion, no UDF); greedy is inherently a
sequential scan, so it runs as ONE Arrow batch per bucket
(applyInPandas) over (id, n_tokens) pairs only — the packer never
ships text, so a bucket of a billion documents is ~16 GB of metadata,
and n_buckets is the knob that bounds it. Pick n_buckets ≈ a few ×
cores at cluster scale; sequences are bucket-local, which is exactly
what a sharded dataloader wants.

Token counts default to the whitespace proxy (``\\S+`` count — the
token_stats ws_tokens column, oracle-proven cross-engine); pass
``token_count_col`` to pack by a real tokenizer's counts computed
upstream. Zero-token documents drop (they occupy no window).

No reference counterpart (the reference indexes documents; it never
assembles training sequences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_WS = r"\S+"


def _with_bucket_and_tokens(
    docs: DataFrame,
    n_buckets: int,
    id_col: str,
    text_col: str,
    token_count_col: str | None,
) -> DataFrame:
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    n_tok = (
        F.col(token_count_col)
        if token_count_col
        else F.regexp_count(F.col(text_col), F.lit(TOKEN_WS))
    ).cast("long")
    # top 60 bits of md5 (15 hex chars) — exact in a signed 64-bit
    # BIGINT on every engine (indexing/shards.py shard_assignment)
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
               16, 10).cast("long") % n_buckets
    ).cast("int")
    return (
        docs.select(
            F.col(id_col).alias("id"),
            n_tok.alias("n_tokens"),
            bucket.alias("bucket"),
        )
        .filter(F.col("n_tokens") > 0)
    )


def pack_concat_chunks(
    docs: DataFrame,
    max_tokens: int,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
) -> DataFrame:
    """-> (id, bucket, n_tokens, tok_start, tok_end, chunk_first,
    chunk_last): GPT-style concat-and-chunk packing PLAN. Within each
    bucket, documents ordered by id lay head-to-tail; tok_start/tok_end
    are the document's [start, end) offsets in its bucket's stream and
    chunk_first..chunk_last = start div max_tokens .. (end-1) div
    max_tokens are the fixed windows it occupies (straddling documents
    span several — the concat semantics; integer div, nothing floats).
    One window cumsum per bucket: a single range exchange, no UDF."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    base = _with_bucket_and_tokens(docs, n_buckets, id_col, text_col,
                                   token_count_col)
    w = (
        Window.partitionBy("bucket").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    staged = base.select(
        "id", "bucket", "n_tokens",
        start.alias("tok_start"),
        (start + F.col("n_tokens")).alias("tok_end"),
    )
    return staged.select(
        "id", "bucket", "n_tokens", "tok_start", "tok_end",
        F.expr(f"tok_start div {int(max_tokens)}").alias("chunk_first"),
        F.expr(f"(tok_end - 1) div {int(max_tokens)}").alias("chunk_last"),
    ).orderBy("bucket", "id")


def greedy_assign(n_tokens, budget: int):
    """The no-split first-fit state machine: given in-order token
    counts, return (seq_ids, offsets) — the pure kernel ``pack_greedy``
    runs per bucket (exposed so the property gates and the recursive
    DuckDB oracle can be checked against one definition). A count >=
    budget takes a sequence alone and closes it; otherwise a doc lands
    at the open sequence's fill offset, opening a new one when it would
    not fit whole."""
    seqs = [0] * len(n_tokens)
    offs = [0] * len(n_tokens)
    open_seq, fill = 0, 0
    for i, tok in enumerate(n_tokens):
        tok = int(tok)
        if tok >= budget:
            if fill > 0:
                open_seq += 1
            seqs[i], offs[i] = open_seq, 0
            open_seq, fill = open_seq + 1, 0
        else:
            if fill + tok > budget:
                open_seq += 1
                fill = 0
            seqs[i], offs[i] = open_seq, fill
            fill += tok
    return seqs, offs


def pack_greedy(
    docs: DataFrame,
    max_tokens: int,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    order: str = "id",
) -> DataFrame:
    """-> (id, bucket, seq, seq_offset, n_tokens, truncated): no-split
    first-fit-in-order packing. Within each bucket, documents ordered
    by id fill sequence ``seq`` (bucket-local, 0-based) at token offset
    ``seq_offset``; a new sequence starts when the open one cannot hold
    the next document whole. A document with n_tokens >= max_tokens
    takes a sequence ALONE and closes it (``truncated`` marks
    n_tokens > max_tokens — the dataloader must cut it; an
    exactly-full document is not truncated). The scan is inherently
    sequential per bucket, so it runs as one Arrow batch per bucket
    over (id, n_tokens) metadata only — never the text.

    ``order``: the scan order within each bucket — ``"id"``
    (in-order, streaming-friendly) or ``"length_desc"`` ((n_tokens
    DESC, id) — the DECREASING variant of the classic bin-packing
    heuristics: grouping similar lengths lets the single-open-sequence
    state machine close denser sequences, at the cost of a sort; both
    run the SAME ``greedy_assign`` kernel, only the feed order differs,
    so the recursive-CTE oracle replays either by changing one
    ORDER BY)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if order not in ("id", "length_desc"):
        raise ValueError(
            f"order must be 'id' or 'length_desc', got {order!r}")
    base = _with_bucket_and_tokens(docs, n_buckets, id_col, text_col,
                                   token_count_col)
    budget = int(max_tokens)

    def _pack(pdf):
        import pandas as pd

        if order == "length_desc":
            pdf = pdf.sort_values(
                ["n_tokens", "id"], ascending=[False, True]
            ).reset_index(drop=True)
        else:
            pdf = pdf.sort_values("id").reset_index(drop=True)
        seqs, offs = greedy_assign(
            [int(t) for t in pdf["n_tokens"]], budget)
        return pd.DataFrame({
            "id": pdf["id"], "bucket": pdf["bucket"],
            "seq": pd.Series(seqs, dtype="int64"),
            "seq_offset": pd.Series(offs, dtype="int64"),
            "n_tokens": pdf["n_tokens"],
            "truncated": pdf["n_tokens"] > budget,
        })

    out_schema = ("id long, bucket int, seq long, seq_offset long, "
                  "n_tokens long, truncated boolean")
    return (
        base.groupBy("bucket")
        .applyInPandas(_pack, schema=out_schema)
        .orderBy("bucket", "id")
    )


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """-> (bucket, n_seqs, n_docs, n_tokens, pad_tokens): per-bucket
    fill accounting for a ``pack_greedy`` plan — pad_tokens =
    n_seqs*max_tokens - min(n_tokens, max_tokens-capped sum), the
    padding a dataloader would emit (truncated docs count the budget,
    their overflow is cut, not padded). Partial-aggregable; feeds the
    'how much budget does no-split packing waste' decision against
    concat-and-chunk."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    capped = F.least(F.col("n_tokens"), F.lit(int(max_tokens)))
    return (
        packed.groupBy("bucket")
        .agg(
            (F.max("seq") + 1).cast("long").alias("n_seqs"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            ((F.max("seq") + 1) * int(max_tokens)
             - F.sum(capped)).cast("long").alias("pad_tokens"),
        )
        .orderBy("bucket")
    )
