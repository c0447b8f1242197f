"""Term vectors — the ES ``_termvectors`` API analog: for a bounded set
of documents, the stored term statistics the index holds about each —
per (doc, term): term frequency, corpus document frequency, and
optionally the token positions ("what does the index know about THIS
doc"), the debugging/relevance-tuning companion to ``--explain``.

Sources (nothing is re-tokenized, nothing is re-derived):

- tf and positions come from the STORED token stream (the docs stage —
  tokenization ran exactly once, at build; ``posexplode`` over the
  stored array yields the same (term, position) occurrences the
  positional sidecar encoded, so positions are available on ANY payload
  without a positional build — parity with the packed positional view
  is gated in tests/test_termvectors.py).
- df rides the ``term_stats`` sidecar AS STORED — like Elasticsearch,
  whose termvectors df deliberately includes deleted docs until merge
  ("the returned document frequencies do not take deleted documents
  into account"); our tombstone model matches (deletes decrement
  ``n_docs_live`` only; compaction refreshes df). Requesting a
  TOMBSTONED doc returns nothing, exactly like a deleted doc in ES.

Plan shape (the 100-TB question): the requested doc set is the API's
own bound (ES takes explicit ids) — a BROADCAST join prunes the
docs-stage scan to those rows (the PRF/snippet/significant pattern);
one partial-aggregable groupBy builds the per-doc vectors; df attaches
by broadcasting the bounded vector side INTO the vocabulary-sized
term_stats scan (never the reverse). No full-corpus pass, no per-row
Python.

No reference counterpart (the reference serves ranked lists only);
semantics follow the Elasticsearch termvectors API.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.packed import PackedIndex


def _vectors_from_tokens(toks: DataFrame, positions: bool) -> DataFrame:
    """(doc_id, tokens) -> (doc_id, term, tf [, positions]) — shared by
    both tiers. Positions are 0-based token indices in the stored
    stream, sorted ascending."""
    occ = toks.select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("tf")]
    if positions:
        aggs.append(F.sort_array(F.collect_list(
            F.col("pos").cast("int"))).alias("positions"))
    return occ.groupBy("doc_id", "term").agg(*aggs)


def _ids_frame(pidx: PackedIndex, doc_ids: Sequence[int]):
    """Deduped, tombstone-filtered (doc_id) frame, or None when every
    requested doc is deleted."""
    import numpy as np

    ids = list(dict.fromkeys(int(d) for d in doc_ids))
    if not ids:
        raise ValueError("doc_ids must name at least one document")
    mask = pidx.delete_mask()
    if mask is not None:
        ids = [int(d) for d in mask.mask_docs(np.asarray(ids, np.int64))]
    if not ids:
        return None
    return pidx.spark.createDataFrame([(d,) for d in ids], "doc_id long")


def term_vectors(
    pidx: PackedIndex,
    doc_ids: Sequence[int],
    positions: bool = False,
) -> DataFrame:
    """-> (doc_id, term, tf, df [, positions]) for each requested live
    doc — the ES termvectors response body (term_freq / doc_freq /
    positions per term). Tombstoned docs emit nothing; df is the stored
    sidecar value (includes deleted docs until compaction — the ES
    contract, see module docstring). Deterministic order (doc_id,
    term)."""
    schema = ("doc_id long, term string, tf long, df long"
              + (", positions array<int>" if positions else ""))
    ids = _ids_frame(pidx, doc_ids)
    if ids is None:
        return pidx.spark.createDataFrame([], schema)
    tv = _vectors_from_tokens(
        pidx.doc_tokens().join(F.broadcast(ids), "doc_id"), positions
    )
    out = pidx.term_stats.select(
        "term", F.col("df").cast("long").alias("df")
    ).join(F.broadcast(tv), "term")
    cols = ["doc_id", "term", "tf", "df"] + (
        ["positions"] if positions else [])
    return out.select(*cols).orderBy("doc_id", "term")


def term_vectors_federated(
    shards,
    doc_ids: Sequence[int],
    positions: bool = False,
) -> DataFrame:
    """Federated twin: ``doc_ids`` speak the FEDERATION namespace
    (query/federated.py base offsets); each doc's tokens live in exactly
    one shard, so the per-shard vectors union losslessly. df is the
    FEDERATION-GLOBAL dictionary value (df summed over disjoint shards
    == the merged index's sidecar — the same global-stats contract BM25
    federation uses), so a vector reads identically through one merged
    index or its shards (gated)."""
    from functools import reduce

    from .federated import _doc_bases, _global_dictionary

    ids = list(dict.fromkeys(int(d) for d in doc_ids))
    if not ids:
        raise ValueError("doc_ids must name at least one document")
    spark = shards[0].spark
    bases = _doc_bases(shards)
    ends = bases[1:] + [bases[-1] + int(shards[-1].manifest["n_docs"])]
    parts = []
    for s, base, end in zip(shards, bases, ends):
        local = [d - base for d in ids if base <= d < end]
        if not local:
            continue
        lf = _ids_frame(s, local)
        if lf is None:
            continue
        toks = s.doc_tokens().join(F.broadcast(lf), "doc_id")
        parts.append(
            _vectors_from_tokens(toks, positions)
            .select((F.col("doc_id") + base).alias("doc_id"),
                    "term", "tf",
                    *(["positions"] if positions else []))
        )
    schema = ("doc_id long, term string, tf long, df long"
              + (", positions array<int>" if positions else ""))
    if not parts:
        return spark.createDataFrame([], schema)
    tv = reduce(DataFrame.unionByName, parts)
    out = _global_dictionary(shards).select(
        "term", F.col("df").cast("long").alias("df")
    ).join(F.broadcast(tv), "term")
    cols = ["doc_id", "term", "tf", "df"] + (
        ["positions"] if positions else [])
    return out.select(*cols).orderBy("doc_id", "term")
