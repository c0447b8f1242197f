"""Shard merge: fold N independently-built packed indexes into ONE.

The distributed-build pattern the reference's single-process SPIMI cannot
express (reference src/models/spimi.py merges BLOCKS of one build; it has
no notion of merging two finished indexes): partition a 100-TB corpus,
build each partition's index in parallel (separate jobs, separate
clusters, separate days), then merge the shards into one servable index.

Contract — ``merge_packed_indexes(shards) == build_packed_index(concat of
the shards' LIVE corpora)``, bit for bit:

- the merged docs stage is rebuilt from the shards' STORED token streams
  (docs stage schema ``doc_id, *order_cols, tokens, dl``) with a global
  ``order_cols`` re-sort and dense docID re-assignment — exactly what a
  fresh build does after tokenizing, so a merge never re-tokenizes;
- every downstream stage (index encode, term_stats/idf, doc_norms,
  lineage, manifest) is the BUILD'S OWN code via its resume seam
  (``build_packed_index(resume=True)`` skips only the docs stage);
- avgdl / N / idf are recomputed over the merged corpus (a shard's local
  statistics are never blended — blending is how merged rankings drift);
- each shard's tombstones are folded (anti-join before the union), like a
  compaction: deleted docs do not survive a merge.

Scale shape: reads only the shards' docs stages (columnar: order_cols +
tokens), ONE range shuffle for docID assignment, then the build's one
index shuffle. Tombstone sets ride a broadcast anti-join (DeleteMask is a
bounded driver-side array by design, indexing/deletes.py).

Refusals are loud: shards must agree on tokenizer, BM25 params,
chunk_docs, payload, positional, tfidf_sidecar, tfidf_doc_schema and
order_cols — merging indexes built under different contracts silently
produces an index that matches neither, so any mismatch raises.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig
from .build import Bm25Params
from .docids import DOC_ID
from .packed import (
    _stage_dirs,
    build_packed_index,
    load_packed_index,
    write_docs_stage,
)

# manifest keys that must agree across shards (with their build defaults,
# so a key an older manifest omits still compares)
_COMPAT_KEYS = (
    ("tokenizer", None),
    ("k", None),
    ("b", None),
    ("chunk_docs", None),
    ("payload", "freq"),
    ("positional", False),
    ("tfidf_sidecar", False),
    ("tfidf_doc_schema", None),
    ("order_cols", None),
)


def _compat_view(manifest: dict) -> dict:
    return {k: manifest.get(k, d) for k, d in _COMPAT_KEYS}


def merge_packed_indexes(
    spark: SparkSession,
    shard_paths: Sequence[str],
    out_path: str,
    n_partitions: Optional[int] = None,
    check_disjoint: bool = False,
) -> dict:
    """Merge the packed indexes at ``shard_paths`` into a fresh index at
    ``out_path``; returns the new manifest.

    ``check_disjoint=True`` additionally asserts no two shards share an
    ``order_cols`` key (one count-distinct pass over the union — duplicate
    keys make dense docID assignment order-ambiguous, the same caller
    contract a fresh build has; opt-in because the check is a full
    aggregation at merge scale).
    """
    if len(shard_paths) < 2:
        raise ValueError("merge needs at least two shard indexes")
    if str(out_path).rstrip("/") in {str(p).rstrip("/") for p in shard_paths}:
        raise ValueError(
            "out_path must differ from every shard path (the output "
            "location is clobbered before the merged build)"
        )
    shards = [load_packed_index(spark, p) for p in shard_paths]

    ref = _compat_view(shards[0].manifest)
    for p, s in zip(shard_paths[1:], shards[1:]):
        got = _compat_view(s.manifest)
        if got != ref:
            diff = {k: (ref[k], got[k]) for k in ref if ref[k] != got[k]}
            raise ValueError(
                f"shard {p!r} was built under a different contract than "
                f"{shard_paths[0]!r}; differing keys (first, this): {diff}"
            )

    order_cols = list(ref["order_cols"])
    parts = []
    for s in shards:
        docs = s.docs_stage()
        mask = s.delete_mask()
        if mask is not None:
            tomb = spark.createDataFrame(
                [(int(x),) for x in mask.arr], schema=f"{DOC_ID} long"
            )
            docs = docs.join(F.broadcast(tomb), on=DOC_ID, how="left_anti")
        parts.append(docs.select(*order_cols, "tokens"))
    union = reduce(DataFrame.unionByName, parts)

    if check_disjoint:
        row = union.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.struct(*order_cols)).alias("nd"),
        ).collect()[0]
        if int(row["n"]) != int(row["nd"]):
            raise ValueError(
                f"shards overlap: {int(row['n']) - int(row['nd'])} duplicate "
                f"{tuple(order_cols)} keys across shard corpora"
            )

    # clobber the output first (overwrite semantics, like the build's
    # stage writes): a leftover index at out_path would otherwise let the
    # resume seam below skip downstream stages that are STALE for the new
    # docs stage
    from . import fsio

    fsio.delete(spark, out_path)

    # docs stage from the stored token streams (no re-tokenization), then
    # the build's own downstream stages via its resume seam
    write_docs_stage(union, order_cols, _stage_dirs(out_path), n_partitions=n_partitions)
    m = shards[0].manifest
    return build_packed_index(
        union,  # resume skips the docs stage; this carries the session only
        TokenizerConfig.from_manifest(m["tokenizer"]),
        out_path,
        params=Bm25Params(k=m["k"], b=m["b"]),
        order_cols=tuple(order_cols),
        chunk_docs=int(m["chunk_docs"]),
        n_partitions=n_partitions,
        resume=True,
        positional=bool(m.get("positional", False)),
        tfidf_sidecar=bool(m.get("tfidf_sidecar", False)),
        payload=m.get("payload", "freq"),
        tfidf_doc_schema=m.get("tfidf_doc_schema") or "lnc",
    )


def reindex_filtered(
    spark: SparkSession,
    src_path: str,
    out_path: str,
    where: str,
    n_partitions: Optional[int] = None,
) -> dict:
    """Carve a NEW packed index out of an existing one — the ES
    ``_reindex``-with-query analog: the docs matching ``where`` (a SQL
    predicate over the docs-stage columns: ``doc_id``, the index's
    ``order_cols``, ``dl``) become a fresh index at ``out_path``.

    Same machinery and same contract as a shard merge, single-source:
    the new docs stage comes from the STORED token stream (tokenization
    never re-runs), tombstoned docs are excluded first (a reindex is a
    compaction too — deleted docs don't survive), docIDs re-assign
    densely under the global order_cols sort, and every downstream
    stage is the build's own code via the resume seam — so the result
    is bit-identical to a fresh ``build_packed_index`` over the
    filtered live corpus (gated in tests/test_reindex.py). Predicates
    over lakehouse attributes (role, ts, ...) belong to the ATTRS
    table: resolve them to order_cols there and filter on those —
    the index stores only what it needs to serve.

    A predicate matching nothing raises (an empty index is almost
    always a mis-typed predicate, and the build's offsets stage has no
    zero-doc shape)."""
    if str(out_path).rstrip("/") == str(src_path).rstrip("/"):
        raise ValueError(
            "out_path must differ from src_path (the output location is "
            "clobbered before the rebuild; reindex-in-place would destroy "
            "the source mid-read)"
        )
    src = load_packed_index(spark, src_path)
    m = src.manifest
    order_cols = [c for c in m["order_cols"] if c != DOC_ID]
    docs = src.docs_stage()
    mask = src.delete_mask()
    if mask is not None:
        tomb = spark.createDataFrame(
            [(int(x),) for x in mask.arr], schema=f"{DOC_ID} long"
        )
        docs = docs.join(F.broadcast(tomb), on=DOC_ID, how="left_anti")
    kept = docs.filter(F.expr(where)).select(*order_cols, "tokens")
    if not kept.limit(1).count():
        raise ValueError(
            f"predicate {where!r} matches no live documents in {src_path!r}"
        )

    from . import fsio

    fsio.delete(spark, out_path)
    write_docs_stage(kept, order_cols, _stage_dirs(out_path),
                     n_partitions=n_partitions)
    return build_packed_index(
        kept,  # resume skips the docs stage; this carries the session only
        TokenizerConfig.from_manifest(m["tokenizer"]),
        out_path,
        params=Bm25Params(k=m["k"], b=m["b"]),
        order_cols=tuple(order_cols),
        chunk_docs=int(m["chunk_docs"]),
        n_partitions=n_partitions,
        resume=True,
        positional=bool(m.get("positional", False)),
        tfidf_sidecar=bool(m.get("tfidf_sidecar", False)),
        payload=m.get("payload", "freq"),
        tfidf_doc_schema=m.get("tfidf_doc_schema") or "lnc",
    )


def adopt_shard_index(
    spark: SparkSession,
    path: str,
    shard_path: str,
    batch_id: Optional[int] = None,
) -> dict:
    """Append a FINISHED shard index into the live index at ``path`` as one
    committed epoch — O(shard) cost, the base is never touched. Returns the
    updated manifest.

    Contract: identical to ``append_batch`` over the shard's raw live rows
    (tokenization is deterministic, so the shard's stored token streams
    substitute bit-for-bit) — frozen-avgdl dl_norm, final-live-set idf, the
    whole incremental contract (streaming/incremental.py). The shard's
    tombstones are folded (deleted docs are not adopted).

    Only tokenizer + order_cols must match the target: the shard's payload,
    chunk_docs, positional and sidecar flags are irrelevant because only
    its DOCS stage (tokens) is read — the epoch is re-encoded under the
    TARGET's contract by append_batch. Use this over
    ``merge_packed_indexes`` when the base is large and the shard small
    (continuous ingestion of pre-built partial indexes); use the merge when
    you want a fresh single-base layout (or run a compaction after).

    ``batch_id`` defaults to the next epoch id, monotonic past compactions
    (same rule as ``jobs/maintain.py``)."""
    from ..streaming.incremental import append_batch
    from . import fsio
    import json

    shard = load_packed_index(spark, shard_path)
    manifest = json.loads(fsio.read_text(spark, fsio.join(path, "manifest.json")))
    for key in ("tokenizer", "order_cols"):
        if manifest.get(key) != shard.manifest.get(key):
            raise ValueError(
                f"shard {shard_path!r} disagrees with the target index on "
                f"{key!r}: {shard.manifest.get(key)!r} vs {manifest.get(key)!r}"
            )
    if batch_id is None:
        used = {a["batch_id"] for a in manifest.get("appends", [])}
        batch_id = max(
            int(manifest.get("append_seq", 0)),
            max(used) + 1 if used else 0,
        )

    order_cols = list(manifest["order_cols"])
    docs = shard.docs_stage()
    mask = shard.delete_mask()
    if mask is not None:
        tomb = spark.createDataFrame(
            [(int(x),) for x in mask.arr], schema=f"{DOC_ID} long"
        )
        docs = docs.join(F.broadcast(tomb), on=DOC_ID, how="left_anti")
    return append_batch(
        docs.select(*order_cols, "tokens"),
        path,
        TokenizerConfig.from_manifest(manifest["tokenizer"]),
        batch_id=batch_id,
        pre_tokenized=True,
    )
