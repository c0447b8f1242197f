"""Sharded index builds: hash-partition a corpus into N conversation-
coherent shards and build one packed index per shard.

This is the missing BUILD half of the federated serving story
(query/federated.py): it turns ONE corpus into the ``--shards a,b,...``
layout that `jobs/search.py` scatter-gathers over, with the shard
assignment a pure deterministic function of the document's grouping key
(md5 of ``shard_by``, so re-runs, appends routed with
:func:`shard_assignment`, and the DuckDB oracle all agree bit for bit).
Sharding by ``conv_id`` keeps every turn of a conversation in one shard,
so each shard's ``(conv_id, turn_idx)`` docID order is a subsequence of
the full corpus order — the same invariant a turn-parity split has.

Scale shape (the 100-TB question):

- ONE staging pass: the corpus is written ``partitionBy(shard)`` — a
  single wide write, no shuffle beyond the files' own redistribution —
  and then each per-shard build reads ONLY its ``_shard=i`` directory
  (partition-pruned scan, 1/N of the data). Without staging, N builds
  over a non-pushable ``md5(conv_id) % N`` filter would each re-scan the
  FULL corpus: N x corpus reads vs 1 write + 1 read total.
- Each per-shard build is the ordinary single-index build (one
  ``repartitionByRange(term, doc_id)`` shuffle over 1/N of the data). On
  a real cluster the N builds are independent jobs — run them from one
  driver (this function), N drivers, or N clusters; the shard layout is
  identical because the assignment is content-deterministic.
- Serving composes with everything shards already do: federated
  scatter-gather, `jobs/merge_index.py` fold-to-one,
  `jobs/maintain.py --adopt`, per-shard snapshots.

No reference counterpart (the reference is single-process); the shape is
the standard ES/Lucene document-partitioned index build.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import fsio
from .build import Bm25Params
from .packed import build_packed_index

_SHARD_COL = "_se_shard"
FEDERATION_MANIFEST = "federation.json"


def shard_assignment(shard_by: str = "conv_id", n_shards: int = 4) -> Column:
    """Deterministic shard id in [0, n_shards) from the grouping key:
    the top 60 bits of md5 (15 hex chars — exact in a signed 64-bit
    long, never negative) mod N. Cross-engine reproducible — DuckDB:
    ``('0x' || substr(md5(k), 1, 15))::BIGINT % N`` — and stable across
    runs/engines, so late-arriving docs route to the same shard their
    conversation lives in."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return (
        F.conv(F.substring(F.md5(F.col(shard_by).cast("string")), 1, 15), 16, 10)
        .cast("long") % n_shards
    ).cast("int")


def shard_paths(output: str, n_shards: int) -> list[str]:
    return [fsio.join(output, f"shard_{i:04d}") for i in range(n_shards)]


def build_shard_indexes(
    df: DataFrame,
    cfg,
    output: str,
    n_shards: int,
    *,
    shard_by: str = "conv_id",
    params: Optional[Bm25Params] = None,
    order_cols: Sequence[str] = ("conv_id", "turn_idx"),
    staging: bool = True,
    keep_staging: bool = False,
    **build_kwargs,
) -> dict:
    """Build ``n_shards`` packed indexes under ``output/shard_NNNN`` and
    commit a tiny ``federation.json`` sidecar (the ``--shards`` spec plus
    the assignment recipe, so routers can direct appends).

    ``staging=True`` (default) materializes the corpus once as a
    shard-partitioned parquet dir and builds each shard from its pruned
    partition directory; ``staging=False`` skips the extra write and
    filters the input per shard — only sensible when the input is tiny
    or already cached. Extra ``build_kwargs`` (``chunk_docs``,
    ``positional``, ``tfidf_sidecar``, ``payload``, ...) pass through to
    every :func:`build_packed_index` unchanged, so every index feature
    shards. Returns ``{"n_shards", "shard_by", "assignment", "spec",
    "shards": [per-shard manifests]}``."""
    if shard_by not in df.columns:
        raise ValueError(f"shard_by column {shard_by!r} not in {df.columns}")
    params = params if params is not None else Bm25Params()
    spark = df.sparkSession
    paths = shard_paths(output, n_shards)
    assign = shard_assignment(shard_by, n_shards)

    stage_dir = fsio.join(output, "_staging")
    if staging:
        (
            df.withColumn(_SHARD_COL, assign)
            .write.mode("overwrite")
            .partitionBy(_SHARD_COL)
            .parquet(stage_dir)
        )

    # attest the coherence invariant in each shard's manifest: md5(shard_by)
    # mod N puts EVERY row of a shard_by group in one shard, so parent-level
    # federated merges (has_child) can validate instead of assuming.
    # Callers may add keys but can NOT clobber the attestation — it is the
    # one key this function exists to guarantee.
    caller_extra = build_kwargs.pop("manifest_extra", {})
    if caller_extra.get("shard_coherent_by", shard_by) != shard_by:
        raise ValueError(
            f"manifest_extra tries to overwrite shard_coherent_by with "
            f"{caller_extra['shard_coherent_by']!r} — the attestation is "
            f"derived from shard_by={shard_by!r}, not caller-settable")
    extra = {**caller_extra, "shard_coherent_by": shard_by}
    manifests = []
    try:
        for i, path in enumerate(paths):
            if staging:
                # reading the partition DIRECTORY prunes to 1/N of the
                # files and drops the partition column from the schema
                part_dir = fsio.join(stage_dir, f"{_SHARD_COL}={i}")
                if not fsio.exists(spark, part_dir):
                    # no docs hashed here (tiny corpus / large n_shards):
                    # fail loudly instead of an opaque PATH_NOT_FOUND —
                    # an empty shard index can't be built or served
                    raise ValueError(
                        f"shard {i} received no documents "
                        f"(n_shards={n_shards} too large for this corpus "
                        f"under shard_by={shard_by!r}) — lower n_shards"
                    )
                part = spark.read.parquet(part_dir)
            else:
                part = df.filter(assign == i)
            manifests.append(
                build_packed_index(
                    part, cfg, path, params=params,
                    order_cols=tuple(order_cols),
                    manifest_extra=extra, **build_kwargs,
                )
            )
    finally:
        if staging and not keep_staging:
            fsio.delete(spark, stage_dir)

    fed = {
        "format": "searchengine_spark.federation/1",
        "n_shards": n_shards,
        "shard_by": shard_by,
        "assignment": "md5_hex15_mod",
        "spec": ",".join(paths),
        "n_docs": sum(m["n_docs"] for m in manifests),
        "shards": [
            {"path": p, "n_docs": m["n_docs"], "n_terms": m["n_terms"]}
            for p, m in zip(paths, manifests)
        ],
    }
    import json

    fsio.write_text(spark, fsio.join(output, FEDERATION_MANIFEST),
                    json.dumps(fed, indent=1))
    fed["shards"] = manifests  # callers get the full per-shard manifests
    return fed
