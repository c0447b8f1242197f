"""Snapshot time travel over the packed index (the Iceberg-snapshot /
Delta-time-travel analog).

Every maintenance commit (append epoch, delete, compaction) replaces
``manifest.json`` atomically; this module archives the SUPERSEDED manifest
as ``snapshots/<seq>.json`` in the same commit, so a reader can pin any
historical state:

    pidx = load_packed_index(spark, path, snapshot=3)

Retention is EXACTLY the delayed-GC discipline the writers already follow
— it is a guarantee about the previous commit, not all history:

- the most recent snapshot (the state one commit ago) is always fully
  readable: appends/deletes keep the newest-but-one term_stats version
  alive, and compaction retires superseded dirs only at the NEXT
  compaction;
- older snapshots may reference dirs that delayed GC has since removed —
  loading one raises :class:`SnapshotExpired` (after an existence check of
  every referenced dir), never a half-working index.

``snapshot_seq`` in the live manifest is the NEXT sequence number; the
archived file ``snapshots/<k>.json`` holds the manifest that was current
before commit k+1... i.e. seq k was live until it was superseded.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from . import fsio


class SnapshotExpired(Exception):
    """The snapshot's manifest exists but references GC'd dirs."""


def commit_manifest(spark: SparkSession, path: str, manifest: dict) -> dict:
    """The shared commit point for every index writer: archive the current
    manifest as ``snapshots/<its seq>.json``, bump ``snapshot_seq``, then
    atomically replace ``manifest.json``. Returns the committed manifest."""
    mp = fsio.join(path, "manifest.json")
    old = json.loads(fsio.read_text(spark, mp))
    old_seq = int(old.get("snapshot_seq", 0))
    fsio.write_text(
        spark, fsio.join(path, "snapshots", f"{old_seq}.json"),
        json.dumps(old, indent=1),
    )
    manifest["snapshot_seq"] = old_seq + 1
    fsio.write_text(spark, mp, json.dumps(manifest, indent=1))
    return manifest


def referenced_dirs_by_kind(path: str, manifest: dict) -> dict:
    """The dirs a manifest needs to serve, keyed by stage kind — the ONE
    inventory that fsck's checks, compaction's retirement groups, the
    delete path's docs reads and the snapshot liveness check all derive
    from (a new manifest-listed stage dir is added here, nowhere else)."""
    from .deletes import tombstone_dirs

    appends = manifest.get("appends", [])
    kinds = {
        "index": [fsio.join(path, manifest.get("index_dir", "index"))]
        + [fsio.join(path, "index_appends", str(a["batch_id"])) for a in appends],
        "docs": [fsio.join(path, manifest.get("docs_dir", "docs"))]
        + [fsio.join(path, "docs_appends", str(a["batch_id"])) for a in appends],
        "term_stats": [
            fsio.join(path, manifest.get("term_stats_dir", "term_stats"))
        ],
        "tombstones": tombstone_dirs(path, manifest),
    }
    if manifest.get("tfidf_sidecar"):
        kinds["doc_norms"] = [
            fsio.join(path, manifest.get("doc_norms_dir", "doc_norms"))
        ] + [
            fsio.join(path, "doc_norms_appends", str(a["batch_id"]))
            for a in appends
        ]
    return kinds


def referenced_dirs(path: str, manifest: dict) -> list:
    """Flat view of :func:`referenced_dirs_by_kind` (the loader's liveness
    check and snapshot expiry use it)."""
    kinds = referenced_dirs_by_kind(path, manifest)
    return [
        d
        for k in ("index", "docs", "term_stats", "tombstones", "doc_norms")
        for d in kinds.get(k, ())
    ]


def load_snapshot_manifest(spark: SparkSession, path: str, snapshot: int) -> dict:
    """Manifest of historical ``snapshot`` (or the live one when it equals
    the current seq); raises FileNotFoundError for unknown seqs and
    :class:`SnapshotExpired` when delayed GC already removed its dirs."""
    live = json.loads(fsio.read_text(spark, fsio.join(path, "manifest.json")))
    if int(live.get("snapshot_seq", 0)) == snapshot:
        return live
    sp = fsio.join(path, "snapshots", f"{snapshot}.json")
    if not fsio.exists(spark, sp):
        raise FileNotFoundError(
            f"no snapshot {snapshot} at {path} "
            f"(live seq is {live.get('snapshot_seq', 0)})"
        )
    manifest = json.loads(fsio.read_text(spark, sp))
    missing = [
        d for d in referenced_dirs(path, manifest) if not fsio.exists(spark, d)
    ]
    if missing:
        raise SnapshotExpired(
            f"snapshot {snapshot} references {len(missing)} GC'd dir(s), "
            f"e.g. {missing[0]} — only the previous commit is retained "
            "(module docstring)"
        )
    return manifest
