"""Iceberg SINK seam — the write-side twin of ``read_transcripts``.

The packed index's source-of-truth layout stays parquet-dirs + manifest
(the commit protocol: manifest written last, epoch append dirs —
indexing/packed.py, streaming/incremental.py). What an Iceberg catalog
adds downstream is snapshot-isolated, catalog-discoverable TABLES over
the searchable stages — so the seam here PUBLISHES those stages through
the DSv2 ``writeTo`` API when the iceberg-spark runtime is on the
classpath, and fails loudly (not silently-parquet) when it is not.

This sandbox has no iceberg runtime jar (SURVEY.md §7 hard-parts note);
the dispatch + partition specs below are the real seam, tested for the
jar-absent error path and for parquet passthrough.

Identifier convention matches the reader (sources/transcripts.py):
``catalog.db.table`` -> Iceberg identifier; path-like -> parquet dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .transcripts import _looks_like_table_ident

# catalog-facing partition spec per published stage: the same keys the
# parquet layout ranges/sorts by, expressed as Iceberg transforms so the
# catalog prunes like our pushed-filter scans do.
# - index: bucket(term) — equality term lookups prune to one bucket;
#   within-file ordering stays (term, chunk) from the build sort.
# - docs/docmap: bucket(doc_id) — resolve joins co-locate.
STAGE_PARTITION = {
    "index": lambda n: [F.bucket(n, F.col("term"))],
    "docs": lambda n: [F.bucket(n, F.col("doc_id"))],
    "term_stats": lambda n: [],  # tiny sidecar — unpartitioned
    "doc_norms": lambda n: [F.bucket(n, F.col("doc_id"))],
}


def write_stage(
    df: DataFrame,
    target: str,
    fmt: str = "auto",
    partition_by: list | None = None,
    mode: str = "replace",
) -> None:
    """Write one stage DataFrame to ``target``.

    ``fmt``: 'auto' | 'iceberg' | 'parquet'. ``partition_by``: list of
    column/transform expressions (iceberg) or column names (parquet).
    ``mode``: 'replace' (create or replace) | 'append'."""
    if fmt not in ("auto", "iceberg", "parquet"):
        raise ValueError(f"unknown sink format {fmt!r}")
    if mode not in ("replace", "append"):
        raise ValueError(f"unknown sink mode {mode!r}")
    if fmt == "auto":
        fmt = "iceberg" if _looks_like_table_ident(target) else "parquet"
    if fmt == "parquet":
        w = df.write.mode("overwrite" if mode == "replace" else "append")
        if partition_by:
            w = w.partitionBy(*[str(c) for c in partition_by])
        w.parquet(target)
        return
    try:
        w = df.writeTo(target).using("iceberg")
        if partition_by and mode == "replace":
            w = w.partitionedBy(*partition_by)
        if mode == "replace":
            w.createOrReplace()
        else:
            w.append()
    except Exception as exc:  # runtime jar missing / catalog unconfigured
        raise RuntimeError(
            f"could not write {target!r} as an Iceberg table — is the "
            "iceberg-spark-runtime jar on the classpath and the catalog "
            "configured? (use fmt='parquet' for a parquet directory)"
        ) from exc


def publish_index_iceberg(
    spark: SparkSession,
    index_path: str,
    table_prefix: str,
    n_buckets: int = 64,
) -> list[str]:
    """Publish a built packed index's searchable stages as Iceberg tables
    ``<prefix>_index``, ``<prefix>_term_stats``, ``<prefix>_docs`` (and
    ``<prefix>_doc_norms`` when present) — snapshot-isolated,
    catalog-discoverable replicas for downstream consumers. The parquet
    layout at ``index_path`` remains the engine's source of truth.

    Returns the list of table identifiers written."""
    from ..indexing.packed import load_packed_index

    if not _looks_like_table_ident(table_prefix):
        raise ValueError(
            f"{table_prefix!r} is not an Iceberg table identifier "
            "(expected catalog.db.name, no '/')"
        )
    pidx = load_packed_index(spark, index_path)
    stages = [
        ("index", pidx.index),
        ("term_stats", pidx.term_stats),
        ("docs", pidx.docmap),
    ]
    if pidx.doc_norms is not None:
        stages.append(("doc_norms", pidx.doc_norms))
    written = []
    for name, df in stages:
        ident = f"{table_prefix}_{name}"
        write_stage(
            df, ident, fmt="iceberg",
            partition_by=STAGE_PARTITION[name](n_buckets) or None,
        )
        written.append(ident)
    return written
