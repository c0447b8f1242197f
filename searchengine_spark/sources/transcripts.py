"""Transcripts-table source: Iceberg when available, parquet layout otherwise.

The north_rule input is an Iceberg table of multi-turn transcripts
(conv_id, turn_idx, role, text, tool, ts). On a cluster with the
iceberg-spark runtime on the classpath, ``read_transcripts`` loads the
table through the Iceberg DSv2 connector — which is what gives snapshot
isolation for incremental appends and metadata-level partition pruning.
This sandbox has no iceberg runtime jar (SURVEY.md §7 hard-parts note), so
the parquet-directory layout of the same schema is the tested fallback; the
dispatch below is the real seam, not a stub.

Identifier convention:
- ``catalog.db.table`` (no '/', no data-file extension, not an existing
  local path) -> Iceberg table identifier
- anything path-like (a '/', a known extension like ``x.parquet``, or an
  existing relative dir) -> parquet
- ``fmt`` overrides the guess.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


_DATA_EXTS = (".parquet", ".pq", ".orc", ".csv", ".tsv", ".json", ".gz")


def _looks_like_table_ident(s: str) -> bool:
    """catalog.db.table — NOT a bare relative file/dir name: a known data
    extension ('transcripts.parquet') or an existing local path routes to
    parquet instead of a doomed jar-less Iceberg load."""
    import os

    if "/" in s or s.startswith("."):
        return False
    if s.lower().endswith(_DATA_EXTS):
        return False
    return not os.path.exists(s)


def read_transcripts(
    spark: SparkSession, source: str, fmt: str = "auto"
) -> DataFrame:
    """Load the transcripts table from an Iceberg identifier or a parquet
    path. ``fmt``: 'auto' | 'iceberg' | 'parquet'."""
    if fmt not in ("auto", "iceberg", "parquet"):
        raise ValueError(f"unknown transcripts format {fmt!r}")
    if fmt == "auto":
        fmt = "iceberg" if _looks_like_table_ident(source) else "parquet"
    if fmt == "parquet":
        return spark.read.parquet(source)
    try:
        return spark.read.format("iceberg").load(source)
    except Exception as exc:  # runtime jar missing or table unresolved
        raise RuntimeError(
            f"could not load {source!r} as an Iceberg table — is the "
            "iceberg-spark-runtime jar on the classpath and the catalog "
            "configured? (pass fmt='parquet' for a parquet directory)"
        ) from exc
