"""Transcripts source dispatch (Iceberg identifier vs parquet path)."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.sources import read_transcripts


def test_parquet_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    transcripts_df(spark, n_conv=5).write.parquet(p)
    df = read_transcripts(spark, p)  # auto: path-like -> parquet
    assert df.count() > 0
    assert {"conv_id", "turn_idx", "text"} <= set(df.columns)
    assert read_transcripts(spark, p, fmt="parquet").count() == df.count()


def test_iceberg_dispatch(spark):
    """catalog.db.table identifiers route to the Iceberg connector; without
    the runtime jar the error must say so (not an opaque scheme failure).
    If an Iceberg runtime IS present, the identifier is still expected to
    fail table resolution here (no such table) — either way the path-like
    guess never swallows a table identifier silently."""
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_transcripts(spark, "catalog.db.transcripts")


def test_bad_fmt(spark):
    with pytest.raises(ValueError):
        read_transcripts(spark, "x", fmt="orc")
