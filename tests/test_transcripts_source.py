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


# ---------------------------------------------------------- sink seam


def test_sink_parquet_passthrough(spark, tmp_path):
    from searchengine_spark.sources import write_stage

    df = transcripts_df(spark, n_conv=3)
    p = str(tmp_path / "out.parquet")
    write_stage(df, p)  # auto: path-like -> parquet
    assert spark.read.parquet(p).count() == df.count()
    p2 = str(tmp_path / "out2.parquet")
    write_stage(df, p2, partition_by=["conv_id"])
    assert spark.read.parquet(p2).count() == df.count()
    write_stage(df, p2, partition_by=["conv_id"], mode="append")
    assert spark.read.parquet(p2).count() == 2 * df.count()


def test_sink_iceberg_jar_absent_error(spark):
    """Table identifiers route to the Iceberg DSv2 writeTo; without the
    runtime jar the error must say so, never silently write parquet."""
    from searchengine_spark.sources import write_stage

    df = transcripts_df(spark, n_conv=2)
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        write_stage(df, "catalog.db.sink_probe")  # auto -> iceberg
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        write_stage(df, "catalog.db.sink_probe", fmt="iceberg")


def test_sink_bad_args(spark):
    from searchengine_spark.sources import publish_index_iceberg, write_stage

    df = transcripts_df(spark, n_conv=2)
    with pytest.raises(ValueError):
        write_stage(df, "x", fmt="orc")
    with pytest.raises(ValueError):
        write_stage(df, "x", mode="upsert")
    with pytest.raises(ValueError, match="identifier"):
        publish_index_iceberg(spark, "/tmp/idx", "/not/an/ident")


def test_auto_detect_bare_filenames_route_to_parquet(spark, tmp_path):
    """A bare relative name with a data extension (or an existing local
    path) must never be guessed as an Iceberg identifier."""
    from searchengine_spark.sources.transcripts import _looks_like_table_ident

    assert not _looks_like_table_ident("transcripts.parquet")
    assert not _looks_like_table_ident("dump.tsv.gz")
    assert _looks_like_table_ident("catalog.db.transcripts")
    import os

    d = tmp_path / "localdir"
    d.mkdir()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert not _looks_like_table_ident("localdir")
    finally:
        os.chdir(cwd)
