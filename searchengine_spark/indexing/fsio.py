"""Small-file metadata IO through the JVM Hadoop FileSystem API.

The packed-index layout stores a handful of tiny sidecar files next to the
parquet stages (``manifest.json`` commit marker, ``build_state.json``,
``_SUCCESS`` probes). The parquet stages already go through Spark and work
on any Hadoop-FS URI (``file://``, ``hdfs://``, ``s3a://``); these helpers
route the sidecar reads/writes through the same
``org.apache.hadoop.fs.FileSystem`` so the WHOLE index layout is
URI-addressable — ``os.path``/``open()`` would silently pin the build to
the driver's local disk (works in local mode, breaks at the first stage on
a real cluster).

All files here are O(KB): per-call JVM round-trips are noise next to any
Spark action, and commit markers must be small anyway.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession


def join(base: str, *parts: str) -> str:
    """URI-safe path join (os.path.join would mangle scheme-ful URIs on
    odd inputs and is Windows-separator-dependent)."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs(spark, path)
    return bool(fs.exists(hpath))


def read_text(spark: SparkSession, path: str) -> str:
    fs, hpath = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write-then-rename: the file appears at ``path`` only complete, so a
    reader never observes a torn commit marker (rename is atomic on local
    FS/HDFS; on object stores it degrades to copy+delete, still
    whole-file-visible)."""
    fs, hpath = _fs(spark, path)
    tmp = spark._jvm.org.apache.hadoop.fs.Path(
        path + ".tmp." + uuid.uuid4().hex[:8]
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(hpath):
        fs.delete(hpath, False)
    if not fs.rename(tmp, hpath):
        raise IOError(f"rename {tmp} -> {path} failed")


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, hpath = _fs(spark, path)
    return bool(fs.delete(hpath, recursive))
