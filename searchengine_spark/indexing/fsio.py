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
    """Write-then-rename-OVERWRITE: the file appears at ``path`` only
    complete, and an UPDATE replaces the old content in one atomic rename
    (local FS/HDFS). The naive delete-then-rename would open a window with
    NO file at all — a concurrent reader's manifest load fails, and a
    writer crash inside the window permanently loses the commit marker.
    Falls back to delete+rename only where no AbstractFileSystem binding
    exists for the scheme (some object-store connectors), which are
    non-atomic for renames anyway."""
    fs, hpath = _fs(spark, path)
    jvm = spark._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp." + uuid.uuid4().hex[:8])
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    try:
        ctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            hpath.toUri(), spark._jsc.hadoopConfiguration()
        )
        ren = spark.sparkContext._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        ren[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        ctx.rename(tmp, hpath, ren)
        return
    except Exception:  # UnsupportedFileSystemException and kin
        pass
    if fs.exists(hpath):
        fs.delete(hpath, False)
    if not fs.rename(tmp, hpath):
        raise IOError(f"rename {tmp} -> {path} failed")


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, hpath = _fs(spark, path)
    return bool(fs.delete(hpath, recursive))
