"""Hadoop FileSystem helpers for sink/control-table mutations.

Every mutating path operation in the engine (control-table swap,
retention partition drops) goes through the Hadoop ``FileSystem`` API —
resolved from the path's own scheme — so the same code runs on local
disk, HDFS, S3A, or ABFS. ``pathlib``/``shutil`` would silently no-op
or crash on anything but the local filesystem, and a 100 TB sink never
lives on local disk. (Same pattern `operators/merge.py` established for
its existence probe.)

Object-store caveat: ``rename`` on S3-like stores is a server-side copy,
not a metadata operation. The engine only renames the single-file
control table (tiny) and single boundary partitions — never bulk data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs(spark, path)
    return fs.exists(hpath)


def delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete; False when the path didn't exist."""
    fs, hpath = _fs(spark, path)
    if not fs.exists(hpath):
        return False
    return fs.delete(hpath, True)


def rename(spark: SparkSession, src: str, dst: str) -> None:
    fs, hsrc = _fs(spark, src)
    hdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(hsrc, hdst):
        raise IOError(f"rename failed: {src} -> {dst}")


def list_child_names(spark: SparkSession, path: str) -> list[str]:
    """Basenames of direct children; [] when the path doesn't exist."""
    fs, hpath = _fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [status.getPath().getName() for status in fs.listStatus(hpath)]
