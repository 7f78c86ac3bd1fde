"""Hadoop FileSystem helpers (JVM gateway) — work on any Hadoop-compatible
FS (local, HDFS, S3A), so the same code path runs in the sandbox and on a
real cluster."""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, jvm) for the given path's scheme."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def path_exists(spark: SparkSession, path: str) -> bool:
    """Metadata-only existence probe on any Hadoop-compatible FS."""
    fs, jvm = hadoop_fs(spark, path)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(path))


def hadoop_delete(spark: SparkSession, path: str) -> None:
    fs, jvm = hadoop_fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if fs.exists(p):
        fs.delete(p, True)


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total committed DATA bytes under `path` (0 if it doesn't exist):
    recursive listing, hidden files (.crc checksums, _SUCCESS markers)
    excluded. Metadata-only op — no data read."""
    fs, jvm = hadoop_fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return 0
    total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(".") or name.startswith("_"):
            continue
        total += int(st.getLen())
    return total
