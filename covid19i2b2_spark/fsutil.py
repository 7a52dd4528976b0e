"""Shared JVM Hadoop FileSystem access (round 7 review: the
Path + getFileSystem dance was inlined in three modules — one helper
keeps filesystem handling consistent and gives path-encoding fixes a
single home)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the JVM Hadoop FS API — works
    on any filesystem the cluster can reach, unlike os.path."""
    jvm = spark._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath  # noqa: SLF001
