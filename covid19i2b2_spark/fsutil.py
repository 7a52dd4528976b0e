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

def read_text_file(spark: SparkSession, path: str) -> str | None:
    """Contents of a small control file (version pointer, marker), or
    None if it does not exist OR cannot be read back intact (a torn
    write that fails the FS checksum is a corrupt pointer — to a
    fallback-driven reader that is the same situation as no pointer).
    JVM-FS so it works wherever the data lives; byte-wise read is fine
    — control files are a few bytes."""
    fs, p = hadoop_fs(spark, path)
    try:
        if not fs.exists(p):
            return None
        stream = fs.open(p)
        try:
            data = []
            while True:
                b = stream.read()
                if b < 0:
                    break
                data.append(b)
            return bytes(data).decode()
        finally:
            stream.close()
    except UnicodeDecodeError:
        return None
    except Exception as e:
        # JVM-side ChecksumException/IOException arrive as Py4J errors;
        # anything Python-side (programming errors) must still raise
        if type(e).__module__.startswith("py4j"):
            return None
        raise


def write_text_file_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Write a small control file via tmp + rename — the ADVICE r8 #1
    protocol: ``create(overwrite)`` exposes a truncated file to a crash
    or a racing reader, a rename is atomic on HDFS and local FS.  Some
    FS implementations refuse a rename onto an existing destination, so
    the old file is deleted first; the delete->rename gap must be
    covered by a reader-side fallback (the caller's contract)."""
    fs, p = hadoop_fs(spark, path)
    tmp_p = hadoop_fs(spark, path + ".tmp")[1]
    out = fs.create(tmp_p, True)
    try:
        out.write(text.encode())
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp_p, p):
        raise IOError(f"could not atomically write {path}")


def one_partition_df(spark: SparkSession, rows: list, schema: str):
    """A driver-local DataFrame materialized as ONE partition (round 16,
    guide §1.2 per-task work): ``spark.createDataFrame(rows)``
    parallelizes into defaultParallelism partitions (almost all empty
    for metadata-sized row lists), and the ``coalesce(1)`` every tiny
    control-table write then performed fused them into ONE task that
    pays a sequential Python-runner handshake PER PARENT PARTITION —
    measured 7-8 s per metadata write on local[32] vs ~0.3 s for this
    shape (scripts/bloom_leg_probe.py receipts, OPTIMIZATION_r16.md).
    One slice = one Python eval round = one output file, no coalesce."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
