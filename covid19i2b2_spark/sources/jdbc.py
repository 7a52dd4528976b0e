"""JDBC source (SURVEY §2.1 S6).

Deployment reality: i2b2 lives in an RDBMS (the reference runs *inside*
SQL Server/Oracle).  The Spark engine ingests via partitioned JDBC reads
— `partitionColumn=patient_num` splits the fact table into numPartitions
range scans that run in parallel across executors, which is the only way
a single-table JDBC read scales.

Exercised end-to-end in this harness against Apache Derby (the embedded
RDBMS Spark ships for its Hive metastore): tests/test_jdbc.py runs the
real ``.load()`` — driver resolution, the numPartitions parallel range
scans on the partition column, filter pushdown into the database
(PushedFilters on the JDBC scan), and an i2b2-shaped aggregate over the
ingested rows.  Production swaps only the url/driver options.
"""

from __future__ import annotations

from pyspark.sql import DataFrameReader, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str = "patient_num",
    lower_bound: int = 0,
    upper_bound: int = 1 << 31,
    num_partitions: int = 64,
    fetch_size: int = 10_000,
    **options: str,
) -> DataFrameReader:
    """Configured partitioned-JDBC reader for an i2b2 table.

    At 100 TB-adjacent scale the knobs that matter: numPartitions bounds
    parallelism AND concurrent DB connections; bounds should cover the
    real key range or edge partitions skew; fetchsize trades round-trips
    for memory.
    """
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
        .options(**options)
    )
