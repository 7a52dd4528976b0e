"""Storage layout for 100 TB (SURVEY §4.2 physical design).

The single highest-leverage decision at scale: write the fact tables
bucketed by `patient_num` (and date-partitioned where queries prune on
time).  Every per-patient join and groupBy in the covid pipeline then
reads co-located buckets — no shuffle for the workhorse J1 join, and
dynamic partition pruning handles the date axis.

Bucketing requires saveAsTable (bucket metadata lives in the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist bucketed (+ optionally sorted/partitioned) as a catalog
    table.  Joins/groupBys keyed on bucket_cols between tables written
    with the SAME n_buckets skip their Exchange entirely."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    date_col: str,
    partition_col: str = "event_date",
    mode: str = "overwrite",
) -> None:
    """Time-series layout: plain parquet partitioned by calendar date —
    the standard 100 TB events layout.  Date-bounded queries then touch
    only the matching directories (partition pruning; with a join against
    a date dimension, dynamic partition pruning).  Unlike bucketing this
    needs no catalog: any reader prunes on the directory structure."""
    from pyspark.sql import functions as F

    (
        df.withColumn(partition_col, F.to_date(date_col))
        .write.mode(mode)
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_date_range(
    spark: SparkSession, path: str, lo: str, hi: str,
    partition_col: str = "event_date",
) -> DataFrame:
    """Partition-pruned date-range read over a write_date_partitioned
    layout (the filter is on the partition column, so only lo..hi
    directories are listed/scanned)."""
    from pyspark.sql import functions as F

    return spark.read.parquet(path).filter(
        F.col(partition_col).between(F.lit(lo), F.lit(hi))
    )
