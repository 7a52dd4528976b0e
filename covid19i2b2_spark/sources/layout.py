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
