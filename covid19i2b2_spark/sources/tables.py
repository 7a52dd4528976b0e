"""Schema-enforced parquet readers for the driver testdata + i2b2 fixtures.

SURVEY.md §2.1 S1: base-table scan with predicate/column pushdown.  Readers
always pass explicit schemas (schemas.py) so Catalyst plans against known
types and the parquet scan prunes columns / pushes filters.

Scale note (100 TB): these readers take a directory path; on a cluster the
same call reads a partitioned/bucketed dataset.  Nothing here collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark import schemas
from covid19i2b2_spark.session import ensure_runtime_conf

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its canonical schema.

    ``events`` needs special handling: its ``ts`` column is parquet
    TIMESTAMP(NANOS), unreadable by Spark's parquet reader unless
    ``spark.sql.legacy.parquet.nanosAsLong=true`` (runtime-settable); we
    read epoch-nanos as long and convert to timestamp_ntz JVM-side
    (integer div + timestamp_micros — stays in whole-stage codegen).
    """
    if name == "events":
        ensure_runtime_conf(spark)  # driver may hand us a vanilla session
        raw = (
            spark.read.schema(schemas.TESTDATA_EVENTS_RAW)
            .parquet(_path(sf_dir, name))
        )
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    if name not in schemas.TESTDATA:
        raise KeyError(f"unknown table {name!r}; known: {schemas.TABLE_NAMES}")
    return (
        spark.read.schema(schemas.TESTDATA[name]).parquet(_path(sf_dir, name))
    )


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = schemas.TABLE_NAMES
) -> None:
    """Register each table as a temp view so Spark SQL queries see the same
    relations the DuckDB oracle does."""
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_i2b2(spark: SparkSession, fixture_dir: str, name: str) -> DataFrame:
    """Read an i2b2-star-schema table (covid pipeline input) from parquet."""
    return spark.read.schema(schemas.I2B2[name]).parquet(_path(fixture_dir, name))
