"""Schema-enforced parquet readers for the driver testdata + i2b2 fixtures.

SURVEY.md §2.1 S1: base-table scan with predicate/column pushdown.  Readers
always pass explicit schemas (schemas.py) so Catalyst plans against known
types and the parquet scan prunes columns / pushes filters.

Scale note (100 TB): these readers take a directory path; on a cluster the
same call reads a partitioned/bucketed dataset.  Nothing here collects.
"""

from __future__ import annotations

import functools
import glob
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark import schemas
from covid19i2b2_spark.session import ensure_runtime_conf

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


@functools.lru_cache(maxsize=64)
def events_ts_unit(path: str) -> str:
    """Sniff the parquet footer for the ``ts`` column's timestamp unit
    ('ns' | 'us' | 'ms' | 's').

    Different generations of the driver testdata encoded ``ts``
    differently (round 1: TIMESTAMP(NANOS); round 2: TIMESTAMP(MICROS)),
    and reading NANOS needs a different plan than MICROS — a wrong guess
    silently shifts every timestamp by 1000x.  One footer read on the
    driver (directories: first part file) decides; cached per path.
    """
    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if parts:
            target = parts[0]
    try:
        return pq.read_schema(target).field("ts").type.unit
    except Exception:
        return "us"  # modern default; NANOS files are the legacy special case


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its canonical schema.

    ``events`` needs unit-aware handling (see :func:`events_ts_unit`):
    TIMESTAMP(NANOS) files are unreadable by Spark's parquet reader unless
    ``spark.sql.legacy.parquet.nanosAsLong=true`` — we then read epoch-nanos
    as long and convert JVM-side (integer div + timestamp_micros, stays in
    whole-stage codegen).  MICROS files read natively as timestamp_ntz.
    """
    if name == "events":
        path = _path(sf_dir, name)
        if events_ts_unit(path) == "ns":
            ensure_runtime_conf(spark)  # nanosAsLong must be set
            raw = spark.read.schema(schemas.TESTDATA_EVENTS_RAW).parquet(path)
            return raw.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        return spark.read.schema(schemas.TESTDATA["events"]).parquet(path)
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
