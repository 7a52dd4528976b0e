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
import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark import schemas
from covid19i2b2_spark.session import ensure_runtime_conf

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


@functools.lru_cache(maxsize=64)
def _events_ts_unit_cached(path: str, mtime_ns: int, size: int) -> str:
    """Footer sniff, cached on (path, mtime, size) so a regenerated file at
    the same path (e.g. test fixtures rewriting testdata with a different
    timestamp unit) never serves a stale unit — a wrong cached unit would
    silently shift every timestamp by 1000x."""
    try:
        import pyarrow.parquet as pq  # pyspark does not hard-require pyarrow

        target = path
        if os.path.isdir(path):
            # recursive: hive-partitioned datasets keep part files under
            # partition subdirectories, invisible to a top-level glob
            parts = sorted(
                glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            )
            if parts:
                target = parts[0]
        return pq.read_schema(target).field("ts").type.unit
    except Exception:
        warnings.warn(
            f"could not sniff timestamp unit of {path!r}; assuming 'us' "
            "(legacy NANOS files would be misread — check the footer)",
            stacklevel=2,
        )
        return "us"  # modern default; NANOS files are the legacy special case


def events_ts_unit(path: str) -> str:
    """Sniff the parquet footer for the ``ts`` column's timestamp unit
    ('ns' | 'us' | 'ms' | 's').

    Different generations of the driver testdata encoded ``ts``
    differently (round 1: TIMESTAMP(NANOS); round 2: TIMESTAMP(MICROS)),
    and reading NANOS needs a different plan than MICROS.  One footer read
    on the driver (directories: first part file) decides.
    """
    try:
        st = os.stat(path)
        key = (st.st_mtime_ns, st.st_size)
    except OSError:
        key = (0, 0)
    return _events_ts_unit_cached(path, *key)


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
        # unconditional: pins spark.sql.session.timeZone=UTC on externally
        # created sessions so timestamp_ntz casts / time functions match the
        # UTC-naive DuckDB oracle on non-UTC hosts (cheap + idempotent)
        ensure_runtime_conf(spark)
        if events_ts_unit(path) == "ns":
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
