"""CSV/JSON readers with enforced schemas (engine surface beyond the
parquet default; SURVEY §2.1).  Never infer schemas in production — an
inference pass is a full extra scan at 100 TB and silently drifts."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)
