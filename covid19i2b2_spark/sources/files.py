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


def read_evolving_snapshots(
    spark: SparkSession,
    paths: list[str],
    snapshot_col: str | None = "snapshot",
) -> DataFrame:
    """Read a sequence of parquet snapshots whose schemas EVOLVED over
    time (later crawls add columns — quality scores, license tags,
    embedding ids) into one frame: the union of all columns, with
    missing ones NULL, optionally tagged with the source snapshot path.

    Two schema-evolution strategies, composed:

    - within one path, Spark's native ``mergeSchema`` reconciles files
      written at different schema versions (footer-level merge — no
      data pass);
    - across paths, ``unionByName(allowMissingColumns=True)`` aligns by
      COLUMN NAME, never position — the only safe alignment when
      snapshots dropped or reordered columns.

    Scale note: each snapshot stays an independent parquet scan with
    its own pushdown/pruning; the union is plan-level (no shuffle).
    Type CONFLICTS (same column, different type) are not silently cast
    — Spark raises, which is the correct failure mode for a corpus
    store; reconcile types upstream."""
    if not paths:
        raise ValueError("paths must be non-empty")
    frames = []
    for p in paths:
        df = spark.read.option("mergeSchema", "true").parquet(p)
        if snapshot_col is not None:
            from pyspark.sql import functions as F

            df = df.withColumn(snapshot_col, F.lit(p))
        frames.append(df)
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
