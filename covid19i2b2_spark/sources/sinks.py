"""File sinks.

SURVEY.md §2.1 S4/S5: the reference ends each pipeline with an ordered
SELECT exported as CSV — either as result-set columns or as pre-serialized
CSV lines with a header row (the ``output_as_columns`` / ``output_as_csv``
config switch, 4CE_Phase1.1_Files_mssql.sql:§output ~L980-1100,
reconstructed).

Scale note: ``single_file=True`` coalesces to 1 partition — only sane for
the reference's aggregate outputs (thousands of rows).  Large extracts keep
the partitioned layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def write_csv(
    df: DataFrame,
    path: str,
    order_by: list[str | Column] | None = None,
    single_file: bool = False,
    as_lines: bool = False,
    mode: str = "overwrite",
) -> None:
    """Ordered CSV export (S4) with the reference's two output modes (S5).

    ``as_lines=True`` mirrors the reference's csv-string mode: one varchar
    column containing the pre-joined line (header row included via a
    sort-key union, as the reference does with a ``sort`` column).
    """
    out = df.orderBy(*order_by) if order_by else df
    if as_lines:
        cols = out.columns
        header = out.sparkSession.range(1).select(
            F.lit(",".join(cols)).alias("line"), F.lit(0).alias("_sort")
        )
        body = out.select(
            F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("line"),
            F.lit(1).alias("_sort"),
        )
        lines = header.unionByName(body).orderBy("_sort").select("line")
        (lines.coalesce(1) if single_file else lines).write.mode(mode).text(path)
        return
    writer = (out.coalesce(1) if single_file else out).write.mode(mode)
    writer.option("header", True).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    split_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Training-data export (north-star sink): JSONL shards — the
    interchange format every trainer/tokenizer toolchain reads.

    The output of pack_sequences/hash_split writes as
    ``path/[split=…/]shard=…/part-*.json`` with one JSON object per line.
    Partitioning by (split, shard) means a trainer reading shard k of
    split 'train' lists exactly one directory, and shards can be
    consumed/resumed independently — the layout contract, not a detail.
    Rows within a shard are repartitioned to one file per shard so a
    shard IS a file (readers assume this); shard counts are chosen by
    pack_sequences' n_shards, so files stay executor-memory-sized at any
    corpus scale."""
    parts = [c for c in ([split_col] if split_col else []) + [shard_col]]
    (
        df.repartition(*[F.col(c) for c in parts])
        .write.mode(mode)
        .partitionBy(*parts)
        .json(path)
    )
