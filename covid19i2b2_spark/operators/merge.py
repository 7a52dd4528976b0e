"""Merge/upsert emulation (engine surface; no Delta/Iceberg jars in this
environment, so MERGE INTO is composed from primitives — the reference's
weekly re-run pattern is effectively a full-refresh upsert of each
artifact).

anti-join + union: rows of ``target`` whose key appears in ``updates``
are replaced; new keys append.  For SCD2, the replaced rows are instead
closed out with an end-date column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from covid19i2b2_spark.operators.joins import anti_join


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE: update-or-insert by key.  One anti-join (shuffle on key,
    broadcast when updates are small) + unionByName — no row mutation,
    idempotent under re-run."""
    kept = anti_join(target, updates.select(*keys), list(keys))
    return kept.unionByName(updates)


def scd2_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    effective_col: str = "effective_date",
    end_col: str = "end_date",
) -> DataFrame:
    """SCD type-2: close out current rows for changed keys (end_date :=
    the update's effective date) and append the new versions with an open
    end_date."""
    upd_keys = updates.select(
        *keys, F.col(effective_col).alias("__new_effective")
    )
    closed = (
        target.filter(F.col(end_col).isNull())
        .join(upd_keys, list(keys), "inner")
        .withColumn(end_col, F.col("__new_effective"))
        .drop("__new_effective")
    )
    untouched_open = anti_join(
        target.filter(F.col(end_col).isNull()), upd_keys.select(*keys), list(keys)
    )
    history = target.filter(F.col(end_col).isNotNull())
    new_rows = updates.withColumn(end_col, F.lit(None).cast("date"))
    return history.unionByName(closed).unionByName(untouched_open).unionByName(
        new_rows
    )
