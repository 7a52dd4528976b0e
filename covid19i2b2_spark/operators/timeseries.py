"""Per-entity time-series regularization (SURVEY §2.5/§2.11 adjacent —
the gap-fill step clinical-course and metrics pipelines run before
modeling: the 4CE labs tables are per-day observations with missing
days, and downstream consumers want a dense daily grid).

Spark-first shape:
- the date spine is ``sequence(min_day, max_day)`` exploded PER ENTITY —
  no driver-side calendar, no cross join with a global calendar (which
  would key every entity to the same spine rows and skew);
- forward-fill is ``last(value, ignorenulls=True)`` over an entity-
  partitioned window — per-entity partitions, so the window never
  collapses to a single partition regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def resample_daily(
    df: DataFrame,
    entity_col: str,
    date_col: str,
    value_cols: list[str],
    agg: str = "avg",
) -> DataFrame:
    """Dense per-entity daily grid: one row per (entity, day) from the
    entity's first to last observed day; observed days aggregate their
    values (``agg``: avg/min/max/sum — duplicates per day are real in
    observation data), unobserved days carry NULLs for fill_forward.

    Plan: one groupBy(entity, day) for the per-day aggregate, one
    groupBy(entity) for the [min, max] span, a sequence-explode of the
    span (rows = entity's own day count), and a left join back on
    (entity, day) — every shuffle keys on the entity axis."""
    agg_fn = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum}[agg]
    day = F.to_date(F.col(date_col)).alias("__day")
    per_day = df.groupBy(F.col(entity_col), day).agg(
        *[agg_fn(c).alias(c) for c in value_cols]
    )
    spine = (
        per_day.groupBy(entity_col)
        .agg(F.min("__day").alias("__lo"), F.max("__day").alias("__hi"))
        .select(
            entity_col,
            F.explode(F.sequence("__lo", "__hi")).alias("__day"),
        )
    )
    return (
        spine.join(per_day, [entity_col, "__day"], "left")
        .withColumnRenamed("__day", "day")
    )


def fill_forward(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Forward-fill NULLs with the entity's most recent non-null value
    (rows before the first observation stay NULL).  last(...,
    ignorenulls) over an unbounded-preceding entity window — partitioned
    by entity, so parallelism is the entity count and no global sort
    exists."""
    w = (
        Window.partitionBy(entity_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def resample_fill_daily(
    df: DataFrame,
    entity_col: str,
    date_col: str,
    value_cols: list[str],
    agg: str = "avg",
) -> DataFrame:
    """resample_daily + fill_forward: the dense, forward-filled daily
    series consumers actually read."""
    return fill_forward(
        resample_daily(df, entity_col, date_col, value_cols, agg),
        entity_col,
        "day",
        value_cols,
    )
