"""Window operators (SURVEY.md §2.5).

The reference (T-SQL) computes cumulative counts via `<=` self-joins
(4CE_Phase1.1_Files_mssql.sql:§DailyCounts ~L520-600, reconstructed) and
first-events via MIN-subqueries; idiomatic Spark replaces both with window
functions — identical semantics, strictly better plans (no O(n^2) join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def cumulative(
    df: DataFrame,
    order_by: str | Column,
    sums: dict[str, str | Column],
    partition_by: Sequence[str | Column] = (),
) -> DataFrame:
    """Running totals ordered by ``order_by`` (W1; replaces reference J7
    self-join).

    Scale invariant: when ``partition_by`` is empty this is a
    single-partition window — callers MUST pre-aggregate first so the input
    is small (e.g. one row per calendar day; SURVEY.md §4.2).  The covid
    DailyCounts feed is ≤ a few thousand rows, so this is safe by
    construction; for large inputs pass a partition key.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for out_name, src in sums.items():
        out = out.withColumn(out_name, F.sum(src).over(w))
    return out


def first_per_entity(
    df: DataFrame,
    entity_cols: Sequence[str],
    order_by: Sequence[str | Column],
    keep_ties: bool = False,
) -> DataFrame:
    """Earliest row per entity (W2/J9) — e.g. first admission per patient
    (reference: MIN(start_date) subquery, ~L350 reconstructed).

    ``row_number`` (or ``rank`` for ties) over an entity-partitioned window;
    shuffles once on the entity key, no self-join.
    """
    rank_fn = F.rank if keep_ties else F.row_number
    w = Window.partitionBy(*entity_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", rank_fn().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreak: str | None = None,
) -> DataFrame:
    """Batch sessionization: lag(ts) per entity, new-session flag when the
    gap exceeds the threshold, running sum -> session_id (the standard
    lag+cumsum idiom; streaming equivalent is F.session_window).

    Two window passes over the same entity-partitioned ordering — one
    shuffle total, scales with the entity key.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    flagged = df.withColumn("__prev_ts", F.lag(ts_col).over(w)).withColumn(
        "__new_session",
        (
            F.col("__prev_ts").isNull()
            | ((F.col(ts_col) - F.col("__prev_ts")) > gap)
        ).cast("long"),
    )
    return flagged.withColumn(
        "session_id",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("__prev_ts", "__new_session")


def with_row_number(
    df: DataFrame,
    order_by: Sequence[str | Column],
    out_name: str = "row_num",
    partition_by: Sequence[str | Column] = (),
) -> DataFrame:
    """W3: ordered row numbering (reference: CSV sort column / Phase-2
    pseudonym assignment via ROW_NUMBER() OVER (ORDER BY NEWID())).

    Unpartitioned use is single-partition — output-edge only (the reference
    only numbers final, already-small result sets).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out_name, F.row_number().over(w))
