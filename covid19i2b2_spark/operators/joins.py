"""Join operators (SURVEY.md §2.3).

The reference's joins are: the big fact⋈cohort equi-join (J1), tiny
code-map joins (J2), EXISTS/NOT-EXISTS membership tests (J4/J5), and the
DailyCounts date-interval join (J6).  Spark mappings chosen for 100 TB:

- J1: plain equi-join; AQE picks sort-merge vs shuffled-hash, handles skew.
- J2: explicit ``F.broadcast`` — code maps are ≤ hundreds of rows; never
  let a misestimated stat shuffle the fact table against them.
- J6: range joins must not become BroadcastNestedLoopJoin on two large
  sides; ``range_join`` broadcasts a small side, ``range_join_binned``
  converts interval-containment into an equi-join on coarse date bins +
  residual filter so Catalyst plans a hash join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def broadcast_map_join(
    fact: DataFrame,
    code_map: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """J2: fact ⋈ small code map (reference: fact JOIN #lab_map/#med_map,
    4CE_Phase1.1_Files_mssql.sql ~L740/~L860 reconstructed).  Always
    broadcast: a code map at 100 TB is still hundreds of rows."""
    return fact.join(F.broadcast(code_map), on, how)


def semi_join(df: DataFrame, other: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """J4/P3: WHERE EXISTS / IN (subquery) membership."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """J5/U3: NOT EXISTS / NOT IN (null-safe, unlike SQL NOT IN)."""
    return df.join(other, on, "left_anti")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str | Column,
    start_col: str | Column,
    end_col: str | Column,
    how: str = "inner",
    broadcast_points: bool = True,
    open_end: bool = False,
) -> DataFrame:
    """J6: point-in-interval join ("in hospital on this date": v.start <= d
    AND (v.end >= d OR v.end IS NULL), §DailyCounts ~L520-600 reconstructed).

    The reference's calendar side is tiny (one row per day) — broadcast it
    so the physical plan is BroadcastNestedLoop over a few-hundred-row
    build side, which is fine; for two large sides use range_join_binned.
    """
    p = F.col(point_col) if isinstance(point_col, str) else point_col
    s = F.col(start_col) if isinstance(start_col, str) else start_col
    e = F.col(end_col) if isinstance(end_col, str) else end_col
    cond = (s <= p) & (e.isNull() | (e >= p)) if open_end else (s <= p) & (e >= p)
    left = F.broadcast(points) if broadcast_points else points
    return left.join(intervals, cond, how)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_expr: str = "date_trunc('month', {c})",
) -> DataFrame:
    """J6 at scale: both sides large.  Explode each interval into the
    coarse bins it overlaps (sequence()), equi-join points on their bin,
    then apply the exact containment filter.  Turns an O(n·m) nested loop
    into a shuffle hash join keyed by bin; bin granularity trades explode
    fan-out against join selectivity (months for multi-week stays).
    """
    b_start = F.expr(bin_expr.format(c=start_col))
    b_end = F.expr(bin_expr.format(c=end_col))
    binned_intervals = intervals.withColumn(
        "__bin", F.explode(F.sequence(b_start, b_end, F.expr("interval 1 month")))
    )
    binned_points = points.withColumn("__bin", F.expr(bin_expr.format(c=point_col)))
    out = binned_points.join(binned_intervals, "__bin").filter(
        (F.col(start_col) <= F.col(point_col))
        & (F.col(end_col) >= F.col(point_col))
    )
    return out.drop("__bin")


def join_keyed(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """J1/J3: the workhorse equi-join (fact ⋈ cohort).  Declarative on
    purpose — Catalyst + AQE choose SMJ/SHJ/broadcast and split skewed
    partitions; co-location at 100 TB comes from the storage layout
    (bucket both sides by the key), not from hints here."""
    return left.join(right, list(on) if not isinstance(on, str) else on, how)
