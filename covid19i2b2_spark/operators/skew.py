"""Skew mitigation (SURVEY §4.2).

AQE handles skewed JOINS (spark.sql.adaptive.skewJoin, on by default in
session.py); skewed GROUP-BY keys need salting: a hot key (one patient
with millions of observations, one boilerplate LSH bucket) lands its
entire group on one task.  Two-phase salted aggregation spreads the hot
key across n_salts partial groups, then merges.

Works for algebraic aggregates (sum/count/min/max — anything with a
merge step).  Exact count-distinct is NOT algebraic; use the two-step
(key, value) distinct-then-count below.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``partial_aggs`` aggregate raw rows; ``merge_aggs`` combine the
    partials (e.g. partial F.count('*').alias('c') merges with
    F.sum('c').alias('c')).  Salt derives from xxhash64 of all columns
    when ``salt_col`` is None — deterministic, uniform, retry-safe (never
    F.rand, SURVEY F13 rationale).
    """
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
        if salt_col is None
        else F.pmod(F.xxhash64(salt_col), F.lit(n_salts))
    )
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *partial_aggs
    )
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_count(
    df: DataFrame, keys: Sequence[str], out: str = "n", n_salts: int = 16
) -> DataFrame:
    return salted_agg(
        df,
        keys,
        [F.count("*").alias("__c")],
        [F.sum("__c").cast("long").alias(out)],
        n_salts,
    )


def skew_resistant_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    out: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT x) for skewed keys: dedupe on (keys, x) first
    — that shuffle keys on (keys, x) so a hot key spreads across
    partitions — then count per key.  Same two-shuffle cost as Spark's
    own distinct-aggregate expansion but with the dedupe explicitly
    spread; memory per task is O(1) (no per-key set)."""
    return (
        df.select(*keys, distinct_col)
        .dropDuplicates([*keys, distinct_col])
        .groupBy(*keys)
        .agg(F.count("*").alias(out))
    )
