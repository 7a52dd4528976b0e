"""Mergeable distinct-count sketch store (SURVEY §2.4 A1' at scale —
the incremental companion to approx_count_distinct).

``approx_count_distinct`` answers one query over one scan.  At 100 TB
the pattern that matters is MERGEABILITY: aggregate each day/partition
ONCE into an Apache DataSketches HLL sketch (Spark 3.5+ built-ins —
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``, all
JVM-side), persist the binary sketches next to the rollup, and answer
any coarser-grained distinct question later — weekly, monthly, total,
cross-partition — by unioning kilobyte sketches instead of re-scanning
raw data.  A new day's load appends one sketch row; nothing is
recomputed.

Error: standard HLL, ~1.04/sqrt(2^lg_k) relative standard error
(lg_k=12 -> ~1.6%); pinned by the error-bound tests, mirroring the
approx_count_distinct testing strategy (SURVEY §5.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def build_distinct_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per group:
    (group_cols..., sketch binary, n_rows).  One map-side-combined
    aggregate — the only pass over the raw data this store ever takes.
    Persist the result (parquet handles the binary column) keyed by the
    finest grain you will query."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def rollup_distinct_sketches(
    sketches: DataFrame,
    group_cols: Sequence[str],
    allow_different_lg_k: bool = False,
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grain — (group_cols
    ..., approx_distinct, n_rows) — by unioning the binary sketches.
    Never touches raw data: the shuffle moves kilobyte sketches, one per
    input group.  Pass ``group_cols=[]`` for the global rollup."""
    aggs = [
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(allow_different_lg_k))
        ).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*aggs)
    return sketches.agg(*aggs)


def merge_sketch_stores(
    existing: DataFrame, batch: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Incremental maintenance: fold a new batch's sketches into the
    store (same schema both sides).  Groups present in both merge via
    sketch union; new groups append — one union + one groupBy over
    sketch rows, the steady-state daily-load step."""
    return (
        existing.unionByName(batch)
        .groupBy(*group_cols)
        .agg(
            F.hll_union_agg("sketch").alias("sketch"),
            F.sum("n_rows").alias("n_rows"),
        )
    )
