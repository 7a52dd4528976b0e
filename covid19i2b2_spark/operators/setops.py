"""Set operations (SURVEY.md §2.7).

The reference assembles code lists, severity sub-cohorts and output files
with INSERT-append / UNION ALL (~L260-330, ~L650-740 reconstructed).
Always ``unionByName`` — positional union is a silent-corruption hazard
when column order drifts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame, allow_missing: bool = False) -> DataFrame:
    """U1: n-way UNION ALL by column name."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
    )


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """U2: UNION (distinct) — dedup after the append, one shuffle."""
    return union_all(*dfs).dropDuplicates()
