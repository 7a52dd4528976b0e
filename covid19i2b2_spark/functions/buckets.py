"""Bucketing helpers (SURVEY.md §2.8 F11/F17, §2.2 P7).

The reference buckets age into the published 4CE groups with a CASE WHEN
chain (§Demographics, reconstructed); ``bucket_by_ranges`` generalizes
that: a list of (upper_bound_exclusive, label), else-label last.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F

# Published 4CE Phase 1.1 age groups.
AGE_GROUPS: list[tuple[float, str]] = [
    (3, "00to02"), (6, "03to05"), (12, "06to11"), (18, "12to17"),
    (26, "18to25"), (50, "26to49"), (70, "50to69"), (80, "70to79"),
]
AGE_ELSE = "80plus"


def bucket_by_ranges(
    col: str | Column,
    bounds: Sequence[tuple[float, str]],
    else_label: str,
    null_label: str = "other",
) -> Column:
    """CASE WHEN x < b1 THEN l1 WHEN x < b2 THEN l2 ... ELSE else END."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.when(c.isNull(), F.lit(null_label))
    for bound, label in bounds:
        expr = expr.when(c < bound, F.lit(label))
    return expr.otherwise(F.lit(else_label))


def age_group(age_col: str | Column) -> Column:
    return bucket_by_ranges(age_col, AGE_GROUPS, AGE_ELSE)


def age_from_birth(birth_col: str | Column, ref_col: str | Column) -> Column:
    """F17: age in whole years at a reference date."""
    b = F.col(birth_col) if isinstance(birth_col, str) else birth_col
    r = F.col(ref_col) if isinstance(ref_col, str) else ref_col
    return F.floor(F.months_between(r, b) / 12).cast("int")
