"""Code-string functions (SURVEY.md §2.8 F5-F8).

The reference namespaces concept codes as '<PREFIX><code>' (e.g.
'ICD10CM:J80') and derives the Diagnoses axis by stripping the prefix,
removing dots, and truncating to 3 characters:
LEFT(REPLACE(SUBSTRING(concept_cd, LEN(prefix)+1, 999), '.', ''), 3)
(4CE_Phase1.1_Files_mssql.sql:§Diagnoses ~L800-860, reconstructed).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def strip_prefix(code: str | Column, prefix: str) -> Column:
    """SUBSTRING(code, LEN(prefix)+1, 999) — prefix removal by length, the
    reference's idiom (it has already LIKE-filtered on the prefix, P4)."""
    c = F.col(code) if isinstance(code, str) else code
    return F.substring(c, len(prefix) + 1, 999)


def icd_3chars(code: str | Column, prefix: str) -> Column:
    """The 3-char ICD rollup axis: strip prefix, drop '.', keep 3 chars."""
    stripped = strip_prefix(code, prefix)
    return F.left(F.replace(stripped, F.lit("."), F.lit("")), F.lit(3))


def has_prefix(code: str | Column, prefix: str) -> Column:
    """P4: concept_cd LIKE prefix + '%' — startswith compiles to a
    StartsWith predicate that pushes down to the parquet scan."""
    c = F.col(code) if isinstance(code, str) else code
    return c.startswith(prefix)
