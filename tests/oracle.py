"""Local mirror of the driver's t2 compare: order-insensitive,
column-name-sorted, canonicalized value comparison between a Spark result
and a DuckDB result (SURVEY.md §5.2 item 1).

Canonicalization: NULL/NaN -> sentinel; integral numerics -> int string;
floats -> round(6); timestamps at midnight fold to dates (Spark DATE comes
back as datetime.date, DuckDB DATE as datetime64); nested lists recurse.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import numpy as np
import pandas as pd

NULL = "∅"


def canon_cell(v) -> str:
    if v is None:
        return NULL
    if isinstance(v, (float, np.floating)) and math.isnan(v):
        return NULL
    if v is pd.NaT:
        return NULL
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating, Decimal)):
        f = float(v)
        if math.isinf(f):
            return "inf" if f > 0 else "-inf"
        r = round(f, 6)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return repr(r)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        if v.time() == dt.time(0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_table(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(canon_cell(row[c]) for c in cols)
        for _, row in df.iterrows()
    ]
    return sorted(rows)


def assert_frames_match(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str
) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch\n spark={sorted(spark_pdf.columns)}\n"
        f" oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
    )
    a, b = canon_table(spark_pdf), canon_table(oracle_pdf)
    if a != b:
        diffs = [
            f"  spark={ra}\n oracle={rb}"
            for ra, rb in zip(a, b)
            if ra != rb
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch ({len([1 for x, y in zip(a, b) if x != y])}"
            f" differing rows of {len(a)}); first diffs:\n" + "\n".join(diffs)
        )
