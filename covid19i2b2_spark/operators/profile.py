"""Dataset profiling (pipeline QC surface — the 4CE consortium's central
upload validation did schema/range checks per site; SURVEY §5.1.  A
training-data pipeline needs the same: per-column null rates, cardinality,
ranges, before data enters the corpus)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from covid19i2b2_spark.operators.aggregates import round6


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: n_rows, n_null, null_rate, n_distinct (exact),
    min/max as strings.  Single pass per column batch; all exact so the
    result is oracle-checkable."""
    cols = columns or df.columns
    per_col = []
    for c in cols:
        per_col.append(
            df.agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
                F.count_distinct(c).alias("n_distinct"),
                F.min(F.col(c).cast("string")).alias("min_value"),
                F.max(F.col(c).cast("string")).alias("max_value"),
            )
        )
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "null_rate", round6(F.col("n_null").cast("double") / F.col("n_rows"))
    )
