"""X59: snapshot schema + statistics drift report (SURVEY §2.11
extension; round 10).  The ingest guard every periodic pipeline runs
before trusting a new snapshot: did a column disappear or change type,
did a null rate jump, did the distinct cardinality or value range move
— the expectations-style check that catches an upstream extractor
regression BEFORE it trains into a model.  X45's corpus drift watches
the token DISTRIBUTION of one text column; this watches the SHAPE of
the whole table.

One aggregate pass per snapshot: every requested column contributes
its metrics to a single ``agg`` (count/nulls/distinct/min/max), so the
report costs two scans total regardless of column count.  Exact
count_distinct is used — it makes the report oracle-checkable and the
per-column Expand is priced into a validation pass that runs once per
snapshot, not per query (swap to approx_count_distinct at 100 TB if
the 2-scan budget matters more than exactness; the schema keeps the
column names either way).

min/max are reported as strings (one report schema across
numeric/date/string columns); null_frac is round6 for cross-engine
hashing.  Columns missing from one side report NULL metrics there and
``schema_drift`` = true — as does a dtype change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from covid19i2b2_spark.operators.aggregates import round6


def _side_stats(df: DataFrame, columns: list[str], suffix: str) -> DataFrame:
    """One 1-row aggregate with every column's metrics, unpivoted to
    (column, type_x, null_frac_x, n_distinct_x, min_x, max_x)."""
    present = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        if c not in present:
            continue
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    spark = df.sparkSession
    parts = []
    for c in columns:
        if c in present:
            parts.append(
                row.select(
                    F.lit(c).alias("column"),
                    F.lit(present[c]).alias(f"type_{suffix}"),
                    round6(
                        F.when(F.col("__n") > 0,
                               F.col(f"__null_{c}") / F.col("__n"))
                        .otherwise(F.lit(0.0))
                    ).alias(f"null_frac_{suffix}"),
                    F.col(f"__dist_{c}").cast("long").alias(
                        f"n_distinct_{suffix}"
                    ),
                    F.col(f"__min_{c}").alias(f"min_{suffix}"),
                    F.col(f"__max_{c}").alias(f"max_{suffix}"),
                )
            )
        else:
            parts.append(
                spark.createDataFrame(
                    [(c,)], "column string"
                ).select(
                    "column",
                    F.lit(None).cast("string").alias(f"type_{suffix}"),
                    F.lit(None).cast("double").alias(f"null_frac_{suffix}"),
                    F.lit(None).cast("long").alias(f"n_distinct_{suffix}"),
                    F.lit(None).cast("string").alias(f"min_{suffix}"),
                    F.lit(None).cast("string").alias(f"max_{suffix}"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot_drift_report(
    a: DataFrame,
    b: DataFrame,
    columns: list[str] | None = None,
) -> DataFrame:
    """Column-by-column comparison of two snapshots: (column, type_a,
    type_b, null_frac_a/b, n_distinct_a/b, min/max_a/b, schema_drift).
    ``columns`` defaults to the UNION of both schemas in a's order
    (then b-only names) — a dropped or added column is exactly what
    the report exists to surface.  ``schema_drift`` flags presence or
    dtype mismatches; thresholding the statistical deltas is the
    caller's policy (alert levels belong to the pipeline, not the
    operator)."""
    if columns is None:
        a_cols = [f.name for f in a.schema.fields]
        b_only = [
            f.name for f in b.schema.fields if f.name not in set(a_cols)
        ]
        columns = a_cols + b_only
    if not columns:
        raise ValueError("no columns to compare")
    sa = _side_stats(a, columns, "a")
    sb = _side_stats(b, columns, "b")
    return sa.join(sb, "column").select(
        "column",
        "type_a",
        "type_b",
        "null_frac_a",
        "null_frac_b",
        "n_distinct_a",
        "n_distinct_b",
        "min_a",
        "min_b",
        "max_a",
        "max_b",
        (
            F.col("type_a").isNull()
            | F.col("type_b").isNull()
            | (F.col("type_a") != F.col("type_b"))
        ).alias("schema_drift"),
    )
