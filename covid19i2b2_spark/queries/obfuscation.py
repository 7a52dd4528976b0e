"""t2 queries: the obfuscation pass (SURVEY.md §2.9 D2/D3, §2.8 F13/F15).

One query covers the whole surface: seeded blur noise (F13), small-count
mask (D2), and round-to-nearest (F15).  The noise is md5-derived
(operators/obfuscation.portable_hash), so the DuckDB oracle reproduces
the exact blurred values — the blur path is hash-verified, not just
property-tested (round-1 q_obfuscate_blur was rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.operators.obfuscation import (
    ObfuscationConfig,
    obfuscate_counts,
    round_counts,
)
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table

# DuckDB mirror of seeded_noise(["nationkey","segment","obf_count"], 2, 42):
# pmod(portable_hash, 5) - 2, hash = first 8 md5 hex chars of
# concat_ws('|', keys..., column-name, seed)
_NOISE = """(CAST(('0x' || substr(md5(
        CAST(nationkey AS VARCHAR) || '|' || segment || '|obf_count|42'),
        1, 8)) AS BIGINT) % 5 - 2)"""


@query(
    "q_obfuscate",
    oracle=f"""
    WITH counts AS (
        SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
               COUNT(*) AS n_customers
        FROM customer
        GROUP BY 1, 2
    )
    SELECT nationkey, segment,
           CASE WHEN n_customers < 10 THEN -99
                ELSE GREATEST(n_customers + {_NOISE}, 0) END AS obf_count,
           CASE WHEN n_customers < 10 THEN -99
                ELSE CAST(FLOOR(n_customers / 5.0 + 0.5) * 5 AS BIGINT)
           END AS rounded_count
    FROM counts
    ORDER BY nationkey, segment
    """,
)
def q_obfuscate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/F13/F15: blur (seeded deterministic noise in [-2,+2], never
    F.rand — task retries must reproduce the same noise at 100 TB),
    small-count mask (-99, the published 4CE sentinel), and the
    round-to-nearest-5 demographic option.  Invariants (|noise| <= blur,
    mask wins, non-negative) are also property-tested in
    tests/test_obfuscation.py."""
    cust = read_table(spark, sf_dir, "customer")
    counts = cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count("*").alias("n_customers"))
    cfg = ObfuscationConfig(blur=2, small_count_mask=10, seed=42)
    blurred = obfuscate_counts(
        counts.withColumn("obf_count", F.col("n_customers")),
        ["obf_count"],
        ["nationkey", "segment"],
        cfg,
    )
    rounded = round_counts(
        blurred.withColumn("rounded_count", F.col("n_customers")),
        ["rounded_count"],
        nearest=5,
    )
    # the mask applies to the raw count in both output columns (the
    # reference masks before its rounding option):
    return (
        rounded.withColumn(
            "rounded_count",
            F.when(F.col("n_customers") < cfg.small_count_mask, F.lit(-99)).otherwise(
                F.col("rounded_count")
            ),
        )
        .select("nationkey", "segment", "obf_count", "rounded_count")
        .orderBy("nationkey", "segment")
    )
