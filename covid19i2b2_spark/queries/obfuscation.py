"""t2 queries: the obfuscation pass (SURVEY.md §2.9 D2/D3, §2.8 F13/F15)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.operators.obfuscation import (
    ObfuscationConfig,
    obfuscate_counts,
    round_counts,
)
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table


@query(
    "q_obfuscate",
    oracle="""
    WITH counts AS (
        SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
               COUNT(*) AS n_customers
        FROM customer
        GROUP BY 1, 2
    )
    SELECT nationkey, segment,
           CASE WHEN n_customers < 10 THEN -99 ELSE n_customers END AS obf_count,
           CASE WHEN n_customers < 10 THEN -99
                ELSE CAST(FLOOR(n_customers / 5.0 + 0.5) * 5 AS BIGINT) END AS rounded_count
    FROM counts
    ORDER BY nationkey, segment
    """,
)
def q_obfuscate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/F15: small-count mask (-99, the published 4CE sentinel) and
    round-to-nearest-5 option (blur=0 here so the oracle can check exact
    values; the seeded-noise blur path is q_obfuscate_blur + property
    tests)."""
    cust = read_table(spark, sf_dir, "customer")
    counts = cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count("*").alias("n_customers"))
    cfg = ObfuscationConfig(blur=0, small_count_mask=10)
    masked = obfuscate_counts(
        counts.withColumn("obf_count", F.col("n_customers")),
        ["obf_count"],
        ["nationkey", "segment"],
        cfg,
    )
    rounded = round_counts(
        masked.withColumn("rounded_count", F.col("n_customers")),
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


@query("q_obfuscate_blur", oracle=None)  # xxhash64 noise not reproducible in DuckDB
def q_obfuscate_blur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: the full blur pass with deterministic seeded-hash noise
    (pmod(xxhash64(keys, seed), 2b+1) - b, never F.rand — task retries
    must reproduce the same noise at 100 TB).  Invariants (|noise| <= blur,
    mask wins, non-negative) are property-tested in
    tests/test_obfuscation.py; the driver records rows-only here."""
    cust = read_table(spark, sf_dir, "customer")
    counts = cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count("*").alias("obf_count"))
    cfg = ObfuscationConfig(blur=2, small_count_mask=10, seed=42)
    return obfuscate_counts(
        counts, ["obf_count"], ["nationkey", "segment"], cfg
    ).orderBy("nationkey", "segment")
