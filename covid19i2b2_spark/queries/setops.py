"""t2 queries: set operations (SURVEY.md §2.7 U1-U4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.operators.setops import union_all, union_distinct
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table


@query(
    "q_union_all",
    oracle="""
    SELECT entity_type, nationkey, COUNT(*) AS n_entities
    FROM (
        SELECT 'customer' AS entity_type, c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT 'supplier' AS entity_type, s_nationkey AS nationkey FROM supplier
    )
    GROUP BY entity_type, nationkey
    ORDER BY entity_type, nationkey
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: UNION ALL (reference: severity sub-cohort assembly
    labs ∪ meds ∪ diags ∪ procs, ~L260-330 reconstructed)."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity_type"), F.col("c_nationkey").alias("nationkey")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity_type"), F.col("s_nationkey").alias("nationkey")
    )
    return (
        union_all(cust, supp)
        .groupBy("entity_type", "nationkey")
        .agg(F.count("*").alias("n_entities"))
        .orderBy("entity_type", "nationkey")
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    )
    ORDER BY nationkey
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: UNION distinct (reference: deduped severe-patient set)."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return union_distinct(cust, supp).orderBy("nationkey")
