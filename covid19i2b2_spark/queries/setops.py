"""t2 queries: set operations (SURVEY.md §2.7 U1-U4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.operators.setops import union_all, union_distinct
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table


@query(
    "q_set_ops",
    oracle="""
    WITH ua AS (
        SELECT entity_type, nationkey, COUNT(*) AS n_entities
        FROM (
            SELECT 'customer' AS entity_type, c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT 'supplier' AS entity_type, s_nationkey AS nationkey FROM supplier
        )
        GROUP BY entity_type, nationkey
    ),
    ud AS (
        SELECT nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION
            SELECT s_nationkey AS nationkey FROM supplier
        )
    )
    SELECT ua.entity_type, ua.nationkey, ua.n_entities
    FROM ua JOIN ud ON ua.nationkey = ud.nationkey
    ORDER BY ua.entity_type, ua.nationkey
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2: UNION ALL (reference: severity sub-cohort assembly
    labs ∪ meds ∪ diags ∪ procs, ~L260-330 reconstructed) beside UNION
    distinct (deduped severe-patient set), joined on the distinct key set.
    Merges round-1's q_union_all / q_union_distinct into one driver slot
    (50-query window, VERDICT r1 #1)."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity_type"), F.col("c_nationkey").alias("nationkey")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity_type"), F.col("s_nationkey").alias("nationkey")
    )
    ua = (
        union_all(cust, supp)
        .groupBy("entity_type", "nationkey")
        .agg(F.count("*").alias("n_entities"))
    )
    ud = union_distinct(
        cust.select("nationkey"), supp.select("nationkey")
    )
    return ua.join(ud, "nationkey").select(
        "entity_type", "nationkey", "n_entities"
    ).orderBy("entity_type", "nationkey")
