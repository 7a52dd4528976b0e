"""t2 queries: projections, filters, predicates, distinct, top-k
(SURVEY.md §2.2 P1-P8, §2.6 O1-O2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.functions.buckets import bucket_by_ranges
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table


@query(
    "q_filter_predicates",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_types
    FROM (
        SELECT DISTINCT p_brand, p_type
        FROM part
        WHERE p_size = 15 AND p_brand LIKE 'Brand#1%'
    )
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P4/P8: equality predicate (reference: WHERE severe = 1) +
    LIKE-prefix (concept_cd LIKE code_prefix + '%', ~L800 reconstructed;
    startswith compiles to StringStartsWith) — both push down to the
    parquet scan (PushedFilters) — feeding SELECT DISTINCT (dropDuplicates
    = one hash-aggregate shuffle with map-side partials) and a count per
    brand.  Merges round-1's q_filter_eq / q_like_prefix / q_distinct
    into one driver slot (50-query window, VERDICT r1 #1)."""
    part = read_table(spark, sf_dir, "part")
    return (
        part.filter(
            (F.col("p_size") == 15) & F.col("p_brand").startswith("Brand#1")
        )
        .select("p_brand", "p_type")
        .dropDuplicates()
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_types"))
        .orderBy("p_brand")
    )


@query(
    "q_age_buckets",
    oracle="""
    SELECT CASE WHEN c_acctbal IS NULL THEN 'other'
                WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 2000 THEN '00to2k'
                WHEN c_acctbal < 4000 THEN '02to4k'
                WHEN c_acctbal < 6000 THEN '04to6k'
                WHEN c_acctbal < 8000 THEN '06to8k'
                ELSE '08plus' END AS bal_group,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations
    FROM customer
    GROUP BY 1
    ORDER BY bal_group
    """,
)
def q_age_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/F11/F17: CASE WHEN range bucketing — the 4CE age-group axis
    (§Demographics, reconstructed) applied to acctbal ranges."""
    cust = read_table(spark, sf_dir, "customer")
    buckets = bucket_by_ranges(
        "c_acctbal",
        [(0, "negative"), (2000, "00to2k"), (4000, "02to4k"),
         (6000, "04to6k"), (8000, "06to8k")],
        "08plus",
    )
    return (
        cust.groupBy(buckets.alias("bal_group"))
        .agg(
            F.count("*").alias("n_customers"),
            F.count_distinct("c_nationkey").alias("n_nations"),
        )
        .orderBy("bal_group")
    )


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-k — Spark plans TakeOrderedAndProject (no total sort, each
    partition keeps k).  o_orderkey tiebreak keeps the cutoff deterministic.

    Deregistered from the driver's 50-query window in favor of
    q_bm25_rank (queries/llm3.py): O2's TakeOrderedAndProject shape stays
    driver-green via q_cosine_topk and q_bm25_rank, the plan shape stays
    pinned in tests/test_plan_shape.py, and DF≡oracle parity moves to
    tests/test_oracle_parity.py (UNREGISTERED_ORACLES)."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )
