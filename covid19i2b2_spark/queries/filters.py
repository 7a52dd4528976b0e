"""t2 queries: projections, filters, predicates, distinct, top-k
(SURVEY.md §2.2 P1-P8, §2.6 O1-O2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.functions.buckets import bucket_by_ranges
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table


@query(
    "q_filter_eq",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus = 'F'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: equality predicates (reference: WHERE severe = 1 etc.).
    Both predicates push down to the parquet scan (PushedFilters)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_like_prefix",
    oracle="""
    SELECT p_type, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM part
    WHERE p_brand LIKE 'Brand#1%'
    GROUP BY p_type
    ORDER BY p_type
    """,
)
def q_like_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: LIKE-prefix predicate (reference: concept_cd LIKE
    code_prefix_icd10cm + '%', ~L800 reconstructed).  startswith compiles
    to StringStartsWith and pushes down to parquet."""
    from covid19i2b2_spark.operators.aggregates import dsum

    part = read_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_brand").startswith("Brand#1"))
        .groupBy("p_type")
        .agg(F.count("*").alias("n_parts"), dsum("p_retailprice", "sum_price"))
        .orderBy("p_type")
    )


@query(
    "q_distinct",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment
    FROM customer
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: SELECT DISTINCT (reference: DISTINCT patient_num,
    admission_date ~L360).  dropDuplicates = one hash-aggregate shuffle
    with map-side partials."""
    cust = read_table(spark, sf_dir, "customer")
    return (
        cust.select("c_nationkey", "c_mktsegment")
        .dropDuplicates()
        .orderBy("c_nationkey", "c_mktsegment")
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


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-k — Spark plans TakeOrderedAndProject (no total sort, each
    partition keeps k).  o_orderkey tiebreak keeps the cutoff deterministic."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )
