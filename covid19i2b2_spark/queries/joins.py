"""t2 queries: joins (SURVEY.md §2.3 J1-J9, §2.1 S2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from covid19i2b2_spark.operators.aggregates import dsum
from covid19i2b2_spark.operators.joins import (
    anti_join,
    broadcast_map_join,
    join_keyed,
    range_join,
    semi_join,
)
from covid19i2b2_spark.operators.windows import first_per_entity
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table


@query(
    "q_join_inner",
    oracle="""
    SELECT n_name AS nation,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_totalprice
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY nation
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2: the workhorse join pipeline — large×large equi-join
    (reference: fact ⋈ #covid_cohort on patient_num, ~L520-920
    reconstructed; declarative, AQE picks the strategy, bucketing both
    sides by the key makes it shuffle-free at 100 TB) feeding a large×small
    broadcast map join (fact ⋈ #lab_map, ~L740; F.broadcast pins
    BroadcastHashJoin so the fact side never reshuffles).  Merges round-1's
    q_join_inner / q_join_broadcast into one driver slot; the BHJ plan
    shape stays pinned in tests/test_plan_shape.py."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = join_keyed(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    named = broadcast_map_join(joined, nation, "c_nationkey")
    return (
        named.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            dsum("o_totalprice", "sum_totalprice"),
        )
        .orderBy("nation")
    )


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer join preserving customers with no orders (reference:
    cohort LEFT JOIN death/race sources, ~L650 reconstructed).

    Deregistered round 7 (VERDICT r6 #4): its t2 slot went to
    q_token_budget_select so the fixed global-prefix plan sits under the
    driver oracle; J3 semantics stay covered by q_semi_anti_join's build,
    the covid pipeline's cohort LEFT JOINs, and this query's own DuckDB
    parity in tests/test_oracle_parity.py (UNREGISTERED tier)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    return (
        join_keyed(cust, orders, "c_custkey", "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")), F.lit(0)
            )
            .cast("double")
            .alias("sum_totalprice"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_semi_anti_join",
    oracle="""
    SELECT 'has_open' AS membership, c_custkey, c_nationkey
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    UNION ALL
    SELECT 'no_pending' AS membership, c_custkey, c_nationkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    ORDER BY membership, c_custkey
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/J5/P3/U3/U4: WHERE EXISTS membership (reference: concept_cd IN
    (SELECT local_med_code FROM #med_map), cohort membership tests) union
    NOT EXISTS complement (patients without severe indicators, ~L470
    reconstructed; filtered to 'P' orders so the complement is non-empty at
    every sf — an all-rows or zero-rows anti-join would be a
    trivially-passing check).  Merges round-1's q_semi_join / q_anti_join
    into one driver slot (50-query window, VERDICT r1 #1)."""
    cust = read_table(spark, sf_dir, "customer")
    open_orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    pending = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    semi = semi_join(cust, open_orders, "c_custkey").select(
        F.lit("has_open").alias("membership"), "c_custkey", "c_nationkey"
    )
    anti = anti_join(cust, pending, "c_custkey").select(
        F.lit("no_pending").alias("membership"), "c_custkey", "c_nationkey"
    )
    return semi.unionByName(anti).orderBy("membership", "c_custkey")


@query(
    "q_range_join",
    oracle="""
    WITH stays AS (
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS admit_date,
               CAST(o_orderdate AS DATE) + CAST(o_orderkey % 20 AS INTEGER)
                   AS discharge_date
        FROM orders
    ),
    cal AS (
        SELECT DISTINCT CAST(date_trunc('month', admit_date) AS DATE) AS cal_date
        FROM stays
    )
    SELECT cal_date, COUNT(*) AS n_in_hospital
    FROM cal JOIN stays
      ON stays.admit_date <= cal.cal_date AND stays.discharge_date >= cal.cal_date
    GROUP BY cal_date
    ORDER BY cal_date
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/P5/F2: point-in-interval join — "num_patients_in_hospital_on_
    this_date" (4CE §DailyCounts ~L520-600 reconstructed).  Stays are
    synthesized (admit=orderdate, discharge=admit + orderkey%20 days); the
    calendar side is tiny and broadcast, so the plan is a broadcast
    nested-loop over ~tens of build rows, not an O(n·m) shuffle."""
    orders = read_table(spark, sf_dir, "orders")
    stays = orders.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("admit_date"),
        F.date_add(
            F.to_date("o_orderdate"), (F.col("o_orderkey") % 20).cast("int")
        ).alias("discharge_date"),
    )
    cal = stays.select(
        F.trunc("admit_date", "month").alias("cal_date")
    ).dropDuplicates()
    joined = range_join(cal, stays, "cal_date", "admit_date", "discharge_date")
    return (
        joined.groupBy("cal_date")
        .agg(F.count("*").alias("n_in_hospital"))
        .orderBy("cal_date")
    )


@query(
    "q_asof_first",
    oracle="""
    SELECT o_custkey AS custkey,
           o_orderkey AS first_orderkey,
           CAST(o_orderdate AS DATE) AS first_order_date
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn = 1
    ORDER BY custkey
    """,
)
def q_asof_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9/W2/A3: earliest-event-per-entity (reference: first admission per
    patient after the positive test, MIN(start_date) ~L350 reconstructed).
    One window shuffle on the entity key; o_orderkey tiebreak for
    determinism."""
    orders = read_table(spark, sf_dir, "orders")
    first = first_per_entity(orders, ["o_custkey"], ["o_orderdate", "o_orderkey"])
    return first.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
        F.to_date("o_orderdate").alias("first_order_date"),
    ).orderBy("custkey")


def q_literal_map_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/J2: inline literal code map (reference: INSERT INTO #med_map
    VALUES ..., ~L90-260 reconstructed) built with createDataFrame and
    broadcast into the join — never a shuffle for a 5-row map.

    Not registered as a t2 query (driver 50-query window): the same
    literal-map-broadcast shape is hash-verified through the covid
    artifact queries (pipelines/covid.py code maps); DF≡oracle parity for
    this query is asserted in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.fsutil import one_partition_df

    seg_map = one_partition_df(
        spark,
        [
            ("AUTOMOBILE", "consumer"),
            ("HOUSEHOLD", "consumer"),
            ("FURNITURE", "consumer"),
            ("BUILDING", "industrial"),
            ("MACHINERY", "industrial"),
        ],
        T.StructType(
            [
                T.StructField("c_mktsegment", T.StringType()),
                T.StructField("segment_class", T.StringType()),
            ]
        ),
    )
    cust = read_table(spark, sf_dir, "customer")
    return (
        broadcast_map_join(cust, seg_map, "c_mktsegment")
        .groupBy("segment_class")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal", "sum_acctbal"))
        .orderBy("segment_class")
    )
