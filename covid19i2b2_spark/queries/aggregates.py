"""t2 queries: aggregations (SURVEY.md §2.4 A1-A11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.operators.aggregates import (
    count_distinct_where,
    dmean,
    dmean_pre,
    dstd,
    dstd_pre,
    dsum,
    log_value,
    round6,
    two_level_agg,
    two_level_fixed_sums,
)
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table


@query(
    "q_agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS count_order,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS n_ship_days,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           FLOOR((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(l_quantity)) * 1000000 + 0.5) / 1000000 AS avg_qty,
           FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(l_extendedprice)) * 1000000 + 0.5) / 1000000 AS avg_price,
           FLOOR((CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(l_discount)) * 1000000 + 0.5) / 1000000 AS avg_disc
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-09-03'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(
    spark: SparkSession, sf_dir: str, impl: str = "fixed"
) -> DataFrame:
    """A1/A2/A4/A11: the TPC-H Q1 shape — grouped counts, exact COUNT
    DISTINCTs (every 4CE output counts patients, not rows), sums, means.
    Measures sum exactly (order-independent, oracle-identical), output
    as double; means divide the exact sum in double.

    The date bound is a raw timestamp comparison (not CAST(ts AS DATE) <=
    d, which is equivalent but wraps the column in a cast and would not
    push down to the parquet scan).

    Multi-distinct rewrite (round 2): two COUNT DISTINCTs in one agg make
    Spark plan an Expand that triples every input row before the shuffle
    — at 100 TB that is 3x shuffle volume carrying all nine measure
    columns.  Instead each distinct runs as its own column-pruned
    pre-aggregate (dropDuplicates = map-side partial on 3 columns) joined
    back on the tiny group key; measured ~2x faster at sf0.1 and the gap
    widens with row width.  Values are identical — the oracle is
    unchanged.

    Fixed-point rewrite (round 5, impl='fixed' default): the measure
    aggregate itself was the remaining tail — decimal(22,2+) sum
    accumulators exceed UnsafeRow's 18-digit mutable-long limit, so
    every row pays a BigDecimal buffer round trip.
    operators.aggregates.two_level_fixed_sums sums integer cents /
    scale-4 / scale-6 units as LONGS per (group, partition), then
    finalizes the per-partition subtotals in exact decimal(38,0) — same
    correctly-rounded doubles (x100 corpus: 3.85 -> 2.47 s for the main
    aggregate).  impl='decimal' keeps the one-level decimal plan as the
    oracle mirror."""
    if impl not in ("fixed", "decimal"):
        raise ValueError(f"impl must be 'fixed' or 'decimal', got {impl!r}")
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1998-09-03").cast("timestamp_ntz")
    )
    g = ["l_returnflag", "l_linestatus"]
    dec = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    if impl == "fixed":
        cents = lambda c: (dec(c) * 100).cast("long")  # noqa: E731
        price_c, disc_c, tax_c = (
            cents("l_extendedprice"),
            cents("l_discount"),
            cents("l_tax"),
        )
        dp_u = price_c * (F.lit(100).cast("long") - disc_c)  # scale 4
        ch_u = dp_u * (F.lit(100).cast("long") + tax_c)  # scale 6
        tot = two_level_fixed_sums(
            li,
            g,
            sums={
                "sum_qty": (cents("l_quantity"), 2),
                "sum_base_price": (price_c, 2),
                "sum_disc_price": (dp_u, 4),
                "sum_charge": (ch_u, 6),
                "__sum_disc": (cents("l_discount"), 2),
            },
            counts={
                "qty": "l_quantity",
                "price": "l_extendedprice",
                "disc": "l_discount",
            },
        )
        main = tot.select(
            *g,
            F.col("count_rows").alias("count_order"),
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            round6(F.col("sum_qty") / F.col("n_qty")).alias("avg_qty"),
            round6(F.col("sum_base_price") / F.col("n_price")).alias(
                "avg_price"
            ),
            round6(F.col("__sum_disc") / F.col("n_disc")).alias("avg_disc"),
        )
    else:
        disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
        charge = disc_price * (F.lit(1) + dec("l_tax"))
        main = li.groupBy(*g).agg(
            F.count("*").alias("count_order"),
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            dmean("l_quantity", "avg_qty"),
            dmean("l_extendedprice", "avg_price"),
            dmean("l_discount", "avg_disc"),
        )
    n_orders = (
        li.select(*g, "l_orderkey")
        .dropDuplicates()
        .groupBy(*g)
        .agg(F.count("*").alias("n_orders"))
    )
    n_days = (
        li.select(*g, F.to_date("l_shipdate").alias("__d"))
        .dropDuplicates()
        .groupBy(*g)
        .agg(F.count("*").alias("n_ship_days"))
    )
    return (
        main.join(n_orders, g)
        .join(n_days, g)
        .select(
            *g,
            "count_order",
            "n_orders",
            "n_ship_days",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "avg_qty",
            "avg_price",
            "avg_disc",
        )
        .orderBy(*g)
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 scale path: HyperLogLog++ approximate distinct for interactive
    100 TB queries (rsd 1%).  Not registered as a t2 query (DuckDB's
    approx sketch is a different estimator and the registry is capped at
    the driver's 50-query window) — error bounds vs exact distinct are
    asserted in tests/test_oracle_parity.py; exact COUNT DISTINCT is
    hash-verified via q_agg_basic's n_orders/n_ship_days columns."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_conditional_agg",
    oracle="""
    SELECT c_nationkey AS nationkey,
           COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN c_custkey END)
               AS n_customers_negative,
           CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_building,
           CAST(SUM(CASE WHEN c_acctbal >= 5000
                         THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
               AS sum_acctbal_rich
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(DISTINCT c_custkey) > 5
    ORDER BY nationkey
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A10: filtered aggregation — the reference's ever-severe columns
    beside all-patient columns (COUNT(DISTINCT CASE WHEN severe=1 THEN
    patient_num END)) in every artifact — plus the HAVING post-aggregate
    threshold (small-nation rows dropped)."""
    cust = read_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count_distinct("c_custkey").alias("n_customers"),
            count_distinct_where(
                F.col("c_acctbal") < 0, "c_custkey", "n_customers_negative"
            ),
            F.sum(
                F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
            ).alias("n_building"),
            F.sum(
                F.when(
                    F.col("c_acctbal") >= 5000,
                    F.col("c_acctbal").cast("decimal(12,2)"),
                )
            )
            .cast("double")
            .alias("sum_acctbal_rich"),
        )
        .filter(F.col("n_customers") > 5)
        .orderBy("nationkey")
    )


@query(
    "q_two_level_agg",
    oracle="""
    WITH per_customer AS (
        SELECT o_custkey,
               CAST(FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                          / COUNT(o_totalprice)) * 1000000 + 0.5) / 1000000 AS DECIMAL(18,6)) AS entity_value
        FROM orders
        GROUP BY o_custkey
    )
    SELECT c_nationkey AS nationkey,
           COUNT(*) AS n_customers,
           FLOOR((CAST(SUM(entity_value) AS DOUBLE) / COUNT(entity_value)) * 1000000 + 0.5) / 1000000
               AS mean_customer_avg,
           CAST(MIN(entity_value) AS DOUBLE) AS min_customer_avg,
           CAST(MAX(entity_value) AS DOUBLE) AS max_customer_avg
    FROM per_customer JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    ORDER BY nationkey
    """,
)
def q_two_level_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: two-level aggregation — one value per entity first, then group
    stats, so heavy entities can't dominate (4CE §Labs computes one value
    per patient-day before the per-(loinc,day) moments; reconstructed)."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    per_customer = two_level_agg(orders, ["o_custkey"], [], "o_totalprice")
    joined = per_customer.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    return (
        joined.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_customers"),
            dmean_pre("entity_value", "mean_customer_avg"),
            F.min("entity_value").cast("double").alias("min_customer_avg"),
            F.max("entity_value").cast("double").alias("max_customer_avg"),
        )
        .orderBy("nationkey")
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT COALESCE(c_mktsegment, 'all') AS segment,
           COALESCE(CAST(c_nationkey AS VARCHAR), 'all') AS nationkey,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    ORDER BY segment, nationkey
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: the Demographics margins — the reference UNION-ALLs group-bys at
    each granularity with 'all' placeholder rows (~L650-740 reconstructed);
    one ROLLUP produces identical rows in a single shuffle."""
    from covid19i2b2_spark.operators.aggregates import grouping_sets_margins

    cust = read_table(spark, sf_dir, "customer")
    return grouping_sets_margins(
        cust,
        ["c_mktsegment", "c_nationkey"],
        [F.count("*").alias("n_customers"), dsum("c_acctbal", "sum_acctbal")],
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
        "n_customers",
        "sum_acctbal",
    ).orderBy("segment", "nationkey")


@query(
    "q_labs_stats",
    oracle="""
    SELECT l_returnflag AS code,
           COUNT(l_extendedprice) AS num_values,
           FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(l_extendedprice)) * 1000000 + 0.5) / 1000000 AS mean_value,
           CASE WHEN COUNT(l_extendedprice) < 2 THEN 0.0 ELSE
             FLOOR((SQRT(GREATEST(
               (CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                  * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                  / COUNT(l_extendedprice))
               / (COUNT(l_extendedprice) - 1.0), 0.0))) * 1000000 + 0.5) / 1000000 END AS stdev_value,
           FLOOR((CAST(SUM(CAST(FLOOR((LN(l_extendedprice * 0.001 + 0.5)) * 1000000 + 0.5) / 1000000
                               AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(l_extendedprice)) * 1000000 + 0.5) / 1000000 AS mean_log_value,
           CASE WHEN COUNT(l_extendedprice) < 2 THEN 0.0 ELSE
             FLOOR((SQRT(GREATEST(
               (CAST(SUM(CAST(FLOOR((LN(l_extendedprice * 0.001 + 0.5)) * 1000000 + 0.5) / 1000000
                              AS DECIMAL(18,6))
                         * CAST(FLOOR((LN(l_extendedprice * 0.001 + 0.5)) * 1000000 + 0.5) / 1000000
                                AS DECIMAL(18,6))) AS DOUBLE)
                - CAST(SUM(CAST(FLOOR((LN(l_extendedprice * 0.001 + 0.5)) * 1000000 + 0.5) / 1000000
                               AS DECIMAL(18,6))) AS DOUBLE)
                  * CAST(SUM(CAST(FLOOR((LN(l_extendedprice * 0.001 + 0.5)) * 1000000 + 0.5) / 1000000
                                 AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(l_extendedprice))
               / (COUNT(l_extendedprice) - 1.0), 0.0))) * 1000000 + 0.5) / 1000000 END AS stdev_log_value
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL
    GROUP BY l_returnflag
    ORDER BY code
    """,
)
def q_labs_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5/A6/F9/F12/F16/P6: the Labs artifact's numeric moments — n,
    mean, sample stddev (ISNULL(STDEV,0) for n<2, MSSQL semantics), and
    log-scale moments LOG(val*scale + 0.5) (§Labs ~L740-800 reconstructed;
    scale_factor=0.001 plays the unit-harmonization factor)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
    )
    lx = log_value("l_extendedprice", scale=0.001)
    li = li.withColumn("__log_value", lx)
    return (
        li.groupBy(F.col("l_returnflag").alias("code"))
        .agg(
            F.count("l_extendedprice").alias("num_values"),
            dmean("l_extendedprice", "mean_value"),
            dstd("l_extendedprice", "stdev_value"),
            dmean_pre("__log_value", "mean_log_value"),
            dstd_pre("__log_value", "stdev_log_value"),
        )
        .orderBy("code")
    )
