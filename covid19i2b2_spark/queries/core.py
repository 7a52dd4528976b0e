"""Core t2 queries — the minimum end-to-end slice (SURVEY.md §7 M1).

``q_cumulative`` is the first real query: one scan, one groupBy, one window,
one sort — exercises S1, P1, A2, A1, W1, O1 and the whole t2 harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.operators.windows import cumulative
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table


@query(
    "q_cumulative",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders
        GROUP BY 1
    )
    SELECT order_date, n_orders, n_customers,
           CAST(SUM(n_orders) OVER (
               ORDER BY order_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_orders,
           CAST(SUM(n_orders) OVER (
               ORDER BY order_date
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_4d,
           CAST(SUM(n_orders) OVER (
               ORDER BY order_date
               ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS BIGINT) AS leading_3d,
           CAST(MAX(n_orders) OVER (
               ORDER BY order_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS peak_to_date,
           CAST(SUM(n_orders) OVER (
               ORDER BY order_date
               RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_7d
    FROM daily
    ORDER BY order_date
    """,
)
def q_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W4/J7: the full window-frame surface over per-day pre-aggregates
    — unbounded-preceding cumulative (the DailyCounts shape: the reference
    builds cumulative_patients_all via a `<=` self-join,
    4CE_Phase1.1_Files_mssql.sql:§DailyCounts ~L520-600 reconstructed),
    rows frames (preceding/following), and a true value-RANGE trailing-7d
    frame (gaps in the date axis count correctly — Spark's rangeBetween
    over days-since-epoch ≡ DuckDB's RANGE INTERVAL 6 DAYS PRECEDING).
    Input is pre-aggregated per day, so the single-partition window is
    safe (SURVEY §4.2)."""
    from pyspark.sql import Window as W

    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
    cum = cumulative(daily, "order_date", {"cum_orders": "n_orders"})
    w = W.orderBy("order_date")
    epoch_days = F.datediff("order_date", F.lit("1970-01-01"))
    wr = W.orderBy(epoch_days).rangeBetween(-6, 0)
    return cum.select(
        "order_date",
        "n_orders",
        "n_customers",
        "cum_orders",
        F.sum("n_orders").over(w.rowsBetween(-3, 0)).alias("moving_4d"),
        F.sum("n_orders").over(w.rowsBetween(0, 2)).alias("leading_3d"),
        F.max("n_orders").over(w.rowsBetween(W.unboundedPreceding, 0)).alias(
            "peak_to_date"
        ),
        F.sum("n_orders").over(wr).alias("trailing_7d"),
    ).orderBy("order_date")


@query(
    "q_window_tumbling",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS window_day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY window_day
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 batch form: F.window() tumbling 1-day buckets — the exact
    grouping the streaming daily_event_counts uses, proven equal to
    date_trunc bucketing (so stream and SQL agree on window boundaries)."""
    from covid19i2b2_spark.sources.tables import read_table

    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("window_day"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_day")
    )


def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.2 entry point 2: the Spark SQL surface — registered temp
    views + spark.sql() land in the same Catalyst plan space as the
    DataFrame API (this query is written entirely in SQL).

    Not registered as a t2 query (driver 50-query window): SQL≡DataFrame
    plan equivalence and DuckDB-oracle parity are asserted in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT n_name AS nation, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY nation
        """
    )


def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 batch equivalent / flagship: daily event counts + distinct users
    + cumulative — the DailyCounts artifact shape on the events table.
    Streaming parity target for streaming/daily_counts.py.  Not registered
    as a t2 query (registry capped at the driver's 50-query window; the
    same cumulative/daily shape is hash-verified via q_cumulative and
    q_window_tumbling) — this remains the driver's t1 smoke entry
    (__spark_entry__.entry) and the stream≡batch parity anchor."""
    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0))
        ).alias("n_purchases"),
    )
    return cumulative(daily, "event_date", {"cum_events": "n_events"}).orderBy(
        "event_date"
    )
