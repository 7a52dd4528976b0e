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
           ) AS BIGINT) AS cum_orders
    FROM daily
    ORDER BY order_date
    """,
)
def q_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/J7: cumulative counts by calendar date — the DailyCounts shape
    (reference builds cumulative_patients_all via a `<=` self-join,
    4CE_Phase1.1_Files_mssql.sql:§DailyCounts ~L520-600 reconstructed;
    we pre-aggregate per day then run one unbounded-preceding window over
    the tiny per-day frame)."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
    return cumulative(daily, "order_date", {"cum_orders": "n_orders"}).orderBy(
        "order_date"
    )


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


@query(
    "q_sql_api",
    oracle="""
    SELECT n_name AS nation, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY nation
    """,
)
def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.2 entry point 2: the Spark SQL surface — registered temp
    views + spark.sql() land in the same Catalyst plan space as the
    DataFrame API (this query is written entirely in SQL)."""
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


@query(
    "q_events_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases
        FROM events
        GROUP BY 1
    )
    SELECT event_date, n_events, n_users, n_purchases,
           CAST(SUM(n_events) OVER (
               ORDER BY event_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_events
    FROM daily
    ORDER BY event_date
    """,
)
def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 batch equivalent / flagship: daily event counts + distinct users
    + cumulative — the DailyCounts artifact shape on the events table.
    Streaming parity target for streaming/daily_counts.py."""
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
