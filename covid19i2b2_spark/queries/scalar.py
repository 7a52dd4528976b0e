"""t2 queries: scalar function families (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.functions.codes import icd_3chars, strip_prefix
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table


@query(
    "q_date_arith",
    oracle="""
    SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS order_month,
           COUNT(*) AS n_orders,
           MIN(CAST(o_orderdate AS DATE)) AS first_date,
           MAX(CAST(o_orderdate AS DATE)) AS last_date,
           date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                     MAX(CAST(o_orderdate AS DATE))) AS span_days,
           MIN(CAST(o_orderdate AS DATE)) + 30 AS first_plus_30
    FROM orders
    GROUP BY 1
    ORDER BY order_month
    """,
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3: DATEDIFF / DATEADD / CAST-to-date — the reference's
    days_since_admission axis machinery (§ClinicalCourse, §Labs)."""
    orders = read_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        orders.groupBy(F.trunc(d, "month").alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min(d).alias("first_date"),
            F.max(d).alias("last_date"),
            F.datediff(F.max(d), F.min(d)).cast("long").alias("span_days"),
            F.date_add(F.min(d), 30).alias("first_plus_30"),
        )
        .orderBy("order_month")
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           LENGTH(c_name) AS name_len,
           UPPER(c_mktsegment) AS seg_upper,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           c_name || ':' || c_mktsegment AS name_seg
    FROM customer
    ORDER BY c_custkey
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F7: string concat / LEN / SUBSTRING (reference: CSV-line
    building and prefix arithmetic, §output)."""
    cust = read_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.length("c_name").cast("long").alias("name_len"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
    ).orderBy("c_custkey")


@query(
    "q_icd_truncate",
    oracle="""
    WITH codes AS (
        SELECT 'EVT:' || replace(event_type, '.', '') AS concept_cd, user_id
        FROM events
    )
    SELECT left(replace(substring(concept_cd, 5, 999), '.', ''), 3) AS code_3chars,
           COUNT(*) AS n_obs,
           COUNT(DISTINCT user_id) AS n_users
    FROM codes
    GROUP BY 1
    ORDER BY code_3chars
    """,
)
def q_icd_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F8: the Diagnoses ICD rollup — strip namespace prefix, drop '.',
    truncate to 3 chars, count distinct patients per truncated code
    (4CE §Diagnoses ~L800-860 reconstructed).  Here the namespaced code is
    synthesized from event_type ('EVT:' prefix)."""
    events = read_table(spark, sf_dir, "events")
    coded = events.select(
        F.concat(F.lit("EVT:"), F.replace("event_type", F.lit("."), F.lit(""))).alias(
            "concept_cd"
        ),
        "user_id",
    )
    return (
        coded.groupBy(icd_3chars("concept_cd", "EVT:").alias("code_3chars"))
        .agg(
            F.count("*").alias("n_obs"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("code_3chars")
    )


@query(
    "q_null_funcs",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_discount,
           CAST(SUM(CAST(COALESCE(NULLIF(l_discount, 0.0), 0.05) AS DECIMAL(12,2)))
                AS DOUBLE) AS sum_effective_discount
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10: ISNULL/COALESCE + NULLIF (reference: default stdev 0,
    divide-by-zero guards)."""
    li = read_table(spark, sf_dir, "lineitem")
    eff = F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(0.05))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(F.nullif(F.col("l_discount"), F.lit(0.0)).isNull(), 1).otherwise(0)
            ).alias("n_zero_discount"),
            F.sum(eff.cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_effective_discount"),
        )
        .orderBy("l_returnflag")
    )
