"""t2 queries: window functions (SURVEY.md §2.5 W3/W4; W1/W2 are covered
by q_cumulative / q_asof_first in core.py / joins.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from covid19i2b2_spark.operators.windows import with_row_number
from covid19i2b2_spark.sources.tables import read_table


def q_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: partitioned row numbering — top-3 customers per nation by
    balance (reference uses ROW_NUMBER for CSV sort columns and Phase-2
    patient pseudonyms).  Partitioned window: scales with the partition
    key, no global sort.

    UNREGISTERED since round 8 (slot ceded to q_cm_sketch per VERDICT
    r7 #2 — the same move as q_join_left in r7): W3 semantics stay
    under the driver oracle via q_covid_patient_mapping's pseudonym
    window, and this query keeps full DuckDB parity in
    tests/test_oracle_parity.py's UNREGISTERED tier."""
    cust = read_table(spark, sf_dir, "customer")
    ranked = with_row_number(
        cust,
        [F.col("c_acctbal").desc(), "c_custkey"],
        "rn",
        partition_by=["c_nationkey"],
    )
    return (
        ranked.filter(F.col("rn") <= 3)
        .select(
            F.col("c_nationkey").alias("nationkey"),
            "c_custkey",
            "c_acctbal",
            F.col("rn").cast("long").alias("rn"),
        )
        .orderBy("nationkey", "rn")
    )


def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: rows-frame variants (preceding/following/unbounded) over per-day
    pre-aggregates — the general frame surface beyond the reference's
    single unbounded-preceding cumulative (input pre-aggregated per day, so
    the single-partition window is safe; SURVEY.md §4.2).

    Not registered as a t2 query (driver 50-query window): the same frame
    surface — rows preceding/following, unbounded max, plus a value-RANGE
    frame — is hash-verified through q_cumulative's moving_4d /
    leading_3d / peak_to_date / trailing_7d columns; DF≡oracle parity for
    this query is asserted in tests/test_oracle_parity.py."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.count("*").alias("n_orders")
    )
    w = W.orderBy("order_date")
    return daily.select(
        "order_date",
        "n_orders",
        F.sum("n_orders").over(w.rowsBetween(-3, 0)).alias("moving_4d"),
        F.sum("n_orders").over(w.rowsBetween(0, 2)).alias("leading_3d"),
        F.max("n_orders").over(w.rowsBetween(W.unboundedPreceding, 0)).alias(
            "peak_to_date"
        ),
    ).orderBy("order_date")
