"""t2 queries: scalar function families (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.functions.codes import icd_3chars, strip_prefix
from covid19i2b2_spark.sources.tables import read_table


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3/F5/F7/F9/F10: the scalar-function surface in one slot —
    DATEDIFF / DATEADD / CAST-to-date (the reference's
    days_since_admission axis machinery, §ClinicalCourse/§Labs), string
    LEN / UPPER / SUBSTRING / concat (CSV-line building, §output), and
    NULLIF + COALESCE (default-stdev-0 and divide-by-zero guards).
    Merges round-1's q_date_arith / q_string_funcs / q_null_funcs into
    one driver slot (50-query window, VERDICT r1 #1).

    Round 15: slot ceded to q_exact_substr_dedup (VERDICT r14 next #5)
    — every family here stays driver-green elsewhere (date arithmetic
    via q_range_join/q_covid_cohort/q_asof_first, string funcs via the
    covid CSV rows and q_covid_diagnoses, NULLIF/COALESCE via
    q_labs_stats), and this exact query keeps full DuckDB parity via
    UNREGISTERED_ORACLES (oracle preserved verbatim in
    tests/test_oracle_parity.py)."""
    orders = read_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    eff_prio = F.nullif(F.col("o_orderkey") % 3, F.lit(0))
    return (
        orders.groupBy(F.trunc(d, "month").alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min(d).alias("first_date"),
            F.max(d).alias("last_date"),
            F.datediff(F.max(d), F.min(d)).cast("long").alias("span_days"),
            F.date_add(F.min(d), 30).alias("first_plus_30"),
            F.min(F.length("o_orderpriority")).cast("long").alias("min_prio_len"),
            F.max(F.upper("o_orderstatus")).alias("max_status_upper"),
            F.min(
                F.concat_ws(
                    ":",
                    F.substring("o_orderpriority", 1, 1),
                    F.col("o_orderstatus"),
                )
            ).alias("min_prio_tag"),
            F.sum(F.when(eff_prio.isNull(), 1).otherwise(0)).alias(
                "n_mod3_zero"
            ),
            F.sum(F.coalesce(eff_prio, F.lit(-1))).alias("sum_effective_mod3"),
        )
        .orderBy("order_month")
    )


def q_icd_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F8: the Diagnoses ICD rollup — strip namespace prefix, drop '.',
    truncate to 3 chars, count distinct patients per truncated code
    (4CE §Diagnoses ~L800-860 reconstructed).  Here the namespaced code is
    synthesized from event_type ('EVT:' prefix).

    Deregistered from the driver's 50-query window in favor of
    q_contamination (queries/llm3.py): F6/F8's truncate+replace stays
    driver-green via q_covid_diagnoses, and DF≡oracle parity moves to
    tests/test_oracle_parity.py (UNREGISTERED_ORACLES)."""
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


