"""t2 queries: sessionization, pivot/unpivot, percentiles — the common
OLAP reshaping surface beyond the reference's own operators (engine
completeness; SURVEY §2.6/§2.11 adjacents)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.operators.windows import sessionize
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_sessionize",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL
                      OR ts - prev_ts > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM ev
    ),
    sess AS (
        SELECT user_id, event_id,
               CAST(SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (lag + gap-flag + cumsum): events per (user,
    session) with a 30-minute inactivity gap."""
    events = read_table(spark, sf_dir, "events")
    s = sessionize(events, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy("user_id", "session_id")
    )


@query(
    "q_pivot_unpivot",
    oracle="""
    WITH wide AS (
        SELECT CAST(ts AS DATE) AS event_date,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events
        GROUP BY 1
    )
    SELECT event_date, measure, n_events FROM (
        SELECT event_date, 'click' AS measure, click AS n_events FROM wide
        UNION ALL SELECT event_date, 'error', error FROM wide
        UNION ALL SELECT event_date, 'purchase', purchase FROM wide
        UNION ALL SELECT event_date, 'signup', signup FROM wide
        UNION ALL SELECT event_date, 'view', view FROM wide
    )
    ORDER BY event_date, measure
    """,
)
def q_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot + unpivot round trip: long EAV -> wide per-day counts per
    event type (explicit value list — no second distinct-scan pass;
    required shape at 100 TB) -> stack() back to long (measure, value)
    rows, zero-filled combos included (which is what distinguishes the
    round trip from a plain groupBy).  Merges round-1's q_pivot /
    q_unpivot into one driver slot (50-query window, VERDICT r1 #1)."""
    events = read_table(spark, sf_dir, "events")
    wide = (
        events.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )
    stack_args = ", ".join(f"'{t}', {t}" for t in EVENT_TYPES)
    return wide.selectExpr(
        "event_date",
        f"stack({len(EVENT_TYPES)}, {stack_args}) AS (measure, n_events)",
    ).orderBy("event_date", "measure")


@query(
    "q_percentiles",
    oracle="""
    SELECT o_orderpriority,
           FLOOR((quantile_cont(o_totalprice, 0.5)) * 1000000 + 0.5) / 1000000
               AS p50,
           FLOOR((quantile_cont(o_totalprice, 0.9)) * 1000000 + 0.5) / 1000000
               AS p90,
           CAST(MAX(o_totalprice) AS DOUBLE) AS p100
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) — the QC/distribution
    surface; approximate path is percentile_approx (q_percentiles_approx)."""
    from covid19i2b2_spark.operators.aggregates import round6

    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            round6(F.percentile("o_totalprice", F.lit(0.5))).alias("p50"),
            round6(F.percentile("o_totalprice", F.lit(0.9))).alias("p90"),
            F.max("o_totalprice").alias("p100"),
        )
        .orderBy("o_orderpriority")
    )


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 RANGE frame: trailing-7-day event counts — a true value-range
    frame (gaps in the date axis count correctly, unlike a 6-rows frame).
    Spark's rangeBetween needs a numeric ordering key: days-since-epoch
    (datediff) with a [-6, 0] frame is exactly DuckDB's RANGE INTERVAL
    6 DAYS PRECEDING.  Input pre-aggregated per day -> single-partition
    window safe (SURVEY §4.2).

    Not registered as a t2 query (driver 50-query window): the identical
    RANGE-frame shape is hash-verified through q_cumulative's trailing_7d
    column; DF≡oracle parity for this query is asserted in
    tests/test_oracle_parity.py."""
    from pyspark.sql import Window as W

    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count("*").alias("n_events")
    )
    epoch_days = F.datediff("event_date", F.lit("1970-01-01"))
    w = W.orderBy(epoch_days).rangeBetween(-6, 0)
    return daily.select(
        "event_date",
        "n_events",
        F.sum("n_events").over(w).alias("trailing_7d"),
    ).orderBy("event_date")


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (QC surface): per-column nulls, cardinality,
    string-cast min/max — the upload-validation checks the 4CE consortium
    ran centrally, as an engine operator.

    Deregistered in round 3 (driver 50-query window) to make room for
    q_semantic_dedup — the least load-bearing slot (its operator shapes,
    count/count-distinct/min/max + union, are all hash-verified through
    other registered queries).  DuckDB parity lives in
    tests/test_oracle_parity.py's UNREGISTERED_ORACLES."""
    from covid19i2b2_spark.operators.profile import profile_columns

    orders = read_table(spark, sf_dir, "orders")
    return profile_columns(orders, ["o_custkey", "o_orderstatus"]).orderBy(
        "column_name"
    )


def q_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (GK sketch) — the 100 TB interactive path.

    Not registered as a t2 query (driver 50-query window; DuckDB's sketch
    differs, so only a rows-only check was possible anyway) — the
    approx-vs-exact error bound is asserted in tests/test_oracle_parity.py."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
        )
        .orderBy("o_orderpriority")
    )


def q_resample_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity daily resample + forward fill (operators/timeseries.py):
    dense grid from each user's first to last active day, gaps carrying
    the most recent MAX(value) (max: order-independent, so both engines
    agree bit-for-bit).  Unregistered (50-slot window); DuckDB parity in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.aggregates import round6
    from covid19i2b2_spark.operators.timeseries import resample_fill_daily

    events = read_table(spark, sf_dir, "events")
    dense = resample_fill_daily(events, "user_id", "ts", ["value"], agg="max")
    return dense.select(
        "user_id", "day", round6(F.col("value")).alias("value_ff")
    ).orderBy("user_id", "day")
