"""Incremental (Structured Streaming) mode (SURVEY.md §2.10).

The reference has zero streaming — it is a weekly batch snapshot script.
This layer adds the incremental DailyCounts the north star asks for:
the same daily aggregation shape, fed by a stream, with watermarked late
data (the ±7-day admission tolerance maps naturally onto a watermark).

Batch parity is the contract: ``daily_event_counts`` over a bounded
stream (availableNow) must equal the batch groupBy (tests/test_streaming.py
asserts it against q_events_daily's aggregation); the DuckDB oracle can't
run a stream, so the driver records the batch-equivalent query instead.

Exact count-distinct isn't available under streaming append mode;
n_users uses approx_count_distinct (HLL++) — the same trade the batch
engine offers via q_approx_distinct.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark import schemas
from covid19i2b2_spark.session import ensure_runtime_conf
from covid19i2b2_spark.sources import tables


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 source: file-stream over the events parquet (stand-in for
    kafka); same nanos->timestamp conversion as the batch reader."""
    ensure_runtime_conf(spark)
    # the file-stream source monitors a DIRECTORY; the testdata table is a
    # single file, so expose it through a temp dir of symlinks (a real
    # deployment streams a landing directory / kafka topic anyway)
    src = os.path.realpath(os.path.join(sf_dir, "events.parquet"))
    # stable digest (not Python's salted hash()) so the dir is reused
    # across processes instead of littering a fresh one per run
    digest = hashlib.md5(src.encode()).hexdigest()[:16]
    stream_dir = os.path.join(
        tempfile.gettempdir(), f"covid19i2b2_stream_{digest}"
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    # TIMESTAMP (LTZ), not NTZ: watermarks/event-time require it.  Session
    # TZ is pinned UTC so wall-clock values match the batch reader's NTZ.
    if tables.events_ts_unit(src) == "ns":
        raw = spark.readStream.schema(schemas.TESTDATA_EVENTS_RAW).parquet(
            stream_dir
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = spark.readStream.schema(schemas.TESTDATA["events"]).parquet(stream_dir)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def daily_event_counts(stream: DataFrame, watermark: str = "2 days") -> DataFrame:
    """ST1+ST2: tumbling daily windows with late-data watermark — the
    incremental DailyCounts feed.  Partial aggregation state is per
    (window, ) key; the watermark bounds state size at scale."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(0)
            ).alias("n_purchases"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("event_date"),
            "n_events",
            "approx_users",
            "n_purchases",
        )
    )


def sliding_counts(
    stream: DataFrame, length: str = "7 days", slide: str = "1 day"
) -> DataFrame:
    """ST3: sliding windows (e.g. trailing-7-day admissions)."""
    return (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", length, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.to_date(F.col("w.start")).alias("window_start"),
            F.to_date(F.col("w.end")).alias("window_end"),
            "n_events",
        )
    )


def session_counts(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """ST3: session windows per user (gap-based)."""
    return (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def dedup_stream(stream: DataFrame, watermark: str = "2 days") -> DataFrame:
    """ST4: stateful dedup on event_id within the watermark horizon."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(
    df: DataFrame, query_name: str, output_mode: str | None = None
) -> DataFrame:
    """Drive a bounded stream to completion synchronously (ST5 sink:
    memory table for tests; swap for foreachBatch->parquet in production).
    Returns the materialized result as a batch DataFrame.  Output mode
    defaults to complete for aggregations / append otherwise; stateful
    applyInPandasWithState(Update) requires output_mode='update'."""
    q = (
        df.writeStream.outputMode(
            output_mode or ("complete" if _has_agg(df) else "append")
        )
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.sql(f"SELECT * FROM {query_name}")


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()
