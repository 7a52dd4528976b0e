"""Streaming cohort maintenance (SURVEY §2.10 north star; VERDICT r1 #6).

The batch pipeline recomputes the cohort from scratch (reference model:
re-run weekly).  This module maintains it continuously from the event
stream with a STREAM-STREAM JOIN:

    positive tests  ──┐
                      ├─ watermarked interval join on (patient, ±window) ─▶ candidate pairs
    inpatient visits ─┘

- Both sides carry event-time watermarks; the join condition is an
  equi-join on patient_num plus a time-range predicate
  (visit_day BETWEEN pos_day - before AND pos_day + after), so Spark
  bounds each side's state buffer by watermark + window — state does NOT
  grow with the stream, which is what makes this run forever at scale.
- Times are day-truncated BEFORE the join (date_trunc('day', ts) is still
  a valid event-time column): the reference's window is calendar-day
  based, and a raw-timestamp range join would disagree with it at day
  boundaries.
- The admission anchor is the FIRST positive test per patient, which a
  pure pairwise join cannot know.  ``cohort_from_pairs`` resolves it from
  the accumulated positive-test feed (min per patient — an
  ontology-of-one aggregate) against the pair table; the pair needed for
  the true minimum is always present because the join emits visit × every
  pos within the visit's window.
- Downstream enrichment (severity, demographics) reuses the batch
  pipeline verbatim: CovidPipeline.enrich_admissions — one code path,
  two execution modes.  Parity pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.streaming.daily_counts import stream_events


def positive_test_stream(
    stream: DataFrame, positive_event: str = "signup", watermark: str = "2 days"
) -> DataFrame:
    """Positive-test feed: (patient_num, pos_day TIMESTAMP) with an
    event-time watermark.  Day truncation mirrors the batch adapter's
    CAST(ts AS DATE)."""
    return (
        stream.filter(F.col("event_type") == positive_event)
        .select(
            F.col("user_id").alias("patient_num"),
            F.date_trunc("day", "ts").alias("pos_day"),
        )
        .withWatermark("pos_day", watermark)
    )


def admission_stream(
    stream: DataFrame, visit_event: str = "view", watermark: str = "2 days"
) -> DataFrame:
    """Inpatient-visit feed: (patient_num, visit_day TIMESTAMP, end_date)
    — the streaming analog of the adapter's visit_dimension ('view'
    events, stay of event_id % 10 days)."""
    return (
        stream.filter(F.col("event_type") == visit_event)
        .select(
            F.col("user_id").alias("v_patient_num"),
            F.date_trunc("day", "ts").alias("visit_day"),
            F.date_add(
                F.to_date("ts"), (F.col("event_id") % 10).cast("int")
            ).alias("end_date"),
        )
        .withWatermark("visit_day", watermark)
    )


def cohort_pair_stream(
    pos: DataFrame,
    visits: DataFrame,
    days_before: int = 7,
    days_after: int = 14,
) -> DataFrame:
    """The stream-stream join: candidate (positive test, visit) pairs
    within the admission window.  Inner join -> rows emit as soon as both
    sides arrive; watermark + the two-sided time bound let Spark evict
    join state older than watermark + window."""
    cond = (
        (pos["patient_num"] == visits["v_patient_num"])
        & (
            visits["visit_day"]
            >= pos["pos_day"] - F.expr(f"INTERVAL {days_before} DAYS")
        )
        & (
            visits["visit_day"]
            <= pos["pos_day"] + F.expr(f"INTERVAL {days_after} DAYS")
        )
    )
    return pos.join(visits, cond).select(
        "patient_num",
        F.to_date("pos_day").alias("pos_date"),
        F.to_date("visit_day").alias("visit_date"),
        "end_date",
    )


def run_streaming_cohort(
    spark: SparkSession,
    sf_dir: str,
    name: str = "cohort_stream",
) -> tuple[DataFrame, DataFrame]:
    """Drain the bounded event stream (availableNow) through the
    stream-stream join into memory sinks; returns (pairs, pos_feed) as
    batch DataFrames.  Production swaps the memory sinks for parquet/Delta
    tables and a continuous trigger — the plan is identical."""
    ev1 = stream_events(spark, sf_dir)
    ev2 = stream_events(spark, sf_dir)
    pos = positive_test_stream(ev1)
    vis = admission_stream(ev2)
    pairs_q = (
        cohort_pair_stream(pos, vis)
        .writeStream.format("memory")
        .queryName(f"{name}_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    pos_q = (
        positive_test_stream(stream_events(spark, sf_dir))
        .select("patient_num", F.to_date("pos_day").alias("pos_date"))
        .writeStream.format("memory")
        .queryName(f"{name}_pos")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    pairs_q.awaitTermination()
    pos_q.awaitTermination()
    return (
        spark.table(f"{name}_pairs"),
        spark.table(f"{name}_pos"),
    )


def cohort_from_pairs(pairs: DataFrame, pos_feed: DataFrame) -> DataFrame:
    """Admissions from the maintained pair + positive-test tables:
    anchor on the true first positive test per patient, then min/max the
    visits paired with that anchor — exactly the batch admissions()
    semantics (cohort membership requires a visit within the FIRST
    positive's window)."""
    first_pos = pos_feed.groupBy("patient_num").agg(
        F.min("pos_date").alias("pos_date")
    )
    anchored = pairs.join(first_pos, ["patient_num", "pos_date"])
    return anchored.groupBy("patient_num").agg(
        F.min("visit_date").alias("admission_date"),
        F.max("end_date").alias("discharge_date"),
    )
