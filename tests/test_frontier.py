"""X61 crawl-frontier scheduling (operators/frontier.py): per-host
politeness cap, priority order, horizon, NULL handling, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.frontier import frontier_schedule


def _frame(spark):
    rows = []
    # host a: 5 urls, priorities 50..10; host b: 2 urls; one NULL host
    for i in range(5):
        rows.append((i, "a.com", 50.0 - 10 * i))
    rows.append((10, "b.com", 5.0))
    rows.append((11, "b.com", 9.0))
    rows.append((12, None, 99.0))
    return spark.createDataFrame(
        rows, "url_id long, host string, priority double"
    )


def test_schedule_respects_cap_priority_and_nulls(spark):
    out = {
        r["url_id"]: r["crawl_round"]
        for r in frontier_schedule(
            _frame(spark), "host", "priority", "url_id",
            per_host_per_round=2,
        ).collect()
    }
    # host a, priority desc: ids 0,1 -> round 1; 2,3 -> 2; 4 -> 3
    assert out[0] == 1 and out[1] == 1
    assert out[2] == 2 and out[3] == 2
    assert out[4] == 3
    # host b: higher priority (id 11) first
    assert out[11] == 1 and out[10] == 1
    # NULL host is unschedulable — loud NULL round, row kept
    assert out[12] is None
    assert len(out) == 8


def test_schedule_horizon_and_validation(spark):
    out = {
        r["url_id"]: r["crawl_round"]
        for r in frontier_schedule(
            _frame(spark), "host", "priority", "url_id",
            per_host_per_round=2, max_rounds=2,
        ).collect()
    }
    assert out[4] is None            # beyond the horizon -> loud NULL
    assert out[2] == 2               # inside it unchanged
    with pytest.raises(ValueError, match="per_host_per_round"):
        frontier_schedule(_frame(spark), "host", "priority", "url_id", 0)
    with pytest.raises(ValueError, match="max_rounds"):
        frontier_schedule(
            _frame(spark), "host", "priority", "url_id", 1, max_rounds=0
        )


def test_schedule_ties_break_to_lowest_id_and_deterministic(spark):
    rows = [(i, "h", 1.0) for i in range(6)]
    df = spark.createDataFrame(rows, "url_id long, host string, priority double")
    a = {
        r["url_id"]: r["crawl_round"]
        for r in frontier_schedule(
            df.repartition(5), "host", "priority", "url_id", 3
        ).collect()
    }
    b = {
        r["url_id"]: r["crawl_round"]
        for r in frontier_schedule(
            df.repartition(2), "host", "priority", "url_id", 3
        ).collect()
    }
    assert a == b == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 2}


def test_round_one_is_breadth_slice(spark):
    """Round 1 must hold EVERY host's top slice — the breadth property
    politeness buys (no host starves another's first fetches)."""
    sched = frontier_schedule(
        _frame(spark), "host", "priority", "url_id", 1
    )
    r1_hosts = {
        r["host"]
        for r in sched.filter(F.col("crawl_round") == 1).collect()
    }
    assert r1_hosts == {"a.com", "b.com"}


def test_per_host_cap_column_overrides_default(spark):
    """Round-12 (X67 Crawl-delay consumer): a host-constant cap column
    overrides per_host_per_round for that host; NULL falls back; a
    cap below 1 raises loudly."""
    df = _frame(spark).withColumn(
        "cap",
        F.when(F.col("host") == "a.com", F.lit(1)).otherwise(
            F.lit(None).cast("long")
        ),
    )
    out = {
        r["url_id"]: r["crawl_round"]
        for r in frontier_schedule(
            df, "host", "priority", "url_id",
            per_host_per_round=2, per_host_cap_col="cap",
        ).collect()
    }
    # a.com throttled to 1/round: ids 0..4 -> rounds 1..5
    assert [out[i] for i in range(5)] == [1, 2, 3, 4, 5]
    # b.com keeps the default cap of 2: both in round 1
    assert out[10] == 1 and out[11] == 1
    assert out[12] is None
    # deriving caps from crawl delays: floor(round_seconds / delay)
    delays = spark.createDataFrame(
        [("a.com", 30.0)], "host string, crawl_delay double"
    )
    capped = (
        _frame(spark)
        .join(delays, "host", "left")
        .withColumn(
            "cap",
            F.floor(F.lit(60.0) / F.col("crawl_delay")).cast("long"),
        )
    )
    out2 = {
        r["url_id"]: r["crawl_round"]
        for r in frontier_schedule(
            capped, "host", "priority", "url_id",
            per_host_per_round=3, per_host_cap_col="cap",
        ).collect()
    }
    assert [out2[i] for i in range(5)] == [1, 1, 2, 2, 3]  # cap 2
    assert out2[10] == 1 and out2[11] == 1                 # default 3
    # cap < 1 is loud
    bad = _frame(spark).withColumn("cap", F.lit(0))
    with pytest.raises(Exception, match="per-host caps"):
        frontier_schedule(
            bad, "host", "priority", "url_id",
            per_host_per_round=2, per_host_cap_col="cap",
        ).collect()
