"""X85 crawl health report (operators/crawl_report.py): planted
per-host mixes through every counter, the NULL-host loud row, the
optional trap column, derived rates, and the one-aggregate plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.crawl_report import crawl_health_report

SCHEMA = (
    "target_uri string, http_status int, http_content_type string, "
    "payload_length long, is_truncated boolean"
)


def _rows():
    rows = []
    # a.com: 6 ok html, 2 redirects, 1 404, 1 503; one truncated
    rows += [
        (f"http://a.com/p{i}", 200, "text/html; charset=utf-8", 1000, False)
        for i in range(5)
    ]
    rows += [("http://a.com/big", 200, "text/html", 5000, True)]
    rows += [
        ("http://a.com/r1", 301, None, 0, False),
        ("http://a.com/r2", 302, None, 0, False),
        ("http://a.com/missing", 404, "text/html", 100, False),
        ("http://a.com/boom", 503, None, 0, False),
    ]
    # b.com: ok but json (no html yield)
    rows += [("http://b.com/api", 200, "application/json", 50, False)]
    # unparseable uri -> NULL host row
    rows += [("not a url", 200, "text/html", 10, False)]
    return rows


def test_counters_and_rates(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    got = {r["host"]: r for r in crawl_health_report(df).collect()}
    a = got["a.com"]
    assert a["n_fetches"] == 10
    assert a["n_ok"] == 6 and a["n_html"] == 6
    assert a["n_redirect"] == 2
    assert a["n_client_err"] == 1 and a["n_server_err"] == 1
    assert a["n_truncated"] == 1
    assert a["total_payload_bytes"] == 10100
    assert a["ok_rate"] == pytest.approx(0.6)
    assert a["server_err_rate"] == pytest.approx(0.1)
    assert a["avg_payload_bytes"] == pytest.approx(1010.0)
    b = got["b.com"]
    assert b["n_ok"] == 1 and b["n_html"] == 0
    # the NULL-host row is present and counted, never dropped
    assert got[None]["n_fetches"] == 1


def test_trap_column_optional(spark):
    df = spark.createDataFrame(
        [(u, s, c, p, t, u.endswith("trap"))
         for u, s, c, p, t in _rows()],
        SCHEMA + ", is_trap boolean",
    )
    with_traps = crawl_health_report(df, trap_col="is_trap")
    assert "n_trapped" in with_traps.columns
    without = crawl_health_report(df)
    assert "n_trapped" not in without.columns


def test_plan_is_one_aggregate(spark):
    from covid19i2b2_spark.plans import physical_plan

    df = spark.createDataFrame(_rows(), SCHEMA)
    plan = physical_plan(crawl_health_report(df, trap_col=None))
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("Exchange") == 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_backoff_caps_policy(spark):
    """X87: the full ramp — no-backoff zone, linear midpoint, floor at
    min_cap, the small-sample guard, NULL-host exclusion, and the
    min-1 invariant frontier_schedule depends on."""
    from covid19i2b2_spark.operators.crawl_report import (
        politeness_backoff_caps,
    )

    report = spark.createDataFrame(
        [
            ("calm.com", 100, 0.05),
            ("edge.com", 100, 0.10),   # exactly backoff_start: no change
            ("mid.com", 100, 0.30),    # ramp midpoint
            ("sick.com", 100, 0.50),   # full backoff
            ("dying.com", 100, 0.90),  # past full: still min_cap
            ("tiny.com", 5, 1.00),     # below min_fetches: base
            (None, 10, 1.00),          # NULL host: no cap row
        ],
        "host string, n_fetches long, server_err_rate double",
    )
    got = {
        r["host"]: r["cap"]
        for r in politeness_backoff_caps(
            report, base_cap=10, backoff_start=0.1, full_backoff=0.5
        ).collect()
    }
    assert got["calm.com"] == 10 and got["edge.com"] == 10
    # midpoint of the ramp: 1 + 0.5 * (10 - 1) = 5.5 -> floor 5
    assert got["mid.com"] == 5
    assert got["sick.com"] == 1 and got["dying.com"] == 1
    assert got["tiny.com"] == 10
    assert None not in got
    assert min(got.values()) >= 1


def test_backoff_caps_feed_the_frontier(spark):
    """End-to-end into X61: a sick host's schedule stretches to more
    rounds under its backed-off cap while a healthy host keeps the
    base cadence."""
    from pyspark.sql import functions as F

    from covid19i2b2_spark.operators.crawl_report import (
        politeness_backoff_caps,
    )
    from covid19i2b2_spark.operators.frontier import frontier_schedule

    report = spark.createDataFrame(
        [("ok.com", 100, 0.0), ("sick.com", 100, 0.8)],
        "host string, n_fetches long, server_err_rate double",
    )
    caps = politeness_backoff_caps(report, base_cap=4)
    frontier = spark.createDataFrame(
        [(f"{h}/{i}", h, float(10 - i)) for h in ("ok.com", "sick.com")
         for i in range(8)],
        "url string, host string, priority double",
    ).join(caps, "host", "left")
    sched = frontier_schedule(
        frontier, "host", "priority", "url", 4, per_host_cap_col="cap"
    )
    rounds = {
        r["host"]: r["mx"]
        for r in sched.groupBy("host")
        .agg(F.max("crawl_round").alias("mx"))
        .collect()
    }
    assert rounds["ok.com"] == 2   # 8 urls / cap 4
    assert rounds["sick.com"] == 8  # 8 urls / cap 1


def test_backoff_caps_validation(spark):
    import pytest as _pytest

    from covid19i2b2_spark.operators.crawl_report import (
        politeness_backoff_caps,
    )

    report = spark.createDataFrame(
        [("a", 100, 0.5)],
        "host string, n_fetches long, server_err_rate double",
    )
    with _pytest.raises(ValueError):
        politeness_backoff_caps(report, base_cap=0)
    with _pytest.raises(ValueError):
        politeness_backoff_caps(
            report, base_cap=5, backoff_start=0.6, full_backoff=0.5
        )
