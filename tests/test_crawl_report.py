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
