"""X71 re-crawl scheduling (operators/recrawl.py): the Cho–Garcia-
Molina estimator against a pure-Python replay on planted fetch
histories, the null-safe change semantics, the cold-start / zero-span
loud-NULL contract, revisit clamping, next_fetch_due arithmetic,
parameter validation, and the one-Exchange plan pin."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.recrawl import (
    change_history,
    estimate_change_rates,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _hist(spark, rows):
    return spark.createDataFrame(
        [
            (url, T0 + dt.timedelta(seconds=offs), fp)
            for url, offs, fp in rows
        ],
        "url string, fetch_time timestamp, content_fp string",
    )


def _py_lambda(n: int, x: int, span: float) -> float:
    return -math.log((n - x + 0.5) / (n + 0.5)) / (span / n)


def test_change_history_counts(spark):
    df = _hist(
        spark,
        [
            # u1: 4 fetches hourly, fp changes at fetch 2 and 4
            ("u1", 0, "a"), ("u1", 3600, "b"),
            ("u1", 7200, "b"), ("u1", 10800, "c"),
            # u2: never changes
            ("u2", 0, "z"), ("u2", 3600, "z"), ("u2", 7200, "z"),
            # u3: single fetch
            ("u3", 0, "q"),
        ],
    )
    got = {
        r["url"]: r
        for r in change_history(df).collect()
    }
    assert got["u1"]["n_fetches"] == 4
    assert got["u1"]["n_intervals"] == 3
    assert got["u1"]["n_changes"] == 2
    assert got["u1"]["span_sec"] == 10800.0
    assert got["u2"]["n_changes"] == 0
    assert got["u3"]["n_intervals"] == 0 and got["u3"]["n_changes"] == 0


def test_null_fingerprint_is_null_safe_change(spark):
    """NULL → value and value → NULL are changes; NULL → NULL is not
    (module contract: an unhashable fetch is evidence of non-sameness,
    not a dropped row)."""
    df = _hist(
        spark,
        [
            ("u", 0, "a"), ("u", 60, None),
            ("u", 120, None), ("u", 180, "a"),
        ],
    )
    row = change_history(df).collect()[0]
    assert row["n_intervals"] == 3
    assert row["n_changes"] == 2  # a→NULL, NULL→a; NULL→NULL no


def test_estimator_matches_python_reference(spark):
    rows = []
    # u_half: 10 fetches hourly, alternating fp -> 9 intervals, 9 changes?
    # alternate a/b each fetch: every interval changes -> x = n
    for i in range(10):
        rows.append(("u_all", i * 3600, "ab"[i % 2]))
    # u_some: changes on fetches 3 and 7 only
    fp = ["a", "a", "a", "b", "b", "b", "b", "c", "c", "c"]
    for i in range(10):
        rows.append(("u_some", i * 3600, fp[i]))
    # u_none: never changes
    for i in range(10):
        rows.append(("u_none", i * 3600, "z"))
    out = {
        r["url"]: r
        for r in estimate_change_rates(
            _hist(spark, rows), change_prob=0.5,
            min_interval_sec=60.0, max_interval_sec=30 * 86400.0,
        ).collect()
    }
    for url, x in [("u_all", 9), ("u_some", 2), ("u_none", 0)]:
        n, span = 9, 9 * 3600.0
        want = _py_lambda(n, x, span)
        got = out[url]["lambda_hat"]
        assert got == pytest.approx(want, rel=1e-12), url
        if want > 0:
            want_rev = min(
                max(-math.log(0.5) / want, 60.0), 30 * 86400.0
            )
        else:
            want_rev = 30 * 86400.0
        assert out[url]["revisit_sec"] == pytest.approx(
            want_rev, rel=1e-12
        ), url


def test_cold_start_and_zero_span_are_null(spark):
    df = _hist(
        spark,
        [
            ("one_fetch", 0, "a"),
            ("one_interval", 0, "a"), ("one_interval", 60, "b"),
            # all fetches at the same instant: span 0
            ("zero_span", 0, "a"), ("zero_span", 0, "b"),
            ("zero_span", 0, "c"),
        ],
    )
    out = {
        r["url"]: r
        for r in estimate_change_rates(df, min_intervals=2).collect()
    }
    for url in ("one_fetch", "one_interval", "zero_span"):
        assert out[url]["lambda_hat"] is None, url
        assert out[url]["revisit_sec"] is None, url
        assert out[url]["next_fetch_due"] is None, url
    # the history columns are still real for cold-start rows
    assert out["one_interval"]["n_changes"] == 1


def test_revisit_clamps_and_next_due(spark):
    # fast churner: changes every second for 100s -> lambda large ->
    # raw revisit << min_interval -> clamped up to min
    rows = [("fast", i, str(i)) for i in range(101)]
    # slow: 2 changes across ~3 years of monthly fetches -> raw
    # revisit > max -> clamped down to max
    month = 30 * 86400
    fps = ["a"] * 12 + ["b"] * 12 + ["c"] * 12
    rows += [("slow", i * month, fps[i]) for i in range(36)]
    out = {
        r["url"]: r
        for r in estimate_change_rates(
            _hist(spark, rows), change_prob=0.5,
            min_interval_sec=3600.0, max_interval_sec=90 * 86400.0,
        ).collect()
    }
    assert out["fast"]["revisit_sec"] == 3600.0
    raw_slow = -math.log(0.5) / _py_lambda(35, 2, 35 * month)
    assert raw_slow > 90 * 86400.0  # the fixture really exceeds max
    assert out["slow"]["revisit_sec"] == 90 * 86400.0
    for url in ("fast", "slow"):
        want_due = (
            out[url]["last_fetch"]
            + dt.timedelta(seconds=out[url]["revisit_sec"])
        )
        assert out[url]["next_fetch_due"] == want_due, url


def test_tiebreak_makes_equal_timestamps_deterministic(spark):
    """Two fetches at the same instant: default tie order is the
    fingerprint, so the change count cannot depend on input order."""
    a = _hist(spark, [("u", 0, "b"), ("u", 0, "a"), ("u", 60, "a")])
    b = _hist(spark, [("u", 0, "a"), ("u", 0, "b"), ("u", 60, "a")])
    ra = change_history(a).collect()[0]
    rb = change_history(b).collect()[0]
    # fp tie order puts "a" first either way: a → b → a = 2 changes
    assert ra["n_changes"] == rb["n_changes"] == 2


def test_parameter_validation(spark):
    df = _hist(spark, [("u", 0, "a")])
    with pytest.raises(ValueError):
        estimate_change_rates(df, change_prob=0.0)
    with pytest.raises(ValueError):
        estimate_change_rates(df, change_prob=1.0)
    with pytest.raises(ValueError):
        estimate_change_rates(
            df, min_interval_sec=100.0, max_interval_sec=50.0
        )


def test_plan_single_exchange(spark):
    """The lag window and the per-url aggregate share one url-keyed
    Exchange (the 100 TB shape: history summarized in one shuffle),
    and the whole estimator is expression-only — no Python."""
    from covid19i2b2_spark.plans import physical_plan

    df = _hist(spark, [("u", i * 60, str(i % 3)) for i in range(9)])
    plan = physical_plan(estimate_change_rates(df))
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("Exchange") == 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
