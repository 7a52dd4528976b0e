"""X79 sitemap-prior cold start (operators/recrawl.py
revisit_with_priors): precedence (measured > sitemap > default),
changefreq folding incl. always/never policy bounds and clamping,
conflicting-entry conservatism, unknown spellings ignored, the
changefreq column through X68's extractor, and the no-fanout join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.recrawl import (
    CHANGEFREQ_SECONDS,
    revisit_with_priors,
)

MIN, MAX, DEFAULT = 3600.0, 30.0 * 86400.0, 7.0 * 86400.0


def _estimates(spark, rows):
    # the slice of estimate_change_rates' output the composition reads
    return spark.createDataFrame(rows, "url string, revisit_sec double")


def _entries(spark, rows):
    return spark.createDataFrame(rows, "url string, changefreq string")


def _run(spark, est, ent):
    return {
        r["url"]: (r["effective_revisit_sec"], r["revisit_source"])
        for r in revisit_with_priors(
            _estimates(spark, est),
            _entries(spark, ent),
            default_sec=DEFAULT,
            min_interval_sec=MIN,
            max_interval_sec=MAX,
        ).collect()
    }


def test_precedence(spark):
    est = [("u_meas", 5000.0), ("u_hint", None), ("u_cold", None)]
    ent = [("u_meas", "daily"), ("u_hint", "daily")]
    got = _run(spark, est, ent)
    assert got["u_meas"] == (5000.0, "measured")
    assert got["u_hint"] == (86400.0, "sitemap")
    assert got["u_cold"] == (DEFAULT, "default")


def test_changefreq_folding_and_bounds(spark):
    ent = [(f"u_{w}", w) for w in CHANGEFREQ_SECONDS]
    ent += [("u_always", "always"), ("u_never", "never"),
            ("u_up", "HOURLY"), ("u_junk", "fortnightly"),
            ("u_null", None)]
    est = [(u, None) for u, _ in ent]
    got = _run(spark, est, ent)
    for w, sec in CHANGEFREQ_SECONDS.items():
        want = min(max(sec, MIN), MAX)
        assert got[f"u_{w}"] == (want, "sitemap"), w
    assert got["u_always"] == (MIN, "sitemap")
    assert got["u_never"] == (MAX, "sitemap")
    # case-insensitive (X68 lowercases, the fold tolerates raw too)
    assert got["u_up"] == (3600.0, "sitemap")
    # unknown spelling / NULL carry no hint
    assert got["u_junk"] == (DEFAULT, "default")
    assert got["u_null"] == (DEFAULT, "default")
    # 'yearly' exceeds the 30-day max -> clamped INTO the policy band
    assert got["u_yearly"][0] == MAX


def test_conflicting_entries_take_smallest(spark):
    est = [("u", None)]
    ent = [("u", "monthly"), ("u", "hourly"), ("u", "weekly")]
    got = _run(spark, est, ent)
    assert got["u"] == (3600.0, "sitemap")
    # and the join never fans out: one output row per estimate row
    assert (
        revisit_with_priors(
            _estimates(spark, est),
            _entries(spark, ent),
            default_sec=DEFAULT,
        ).count()
        == 1
    )


def test_validation(spark):
    with pytest.raises(ValueError):
        revisit_with_priors(
            _estimates(spark, [("u", None)]),
            _entries(spark, []),
            default_sec=1.0,
            min_interval_sec=10.0,
            max_interval_sec=5.0,
        )


def test_changefreq_flows_from_sitemap_extractor(spark):
    from covid19i2b2_spark.operators.robots import extract_sitemap_urls

    body = (
        "<urlset><url><loc>http://s.com/a</loc>"
        "<changefreq> Daily </changefreq></url>"
        "<url><loc>http://s.com/b</loc></url></urlset>"
    )
    df = spark.createDataFrame([("s.com", body)], "host string, body string")
    entries = extract_sitemap_urls(df)
    got = {r["url"]: r["changefreq"] for r in entries.collect()}
    assert got["http://s.com/a"] == "daily"  # trimmed + lowercased
    assert got["http://s.com/b"] is None
    est = _estimates(spark, [("http://s.com/a", None)])
    out = revisit_with_priors(est, entries, default_sec=DEFAULT).collect()
    assert out[0]["effective_revisit_sec"] == 86400.0
    assert out[0]["revisit_source"] == "sitemap"
