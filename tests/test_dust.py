"""X73 DUST parameter-rule mining (operators/dust.py): content-
evidence verdicts on a planted zoo (irrelevant vs relevant vs
mixed-consistency keys, singleton groups, NULL fingerprints, non-URL
rows), threshold semantics, the rule-apply rewrite (host scoping,
order preservation, bare-URL passthrough, out_col), and the plan pins
(two-Exchange mining, broadcast apply, no Python anywhere)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.dust import (
    apply_param_rules,
    mine_param_rules,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "canonical_url string, content_fp string"
    )


def test_mine_verdicts(spark):
    rows = [
        # a.com: "ref" irrelevant — two residual groups, fp constant
        ("http://a.com/p?ref=1", "P"),
        ("http://a.com/p?ref=2", "P"),
        ("http://a.com/p?ref=3", "P"),
        ("http://a.com/q?ref=1&x=1", "Q"),
        ("http://a.com/q?ref=2&x=1", "Q"),
        # a.com: "id" relevant — same residual, fps differ
        ("http://a.com/r?id=1", "R1"),
        ("http://a.com/r?id=2", "R2"),
        # a.com: "once" appears on a single URL — singleton group, no row
        ("http://a.com/s?once=1", "S"),
        # junk rows: excluded, never counted
        ("http://a.com/p?ref=9", None),
        (None, "Z"),
        ("ftp://a.com/p?ref=1", "Z"),
    ]
    out = {
        (r["host"], r["param_key"]): r
        for r in mine_param_rules(_df(spark, rows), min_support=2).collect()
    }
    ref = out[("a.com", "ref")]
    assert ref["n_groups"] == 2 and ref["n_consistent"] == 2
    assert ref["consistency"] == pytest.approx(1.0)
    assert ref["is_rule"] is True
    ident = out[("a.com", "id")]
    assert ident["n_groups"] == 1 and ident["n_consistent"] == 0
    assert ident["is_rule"] is False
    assert ("a.com", "once") not in out
    # the x=1 key: one group (the /q pair differing in ref? no — for
    # key x the two /q URLs differ in ref, so their residuals differ)
    # -> two singleton groups -> no row
    assert ("a.com", "x") not in out


def test_mixed_consistency_threshold(spark):
    rows = [
        # 3 groups for key "v": two consistent, one not
        ("http://b.com/p1?v=1", "A"), ("http://b.com/p1?v=2", "A"),
        ("http://b.com/p2?v=1", "B"), ("http://b.com/p2?v=2", "B"),
        ("http://b.com/p3?v=1", "C"), ("http://b.com/p3?v=2", "D"),
    ]
    loose = mine_param_rules(
        _df(spark, rows), min_support=3, min_consistency=0.6
    ).collect()[0]
    assert loose["n_groups"] == 3 and loose["n_consistent"] == 2
    assert loose["consistency"] == pytest.approx(2 / 3)
    assert loose["is_rule"] is True
    strict = mine_param_rules(
        _df(spark, rows), min_support=3, min_consistency=1.0
    ).collect()[0]
    assert strict["is_rule"] is False
    # support gate: same data, min_support above the 3 groups
    unsupported = mine_param_rules(
        _df(spark, rows), min_support=4, min_consistency=0.5
    ).collect()[0]
    assert unsupported["is_rule"] is False


def test_validation(spark):
    df = _df(spark, [("http://a.com/p?x=1", "A")])
    with pytest.raises(ValueError):
        mine_param_rules(df, min_consistency=0.0)
    with pytest.raises(ValueError):
        mine_param_rules(df, min_support=0)


def test_apply_rewrites(spark):
    rules = spark.createDataFrame(
        [("a.com", "ref"), ("a.com", "sid")],
        "host string, param_key string",
    )
    urls = spark.createDataFrame(
        [
            (1, "http://a.com/p?a=1&ref=9&z=2"),
            (2, "http://a.com/p?ref=9"),
            (3, "http://a.com/p?ref=9&sid=x"),
            (4, "http://a.com/p"),
            (5, "http://other.com/p?ref=9"),  # no rules for this host
            (6, None),
        ],
        "id long, canonical_url string",
    )
    got = {
        r["id"]: r["canonical_url"]
        for r in apply_param_rules(urls, rules).collect()
    }
    assert got[1] == "http://a.com/p?a=1&z=2"  # order preserved
    assert got[2] == "http://a.com/p"  # last param dropped -> no '?'
    assert got[3] == "http://a.com/p"  # both rules applied
    assert got[4] == "http://a.com/p"
    assert got[5] == "http://other.com/p?ref=9"  # byte-identical
    assert got[6] is None


def test_apply_out_col_keeps_original(spark):
    rules = spark.createDataFrame(
        [("a.com", "ref")], "host string, param_key string"
    )
    urls = spark.createDataFrame(
        [("http://a.com/p?ref=1&x=2",)], "canonical_url string"
    )
    row = apply_param_rules(urls, rules, out_col="clean_url").collect()[0]
    assert row["canonical_url"] == "http://a.com/p?ref=1&x=2"
    assert row["clean_url"] == "http://a.com/p?x=2"


def test_mine_then_apply_end_to_end(spark):
    """The mined is_rule slice feeds apply: ref collapses the three /p
    spellings to one URL; id survives untouched."""
    rows = [
        ("http://a.com/p?ref=1", "P"), ("http://a.com/p?ref=2", "P"),
        ("http://a.com/q?ref=1", "Q"), ("http://a.com/q?ref=2", "Q"),
        ("http://a.com/r?id=1", "R1"), ("http://a.com/r?id=2", "R2"),
    ]
    df = _df(spark, rows)
    rules = mine_param_rules(df, min_support=2).filter("is_rule")
    cleaned = apply_param_rules(df, rules)
    urls = sorted(
        r["canonical_url"]
        for r in cleaned.select("canonical_url").distinct().collect()
    )
    assert urls == [
        "http://a.com/p",
        "http://a.com/q",
        "http://a.com/r?id=1",
        "http://a.com/r?id=2",
    ]


def test_plan_shapes(spark):
    """Mining is two Exchanges (group, then key rollup) and no Python;
    apply is a BroadcastHashJoin over pure expressions — the corpus
    never hash-exchanges to be rewritten."""
    from covid19i2b2_spark.plans import physical_plan

    df = _df(spark, [("http://a.com/p?ref=1", "P")])
    mine_plan = physical_plan(mine_param_rules(df))
    body = mine_plan.split("== Physical Plan ==")[-1]
    assert body.count("Exchange") == 2, mine_plan
    assert "ArrowEvalPython" not in mine_plan
    assert "BatchEvalPython" not in mine_plan

    rules = spark.createDataFrame(
        [("a.com", "ref")], "host string, param_key string"
    )
    apply_plan = physical_plan(apply_param_rules(df, rules))
    assert "BroadcastHashJoin" in apply_plan, apply_plan
    assert "SortMergeJoin" not in apply_plan
    assert "ArrowEvalPython" not in apply_plan
    assert "BatchEvalPython" not in apply_plan
