"""X72 URL-template mining (operators/url_templates.py): the template
generalization zoo (hex-before-digit fold order, sorted key sets, NULL
contract), cardinality/share aggregation, explosion flagging with the
small-host guard, the filter split, and the plan pins (map-only
template expression; corpus never hash-exchanges for the flag join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.url_templates import (
    filter_exploded,
    mark_exploded_templates,
    mine_url_templates,
    url_template,
)

TPL_ZOO = [
    # (id, url, expected template; None = NULL)
    (1, "http://ex.com/product/812345", "http://ex.com/product/{N}"),
    (2, "http://ex.com/2026/08/16/post", "http://ex.com/{N}/{N}/{N}/post"),
    (3, "http://ex.com/p?b=2&a=1", "http://ex.com/p?a&b"),
    (4, "http://ex.com/p?a=9&b=0", "http://ex.com/p?a&b"),  # same as 3
    (5, "http://EX.com/CaseKept", "http://ex.com/CaseKept"),
    # 32-hex id folds to {H}, NOT to a shredded digit template
    (6, "http://ex.com/d/0123456789abcdef0123456789abcdef",
     "http://ex.com/d/{H}"),
    # 15 hex chars is below the {H} bar -> digit runs fold individually
    (7, "http://ex.com/d/0123456789abcde", "http://ex.com/d/{N}abcde"),
    (8, "http://ex.com/", "http://ex.com/"),
    (9, "http://ex.com/p?x=1&x=2", "http://ex.com/p?x"),  # keys dedup
    (10, "https://ex.com/p", "https://ex.com/p"),  # scheme kept
    (11, None, None),
    (12, "ftp://ex.com/a", None),
    (13, "not a url", None),
    # fragment never reaches the template
    (14, "http://ex.com/p?a=1#frag", "http://ex.com/p?a"),
    (15, "http://ex.com/page7?z=1&a=2", "http://ex.com/page{N}?a&z"),
]


def test_template_zoo(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in TPL_ZOO], "id long, url string"
    )
    got = {
        r["id"]: r["tpl"]
        for r in df.select("id", url_template("url").alias("tpl")).collect()
    }
    for i, _, want in TPL_ZOO:
        assert got[i] == want, (i, got[i], want)


def _urls(spark, rows):
    return spark.createDataFrame(
        [(i, u) for i, (u, n) in enumerate(
            (u, None) for u in rows
        )],
        "id long, canonical_url string",
    )


def test_mine_counts_and_shares(spark):
    rows = (
        [f"http://big.com/item/{i}" for i in range(8)]
        + ["http://big.com/about", "http://big.com/contact"]
        + ["http://other.com/x"]
        + ["junk"]
    )
    df = _urls(spark, rows)
    got = {
        r["template"]: r
        for r in mine_url_templates(df).collect()
    }
    item = got["http://big.com/item/{N}"]
    assert item["n_urls"] == 8
    assert item["host"] == "big.com"
    assert item["host_urls"] == 10
    assert item["host_share"] == pytest.approx(0.8)
    assert item["sample_url"] == "http://big.com/item/0"
    assert got["http://other.com/x"]["host_share"] == pytest.approx(1.0)
    null_row = got[None]
    assert null_row["n_urls"] == 1
    assert null_row["host"] is None and null_row["host_share"] is None


def test_mark_exploded_share_and_small_host_guard(spark):
    # host a: 200 urls, 180 in one template -> share 0.9 flags
    rows = [f"http://a.com/p/{i}" for i in range(180)]
    rows += [f"http://a.com/static{i}x" for i in range(20)]
    # host b: tiny (3 urls) -> share 1.0 but below min_host_urls
    rows += [f"http://b.com/q/{i}" for i in range(3)]
    df = _urls(spark, rows)
    marked = mark_exploded_templates(
        df, max_urls=10_000, max_host_share=0.5, min_host_urls=100
    )
    agg = {
        r["template"]: (r["n"], r["flagged"])
        for r in marked.groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_exploded").cast("int")).alias("flagged"),
        )
        .collect()
    }
    assert agg["http://a.com/p/{N}"] == (180, 180)
    assert agg["http://a.com/static{N}x"] == (20, 0)
    assert agg["http://b.com/q/{N}"] == (3, 0)  # small-host guard


def test_mark_exploded_absolute_cap(spark):
    rows = [f"http://c.com/s/{i}" for i in range(30)]
    rows += [f"http://c.com/t/{i}" for i in range(70)]
    df = _urls(spark, rows)
    marked = mark_exploded_templates(
        df, max_urls=50, max_host_share=1.0, min_host_urls=10**9
    )
    flagged = {
        r["template"]
        for r in marked.filter("is_exploded").select("template")
        .distinct().collect()
    }
    assert flagged == {"http://c.com/t/{N}"}


def test_filter_split_keeps_template_on_exploded(spark):
    rows = [f"http://a.com/p/{i}" for i in range(120)] + [
        "http://a.com/about", None
    ]
    df = _urls(spark, rows)
    clean, exploded = filter_exploded(
        df, max_urls=100, max_host_share=1.0, min_host_urls=10**9
    )
    assert exploded.count() == 120
    assert exploded.select("template").distinct().collect()[0][0] == (
        "http://a.com/p/{N}"
    )
    # clean keeps the non-URL row (NULL is not an explosion) and
    # carries no audit columns
    assert clean.count() == 2
    assert set(clean.columns) == {"id", "canonical_url"}


def test_threshold_validation(spark):
    df = _urls(spark, ["http://a.com/x"])
    with pytest.raises(ValueError):
        mark_exploded_templates(df, max_host_share=0.0)
    with pytest.raises(ValueError):
        mark_exploded_templates(df, max_host_share=1.5)


def test_plan_template_is_expression_only_and_flag_join_broadcasts(spark):
    """url_template compiles to pure regexp/array expressions (no
    Python), and mark's join back is a BroadcastHashJoin — the corpus
    never hash-exchanges for the flag."""
    from covid19i2b2_spark.plans import physical_plan

    df = _urls(spark, [f"http://a.com/p/{i}" for i in range(5)])
    tpl_plan = physical_plan(df.select(url_template("canonical_url")))
    assert "ArrowEvalPython" not in tpl_plan
    assert "BatchEvalPython" not in tpl_plan
    assert "Exchange" not in tpl_plan.split("== Physical Plan ==")[-1]

    mark_plan = physical_plan(mark_exploded_templates(df))
    assert "BroadcastHashJoin" in mark_plan, mark_plan
    assert "SortMergeJoin" not in mark_plan, mark_plan
