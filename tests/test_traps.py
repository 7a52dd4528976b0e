"""X70 spider-trap detection (operators/traps.py): each reason code
against a planted URL zoo, the bounded-scan contract on adversarially
deep URLs, the NULL/non-URL loud path, the filter split, and the crawl
pipeline's trapped-URLs-never-get-a-round integration."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.traps import (
    filter_traps,
    mark_traps,
    trap_signals,
)

ZOO = [
    # (id, url, expected sorted reason list; None = NULL reasons)
    (1, "http://ex.com/a/b/c", []),
    (2, "http://ex.com/", []),
    (3, "http://ex.com/a/b/a/b/a", ["repeat_segment"]),
    (4, "http://ex.com/a/b/a/b", []),  # multiplicity 2 < default 3
    (5, "http://ex.com/2026/08/16/2026/08/17", ["numeric_run"]),
    (6, "http://ex.com/2026/08/16/post-title", []),  # 3 numeric < 6
    (7, "http://ex.com/p?PHPSESSID=abc123", ["session_param"]),
    (8, "http://ex.com/p?JSESSIONID=x&a=1", ["session_param"]),
    (9, "http://ex.com/p?session_id=9", ["session_param"]),
    (10, "http://ex.com/p?sidebar=1", []),  # 'sid' must match EXACT key
    (11, "http://ex.com/p?x=1&x=2&x=3", ["repeat_param_key"]),
    (12, "http://ex.com/p?x=1&x=2&y=3", []),
    (13, "http://ex.com/" + "/".join(str(i) for i in range(17)),
     ["depth", "numeric_run"]),
    (14, "http://ex.com/p?" + "&".join(f"k{i}=1" for i in range(13)),
     ["params"]),
    (15, "http://ex.com/" + "x" * 129, ["long_segment"]),
    (16, "http://ex.com/" + "x" * 128, []),
    (17, "http://ex.com/p?q=" + "y" * 2100, ["long_url"]),
    (18, None, None),
    (19, "ftp://ex.com/a/b/a/b/a", None),
    (20, "not a url", None),
    # query string is NOT path segments: slashes inside the query
    # must not count toward depth/repeat
    (21, "http://ex.com/p?path=/a/b/a/b/a/b/a/b", []),
    # fragment is excluded from every signal
    (22, "http://ex.com/p#/a/b/a/b/a/b", []),
]


def test_trap_zoo(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in ZOO], "id long, url string"
    )
    got = {
        r["id"]: r["trap_reasons"]
        for r in mark_traps(df, "url").collect()
    }
    for i, _, want in ZOO:
        assert got[i] == want, f"id={i}: {got[i]!r} != {want!r}"


def test_flag_and_null_contract(spark):
    df = spark.createDataFrame(
        [(1, "http://ex.com/a/b/a/b/a"), (2, "http://ex.com/ok"),
         (3, None), (4, "mailto:x@y")],
        "id long, url string",
    )
    rows = {r["id"]: r for r in mark_traps(df, "url").collect()}
    assert rows[1]["is_trap"] is True
    assert rows[2]["is_trap"] is False and rows[2]["trap_reasons"] == []
    # invalid inputs: NULL reasons, flag False (their own loud path)
    for i in (3, 4):
        assert rows[i]["trap_reasons"] is None
        assert rows[i]["is_trap"] is False


def test_bounded_scan_on_adversarial_depth(spark):
    """The O(d^2) repeat scan inspects only the first repeat_scan
    segments — a 5000-segment URL must still evaluate (and trip depth
    + repeat_segment from inside the window)."""
    deep = "http://ex.com/" + "a/" * 5000
    df = spark.createDataFrame([(1, deep)], "id long, url string")
    [r] = mark_traps(df, "url").collect()
    assert "depth" in r["trap_reasons"]
    assert "repeat_segment" in r["trap_reasons"]
    # repeats BEYOND the scan window don't fire on their own: 100
    # distinct segments then one 'z' repeated past position 64
    tail = "http://ex.com/" + "/".join(f"s{i}" for i in range(100)) + "/z/z/z"
    df2 = spark.createDataFrame([(1, tail)], "id long, url string")
    [r2] = mark_traps(df2, "url", max_depth=200).collect()
    assert "repeat_segment" not in r2["trap_reasons"]
    assert "depth" not in r2["trap_reasons"]


def test_thresholds_are_parameters(spark):
    df = spark.createDataFrame(
        [(1, "http://ex.com/a/b/a/b")], "id long, url string"
    )
    [r] = mark_traps(df, "url", max_repeat=2).collect()
    assert r["trap_reasons"] == ["repeat_segment"]


def test_reasons_sorted_deterministic(spark):
    url = "http://ex.com/" + "/".join(str(i) for i in range(20)) \
        + "?PHPSESSID=x&a=1&a=2&a=3"
    df = spark.createDataFrame([(1, url)], "id long, url string")
    [r] = mark_traps(df, "url").collect()
    assert r["trap_reasons"] == sorted(r["trap_reasons"])
    assert r["trap_reasons"] == [
        "depth", "numeric_run", "repeat_param_key", "session_param",
    ]


def test_filter_split(spark):
    df = spark.createDataFrame(
        [(1, "http://ex.com/ok"), (2, "http://ex.com/a/b/a/b/a"),
         (3, None)],
        "id long, url string",
    )
    clean, trapped = filter_traps(df, "url")
    assert sorted(r["id"] for r in clean.collect()) == [1, 3]
    trows = trapped.collect()
    assert [r["id"] for r in trows] == [2]
    # trapped side keeps WHY
    assert trows[0]["trap_reasons"] == ["repeat_segment"]
    assert "trap_reasons" not in clean.columns


def test_pipeline_traps_never_get_a_round(spark):
    """prioritize_and_schedule(exclude_traps=True): a trapped URL keeps
    its row but never consumes a politeness slot, and clean URLs of the
    same host fill the freed slots."""
    from covid19i2b2_spark.pipelines.crawl import prioritize_and_schedule

    urls = spark.createDataFrame(
        [(1, "http://h1.com/ok1"),
         (2, "http://h1.com/a/b/a/b/a"),          # trap
         (3, "http://h1.com/ok2"),
         (4, "http://h2.com/p?PHPSESSID=zz"),     # trap
         (5, "http://h2.com/fine")],
        "url_id long, url string",
    )
    links = spark.createDataFrame(
        [(1, 4), (3, 5)], "src_id long, dst_id long"
    )
    out = prioritize_and_schedule(
        urls, links, per_host_per_round=1, exclude_traps=True,
    )
    rows = {r["url_id"]: r for r in out.collect()}
    assert rows[2]["crawl_round"] is None
    assert rows[4]["crawl_round"] is None
    # clean h1 URLs take rounds 1 and 2 (trap consumed no slot)
    assert sorted([rows[1]["crawl_round"], rows[3]["crawl_round"]]) == [1, 2]
    assert rows[5]["crawl_round"] == 1
    # temp flag columns don't leak into the schedule
    assert not [c for c in out.columns if c.startswith("__")]


def test_signals_expression_only(spark):
    """trap_signals is a pure Column expression — the corpus plan has
    no Python evaluation (no BatchEvalPython / ArrowEvalPython) and no
    exchange: a map-only pass over the scan."""
    df = spark.range(10).select(
        F.concat(F.lit("http://h"), F.col("id"), F.lit(".com/p")).alias("u")
    )
    plan = df.select(trap_signals("u").alias("r"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
