"""X77 page-level robots directives (operators/robots_meta.py): the
directive zoo (token matching, case, none shorthand, attribute orders
and quote styles, bot scoping, header union), a pure-Python same-spec
reference over generated pages, enforcement joins, and the map-only /
broadcast plan pins."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.robots_meta import (
    apply_page_directives,
    mark_page_directives,
    page_directives,
)

ZOO = [
    # (id, html, header, want_noindex, want_nofollow)
    (1, "<meta name='robots' content='noindex'>", None, True, False),
    (2, '<meta name="robots" content="nofollow">', None, False, True),
    (3, "<meta name=robots content=noindex,nofollow>", None, True, True),
    (4, "<meta name='robots' content='none'>", None, True, True),
    (5, "<meta name='robots' content='all'>", None, False, False),
    (6, "<p>no meta at all</p>", None, False, False),
    # token match, not substring: 'noindexing' is NOT noindex
    (7, "<meta name='robots' content='noindexing'>", None, False, False),
    # case-insensitive everywhere
    (8, "<META NAME='ROBOTS' CONTENT='NOINDEX, NOFOLLOW'>", None,
     True, True),
    # attribute order reversed
    (9, "<meta content='noindex' name='robots'>", None, True, False),
    # other meta names never match
    (10, "<meta name='description' content='noindex'>", None,
     False, False),
    # name must be exact: 'robotscheck' is not 'robots'
    (11, "<meta name='robotscheck' content='noindex'>", None,
     False, False),
    # header-only restriction
    (12, "<p>x</p>", "noindex", True, False),
    # header + meta UNION (most restrictive wins)
    (13, "<meta name='robots' content='nofollow'>", "noindex",
     True, True),
    # bot-scoped header value keeps the directive part
    (14, "<p>x</p>", "googlebot: noindex, nofollow", True, True),
    # whitespace tolerance
    (15, "<meta name='robots' content='  noindex ,  nofollow  '>",
     None, True, True),
    (16, None, None, False, False),
    # two meta tags union
    (17, "<meta name='robots' content='noindex'>"
        "<meta name='robots' content='nofollow'>", None, True, True),
]


def _run_zoo(spark):
    df = spark.createDataFrame(
        [(i, h, hd) for i, h, hd, _, _ in ZOO],
        "id long, html string, xrobots string",
    )
    return {
        r["id"]: (r["d"]["noindex"], r["d"]["nofollow"])
        for r in df.select(
            "id", page_directives("html", "xrobots").alias("d")
        ).collect()
    }


def test_directive_zoo(spark):
    got = _run_zoo(spark)
    for i, _, _, ni, nf in ZOO:
        assert got[i] == (ni, nf), (i, got[i], (ni, nf))


# same-spec pure-Python reference (the X67 pattern)
_META_RE = re.compile(
    r"(?is)<meta\b(?=[^>]*\bname\s*=\s*[\"']?\s*robots\s*[\"'\s/>])"
    r"[^>]*\bcontent\s*=\s*(?:([\"'])(.*?)\1|([^\s\"'>]+))"
)


def _py_directives(html, header):
    toks = []
    for m in _META_RE.finditer(html or ""):
        raw = m.group(2) if m.group(2) is not None else m.group(3)
        toks += [
            re.sub(r"^[^:,]*:", "", t).strip()
            for t in raw.lower().split(",")
        ]
    if header:
        toks += [
            re.sub(r"^[^:,]*:", "", t).strip()
            for t in header.lower().split(",")
        ]
    none = "none" in toks
    return ("noindex" in toks or none, "nofollow" in toks or none)


def test_matches_python_reference(spark):
    pages = []
    vals = ["noindex", "nofollow", "none", "all", "index, follow",
            "noindex , nofollow", "NOINDEX"]
    for i in range(40):
        v = vals[i % len(vals)]
        quote = ["'", '"', ""][i % 3]
        name_first = i % 2 == 0
        attrs = (
            f"name={quote}robots{quote} content={quote}{v}{quote}"
            if name_first
            else f"content={quote}{v}{quote} name={quote}robots{quote}"
        )
        hdr = ["noindex", None, "bot: nofollow", None][i % 4]
        pages.append((i, f"<html><meta {attrs}><p>body {i}</p>", hdr))
    df = spark.createDataFrame(pages, "id long, html string, hd string")
    got = {
        r["id"]: (r["d"]["noindex"], r["d"]["nofollow"])
        for r in df.select(
            "id", page_directives("html", "hd").alias("d")
        ).collect()
    }
    for i, html, hdr in pages:
        assert got[i] == _py_directives(html, hdr), (i, html, hdr)


def test_custom_bot_name(spark):
    df = spark.createDataFrame(
        [("<meta name='mybot' content='noindex'>"
          "<meta name='robots' content='nofollow'>",)],
        "html string",
    )
    d_my = df.select(page_directives("html", bot="mybot").alias("d"))
    row = d_my.collect()[0]["d"]
    assert (row["noindex"], row["nofollow"]) == (True, False)


def test_apply_enforcement(spark):
    pages = spark.createDataFrame(
        [
            ("http://s.com/keep", "<p>plain</p>"),
            ("http://s.com/hide",
             "<meta name='robots' content='noindex'><p>secret</p>"),
            ("http://s.com/deadend",
             "<meta name='robots' content='nofollow'><p>ok</p>"),
        ],
        "url string, html string",
    )
    documents = pages.select("url", F.lit("t").alias("text"))
    links = spark.createDataFrame(
        [
            ("http://s.com/keep", "http://x.com/1"),
            ("http://s.com/hide", "http://x.com/2"),
            ("http://s.com/deadend", "http://x.com/3"),
        ],
        "src string, href string",
    )
    docs, edges = apply_page_directives(pages, documents, links)
    assert {r["url"] for r in docs.collect()} == {
        "http://s.com/keep", "http://s.com/deadend",
    }
    assert {r["src"] for r in edges.collect()} == {
        "http://s.com/keep", "http://s.com/hide",
    }


def test_plan_pins(spark):
    """Flagging is map-only expressions; enforcement drops are
    broadcast anti-joins — the big frames never hash-exchange."""
    from covid19i2b2_spark.plans import physical_plan

    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = physical_plan(mark_page_directives(df, "html"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan.split("== Physical Plan ==")[-1]

    pages = spark.createDataFrame(
        [("http://a/1", "<p>x</p>")], "url string, html string"
    )
    docs = pages.select("url", F.lit("t").alias("text"))
    links = spark.createDataFrame(
        [("http://a/1", "http://b/2")], "src string, href string"
    )
    d2, e2 = apply_page_directives(pages, docs, links)
    for frame in (d2, e2):
        p = physical_plan(frame)
        assert "BroadcastHashJoin" in p, p
        assert "SortMergeJoin" not in p, p
