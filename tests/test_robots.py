"""X67 robots.txt parsing (operators/robots.py): planted group zoo,
RFC group semantics (consecutive agents, most-specific group,
empty-disallow allow-all), conservative wildcard/anchor truncation,
crawl delays, end-to-end with filter_disallowed, and a hypothesis
property against a pure-python reference parser."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.robots import (
    parse_robots_txt,
    robots_crawl_delays,
)

ZOO_BODY = """
# global rules
User-agent: *
Disallow: /private
Disallow:            # empty value = allow all, no rule
Crawl-delay: 2

User-Agent: mybot    # field names case-insensitive; agent group of 2
user-agent: otherbot
Disallow: /only-for-bots
Allow: /only-for-bots/except   # Allow is ignored (conservative)
Crawl-delay: 10

noise line without a colon-field
Disallow: /ignored-outside-any-group-is-fine
"""

WILD_BODY = (
    "User-agent: *\r\n"        # CRLF tolerated
    "Disallow: /a/*/c\r\n"     # truncates at the first *
    "Disallow: /exact$\r\n"    # trailing anchor dropped (prefix)
    "Disallow: *\r\n"          # pure wildcard = whole host
    "Disallow: no-slash\r\n"   # lenient: leading / prepended
)


def _rules(spark, rows, ua="*"):
    df = spark.createDataFrame(rows, "host string, body string")
    return sorted(
        (r["rule_host"], r["prefix"], r["is_suffix"])
        for r in parse_robots_txt(df, user_agent=ua).collect()
    )


def test_group_zoo_star_agent(spark):
    got = _rules(spark, [("a.com", ZOO_BODY)], ua="*")
    # the '*' group's one real rule; the mybot group does not apply;
    # the orphan Disallow after the noise line belongs to the mybot
    # group (still within it — no new group started)
    assert got == [("a.com", "/private", False)]


def test_most_specific_group_wins(spark):
    got = _rules(spark, [("a.com", ZOO_BODY)], ua="MyBot")
    # named group applies; the '*' group must NOT (RFC most-specific);
    # the post-noise Disallow still belongs to the named group
    assert got == [
        ("a.com", "/ignored-outside-any-group-is-fine", False),
        ("a.com", "/only-for-bots", False),
    ]
    # an agent named nowhere falls back to '*'
    got2 = _rules(spark, [("a.com", ZOO_BODY)], ua="strangerbot")
    assert got2 == [("a.com", "/private", False)]


def test_wildcards_anchors_and_leniency(spark):
    got = _rules(spark, [("w.com", WILD_BODY)])
    assert got == [
        ("w.com", "/", False),           # '*' truncates to whole host
        ("w.com", "/a/", False),         # prefix before the wildcard
        ("w.com", "/exact", False),      # $ anchor dropped
        ("w.com", "/no-slash", False),   # leading slash prepended
    ]


def test_rules_before_any_group_are_ignored(spark):
    body = "Disallow: /orphan\nUser-agent: *\nDisallow: /real"
    assert _rules(spark, [("x.com", body)]) == [("x.com", "/real", False)]


def test_crawl_delays_group_scoped_max_and_garbage(spark):
    df = spark.createDataFrame(
        [
            ("a.com", ZOO_BODY),
            ("b.com", "User-agent: *\nCrawl-delay: abc\nCrawl-delay: -1"),
            ("c.com", "User-agent: *\nCrawl-delay: 1.5\nCrawl-delay: 3"),
        ],
        "host string, body string",
    )
    star = {r["host"]: r["crawl_delay"]
            for r in robots_crawl_delays(df).collect()}
    assert star == {"a.com": 2.0, "c.com": 3.0}   # garbage host absent
    named = {r["host"]: r["crawl_delay"]
             for r in robots_crawl_delays(df, user_agent="mybot").collect()}
    assert named["a.com"] == 10.0


def test_end_to_end_with_filter_disallowed(spark):
    from covid19i2b2_spark.operators.urls import filter_disallowed

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private")],
        "host string, body string",
    )
    rules = parse_robots_txt(robots)
    urls = spark.createDataFrame(
        [
            (1, "http://a.com/private/x"),
            (2, "http://a.com/public"),
            (3, "http://b.com/private/x"),   # rule binds to a.com only
        ],
        "i long, url string",
    )
    allowed, blocked = filter_disallowed(urls, rules, url_col="url")
    assert sorted(r["i"] for r in blocked.collect()) == [1]
    assert sorted(r["i"] for r in allowed.collect()) == [2, 3]


# --- hypothesis property vs a pure-python reference parser ----------

def _ref_parse(body: str, ua: str):
    """Same semantics, independently implemented: returns
    (set[(prefix)], max crawl_delay or None)."""
    groups: list[dict] = []
    in_ua = False
    for raw in body.split("\n"):
        line = raw.split("#", 1)[0].replace("\r", "").strip()
        m = re.match(r"^([A-Za-z-]+)\s*:(.*)$", line)
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2).strip()
        if field == "user-agent":
            if not in_ua:
                groups.append({"agents": set(), "rules": []})
                in_ua = True
            groups[-1]["agents"].add(value.lower())
        else:
            in_ua = False
            if groups:
                groups[-1]["rules"].append((field, value))
    named = any(ua in g["agents"] for g in groups)
    prefixes, delay = set(), None
    for g in groups:
        if not ((ua in g["agents"])
                or (not named and "*" in g["agents"])):
            continue
        for field, value in g["rules"]:
            if field == "disallow" and value != "":
                p = value.split("*", 1)[0]
                if p.endswith("$"):
                    p = p[:-1]
                if p == "":
                    p = "/"
                elif not p.startswith("/"):
                    p = "/" + p
                prefixes.add(p)
            elif field == "crawl-delay":
                try:
                    v = float(value)
                except ValueError:
                    continue
                if v > 0:
                    delay = v if delay is None else max(delay, v)
    return prefixes, delay


_LINES = st.sampled_from([
    "User-agent: *",
    "User-agent: mybot",
    "User-agent: other",
    "Disallow: /a",
    "Disallow: /a/*/b",
    "Disallow: /c$",
    "Disallow:",
    "Allow: /a/x",
    "Crawl-delay: 5",
    "Crawl-delay: 2.5",
    "Crawl-delay: nope",
    "Sitemap: http://x/sitemap.xml",
    "garbage no colon",
    "# a comment",
    "",
])


@settings(max_examples=6, deadline=None)  # one Spark parse per example (round 16: driver pytest window)
@given(
    body_lines=st.lists(_LINES, min_size=0, max_size=14),
    ua=st.sampled_from(["mybot", "*"]),
)
def test_matches_reference_parser(spark, body_lines, ua):
    body = "\n".join(body_lines)
    df = spark.createDataFrame([("h.com", body)], "host string, body string")
    got_rules = {
        r["prefix"] for r in parse_robots_txt(df, user_agent=ua).collect()
    }
    got_delay = {
        r["host"]: r["crawl_delay"]
        for r in robots_crawl_delays(df, user_agent=ua).collect()
    }.get("h.com")
    want_rules, want_delay = _ref_parse(body, ua)
    assert got_rules == want_rules, body
    assert got_delay == want_delay, body


# --- X68 sitemap extraction ------------------------------------------

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://a.com/page?x=1&amp;y=2</loc>
    <lastmod>2024-01-15</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>
      http://a.com/plain
  </loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>http://a.com/bad-priority</loc><priority>high</priority></url>
</urlset>"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc>http://a.com/sitemap1.xml</loc><lastmod>2024-02-02</lastmod></sitemap>
  <sitemap><loc>http://a.com/sitemap2.xml</loc></sitemap>
</sitemapindex>"""


def test_sitemap_extraction_zoo(spark):
    """X68: url entries with escaped locs, whitespace, optional and
    garbage fields; loc-less blocks dropped; index files emit
    kind='sitemap' children."""
    from covid19i2b2_spark.operators.robots import extract_sitemap_urls

    df = spark.createDataFrame(
        [("a.com", SITEMAP), ("a.com", SITEMAP_INDEX)],
        "host string, body string",
    )
    got = sorted(
        (r["url"], r["lastmod"], r["priority"], r["kind"])
        for r in extract_sitemap_urls(df).collect()
    )
    assert got == [
        ("http://a.com/bad-priority", None, None, "url"),
        ("http://a.com/page?x=1&y=2", "2024-01-15", 0.8, "url"),
        ("http://a.com/plain", None, None, "url"),
        ("http://a.com/sitemap1.xml", "2024-02-02", None, "sitemap"),
        ("http://a.com/sitemap2.xml", None, None, "sitemap"),
    ]


@settings(max_examples=10, deadline=None)
@given(
    entries=st.lists(
        st.tuples(
            st.sampled_from([
                "http://h.com/a", "http://h.com/b?x=1&y=2",
                "http://h.com/c d",          # space kept verbatim
            ]),
            st.one_of(st.none(), st.sampled_from(["2024-01-01", "x"])),
            st.one_of(st.none(), st.sampled_from(["0.5", "junk"])),
        ),
        min_size=0, max_size=6,
    )
)
def test_sitemap_matches_elementtree_reference(spark, entries):
    """Hypothesis: the declarative parse equals xml.etree on arbitrary
    well-formed sitemaps (locs escaped on write, entities round-trip
    through the unescape chain)."""
    import xml.etree.ElementTree as ET
    from xml.sax.saxutils import escape

    from covid19i2b2_spark.operators.robots import extract_sitemap_urls

    parts = ["<urlset>"]
    for loc, lastmod, prio in entries:
        parts.append("<url>")
        parts.append(f"<loc>{escape(loc)}</loc>")
        if lastmod is not None:
            parts.append(f"<lastmod>{lastmod}</lastmod>")
        if prio is not None:
            parts.append(f"<priority>{prio}</priority>")
        parts.append("</url>")
    parts.append("</urlset>")
    body = "\n".join(parts)

    ref = []
    for u in ET.fromstring(body).iter("url"):
        loc = u.findtext("loc")
        if not loc or not loc.strip():
            continue
        prio_txt = u.findtext("priority")
        try:
            prio = float(prio_txt) if prio_txt is not None else None
        except ValueError:
            prio = None
        ref.append((loc.strip(), u.findtext("lastmod"), prio, "url"))

    df = spark.createDataFrame([("h.com", body)], "host string, body string")
    key = lambda t: (t[0], str(t[1]), str(t[2]), t[3])  # None-safe sort
    got = sorted(
        (
            (r["url"], r["lastmod"], r["priority"], r["kind"])
            for r in extract_sitemap_urls(df).collect()
        ),
        key=key,
    )
    assert got == sorted(ref, key=key), body


def test_rule_hosts_normalized_like_url_hosts(spark):
    """Review-r12 pass 2: robots bodies arrive keyed by whatever
    spelling the fetcher recorded; emitted rule hosts (and crawl-delay
    hosts) must be lowercased + www-stripped so they actually match
    extract_host's canonicalized URL hosts."""
    from covid19i2b2_spark.operators.urls import filter_disallowed

    robots = spark.createDataFrame(
        [("WWW.Example.com", "User-agent: *\nDisallow: /x\nCrawl-delay: 4")],
        "host string, body string",
    )
    rules = parse_robots_txt(robots)
    assert [r["rule_host"] for r in rules.collect()] == ["example.com"]
    urls = spark.createDataFrame(
        [(1, "http://example.com/x/1"), (2, "http://example.com/y")],
        "i long, url string",
    )
    _, blocked = filter_disallowed(urls, rules, url_col="url")
    assert [r["i"] for r in blocked.collect()] == [1]
    delays = {r["host"]: r["crawl_delay"]
              for r in robots_crawl_delays(robots).collect()}
    assert delays == {"example.com": 4.0}
