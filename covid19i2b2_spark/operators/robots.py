"""X67: distributed robots.txt parsing (round 12) — the producer side
of the X66 exclusion join.  A crawl fetches one robots.txt per host;
the bodies arrive as crawl results (a DataFrame of (host, body)), so
the parse must be distributed — a driver loop over 10^7 hosts is the
collect() anti-pattern this engine bans.  This module turns those
bodies into the (rule_host, is_suffix, prefix) frame
``filter_disallowed`` consumes, plus per-host Crawl-delay values for
politeness caps (``frontier_schedule``'s per-host cap column).

Semantics (RFC 9309, with two CONSERVATIVE simplifications, both in
the over-blocking direction — a polite crawler may fetch less than
robots.txt allows, never more):

- lines are ``field: value`` with ``#`` comments; unknown fields and
  malformed lines are ignored; field names case-insensitive; CRLF
  tolerated;
- GROUPS: one or more consecutive ``User-agent`` lines followed by
  rule lines.  A group applies to this crawler when one of its agent
  tokens equals ``user_agent`` (case-insensitive); ``*`` groups apply
  only when NO group names the agent specifically (the RFC's
  most-specific-group rule, restated for exact-token matching — the
  common case; substring product-token matching is a caller-side
  refinement);
- ``Disallow:`` with an empty value allows everything (no rule
  emitted); a value of ``/`` (or one that truncates to it) blocks the
  whole host;
- simplification 1: ``Allow`` lines are IGNORED — an allow carve-out
  inside a disallowed subtree stays blocked (over-blocking, safe);
- simplification 2: wildcard values are truncated at the first ``*``
  and a trailing ``$`` anchor is treated as a plain prefix — both
  block a superset of the spec's matches (safe direction), and the
  truncated prefix keeps the X66 join a pure startswith.

Plan shape (one shuffle): posexplode the body lines (bounded —
robots.txt bodies are capped at ~500 KB by convention and by fetchers),
ONE host-keyed window pass assigns group ids (a group starts at a
User-agent line not preceded by another User-agent line) and the
membership/specificity folds are two host-or-group-keyed aggregates;
everything downstream is the bounded per-host rule set.  Nothing is
collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# field:value — field is letters/dash (User-agent, Disallow, Allow,
# Crawl-delay, Sitemap...); everything else is noise per the RFC
_FIELD_RE = r"^([A-Za-z-]+)\s*:"
_VALUE_RE = r"^[A-Za-z-]+\s*:(.*)$"

# emitted hosts are normalized the way extract_host normalizes URL
# hosts (lowercase, leading www. stripped) — robots bodies arrive
# keyed by whatever spelling the fetcher recorded, and an unnormalized
# 'WWW.Example.com' rule_host would silently never match any
# canonicalized URL host (review r12 #3)
def _norm_rule_host():
    return F.regexp_replace(F.lower(F.col("__host")), r"^www\.", "")


def _robots_lines(
    robots: DataFrame, host_col: str, body_col: str, user_agent: str
) -> DataFrame:
    """(host, __grp, __field, __value) for every rule line of every
    group that APPLIES to ``user_agent`` — the shared group machinery
    behind parse_robots_txt and robots_crawl_delays."""
    ua = user_agent.strip().lower()
    lines = robots.select(
        F.col(host_col).alias("__host"),
        F.posexplode(
            F.split(F.col(body_col), r"\n")
        ).alias("__pos", "__raw"),
    ).select(
        "__host",
        "__pos",
        # strip comments and CR, then trim
        F.trim(
            F.regexp_replace(F.regexp_replace("__raw", r"#.*$", ""), r"\r", "")
        ).alias("__line"),
    )
    parsed = lines.select(
        "__host",
        "__pos",
        F.lower(F.regexp_extract("__line", _FIELD_RE, 1)).alias("__field"),
        F.trim(F.regexp_extract("__line", _VALUE_RE, 1)).alias("__value"),
    ).filter(F.col("__field") != "")
    w = Window.partitionBy("__host").orderBy("__pos")
    is_ua = (F.col("__field") == "user-agent").cast("int")
    # a group STARTS at a user-agent line whose predecessor is not one
    # (consecutive user-agent lines share a group); group id = running
    # count of starts — ONE window pass, host-keyed
    start = (
        (is_ua == 1)
        & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)
    ).cast("int")
    grouped = parsed.withColumn(
        "__grp", F.sum(start).over(w)
    ).filter(F.col("__grp") > 0)  # rules before any user-agent line: no group, ignored
    agents = grouped.filter(F.col("__field") == "user-agent").select(
        "__host",
        "__grp",
        F.lower(F.col("__value")).alias("__agent"),
    )
    membership = agents.groupBy("__host", "__grp").agg(
        F.max((F.col("__agent") == ua).cast("int")).alias("__named"),
        F.max((F.col("__agent") == "*").cast("int")).alias("__star"),
    )
    # most-specific-group rule: if ANY group on the host names the
    # agent, '*' groups do not apply
    host_named = membership.groupBy("__host").agg(
        F.max("__named").alias("__host_named")
    )
    applies = (
        membership.join(host_named, "__host")
        .filter(
            (F.col("__named") == 1)
            | ((F.col("__host_named") == 0) & (F.col("__star") == 1))
        )
        .select("__host", "__grp")
    )
    return grouped.join(applies, ["__host", "__grp"]).filter(
        F.col("__field") != "user-agent"
    )


def parse_robots_txt(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = "*",
) -> DataFrame:
    """(rule_host, is_suffix, prefix): the Disallow rules of every
    group applying to ``user_agent``, in the exact schema
    :func:`~covid19i2b2_spark.operators.urls.filter_disallowed`
    consumes (is_suffix always False — robots.txt binds to the host
    that served it, never to subdomains).  Empty Disallow values emit
    nothing (allow-all); wildcard/anchor values are conservatively
    truncated (module docstring); values not starting with ``/`` get
    it prepended (lenient real-world form).  Deduplicated — the join
    side needs each (host, prefix) once."""
    rules = _robots_lines(robots, host_col, body_col, user_agent).filter(
        (F.col("__field") == "disallow") & (F.col("__value") != "")
    )
    # truncate at the first '*' (blocks a superset — safe), drop a
    # trailing '$' anchor, ensure the leading '/'
    pfx = F.regexp_extract("__value", r"^([^*]*)", 1)
    pfx = F.regexp_replace(pfx, r"\$$", "")
    pfx = F.when(pfx == "", F.lit("/")).otherwise(
        F.when(pfx.startswith("/"), pfx).otherwise(F.concat(F.lit("/"), pfx))
    )
    return rules.select(
        _norm_rule_host().alias("rule_host"),
        F.lit(False).alias("is_suffix"),
        pfx.alias("prefix"),
    ).distinct()


def robots_crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = "*",
) -> DataFrame:
    """(host, crawl_delay): the Crawl-delay value (seconds, double) of
    the applicable group per host — the politeness knob
    ``frontier_schedule``'s per-host cap column is derived from
    (fewer fetch slots per round for slower hosts).  Non-numeric and
    non-positive values are ignored (a zero or garbage delay is no
    constraint); multiple applicable values keep the MOST conservative
    (largest) one."""
    delays = _robots_lines(robots, host_col, body_col, user_agent).filter(
        F.col("__field") == "crawl-delay"
    )
    # try_cast: ANSI mode makes a plain cast THROW on garbage values,
    # and "Crawl-delay: abc" is exactly the garbage this filter exists
    # to ignore
    v = F.col("__value").try_cast("double")
    return (
        delays.filter(v.isNotNull() & (v > 0))
        .groupBy(_norm_rule_host().alias("host"))
        .agg(F.max(v).alias("crawl_delay"))
    )


def _xml_unescape(col):
    """The five predefined XML entities, innermost-first so
    ``&amp;lt;`` round-trips to the literal ``&lt;`` (replacing
    ``&amp;`` LAST is what makes the chain single-pass correct)."""
    c = col
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def extract_sitemap_urls(
    sitemaps: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """X68 (round 12): sitemap XML → frontier rows — the discovery
    channel next to link extraction (sites advertise exactly the URLs
    they want crawled, with freshness hints).  One row per ``<url>``
    entry: (host, url, lastmod, priority, changefreq, kind='url');
    changefreq is the protocol's freshness hint, lowercased (the X79
    cold-start prior for re-crawl scheduling); sitemap INDEX
    files emit their child sitemaps as kind='sitemap' rows so the
    caller can loop fetch→extract to a fixed point (the nesting depth
    is bounded at 2 by the protocol, so the loop is, too).

    Declarative parse (the X67 rationale — 10^6+ bodies arrive as
    crawl results): regexp_extract_all over ``(?s)<url>…</url>`` /
    ``<sitemap>…</sitemap>`` blocks, per-block field extracts, the
    five XML entities unescaped (sitemap locs are XML-escaped by
    spec — ``&amp;`` in query strings is the norm, not the edge
    case).  lastmod stays the raw W3C datetime STRING (the protocol
    allows 4 precisions; parse at the consumer with the precision it
    needs); priority is try_cast — garbage is NULL, never a thrown
    stage.  Blocks without a ``<loc>`` carry no evidence and are
    dropped.  Full XML generality (namespaces beyond the default,
    CDATA) is out of scope by the protocol's own fixed schema."""
    # ONE body scan for both entry kinds (review r12 #5): an
    # alternating pattern with a backreference matches <url>…</url>
    # and <sitemap>…</sitemap> in a single regexp_extract_all pass
    # (group 0 = the whole block; the kind is recovered from its open
    # tag).  (?:\s[^>]*)? keeps <url> from matching the <urlset> root.
    pat = r"(?s)<(url|sitemap)(?:\s[^>]*)?>.*?</\1>"
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(body_col), F.lit(pat), F.lit(0))
        ).alias("__b"),
    )
    return (
        blocks.select(
            "host",
            _xml_unescape(
                F.trim(
                    F.regexp_extract(
                        "__b", r"(?s)<loc[^>]*>\s*(.*?)\s*</loc>", 1
                    )
                )
            ).alias("url"),
            F.trim(
                F.regexp_extract(
                    "__b", r"(?s)<lastmod[^>]*>\s*(.*?)\s*</lastmod>", 1
                )
            ).alias("lastmod"),
            F.regexp_extract(
                "__b", r"(?s)<priority[^>]*>\s*(.*?)\s*</priority>", 1
            ).try_cast("double").alias("priority"),
            F.lower(
                F.trim(
                    F.regexp_extract(
                        "__b",
                        r"(?s)<changefreq[^>]*>\s*(.*?)\s*</changefreq>",
                        1,
                    )
                )
            ).alias("changefreq"),
            F.when(F.col("__b").startswith("<url"), F.lit("url"))
            .otherwise(F.lit("sitemap"))
            .alias("kind"),
        )
        .filter(F.col("url") != "")
        .withColumn(
            "lastmod",
            F.when(F.col("lastmod") != "", F.col("lastmod")),
        )
        .withColumn(
            "changefreq",
            F.when(F.col("changefreq") != "", F.col("changefreq")),
        )
    )
