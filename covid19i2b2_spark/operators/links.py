"""X69: HTML link extraction + RFC 3986 reference resolution (round
12) — the PRODUCER of the whole crawl chain's input.  Everything
downstream already exists (X55 canonicalize/dedup → X64 anchor texts →
X56 host PageRank → X61 schedule → X61'' streaming frontier), but the
(src, href, anchor) edges those operators consume had no in-engine
source: crawl results are HTML, and hrefs in HTML are mostly RELATIVE.
A driver loop over 10^9 pages is the banned collect() shape, so both
steps are pure column expressions.

``resolve_url`` implements RFC 3986 §5 reference resolution with the
common non-strict reading (matching urllib.parse.urljoin where the two
agree, pinned by a hypothesis property):

- a ref carrying its own scheme is returned verbatim (non-strict: no
  dot-segment rewrite of foreign URLs — the crawler canonicalizes
  later anyway);
- protocol-relative ``//host/p`` inherits the base scheme;
- root-relative, query-only, empty, and relative refs merge with the
  base per §5.3, with §5.2.4 remove-dot-segments run as ONE
  F.aggregate fold over the split path (``..`` pops, ``.`` skips,
  ``..`` at root is a no-op, a trailing ``/.`` or ``/..`` keeps the
  trailing slash);
- ONE documented divergence from urllib.parse.urljoin: empty path
  segments (``a//b``) are PRESERVED per RFC/WHATWG (python's urljoin
  collapses them — a stdlib quirk, not the spec);
- the ref's fragment is dropped before resolution (never sent to the
  server; the frontier keys on resources).

``extract_links`` pulls ``<a ... href=...>anchor</a>`` blocks with one
regexp_extract_all body pass (the X68 single-scan rule), decodes the
five XML entities in hrefs (``&amp;`` inside query strings is the norm
in HTML), honors a ``<base href>`` when present (itself resolved
against the page URL per the HTML spec), resolves every href, and
keeps http(s) results only — javascript:/mailto:/tel: links carry no
crawl evidence.  Anchor text is the block's inner text with tags
stripped, entities decoded, and whitespace collapsed — the exact shape
X64 top_anchor_texts consumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from covid19i2b2_spark.operators.robots import _xml_unescape

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def _remove_dot_segments(p: Column) -> Column:
    """RFC 3986 §5.2.4 over an ABSOLUTE path (leading '/'): one
    aggregate fold — '..' pops (a no-op at root), '.' skips, empty
    segments are real segments (preserved), and a trailing '/.' or
    '/..' keeps the directory's trailing slash."""
    segs = F.split(p, "/")
    folded = F.aggregate(
        segs,
        F.slice(F.array(F.lit("")), 1, 0),      # empty array<string>

        lambda acc, s: F.when(s == ".", acc)
        .when(
            s == "..",
            F.when(
                F.size(acc) > 1,
                F.slice(acc, 1, F.size(acc) - 1),
            ).otherwise(acc),
        )
        .otherwise(F.concat(acc, F.array(s))),
    )
    joined = F.array_join(folded, "/")
    ends_dir = p.rlike(r"(^|/)\.\.?$")
    joined = F.when(
        ends_dir & ~joined.endswith("/"), F.concat(joined, F.lit("/"))
    ).otherwise(joined)
    return F.when(joined == "", F.lit("/")).otherwise(joined)


def resolve_url(base: Column | str, ref: Column | str) -> Column:
    """The absolute URL of reference ``ref`` against ``base`` (an
    absolute http(s) URL — crawl page URLs by construction).  NULL
    inputs resolve to NULL.  See the module docstring for the exact
    RFC 3986 §5 semantics and the one documented urljoin divergence."""
    b = F.col(base) if isinstance(base, str) else base
    r0 = F.trim(F.col(ref) if isinstance(ref, str) else ref)
    r = F.regexp_replace(r0, r"#.*$", "")          # fragment never resolves
    b_nofrag = F.regexp_replace(b, r"#.*$", "")
    b_scheme = F.lower(F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    b_auth = F.regexp_extract(b, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    b_path = F.regexp_extract(
        b, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    rp = F.regexp_extract(r, r"^([^?]*)", 1)
    rq = F.regexp_extract(r, r"(\?.*)$", 1)
    prefix = F.concat(b_scheme, F.lit("://"), b_auth)
    # relative merge (§5.3): the base directory is the path up to its
    # last '/', or root when the base path is empty/slash-less
    b_dir = F.regexp_extract(b_path, r"^(.*/)", 1)
    b_dir = F.when(b_dir == "", F.lit("/")).otherwise(b_dir)
    merged = F.concat(b_dir, rp)
    return F.when(
        r0.isNull() | b.isNull(), F.lit(None).cast("string")
    ).when(r == "", b_nofrag).when(
        r.rlike(_SCHEME_RE), r
    ).when(
        r.startswith("//"), F.concat(b_scheme, F.lit(":"), r)
    ).when(
        rp.startswith("/"),
        F.concat(prefix, _remove_dot_segments(rp), rq),
    ).when(
        rp == "", F.concat(prefix, b_path, rq)      # query-only ref
    ).otherwise(
        F.concat(prefix, _remove_dot_segments(merged), rq)
    )


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src, href, anchor_text): one row per ``<a href>`` in each
    page, hrefs resolved to ABSOLUTE http(s) URLs (everything else —
    javascript:, mailto:, unresolvable garbage — carries no crawl
    evidence and is dropped; pages with no links emit nothing).
    ``src`` is the page URL as given.  Output feeds url_dedup /
    SeenUrlSet (href), top_anchor_texts (anchor_text), and the
    prioritize_and_schedule links frame."""
    # the effective base is computed PER PAGE before the explode, so
    # the full HTML never rides along one-copy-per-link
    base_raw = F.regexp_extract(
        F.col(html_col),
        r"""(?is)<base\s[^>]*?href\s*=\s*["']?([^"'\s>]+)""",
        1,
    )
    eff_base = F.when(
        base_raw != "",
        resolve_url(F.col(url_col), _xml_unescape(base_raw)),
    ).otherwise(F.col(url_col))
    blocks = pages.select(
        F.col(url_col).alias("src"),
        eff_base.alias("__base"),
        F.explode(
            F.regexp_extract_all(
                F.col(html_col),
                F.lit(r"(?is)<a\s[^>]*>.*?</a>"),
                F.lit(0),
            )
        ).alias("__a"),
    )
    dq = F.regexp_extract("__a", r'(?is)^<a\s[^>]*?href\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract("__a", r"(?is)^<a\s[^>]*?href\s*=\s*'([^']*)'", 1)
    bare = F.regexp_extract(
        "__a", r"""(?is)^<a\s[^>]*?href\s*=\s*([^\s"'>][^\s>]*)""", 1
    )
    href_raw = F.when(dq != "", dq).when(sq != "", sq).when(
        bare != "", bare
    )
    anchor = F.regexp_replace(
        F.regexp_extract("__a", r"(?is)^<a[^>]*>(.*)</a>$", 1),
        r"(?s)<[^>]*>",
        " ",
    )
    anchor = F.trim(
        F.regexp_replace(_xml_unescape(anchor), r"\s+", " ")
    )
    return (
        blocks.withColumn(
            "href", resolve_url(F.col("__base"), _xml_unescape(href_raw))
        )
        .filter(F.col("href").rlike(r"^https?://"))
        .select("src", "href", anchor.alias("anchor_text"))
    )
