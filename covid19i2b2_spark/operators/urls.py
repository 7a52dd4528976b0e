"""X55: URL canonicalization + URL-keyed dedup (SURVEY §2.11
extension; round 10).  A crawl frontier and its post-hoc dedup both
need ONE canonical spelling per resource: the same page arrives as
``HTTP://WWW.Example.COM:80/a//b/?utm_source=x&id=2#frag`` and
``http://example.com/a/b?id=2``, and treating those as distinct
documents double-counts every popular page (and leaks near-identical
rows past URL-keyed sampling).  This is the hygiene pass that runs
BEFORE text-level dedup ever sees the bytes.

Everything here is pure column expressions (regexp + array ops — no
UDF, no explode): canonicalization is embarrassingly map-only and must
stay inside whole-stage codegen at 100 TB.

Canonical form (each rule is pinned by a planted test):

- scheme and host lowercase; only http/https qualify (anything else —
  including schemeless strings — canonicalizes to NULL: an
  un-canonicalizable URL must be visibly invalid, not silently passed
  through);
- userinfo dropped, default ports dropped (:80 http / :443 https),
  non-default ports kept;
- leading ``www.`` stripped (``strip_www=False`` opts out — it IS a
  distinct origin, but crawl dedup almost always folds it);
- path: duplicate slashes collapsed, trailing slash stripped (root
  stays ``/``; an empty path becomes ``/``); path CASE IS KEPT (paths
  are case-sensitive by spec, unlike host);
- query: tracking params dropped (utm_*, fbclid, gclid, msclkid,
  yclid, ref, ref_src), the rest SORTED by full ``k=v`` text so
  param order never splits a URL, empty query dropped;
- fragment dropped (never sent to the server).

Canonicalization is IDEMPOTENT (canon(canon(u)) = canon(u), property-
pinned) — safe to re-run over an already-clean frontier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|yclid|ref|ref_src)="


def canonicalize_url(col: str | Column, strip_www: bool = True) -> Column:
    """The canonical spelling of an http(s) URL, or NULL when the
    input isn't one (see the module docstring for the exact rules)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    # everything after ://, fragment dropped at the extraction
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^#]*)", 1)
    hostport = F.lower(
        # userinfo (user:pass@) dropped
        # GREEDY to the LAST @ — a host can't legally contain @, and a
        # lazy strip left "@" as the host for "@@" inputs, breaking
        # idempotence (hypothesis counterexample)
        F.regexp_replace(F.regexp_extract(rest, r"^([^/?]*)", 1), r"^.*@", "")
    )
    host = F.regexp_replace(hostport, r":\d*$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    path = F.regexp_extract(rest, r"^[^/?]*(/[^?]*)?", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(path == "/", path).otherwise(F.regexp_replace(path, r"/$", ""))
    )
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~F.lower(p).rlike(_TRACKING_RE),
        )
    )
    q_part = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    port_part = F.when(
        default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    canon = F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    return F.when(
        scheme.isin("http", "https") & (host != ""), canon
    ).otherwise(F.lit(None).cast("string"))


def extract_host(col: str | Column, strip_www: bool = True) -> Column:
    """The lowercase host of an http(s) URL (NULL when invalid) — the
    grouping key for per-site quotas, blocklists, and crawl budgets.
    eTLD+1 ("registered domain") extraction needs the public-suffix
    list and is deliberately NOT approximated here — a last-two-labels
    guess is wrong for half the world's ccTLDs (``example.co.uk``)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^#]*)", 1)
    hostport = F.lower(
        F.regexp_replace(F.regexp_extract(rest, r"^([^/?]*)", 1), r"^.*@", "")
    )
    host = F.regexp_replace(hostport, r":\d*$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return F.when(
        scheme.isin("http", "https") & (host != ""), host
    ).otherwise(F.lit(None).cast("string"))


def url_dedup(
    df: DataFrame,
    id_col: str,
    url_col: str,
    strip_www: bool = True,
) -> DataFrame:
    """One row per canonical URL — the LOWEST id wins (deterministic
    across runs/partitionings, the house survivor rule).  Rows whose
    URL doesn't canonicalize are KEPT, each its own group (an invalid
    URL is not evidence two documents are the same resource).  One
    map-only canonicalization + one groupBy shuffle on the canonical
    key; high-cardinality by construction."""
    canon = canonicalize_url(url_col, strip_www).alias("canonical_url")
    keyed = df.select(F.col(id_col), F.col(url_col), canon)
    valid = (
        keyed.filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias(id_col),
            F.min_by(F.col(url_col), F.col(id_col)).alias(url_col),
            F.count("*").cast("long").alias("n_duplicates"),
        )
        .select(id_col, url_col, "canonical_url", "n_duplicates")
    )
    invalid = keyed.filter(F.col("canonical_url").isNull()).select(
        id_col, url_col, "canonical_url", F.lit(1).cast("long").alias("n_duplicates")
    )
    return valid.unionByName(invalid)
