"""X89: license/attribution extraction (round 14 — VERDICT r13
"What's missing" #3, the one commonly-hit corpus-builder operator with
no §2.11 row).

Training-corpus curation has to answer "may I use this page, and under
what terms?" per document — licensing obligations attach to every
member of a dedup cluster (the reason survivor_provenance exists,
operators/dedup_clusters.py:369), so the license evidence must be
EXTRACTED from the HTML the engine is already parsing before dedup
collapses anything.  Two evidence channels, both standard practice
(Common Crawl's C4 license filtering, the rel-license microformat):

- ``rel="license"`` declarations: ``<link rel="license" href>`` and
  ``<a rel="license" href>`` (RFC 4946 / HTML spec; rel is a
  space-separated token list, so ``rel="license nofollow"`` counts) —
  the page's own machine-readable statement.  First declaration wins
  (the canonical_link convention), resolved against the page URL via
  X69 RFC 3986 (relative hrefs are legal), http(s)-only.
- Creative-Commons URL recognition: an href pointing at
  ``creativecommons.org/licenses/<code>/<ver>/`` or
  ``/publicdomain/{zero,mark}/<ver>/`` even WITHOUT a rel attribute —
  the dominant real-world pattern (the badge-image link).

Everything is pure JVM-side expressions in the X83 canonical_link
idiom (attribute-order/quote agnostic lookahead, entity decode, the
bind-once HOF staging for multiply-referenced sub-expressions), with a
planted-zoo pytest and a full DuckDB re-derivation parity query
(UNREGISTERED_ORACLES) — no UDFs, no second HTML pass beyond the one
regexp family the links/boilerplate chain already pays.

``license_id`` normalization: CC URLs map to SPDX-style identifiers
(``CC-BY-SA-4.0``, ``CC0-1.0``, ``CC-PDM-1.0``); any other
rel-license target keeps its URL with a NULL id — the operator
extracts evidence, policy decides downstream.

Scale shape: map-only (one projection over pages), exactly like
canonical_link/extract_links — no shuffle, no driver state; the
provenance rollup happens in X63 where the license_id column rides
``collect_cols`` like any other obligation column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# rel is a space-separated token LIST: accept license as any token in
# the value (quoted — where the backreferenced quote bounds the token
# scan — or bare single-token), on <link> or <a>.  The lookahead keeps
# attribute order free (the X77/X83 pattern).  Token boundaries are
# (?<![\w-])/(?![\w-]) rather than \b: rel="license-info" is a
# DIFFERENT token per the HTML spec, and \b treats '-' as a boundary
# (review r14).  The whole-document pass captures the FIRST matching
# ELEMENT (group 3 = the full tag); href extraction then runs over
# that short tag string, so a later quoted declaration can never
# outrank an earlier bare one (first-declaration-wins for real,
# review r14).
_TOK = r"(?<![\w-])license(?![\w-])"
_REL_LICENSE_ELEM = (
    r"(?is)(<(?:link|a)\b"
    r"(?=[^>]*\brel\s*=\s*"
    r"(?:([\"'])(?:(?!\2)[^>])*" + _TOK + r"|" + _TOK + r"))"
    r"[^>]*>)"
)
_HREF_Q = r"(?is)(?<![\w-])href\s*=\s*([\"'])(.*?)\1"
_HREF_BARE = r"(?is)(?<![\w-])href\s*=\s*([^\s\"'>]+)"
# a CC license/publicdomain URL used as an href anywhere on the page
_CC_HREF = (
    r"(?is)(?<![\w-])href\s*=\s*[\"']?\s*"
    r"(https?://(?:www\.)?creativecommons\.org/"
    r"(?:licenses/[a-z][a-z-]*/\d+(?:\.\d+)?|"
    r"publicdomain/(?:zero|mark)/\d+(?:\.\d+)?)[^\s\"'>]*)"
)
# normalization pieces (run on an already-extracted URL — tiny input)
_CC_CODE = (
    r"(?i)creativecommons\.org/licenses/([a-z][a-z-]*)/(\d+(?:\.\d+)?)"
)
_CC_PD = r"(?i)creativecommons\.org/publicdomain/(zero|mark)/(\d+(?:\.\d+)?)"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def rel_license_link(
    html_col: str | Column, url_col: str | Column
) -> Column:
    """The absolute http(s) URL the page declares as its license via
    ``rel="license"`` (<link> or <a>; license as any rel token), or
    NULL.  First declaration wins; relative hrefs resolve against the
    page URL (RFC 3986); entity-decoded; tab/CR/LF stripped per the
    HTML URL-attribute rule (the X69/X83 conventions).

    Documented trade-off (review r15): first-ELEMENT-wins — a first
    declaring element with no extractable href (markup error, e.g. a
    bare ``<link rel="license">``) yields NULL even when a later
    well-formed declaration exists.  Declaration order is evidence
    order here; recovering from malformed first declarations would
    need an all-declarations scan (the cost the single-capture design
    deliberately avoids)."""
    from covid19i2b2_spark.operators.links import resolve_url
    from covid19i2b2_spark.operators.robots import _xml_unescape

    h = _col(html_col)
    u = _col(url_col)
    # ONE whole-document regex captures the first declaring element;
    # quote-style disambiguation happens on the short tag string where
    # declaration order cannot be inverted.  The element is bind-once
    # staged (round 15, guide §4.4-adjacent expression-duplication):
    # referenced bare, the CASE raw-href expression inlines the
    # whole-document extract FOUR times per row — one element_at/
    # transform stage keeps the expensive scan at exactly one
    # evaluation; the short-tag href regexes stay direct references.
    elem_raw = F.regexp_extract(h, _REL_LICENSE_ELEM, 1)

    def _href_of(elem: Column) -> Column:
        quoted = F.regexp_extract(elem, _HREF_Q, 2)
        bare = F.regexp_extract(elem, _HREF_BARE, 1)
        raw = F.when(
            F.regexp_extract(elem, _HREF_Q, 0) != "", quoted
        ).otherwise(F.when(bare != "", bare))
        cleaned = _xml_unescape(F.regexp_replace(raw, r"[\t\r\n]", ""))
        # bind-once staging (the urls.py tree-duplication trap):
        # resolve_url references its ref many times; the http(s) gate
        # references the resolution twice
        return F.element_at(
            F.transform(
                F.array(cleaned),
                lambda r: F.element_at(
                    F.transform(
                        F.array(resolve_url(u, r)),
                        lambda rr: F.when(
                            F.lower(rr).rlike(r"^https?://"), rr
                        ),
                    ),
                    1,
                ),
            ),
            1,
        )

    return F.element_at(F.transform(F.array(elem_raw), _href_of), 1)


def cc_href_link(html_col: str | Column) -> Column:
    """The first Creative-Commons license/publicdomain URL used as an
    href anywhere on the page (badge links carry no rel attribute),
    or NULL.  Already absolute by construction of the pattern."""
    from covid19i2b2_spark.operators.robots import _xml_unescape

    # bind-once: the non-empty test + the unescape each reference the
    # whole-document extract — staging keeps it at one evaluation
    got = F.regexp_extract(_col(html_col), _CC_HREF, 1)
    return F.element_at(
        F.transform(
            F.array(got), lambda g: F.when(g != "", _xml_unescape(g))
        ),
        1,
    )


def cc_license_id(url_col: str | Column) -> Column:
    """SPDX-style identifier for a Creative-Commons license URL, or
    NULL for anything else: licenses/<code>/<ver> -> CC-<CODE>-<ver>,
    publicdomain/zero/<ver> -> CC0-<ver>, publicdomain/mark/<ver> ->
    CC-PDM-<ver>.  Runs on an extracted URL (tiny input), so direct
    regexp_extract references are fine."""
    u = _col(url_col)
    code = F.regexp_extract(u, _CC_CODE, 1)
    cver = F.regexp_extract(u, _CC_CODE, 2)
    pd = F.regexp_extract(u, _CC_PD, 1)
    pver = F.regexp_extract(u, _CC_PD, 2)
    return (
        F.when(
            code != "",
            F.concat(F.lit("CC-"), F.upper(code), F.lit("-"), cver),
        )
        .when(
            F.lower(pd) == "zero",
            F.concat(F.lit("CC0-"), pver),
        )
        .when(
            F.lower(pd) == "mark",
            F.concat(F.lit("CC-PDM-"), pver),
        )
    )


def extract_licenses(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """pages + (license_url, license_source, license_id): the page's
    license evidence —

    - ``license_url``: the rel="license" target when declared, else
      the first CC href, else NULL;
    - ``license_source``: 'rel' / 'cc-href' / NULL — which channel
      produced the URL (rel is the page's own statement and outranks
      the badge-link heuristic);
    - ``license_id``: the SPDX-style CC identifier when the URL is a
      recognized CC URL (from EITHER channel), else NULL — a
      rel-license target pointing at a proprietary terms page keeps
      its URL with a NULL id.

    Map-only; the staged columns follow the links.py LESSON (every
    multiply-referenced extract lands as a real column first)."""
    taken = [
        c
        for c in ("license_url", "license_source", "license_id")
        if c in pages.columns
    ]
    if taken:
        raise ValueError(
            f"output column(s) {taken} already exist on the input — "
            "rename them first (a silent replace would shadow caller "
            "data)"
        )
    staged = pages.withColumn(
        "__rel_lic", rel_license_link(html_col, url_col)
    ).withColumn("__cc_href", cc_href_link(html_col))
    out = (
        staged.withColumn(
            "license_url",
            F.coalesce(F.col("__rel_lic"), F.col("__cc_href")),
        )
        .withColumn(
            "license_source",
            F.when(F.col("__rel_lic").isNotNull(), F.lit("rel")).when(
                F.col("__cc_href").isNotNull(), F.lit("cc-href")
            ),
        )
        .withColumn("license_id", cc_license_id(F.col("license_url")))
    )
    return out.drop("__rel_lic", "__cc_href")
