"""X77: page-level robots directives — meta robots + X-Robots-Tag
(SURVEY §2.11 extension; round 12).  X66/X67 enforce HOST policy
(robots.txt); site owners also mark individual PAGES with
``<meta name="robots" content="noindex, nofollow">`` and the
equivalent ``X-Robots-Tag`` HTTP response header (Google/Bing REP
documents both; RFC 9309 covers only robots.txt, the page-level forms
are the de-facto standard every major crawler honors).  A corpus
builder that ignores them trains on pages whose owners opted out —
a compliance hole, not just a politeness one.

Directives handled (the universally-supported core):

- ``noindex``  — the page's CONTENT must not enter the corpus;
- ``nofollow`` — the page's LINKS must not be crawled/credited;
- ``none``     — both (the spec's shorthand);
- ``all`` / absence — no restriction (the default).

Semantics follow the documented crawler rules: directives are
case-insensitive, comma-separated, token-matched (``noindexing`` is
NOT noindex); the header and the meta tag UNION (most-restrictive
wins — a restriction from either source holds); only ``<meta
name="robots">`` (or a caller-specified bot name) is read, and the
``name`` attribute match is exact after trim/lowercase.

Spark shape: pure expressions — one regexp pull of the relevant meta
content values + one header parse, token membership via array ops.
Map-only, no UDF, no shuffle; the corpus pays one codegen'd pass.
NULL html/header → no directives (absence is permission, per spec).

mark_page_directives FLAGS (noindex/nofollow booleans); the
enforcement split stays with the caller (X66/X70 contract):
``apply_page_directives(documents, links)`` drops noindex'd documents
and nofollow'd pages' outgoing links — the standard enforcement the
X76 pipeline composes.

Parity: planted directive zoo + a pure-Python same-spec reference in
tests/test_robots_meta.py (the X67 pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# content attribute of every <meta ... name="robots" ...> tag, either
# attribute order, either quote style; (?is) because attribute values
# and tag bodies may span lines
_META_NAMED = (
    r"(?is)<meta\b(?=[^>]*\bname\s*=\s*[\"']?\s*{bot}\s*[\"'\s/>])"
    r"[^>]*\bcontent\s*=\s*([\"'])(.*?)\1"
)
_META_NAMED_BARE = (
    r"(?is)<meta\b(?=[^>]*\bname\s*=\s*[\"']?\s*{bot}\s*[\"'\s/>])"
    r"[^>]*\bcontent\s*=\s*([^\s\"'>]+)"
)


def _tokens(raw: Column) -> Column:
    """lowercased, trimmed directive tokens of one content/header
    value; X-Robots-Tag bot-scoped prefixes ('googlebot: noindex')
    keep only the directive part per value."""
    return F.transform(
        F.split(F.lower(raw), ","),
        lambda t: F.trim(F.regexp_replace(t, r"^[^:,]*:", "")),
    )


def page_directives(
    html_col: str | Column,
    header_col: str | Column | None = None,
    *,
    bot: str = "robots",
) -> Column:
    """``struct<noindex boolean, nofollow boolean>`` from the page's
    meta tags and (optionally) its X-Robots-Tag header value.  Absence
    of both sources → (false, false): permission is the default."""
    h = F.col(html_col) if isinstance(html_col, str) else html_col
    quoted = F.regexp_extract_all(h, F.lit(_META_NAMED.format(bot=bot)), 2)
    bare = F.regexp_extract_all(
        h, F.lit(_META_NAMED_BARE.format(bot=bot)), 1
    )
    meta_vals = F.concat(
        F.coalesce(quoted, F.array()), F.coalesce(bare, F.array())
    )
    toks = F.flatten(F.transform(meta_vals, _tokens))
    if header_col is not None:
        hd = (
            F.col(header_col)
            if isinstance(header_col, str)
            else header_col
        )
        toks = F.concat(
            toks, F.coalesce(_tokens(hd), F.array().cast("array<string>"))
        )
    toks = F.coalesce(toks, F.array().cast("array<string>"))
    has = lambda t: F.array_contains(toks, t)  # noqa: E731
    none = has("none")
    return F.struct(
        (has("noindex") | none).alias("noindex"),
        (has("nofollow") | none).alias("nofollow"),
    )


def mark_page_directives(
    df: DataFrame,
    html_col: str = "html",
    header_col: str | None = None,
    *,
    bot: str = "robots",
) -> DataFrame:
    """df + ``noindex`` + ``nofollow`` booleans (one plan, the
    mark_disallowed contract)."""
    d = page_directives(html_col, header_col, bot=bot)
    return df.withColumn("__d", d).select(
        "*", F.col("__d.noindex").alias("noindex"),
        F.col("__d.nofollow").alias("nofollow"),
    ).drop("__d")


def apply_page_directives(
    pages: DataFrame,
    documents: DataFrame,
    links: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    header_col: str | None = None,
    *,
    bot: str = "robots",
    cache_handles: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The standard enforcement: (documents minus noindex'd pages,
    links minus nofollow'd pages' outgoing edges).  ``pages`` is the
    frame carrying the HTML (the X76 warc_pages output); directive
    pages are a tiny fraction of any corpus, so both drops are
    BROADCAST anti-joins — the big frames never shuffle.

    The restricted-page list is eagerly checkpointed: the directive
    regexes scan every page's HTML, and the two anti-joins would
    otherwise each re-run that corpus pass (lazy frames re-evaluate
    per consumer).  The pinned frame holds only the RESTRICTED urls —
    tiny by the same argument that makes the joins broadcasts.  Pass
    ``cache_handles`` to own the release (the X62/components
    contract); without it the ContextCleaner frees it on GC."""
    from covid19i2b2_spark.caching import CheckpointHandle

    marked = (
        mark_page_directives(pages, html_col, header_col, bot=bot)
        .select(F.col(url_col).alias("__durl"), "noindex", "nofollow")
        .filter(F.col("noindex") | F.col("nofollow"))
        .localCheckpoint(eager=True)
    )
    if cache_handles is not None:
        cache_handles.append(CheckpointHandle(marked))
    no_index = marked.filter("noindex").select("__durl")
    no_follow = marked.filter("nofollow").select("__durl")
    docs = documents.join(
        F.broadcast(no_index),
        documents[url_col] == F.col("__durl"),
        "left_anti",
    )
    edges = links.join(
        F.broadcast(no_follow),
        links["src"] == F.col("__durl"),
        "left_anti",
    )
    return docs, edges
