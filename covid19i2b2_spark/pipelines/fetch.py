"""X76: fetch-to-documents pipeline — archive bytes to training text
in one plan (SURVEY §2.11 extension; round 12).  Composes the round's
crawl-side operators into the ingest path a real corpus build runs:

    WARC records (X75) -> response/200/html column filters
    -> charset decode -> main content (X74) -> link edges (X69)

so a directory of .warc[.gz] files becomes (url, canonical_url,
fetched_at, text) documents plus the (src, href, anchor) edge frame
that feeds X55 dedup -> X56 PageRank -> X61 scheduling.  Everything
between the two Python stages (the X75 byte-cursor parse; optionally
the charset decode) is JVM expressions, and the pipeline returns LAZY
frames — callers decide what runs.

Charset: the default path CASTS payload bytes to string — Spark's
binary->string cast wraps bytes as UTF-8 without validating, so
non-UTF-8 sequences degrade to replacement noise in place of text but
never throw (F.decode raises MALFORMED_CHARACTER_CODING on one bad
byte, which would let a single mojibake page kill a 100 TB scan).
``charset_aware=True`` adds ONE Arrow pandas_udf that sniffs BOM ->
HTTP Content-Type charset= -> <meta charset>/http-equiv (in that
order: a BOM is authoritative, headers lie less than meta tags) and
decodes with Python codecs, errors='replace' — opt-in because it puts
Python in the hot path for the minority of non-UTF-8 pages (the same
opt-in contract as X55's IDN fold).

The documents/links split shares the decoded-page frame; callers that
consume both should persist the pages frame across the two reads (the
handle is returned so the release stays with the consumer — the X62
cache-handle contract).

Page-level robots compliance (X77) composes on top: run warc_pages,
then ``apply_page_directives(pages, documents, links)`` from
operators/robots_meta to drop noindex'd documents and nofollow'd
pages' edges before anything downstream consumes them.
"""

from __future__ import annotations

import codecs
import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_BOMS = [
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]
_CT_CHARSET = re.compile(r"(?i)charset\s*=\s*\"?([\w.:-]+)")
_META_CHARSET = re.compile(
    rb"(?is)<meta[^>]+charset\s*=\s*[\"']?([\w.:-]+)"
)


def _sniff_and_decode(payload: bytes | None, http_ct: str | None) -> str | None:
    if payload is None:
        return None
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            return payload.decode(enc, errors="replace")
    enc = None
    if http_ct:
        m = _CT_CHARSET.search(http_ct)
        if m:
            enc = m.group(1)
    if enc is None:
        m = _META_CHARSET.search(payload[:4096])
        if m:
            enc = m.group(1).decode("ascii", "replace")
    if enc is not None:
        try:
            return payload.decode(enc, errors="replace")
        except LookupError:
            pass  # unknown label -> the utf-8 fallback below, loud-ish
    return payload.decode("utf-8", errors="replace")


@pandas_udf(T.StringType())
def _decode_html_udf(payload: pd.Series, http_ct: pd.Series) -> pd.Series:
    return pd.Series(
        [
            _sniff_and_decode(
                bytes(p) if p is not None else None, c
            )
            for p, c in zip(payload, http_ct)
        ]
    )


def _html_col(charset_aware: bool) -> Column:
    if charset_aware:
        return _decode_html_udf(F.col("payload"), F.col("http_content_type"))
    return F.col("payload").cast("string")


def warc_pages(
    spark: SparkSession,
    path: str,
    *,
    payload_limit_bytes: int = 1 << 20,
    charset_aware: bool = False,
) -> DataFrame:
    """Successful HTML fetches under ``path``: (url, canonical_url,
    fetched_at, html).  Column predicates only — status and content
    type were peeled into columns by X75, so Catalyst prunes the
    non-page records before anything touches payload bytes."""
    from covid19i2b2_spark.operators.urls import canonicalize_url
    from covid19i2b2_spark.sources.warc import read_warc

    recs = read_warc(
        spark, path, payload_limit_bytes=payload_limit_bytes
    )
    return (
        recs.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("http_content_type").rlike(r"(?i)^text/html\b")
            & F.col("target_uri").isNotNull()
        )
        .select(
            F.col("target_uri").alias("url"),
            canonicalize_url("target_uri").alias("canonical_url"),
            F.col("warc_date").alias("fetched_at"),
            _html_col(charset_aware).alias("html"),
        )
    )


def warc_to_documents(
    spark: SparkSession,
    path: str,
    *,
    payload_limit_bytes: int = 1 << 20,
    charset_aware: bool = False,
    links_impl: str = "kernel",
    cache_handles: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(documents, links) from a WARC directory:

    - documents: (url, canonical_url, fetched_at, text) with
      boilerplate removed (X74) — all-boilerplate pages keep their
      row with text='' (dropping is corpus policy, not ingest's);
    - links: (src, href, anchor_text) absolute http(s) edges (X69).

    Both frames are lazy views over the same parsed pages.  A caller
    consuming BOTH outputs should pass ``cache_handles`` (the X62 /
    curate() release protocol): the shared pages frame is then
    persisted — the byte-cursor parse runs once, not once per sink —
    and its handle appended for the caller to ``.unpersist()`` after
    both sinks have run.  Without it the frames stay fully lazy
    (single-output callers pay nothing).

    ``links_impl`` (round 15, VERDICT r14 next #3): 'kernel' (default)
    runs the per-anchor chain — href × 3 quote styles, RFC 3986
    resolve, anchor cleanup, entity decode — in one Arrow pass
    (operators/links_kernel.py; row-identical to the expression path,
    pinned in tests); 'expr' keeps the pure-JVM expression plan."""
    from covid19i2b2_spark.operators.boilerplate import extract_main_content

    if links_impl == "kernel":
        from covid19i2b2_spark.operators.links_kernel import (
            extract_links_kernel as extract_links,
        )
    elif links_impl == "expr":
        from covid19i2b2_spark.operators.links import extract_links
    else:
        raise ValueError(
            f"links_impl must be 'kernel' or 'expr' (got {links_impl!r})"
        )

    pages = warc_pages(
        spark,
        path,
        payload_limit_bytes=payload_limit_bytes,
        charset_aware=charset_aware,
    )
    if cache_handles is not None:
        pages = pages.persist()
        cache_handles.append(pages)
    documents = pages.select(
        "url",
        "canonical_url",
        "fetched_at",
        extract_main_content("html").alias("text"),
    )
    links = extract_links(pages, url_col="url", html_col="html")
    return documents, links
