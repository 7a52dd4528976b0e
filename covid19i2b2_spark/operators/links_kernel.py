"""X69 kernel path: the per-anchor link chain in ONE Arrow pass
(round 15 — VERDICT r14 next #3, the follow-up named in the round-14
WARC profile, TODO.md "batch the per-anchor regex chain into one Arrow
kernel like minhash's").

The round-14 profile of ``extract_links`` found the cost NOT in the
whole-document scans (~0.5 s of 2.9 s at the x1 corpus) but in the
PER-ELEMENT expression work: href extraction × 3 quote styles, RFC
3986 ``resolve_url``'s ~10-branch expression tree, anchor text
cleanup, entity decode — ~48k anchors each walking large codegen'd
``CASE`` trees over many ``regexp_*`` calls.  That work is
embarrassingly data-parallel and branchy — exactly the shape where a
compiled-``re`` Python loop over an Arrow batch beats an expression
tree (the minhash_kernel.py precedent).

EXACT MIRROR CONTRACT: ``extract_links_kernel`` must produce the SAME
ROWS as operators/links.py ``extract_links`` — same tempered anchor
blocks, same quote-style precedence (double anywhere, else single
anywhere, else bare non-empty), same five-entity decode order, same
RFC 3986 §5 branch order INCLUDING the two documented urljoin
divergences, same Java-``\\s`` whitespace class in the anchor
collapse, same http(s) prefix gate.  Equality is pinned on the link
zoo, the r12-pass-3 regression corpus, and a hypothesis property over
random (base, ref) pairs (tests/test_links_kernel.py); the JVM
expression path remains the default for query-surface callers, the
kernel is the WARC-ingest hot path (pipelines/fetch.py).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# --- mirrors of links.py's patterns (Java regex -> re) -------------
_ATTRS = r"(?:[^>\"']|\"[^\"]*\"|'[^']*')*"
_BASE_RE = re.compile(r"(?is)(<base\s" + _ATTRS + r">)")
_BLOCK_RE = re.compile(
    r"(?is)<a\s" + _ATTRS + r">(?:(?!<a[\s>]).)*?</a>"
)
_OPEN_RE = re.compile(r"(?is)^(<a\s" + _ATTRS + r">)")
_HREF_PRE = r"[\s\"']href\s*=\s*"
_DQ = re.compile("(?is)" + _HREF_PRE + "\"([^\"]*)\"")
_SQ = re.compile("(?is)" + _HREF_PRE + "'([^']*)'")
_BARE = re.compile("(?is)" + _HREF_PRE + r"([^\s\"'>][^\s>]*)")
_URLWS = re.compile(r"[\t\r\n]")
_TAG = re.compile(r"(?s)<[^>]*>")
_CLOSE_A = re.compile(r"(?is)</a>$")
# Java \s is ASCII-only: [ \t\n\x0B\f\r] — python's \s is unicode-wide
_JAVA_WS = re.compile(r"[ \t\n\x0B\f\r]+")

_FRAG = re.compile(r"(?s)#.*")
_SCHEME_COLON = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_NETLOC = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
_SCHEME_CAP = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")
_AUTH_CAP = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)")
_PATH_CAP = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)")
_RP_CAP = re.compile(r"(?s)^([^?]*)")
_RQ_CAP = re.compile(r"(?s)(\?.*)$")
_NA_CAP = re.compile(r"^(?:[A-Za-z][A-Za-z0-9+.\-]*:)?//([^/?#]*)")
_NP_CAP = re.compile(
    r"(?s)^(?:[A-Za-z][A-Za-z0-9+.\-]*:)?//[^/?#]*([^?#]*)"
)
_DIR_CAP = re.compile(r"^(.*/)")
_ENDS_DIR = re.compile(r"(^|/)\.\.?$")


def _ext(rx: re.Pattern, s: str) -> str:
    """regexp_extract semantics: first match's group 1, else ''."""
    m = rx.search(s)
    return m.group(1) if m else ""


def _unescape(s: str) -> str:
    """robots.py _xml_unescape mirror: the five predefined entities,
    &amp; LAST so &amp;lt; round-trips to the literal &lt;."""
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        s = s.replace(ent, ch)
    return s


def _href_from(tag: str) -> str | None:
    """links.py _href_from mirror: double-quoted anywhere, else
    single-quoted anywhere, else bare non-empty; entity decode after
    the HTML URL-attribute tab/CR/LF strip."""
    m = _DQ.search(tag)
    if m is None:
        m = _SQ.search(tag)
    if m is not None:
        raw = m.group(1)
    else:
        mb = _BARE.search(tag)
        if mb is None or mb.group(1) == "":
            return None
        raw = mb.group(1)
    return _unescape(_URLWS.sub("", raw))


def _remove_dot_segments(p: str) -> str:
    """links.py _remove_dot_segments mirror (RFC 3986 §5.2.4 over an
    absolute path): '..' pops above root only, '.' skips, empty
    segments preserved, trailing '/.' '/..' keep the slash."""
    acc: list[str] = []
    for s in p.split("/"):
        if s == ".":
            continue
        if s == "..":
            if len(acc) > 1:
                acc.pop()
            continue
        acc.append(s)
    joined = "/".join(acc)
    if _ENDS_DIR.search(p) and not joined.endswith("/"):
        joined += "/"
    return joined if joined else "/"


def resolve_url_py(base: str | None, ref: str | None) -> str | None:
    """links.py resolve_url mirror — RFC 3986 §5, same branch order,
    same documented urljoin divergences.  F.trim strips SPACES only,
    so the mirror does too."""
    if base is None or ref is None:
        return None
    r0 = ref.strip(" ")
    r = _FRAG.sub("", r0)
    if r == "":
        return _FRAG.sub("", base)
    if _NETLOC.search(r):
        na = _ext(_NA_CAP, r)
        np_ = _ext(_NP_CAP, r)
        npc = "" if np_ == "" else _remove_dot_segments(np_)
        return _ext(_SCHEME_CAP, r) + "://" + na + npc + _ext(_RQ_CAP, r)
    if _SCHEME_COLON.search(r):
        return r  # opaque (mailto:)
    b_scheme = _ext(_SCHEME_CAP, base).lower()
    rq = _ext(_RQ_CAP, r)
    if r.startswith("//"):
        na = _ext(_NA_CAP, r)
        np_ = _ext(_NP_CAP, r)
        npc = "" if np_ == "" else _remove_dot_segments(np_)
        return b_scheme + "://" + na + npc + rq
    b_auth = _ext(_AUTH_CAP, base)
    b_path = _ext(_PATH_CAP, base)
    prefix = b_scheme + "://" + b_auth
    rp = _ext(_RP_CAP, r)
    if rp.startswith("/"):
        return prefix + _remove_dot_segments(rp) + rq
    if rp == "":
        return prefix + b_path + rq  # query-only ref
    b_dir = _ext(_DIR_CAP, b_path)
    if b_dir == "":
        b_dir = "/"
    return prefix + _remove_dot_segments(b_dir + rp) + rq


def _clean_anchor(block: str, open_tag: str) -> str:
    """links.py anchor expression mirror: inner text = block minus
    open tag and trailing </a>, tags -> space, entity decode,
    Java-\\s collapse, space trim."""
    inner = block[len(open_tag):]
    inner = _CLOSE_A.sub("", inner)
    a = _TAG.sub(" ", inner)
    a = _unescape(a)
    return _JAVA_WS.sub(" ", a).strip(" ")


def _page_links(src: str | None, html: str | None):
    if src is None or html is None:
        return
    base = src
    bm = _BASE_RE.search(html)
    if bm is not None:
        braw = _href_from(bm.group(1))
        if braw is not None and braw != "":
            base = resolve_url_py(src, braw)
    for m in _BLOCK_RE.finditer(html):
        block = m.group(0)
        om = _OPEN_RE.match(block)
        open_tag = om.group(1) if om else ""
        raw = _href_from(open_tag)
        if raw is None:
            continue
        href = resolve_url_py(base, raw)
        if href is None:
            continue
        low7 = href[:7].lower()
        low8 = href[:8].lower()
        if low7 != "http://" and low8 != "https://":
            continue
        yield src, href, _clean_anchor(block, open_tag)


def extract_links_kernel(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src, href, anchor_text) — row-identical to links.py
    ``extract_links`` (module docstring contract), computed in one
    Arrow ``mapInPandas`` pass: no explode, no per-anchor expression
    trees, the whole per-page chain in compiled ``re``."""

    def _batches(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in it:
            srcs: list[str] = []
            hrefs: list[str] = []
            anchors: list[str] = []
            for src, html in zip(pdf[url_col], pdf[html_col]):
                for s, h, a in _page_links(src, html):
                    srcs.append(s)
                    hrefs.append(h)
                    anchors.append(a)
            yield pd.DataFrame(
                {"src": srcs, "href": hrefs, "anchor_text": anchors}
            )

    return pages.select(url_col, html_col).mapInPandas(
        _batches, "src string, href string, anchor_text string"
    )
