"""X70: spider-trap / URL-anomaly detection (SURVEY §2.11 extension;
round 12).  Crawl frontiers fill with URLs no fetch budget should ever
reach: calendar pages that paginate forever, session-id links that mint
a fresh URL per visit, and mis-rooted relative links that stack the
same path segments without bound.  Robots exclusion (X66) only blocks
what a site OWNER declared; traps are a property of the URL's shape and
must be detected engine-side before they consume politeness slots.

Signals (every one a pure expression over the URL string — the corpus
pays a map-only pass, no shuffle, no UDF):

- ``depth``        — more path segments than any hand-built site uses
                     (mis-rooted relative links, infinite directories);
- ``repeat_segment`` — one path segment repeated >= k times
                     (``/a/b/a/b/a`` loop traps: the single strongest
                     published trap heuristic — Heydon & Najork,
                     "Mercator: a scalable, extensible web crawler",
                     WWW 1999 report the same shape);
- ``numeric_run``  — many all-numeric path segments (calendar/archive
                     traps: ``/2026/08/16/2026/08/17/...``);
- ``long_segment`` — a single path segment longer than any human-made
                     slug (encoded state rammed into the path);
- ``long_url``     — total URL length past the de-facto 2k limit;
- ``params``       — more query parameters than forms produce
                     (faceted-search explosion);
- ``repeat_param_key`` — one query key repeated >= k times (growing
                     ``?p=1&p=2&p=3...`` accumulator traps);
- ``session_param`` — a known session-id query key (PHPSESSID,
                     jsessionid, ...): each visitor mints a distinct
                     URL for the SAME resource, so the URL space is
                     unbounded by construction.

The repeat checks are O(d^2) in the number of inspected segments, so
they inspect only the first ``repeat_scan`` (default 64) segments/params
— a URL deep enough to overflow that window has already tripped
``depth``/``params``, and the bound keeps per-row cost constant at any
input length (a trap URL is precisely the adversarial long input).

Output contract: ``trap_reasons`` is the ARRAY of fired reason codes
(sorted, deterministic) — observability first, so a frontier report can
group by reason; ``is_trap`` is its non-emptiness.  NULL / non-http(s)
URLs get NULL reasons and is_trap=False — invalid rows keep their own
loud path (the X33 rule), they are not "traps".

Thresholds are heuristics with false-positive risk by nature (a git
``/commit/<40-hex>`` URL is legitimate); defaults are set wide, every
one is a parameter, and the operator only FLAGS — dropping is the
caller's policy (``filter_traps`` or frontier ``exclude_col``), same
split as mark_disallowed/filter_disallowed.

DuckDB parity (list_transform/list_filter replay) lives in
tests/test_oracle_parity.py (q_trap_detection — UNREGISTERED; the
50-query window is full).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# query keys that mint a URL per visitor — lowercase exact matches
_SESSION_KEYS_RE = (
    r"^(phpsessid|jsessionid|sessionid|session_id|sess_id|sid|s_id|"
    r"cfid|cftoken|oscsid|zenid|aspsessionid[a-z0-9]*)$"
)


def _rest_of(u: Column) -> Column:
    # everything after the authority, fragment dropped — the
    # mark_disallowed extraction (urls.py), shared shape
    return F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^#]*)", 1)


def trap_signals(
    col: str | Column,
    *,
    max_depth: int = 16,
    max_repeat: int = 3,
    max_numeric_segments: int = 6,
    max_segment_len: int = 128,
    max_len: int = 2048,
    max_params: int = 12,
    repeat_scan: int = 64,
) -> Column:
    """``array<string>`` of fired trap reason codes for an http(s) URL
    (empty = clean, NULL = not an http(s) URL).  Sorted, so equal URLs
    produce byte-equal arrays regardless of evaluation order."""
    u = F.col(col) if isinstance(col, str) else col
    rest = _rest_of(u)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    keys = F.transform(params, lambda p: F.regexp_extract(p, "^([^=]*)", 1))

    # max multiplicity over the FIRST repeat_scan entries (bounded
    # per-row cost; see module docstring) — array_max over an empty
    # slice is NULL, coalesced to a non-firing 0
    def _max_mult(arr: Column) -> Column:
        head = F.slice(arr, 1, repeat_scan)
        return F.coalesce(
            F.array_max(
                F.transform(
                    head, lambda s: F.size(F.filter(head, lambda x: x == s))
                )
            ),
            F.lit(0),
        )

    n_numeric = F.size(F.filter(segs, lambda s: s.rlike(r"^[0-9]+$")))
    longest_seg = F.coalesce(
        F.array_max(F.transform(segs, lambda s: F.length(s))), F.lit(0)
    )

    fired = F.array_compact(
        F.array(
            F.when(F.size(segs) > max_depth, F.lit("depth")),
            F.when(F.length(u) > max_len, F.lit("long_url")),
            F.when(longest_seg > max_segment_len, F.lit("long_segment")),
            F.when(F.size(params) > max_params, F.lit("params")),
            F.when(n_numeric >= max_numeric_segments, F.lit("numeric_run")),
            F.when(_max_mult(segs) >= max_repeat, F.lit("repeat_segment")),
            F.when(
                _max_mult(keys) >= max_repeat, F.lit("repeat_param_key")
            ),
            F.when(
                F.exists(
                    keys, lambda k: F.lower(k).rlike(_SESSION_KEYS_RE)
                ),
                F.lit("session_param"),
            ),
        )
    )
    is_http = F.lower(u).rlike(r"^https?://")
    return F.when(u.isNotNull() & is_http, F.array_sort(fired)).otherwise(
        F.lit(None).cast("array<string>")
    )


def mark_traps(
    df: DataFrame,
    url_col: str = "canonical_url",
    out_col: str = "trap_reasons",
    flag_col: str = "is_trap",
    **thresholds,
) -> DataFrame:
    """df + ``out_col`` (reason array) + ``flag_col`` (boolean) — the
    flag form the crawl pipeline consumes in one plan (the
    mark_disallowed contract: no trapped/clean union, so the corpus
    chain evaluates once).  NULL / non-URL rows flag False."""
    reasons = trap_signals(url_col, **thresholds)
    return df.withColumn(out_col, reasons).withColumn(
        flag_col, F.coalesce(F.size(out_col) > 0, F.lit(False))
    )


def filter_traps(
    df: DataFrame,
    url_col: str = "canonical_url",
    **thresholds,
) -> tuple[DataFrame, DataFrame]:
    """(clean, trapped) split — trapped rows carry ``trap_reasons`` so
    the caller can audit WHY each URL was priced out (the X33
    quarantine rule: nothing is silently dropped).  NULL / non-URL
    rows land in ``clean`` — invalid inputs have their own loud path
    downstream and must not masquerade as trap detections."""
    marked = mark_traps(df, url_col, **thresholds)
    clean = marked.filter(~F.col("is_trap")).drop("trap_reasons", "is_trap")
    trapped = marked.filter(F.col("is_trap")).drop("is_trap")
    return clean, trapped
