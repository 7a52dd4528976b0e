"""X72: URL-template mining — budget-sink detection by template
cardinality (SURVEY §2.11 extension; round 12).  X70 flags a URL whose
own SHAPE is pathological; most crawl-budget sinks look individually
innocent — ``/product/812345``, ``/2026/08/16/post`` — and only the
AGGREGATE gives them away: one template minting millions of URLs on one
host (faceted search, calendars, per-session paths).  The standard
move (Koppula et al., "Learning URL patterns for webpage
de-duplication", WSDM 2010 mine the same generalization) is to
generalize each URL to a template and rank templates by how much of
their host's URL space they mint.

Template generalization (pure expressions — one map pass):

- scheme + host kept verbatim (the host IS the budget key);
- in the path, long hex runs (>= 16 hex chars: ids, hashes, UUID
  halves) fold to ``{H}`` FIRST, then digit runs to ``{N}`` —
  order matters, a 32-hex id contains digit runs that would otherwise
  shred it into a mixed template;
- the query collapses to its sorted parameter KEY SET (values dropped,
  keys sorted so ``?a=1&b=2`` and ``?b=9&a=0`` are one template —
  parameter ORDER is presentation, the key set is the form).

Aggregation shape at 100 TB: ONE groupBy on the template (map-side
combined — the whole corpus collapses to |templates| rows, ~10^6 where
URLs are ~10^11), then the per-host share is a window over the
ALREADY-AGGREGATED rows (second shuffle touches |templates|, not
|urls|).  Nothing is collected; skew is the biggest template's row
count, which the first aggregate already reduced to 1.

The operator FLAGS (mark_exploded_templates) and the split
(filter_exploded) drops — same mark/filter policy split as X66/X70.
NULL / non-http(s) URLs get a NULL template (loud, the X33 rule).

DuckDB parity (full template re-derivation with regexp/list functions)
lives in tests/test_oracle_parity.py (q_url_templates — UNREGISTERED;
the 50-query window is full).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def url_template(col: str | Column) -> Column:
    """The generalized template of an http(s) URL (NULL when not
    http(s)): scheme://host/path-with-{H}/{N}-folds?sorted-key-set."""
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^#]*)", 1)
    host = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    path = F.regexp_extract(rest, r"^[^/?#]*([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    # hex BEFORE digits: a 32-hex id contains digit runs that would
    # otherwise shred it into a mixed literal/{N} template
    gen_path = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-fA-F]{16,}", "{H}"),
        r"[0-9]+",
        "{N}",
    )
    keys = F.array_sort(
        F.array_distinct(
            F.transform(
                F.filter(F.split(query, "&"), lambda p: p != ""),
                lambda p: F.regexp_extract(p, "^([^=]*)", 1),
            )
        )
    )
    key_set = F.when(
        F.size(keys) > 0, F.concat(F.lit("?"), F.array_join(keys, "&"))
    ).otherwise(F.lit(""))
    tpl = F.concat(scheme, F.lit("://"), host, gen_path, key_set)
    return F.when(
        u.isNotNull() & F.lower(u).rlike(r"^https?://"), tpl
    ).otherwise(F.lit(None).cast("string"))


def mine_url_templates(
    df: DataFrame,
    url_col: str = "canonical_url",
) -> DataFrame:
    """One row per template: ``host``, ``template``, ``n_urls``,
    ``sample_url`` (the min — deterministic), ``host_urls`` (total
    URLs on the host) and ``host_share`` = n_urls / host_urls.

    Corpus pays one template-keyed aggregate; the share window runs
    over |templates| rows only.  NULL-template rows (non-URLs) keep
    their own group and a NULL host/share — loud, never dropped.
    """
    u = F.col(url_col)
    tpl = (
        df.select(
            url_template(url_col).alias("template"),
            u.alias("__url"),
        )
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min("__url").alias("sample_url"),
        )
        .withColumn(
            "host",
            F.lower(F.regexp_extract("template", r"^[^:]+://([^/?#]*)", 1)),
        )
    )
    w = Window.partitionBy("host")
    return tpl.select(
        F.when(F.col("template").isNotNull(), F.col("host")).alias("host"),
        "template",
        "n_urls",
        "sample_url",
        F.when(
            F.col("template").isNotNull(),
            F.sum("n_urls").over(w),
        ).alias("host_urls"),
        F.when(
            F.col("template").isNotNull(),
            F.col("n_urls") / F.sum("n_urls").over(w),
        ).alias("host_share"),
    )


def mark_exploded_templates(
    df: DataFrame,
    url_col: str = "canonical_url",
    *,
    max_urls: int = 10_000,
    max_host_share: float = 0.5,
    min_host_urls: int = 100,
    out_col: str = "is_exploded",
) -> DataFrame:
    """df + ``template`` + ``out_col``: True when the URL's template
    minted more than ``max_urls`` URLs, OR more than ``max_host_share``
    of its host's URL space while the host has at least
    ``min_host_urls`` URLs (the share test alone would flag every
    template on a 3-URL host).  One aggregate + one broadcast-sized
    join back on the template key (|templates| rows); NULL templates
    flag False — non-URLs are not explosions."""
    if not 0.0 < max_host_share <= 1.0:
        raise ValueError(
            f"max_host_share must be in (0, 1], got {max_host_share}"
        )
    stats = mine_url_templates(df, url_col)
    flagged = stats.filter(
        (F.col("n_urls") > max_urls)
        | (
            (F.col("host_share") > max_host_share)
            & (F.col("host_urls") >= min_host_urls)
        )
    ).select("template", F.lit(True).alias("__exploded"))
    return (
        df.withColumn("template", url_template(url_col))
        .join(F.broadcast(flagged), "template", "left")
        .withColumn(out_col, F.coalesce("__exploded", F.lit(False)))
        .drop("__exploded")
    )


def filter_exploded(
    df: DataFrame,
    url_col: str = "canonical_url",
    **thresholds,
) -> tuple[DataFrame, DataFrame]:
    """(clean, exploded) split — exploded rows keep their ``template``
    so the caller can audit WHICH pattern priced them out (the X33
    quarantine rule)."""
    marked = mark_exploded_templates(df, url_col, **thresholds)
    clean = marked.filter(~F.col("is_exploded")).drop(
        "template", "is_exploded"
    )
    exploded = marked.filter(F.col("is_exploded")).drop("is_exploded")
    return clean, exploded
