"""X85: per-host crawl health report (SURVEY §2.11 extension;
round 12).  The crawl chain now emits a dozen per-row signals
(status classes, redirects, traps, exclusions, truncation); operating
a crawl means reading them PER HOST — a host going 80% 5xx needs its
politeness backed off, a host going 60% trap-flagged needs its
priority cut, a host whose payloads all truncate needs a limit bump.
This operator is the one-aggregate rollup that turns the X75/X76
record frame into that report.

Columns (all from one map-side-combined groupBy(host) — conditional
aggregation, the A8 pattern, never one pass per metric):

- ``n_fetches``, ``n_ok`` (2xx), ``n_redirect`` (3xx), ``n_client_err``
  (4xx), ``n_server_err`` (5xx), plus the derived ``ok_rate`` /
  ``server_err_rate`` the backoff policy reads;
- ``n_html`` (content-type text/html among 2xx) — the corpus-yield
  numerator;
- ``n_truncated``, ``total_payload_bytes``, ``avg_payload_bytes``;
- optional ``n_trapped`` when the caller marked rows with X70 flags.

Rows with a NULL host (unparseable target URIs) aggregate into one
NULL-host row — loud, never dropped (the X33 rule); they are exactly
the rows an operator most needs to see counted.

At 100 TB: one shuffle keyed on the host (~10^7 keys), every metric a
partial-aggregable sum/count — the report costs one pass over the
fetch log regardless of how many columns it carries.

DuckDB parity (full conditional-aggregation replay) lives in
tests/test_oracle_parity.py (q_crawl_report — UNREGISTERED; the
50-query window is full).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def crawl_health_report(
    records: DataFrame,
    *,
    uri_col: str = "target_uri",
    status_col: str = "http_status",
    content_type_col: str = "http_content_type",
    payload_length_col: str = "payload_length",
    truncated_col: str = "is_truncated",
    trap_col: str | None = None,
) -> DataFrame:
    """One row per host (module docstring).  ``trap_col`` names an
    X70 boolean column when the caller pre-marked rows; absent, the
    report carries no trap column rather than a fake zero."""
    from covid19i2b2_spark.operators.urls import extract_host

    s = F.col(status_col)

    def _n(cond) -> F.Column:
        return F.coalesce(F.sum(F.when(cond, 1)), F.lit(0))

    aggs = [
        F.count(F.lit(1)).alias("n_fetches"),
        _n(s.between(200, 299)).alias("n_ok"),
        _n(s.between(300, 399)).alias("n_redirect"),
        _n(s.between(400, 499)).alias("n_client_err"),
        _n(s.between(500, 599)).alias("n_server_err"),
        _n(
            s.between(200, 299)
            & F.col(content_type_col).rlike(r"(?i)^text/html\b")
        ).alias("n_html"),
        _n(F.col(truncated_col)).alias("n_truncated"),
        F.coalesce(F.sum(payload_length_col), F.lit(0)).alias(
            "total_payload_bytes"
        ),
    ]
    if trap_col is not None:
        aggs.append(_n(F.col(trap_col)).alias("n_trapped"))
    out = (
        records.withColumn("host", extract_host(F.col(uri_col)))
        .groupBy("host")
        .agg(*aggs)
    )
    n = F.col("n_fetches").cast("double")
    return (
        out.withColumn("ok_rate", F.col("n_ok") / n)
        .withColumn("server_err_rate", F.col("n_server_err") / n)
        .withColumn(
            "avg_payload_bytes",
            F.when(
                F.col("n_fetches") > 0,
                F.col("total_payload_bytes") / n,
            ),
        )
    )


def politeness_backoff_caps(
    report: DataFrame,
    base_cap: int,
    *,
    err_rate_col: str = "server_err_rate",
    backoff_start: float = 0.1,
    full_backoff: float = 0.5,
    min_cap: int = 1,
    min_fetches: int = 20,
) -> DataFrame:
    """X87: the measure→backoff composition — per-host fetch caps for
    frontier_schedule's ``per_host_cap_col``, derived from the health
    report's server-error rate.  A host going 5xx is telling the
    crawler to slow down; RFC 9110 (503 + Retry-After) and every
    production crawler's adaptive politeness encode the same rule.

    Cap policy (pure expressions on the per-host report rows):

    - err_rate <= ``backoff_start``: no change (base_cap);
    - linear ramp between ``backoff_start`` and ``full_backoff``:
      cap = base_cap scaled down proportionally;
    - err_rate >= ``full_backoff``: ``min_cap`` (never 0 —
      frontier_schedule refuses zero caps loudly: a host that must
      not be fetched is an EXCLUSION decision, not a quota of zero);
    - hosts with fewer than ``min_fetches`` observations keep
      base_cap (a 2-fetch host's 50% error rate is one bad response,
      not evidence — the X79 small-sample guard);
    - the NULL-host report row produces no cap row (nothing to
      schedule against).

    Output: (host, cap) — left-join onto the frontier by host and
    pass the column name as ``per_host_cap_col`` (NULLs fall back to
    the default cap, so partial coverage is safe by construction)."""
    if base_cap < 1 or min_cap < 1:
        raise ValueError(
            f"caps must be >= 1, got base={base_cap} min={min_cap}"
        )
    if not 0.0 <= backoff_start < full_backoff <= 1.0:
        raise ValueError(
            "need 0 <= backoff_start < full_backoff <= 1, got "
            f"{backoff_start} / {full_backoff}"
        )
    e = F.col(err_rate_col)
    span = full_backoff - backoff_start
    frac = (F.lit(float(full_backoff)) - e) / F.lit(float(span))
    ramped = F.floor(
        F.lit(float(min_cap))
        + frac * F.lit(float(base_cap - min_cap))
    ).cast("long")
    cap = (
        F.when(
            F.col("n_fetches") < min_fetches, F.lit(base_cap).cast("long")
        )
        .when(e <= backoff_start, F.lit(base_cap).cast("long"))
        .when(e >= full_backoff, F.lit(min_cap).cast("long"))
        .otherwise(
            F.greatest(ramped, F.lit(min_cap).cast("long"))
        )
    )
    return report.filter(F.col("host").isNotNull()).select(
        "host", cap.alias("cap")
    )
