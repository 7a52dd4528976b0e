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
