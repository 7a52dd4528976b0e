"""X71: re-crawl scheduling from per-URL change-rate estimation
(SURVEY §2.11 extension; round 12).  The crawl chain (X69 extract →
X55 canonicalize → X56 rank → X61 schedule → X61'' frontier) decides
what to fetch FIRST; a production crawler spends most of its budget on
what to fetch AGAIN.  This operator closes that loop: given the fetch
history the crawler already records — one row per (url, fetch_time,
content_fingerprint) — estimate each URL's Poisson change rate and
derive the next fetch time, so re-crawl priority is driven by measured
change behavior instead of a fixed staleness TTL.

Estimator: Cho & Garcia-Molina, "Estimating Frequency of Change", ACM
TOIT 3(3), 2003.  A page changing as a Poisson process with rate λ and
observed at n (roughly regular) intervals of mean length I shows a
change in X of them; the naive X/(n·I) underestimates badly (multiple
changes inside one interval collapse to one observation).  The paper's
bias-reduced estimator is

    λ̂ = -ln( (n - X + 0.5) / (n + 0.5) ) / I

which is consistent, finite even at X = n (the +0.5 smoothing), and
exactly 0 at X = 0.  Irregular fetch gaps use I = span/n (the paper's
regular-interval assumption, documented approximation — fetch schedules
produced by X61 are near-regular per host, which is where this runs).

Revisit policy: fetch again when the probability the page has changed
since the last fetch reaches ``change_prob`` p — for Poisson that is

    Δ = -ln(1 - p) / λ̂

clamped to [min_interval_sec, max_interval_sec] (λ̂ = 0 → the max:
a page never seen to change still gets a bounded staleness guarantee).

Shape at 100 TB: ONE shuffle on the url key — the lag window
(partitionBy url, orderBy fetch_time) and the per-url aggregate share
HashPartitioning(url), so Catalyst plans a single Exchange for both
(pinned in tests/test_plan_shape.py).  Everything after the aggregate
is map-only scalar arithmetic on one row per url.  Skew is bounded by
the most-fetched URL's history length, which the crawler's own
politeness (X61) already bounds.

Loud-NULL contract (house rule): URLs with fewer than
``min_intervals`` observed intervals get NULL ``lambda_hat`` /
``revisit_sec`` / ``next_fetch_due`` — a cold-start URL has no
measured rate and this operator does not invent one; the caller
coalesces its own cold-start policy (typically min_interval_sec, the
X33 explicit-policy split).  NULL urls group into one NULL-key row as
everywhere else in the engine.  A NULL fingerprint is compared
null-safely: NULL → value (or value → NULL) counts as a change,
NULL → NULL does not — a fetch that failed to hash is evidence the
content was not verifiably the same, never silently dropped (dropping
would also shift every later interval).

DuckDB parity (full estimator re-derivation: LAG window + LN replay):
q_recrawl_schedule is REGISTERED under the driver's 50-query gate
since round 12 (slot ceded by q_simhash_pairs, which moved to the
UNREGISTERED parity suite — queries/llm2.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def _epoch_sec(c: Column) -> Column:
    # TIMESTAMP_NTZ (what parquet scans produce) cannot cast straight
    # to double; via TIMESTAMP it can, and the session TZ is pinned
    # UTC engine-wide (session.py) so the value is the plain epoch.
    return c.cast("timestamp").cast("double")


def change_history(
    df: DataFrame,
    url_col: str = "url",
    time_col: str = "fetch_time",
    fingerprint_col: str = "content_fp",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-url fetch-history summary: one row per url with
    ``n_fetches``, ``n_intervals`` (= n_fetches − 1), ``n_changes``
    (consecutive fetches whose fingerprints differ, null-safe),
    ``first_fetch``/``last_fetch`` and ``span_sec``.

    The lag window and the aggregate share one url-keyed Exchange.
    Equal fetch_time ties order by ``tiebreak`` when given (callers
    with sub-second fetch storms should pass their fetch id) —
    otherwise by the fingerprint, so the change count is deterministic
    for any input.
    """
    order = [F.col(time_col)] + (
        [F.col(tiebreak)] if tiebreak else [F.col(fingerprint_col)]
    )
    w = Window.partitionBy(url_col).orderBy(*order)
    prev_fp = F.lag(fingerprint_col).over(w)
    prev_ts = F.lag(time_col).over(w)
    changed = F.when(
        prev_ts.isNotNull(),
        (~F.col(fingerprint_col).eqNullSafe(prev_fp)).cast("long"),
    )
    return (
        df.withColumn("__changed", changed)
        .groupBy(F.col(url_col).alias("url"))
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            (F.count(F.lit(1)) - F.lit(1)).alias("n_intervals"),
            F.coalesce(F.sum("__changed"), F.lit(0)).alias("n_changes"),
            F.min(time_col).alias("first_fetch"),
            F.max(time_col).alias("last_fetch"),
            (
                _epoch_sec(F.max(time_col)) - _epoch_sec(F.min(time_col))
            ).alias("span_sec"),
        )
    )


def estimate_change_rates(
    df: DataFrame,
    url_col: str = "url",
    time_col: str = "fetch_time",
    fingerprint_col: str = "content_fp",
    *,
    change_prob: float = 0.5,
    min_interval_sec: float = 3600.0,
    max_interval_sec: float = 30.0 * 86400.0,
    min_intervals: int = 2,
    tiebreak: str | None = None,
) -> DataFrame:
    """change_history + the Cho–Garcia-Molina rate and the derived
    schedule: ``lambda_hat`` (changes/sec), ``revisit_sec`` (clamped
    -ln(1-p)/λ̂), ``next_fetch_due`` (last_fetch + revisit_sec).

    URLs with < ``min_intervals`` intervals or a zero-length span get
    NULL estimates (loud; see module docstring).  λ̂ = 0 (no change
    ever observed) gets ``max_interval_sec`` — bounded staleness, not
    "never again".
    """
    hist = change_history(
        df, url_col, time_col, fingerprint_col, tiebreak=tiebreak
    )
    return attach_rates(
        hist,
        change_prob=change_prob,
        min_interval_sec=min_interval_sec,
        max_interval_sec=max_interval_sec,
        min_intervals=min_intervals,
    )


def attach_rates(
    hist: DataFrame,
    *,
    change_prob: float = 0.5,
    min_interval_sec: float = 3600.0,
    max_interval_sec: float = 30.0 * 86400.0,
    min_intervals: int = 2,
) -> DataFrame:
    """The rate/schedule arithmetic over a history-summary frame
    (n_intervals, n_changes, span_sec, last_fetch) — factored out so
    the X80 incremental fetch-log store prices its STATE rows through
    the exact same expressions as the batch path (merge ≡ rebuild is
    then an equality of inputs, not of two formula copies)."""
    if not 0.0 < change_prob < 1.0:
        raise ValueError(
            f"change_prob must be in (0, 1), got {change_prob}"
        )
    if not 0.0 < min_interval_sec <= max_interval_sec:
        raise ValueError(
            "need 0 < min_interval_sec <= max_interval_sec, got "
            f"{min_interval_sec} / {max_interval_sec}"
        )
    n = F.col("n_intervals").cast("double")
    x = F.col("n_changes").cast("double")
    mean_gap = F.col("span_sec") / n
    estimable = (F.col("n_intervals") >= min_intervals) & (
        F.col("span_sec") > 0
    )
    lam = F.when(
        estimable,
        -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / mean_gap,
    )
    # -ln(1-p) is a driver-side constant — no per-row log
    neg_log_1mp = -math.log(1.0 - change_prob)
    revisit = F.when(
        lam > 0,
        F.least(
            F.greatest(
                F.lit(neg_log_1mp) / lam, F.lit(float(min_interval_sec))
            ),
            F.lit(float(max_interval_sec)),
        ),
    ).otherwise(
        F.when(estimable, F.lit(float(max_interval_sec)))
    )
    return (
        hist.withColumn("lambda_hat", lam)
        .withColumn("revisit_sec", revisit)
        .withColumn(
            "next_fetch_due",
            F.timestamp_seconds(
                _epoch_sec(F.col("last_fetch")) + F.col("revisit_sec")
            ),
        )
    )


# sitemap changefreq -> seconds (X79): the protocol's seven values.
# 'always' maps to the caller's min_interval and 'never' to its
# max_interval at composition time (they are policy bounds, not
# durations), so the dict holds only the five duration words.
CHANGEFREQ_SECONDS = {
    "hourly": 3600.0,
    "daily": 86400.0,
    "weekly": 7.0 * 86400.0,
    "monthly": 30.0 * 86400.0,
    "yearly": 365.0 * 86400.0,
}


def revisit_with_priors(
    estimates: DataFrame,
    sitemap_entries: DataFrame,
    *,
    default_sec: float,
    min_interval_sec: float = 3600.0,
    max_interval_sec: float = 30.0 * 86400.0,
    url_col: str = "url",
) -> DataFrame:
    """X79: the cold-start composition — measured rate beats sitemap
    hint beats default.  ``estimates`` is estimate_change_rates'
    output (cold-start URLs carry loud-NULL revisit_sec);
    ``sitemap_entries`` is extract_sitemap_urls' output (the
    ``changefreq`` hint).  Adds ``effective_revisit_sec`` (never
    NULL) and ``revisit_source`` ∈ {'measured','sitemap','default'} —
    observability first, so a scheduler report can say how much of
    the frontier runs on evidence vs hints vs guesswork.

    The precedence is the trust order: a MEASURED rate reflects this
    crawler's own fingerprint history; changefreq is a site owner's
    self-report (the sitemap protocol itself labels it a hint and
    crawlers discount it); the default is policy.  Site hints are
    folded to seconds via CHANGEFREQ_SECONDS with 'always' →
    min_interval and 'never' → max_interval, clamped to the same
    [min, max] band as measured revisits (a hint must not escape the
    bounds policy set); unknown changefreq spellings are ignored
    (hint quality is unaudited by construction).  Conflicting entries
    for one URL keep the SMALLEST interval (most conservative —
    re-fetch sooner, the cheap direction of wrong).

    Shape: one url-keyed equi-join (both frames are url-keyed; the
    sitemap side is aggregated to one row per url first, so the join
    never fans out) + pure coalesce arithmetic.  At crawl scale both
    sides are O(|urls|) — AQE picks the join strategy."""
    if not 0.0 < min_interval_sec <= max_interval_sec:
        raise ValueError(
            "need 0 < min_interval_sec <= max_interval_sec, got "
            f"{min_interval_sec} / {max_interval_sec}"
        )
    cf = F.lower(F.col("changefreq"))
    hint_sec = F.when(cf == "always", F.lit(float(min_interval_sec)))
    for word, sec in CHANGEFREQ_SECONDS.items():
        hint_sec = hint_sec.when(cf == word, F.lit(float(sec)))
    hint_sec = hint_sec.when(cf == "never", F.lit(float(max_interval_sec)))
    # clamp ONLY real hints: Spark's greatest/least SKIP NULLs, so a
    # bare least(greatest(NULL, min), max) would resurrect an unknown
    # changefreq spelling as min_interval (found live by the
    # unknown-spelling test)
    clamped = F.when(
        hint_sec.isNotNull(),
        F.least(
            F.greatest(hint_sec, F.lit(float(min_interval_sec))),
            F.lit(float(max_interval_sec)),
        ),
    )
    hints = (
        sitemap_entries.filter(F.col("changefreq").isNotNull())
        .select(
            F.col(url_col).alias("__hint_url"),
            clamped.alias("__hint_sec"),
        )
        .filter(F.col("__hint_sec").isNotNull())
        .groupBy("__hint_url")
        .agg(F.min("__hint_sec").alias("__hint_sec"))
    )
    joined = estimates.join(
        hints, estimates[url_col] == hints["__hint_url"], "left"
    )
    return (
        joined.withColumn(
            "effective_revisit_sec",
            F.coalesce(
                F.col("revisit_sec"),
                F.col("__hint_sec"),
                F.lit(float(default_sec)),
            ),
        )
        .withColumn(
            "revisit_source",
            F.when(F.col("revisit_sec").isNotNull(), F.lit("measured"))
            .when(F.col("__hint_sec").isNotNull(), F.lit("sitemap"))
            .otherwise(F.lit("default")),
        )
        .drop("__hint_url", "__hint_sec")
    )
