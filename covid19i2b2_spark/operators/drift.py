"""Corpus-distribution drift measurement (SURVEY §2.11 north star —
corpus QA for refresh pipelines).

When a crawl snapshot replaces last month's, the question "did the
token distribution move?" gates retraining decisions and catches
ingest regressions (a broken extractor shifts the distribution long
before anyone reads a sample).  `corpus_divergence` answers it with
Jensen-Shannon divergence over token unigram distributions, per group
(source, language, ...), computed entirely with bounded-key aggregates.

Engine-independence: the JS terms involve ln(), which can differ by
1 ulp across libms — each per-token term is therefore rounded to
picounits and summed as BIGINTs (the unigram_logprob_score /
_fixdot pattern), so Spark and the DuckDB oracle produce identical
doubles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.text import tokens


def _token_counts(
    df: DataFrame, text_col: str, group_cols: Sequence[str], side: str
) -> DataFrame:
    toks = df.select(
        *[F.col(c) for c in group_cols],
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    return toks.groupBy(*group_cols, "token").agg(
        F.count("*").alias(f"c_{side}")
    )


def corpus_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Jensen-Shannon divergence (nats, in [0, ln 2]) between the token
    unigram distributions of two corpus snapshots, one row per group.

    JS(p, q) = (KL(p||m) + KL(q||m)) / 2 with m = (p+q)/2 — symmetric,
    finite even for disjoint vocabularies (unlike raw KL), 0 iff the
    distributions are identical.  Also reports token totals and
    type (distinct-token) counts per side plus the shared-type count —
    the quick triage columns when the divergence moves.

    Plan shape (100 TB): one token-count aggregate per side (map-side
    combined, key space = vocabulary), one full-outer join on
    (group, token) — bounded keys, never row-scale — a broadcast join
    of the per-group totals, and one final aggregate.  Nothing touches
    raw documents twice.

    Groups present in only one snapshot are omitted (no distribution
    to compare against); callers watching for appeared/vanished
    SOURCES should diff the group sets separately.

    Per-token terms are floor(term * 1e12 + 0.5) BIGINTs before the
    sum: order-independent and oracle-exact (see module docstring).
    """
    g = list(group_cols)
    ca = _token_counts(df_a, text_col, g, "a")
    cb = _token_counts(df_b, text_col, g, "b")
    return divergence_from_counts(ca, cb, g)


def divergence_from_counts(
    ca: DataFrame,
    cb: DataFrame,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """:func:`corpus_divergence`'s core over PRE-COMPUTED token-count
    frames ((*group_cols, token, c_a) / (..., c_b) — the
    :func:`_token_counts` shape).  Exposed (round 9) so callers that
    compare MANY snapshots against one frozen reference — the
    streaming drift monitor — aggregate the reference once and reuse
    its (vocabulary-bounded) counts per comparison instead of
    re-scanning the reference corpus every time."""
    g = list(group_cols)
    tot_a = ca.groupBy(*g).agg(F.sum("c_a").alias("n_tokens_a"))
    tot_b = cb.groupBy(*g).agg(F.sum("c_b").alias("n_tokens_b"))

    joined = ca.join(cb, [*g, "token"], "full_outer").select(
        *[F.col(c) for c in g],
        "token",
        F.coalesce("c_a", F.lit(0)).alias("c_a"),
        F.coalesce("c_b", F.lit(0)).alias("c_b"),
    )
    totals = tot_a.join(tot_b, g) if g else tot_a.crossJoin(tot_b)
    joined = (
        joined.join(F.broadcast(totals), g)
        if g
        else joined.crossJoin(F.broadcast(totals))
    )

    p = F.col("c_a").cast("double") / F.col("n_tokens_a").cast("double")
    q = F.col("c_b").cast("double") / F.col("n_tokens_b").cast("double")
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(F.col("c_a") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("c_b") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / F.lit(2.0)
    term_fix = F.floor(term * F.lit(1e12) + F.lit(0.5)).cast("long")

    return (
        joined.groupBy(*g)
        .agg(
            F.first("n_tokens_a").alias("n_tokens_a"),
            F.first("n_tokens_b").alias("n_tokens_b"),
            F.sum(F.when(F.col("c_a") > 0, 1).otherwise(0)).alias(
                "n_types_a"
            ),
            F.sum(F.when(F.col("c_b") > 0, 1).otherwise(0)).alias(
                "n_types_b"
            ),
            F.sum(
                F.when((F.col("c_a") > 0) & (F.col("c_b") > 0), 1).otherwise(0)
            ).alias("n_types_shared"),
            round6(F.sum(term_fix).cast("double") / F.lit(1e12)).alias(
                "js_divergence"
            ),
        )
    )


def corpus_divergence_ordered(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """:func:`corpus_divergence` with deterministic output order — the
    t2/report-friendly wrapper."""
    out = corpus_divergence(df_a, df_b, text_col, group_cols)
    return out.orderBy(*group_cols) if group_cols else out
