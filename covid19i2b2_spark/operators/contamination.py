"""Benchmark-contamination detection for training corpora (SURVEY §2.11
north-star extension; not in the reference — the reference computes site
aggregates, this is the analogous hygiene pass a pretraining pipeline runs
before the corpus ships).

Method: word n-gram overlap between each corpus document and the union of
benchmark/eval texts — the GPT-3 appendix-C / PaLM decontamination test.
A document whose distinct n-grams overlap the eval set above a threshold
is flagged for removal.

Scale shape (the whole point at 100 TB):
- The EVAL side is small by construction (benchmarks are thousands of
  documents, not billions), so its distinct-n-gram set is explicitly
  ``F.broadcast``-able — this is the one place a broadcast of a derived
  table is size-safe by invariant, unlike per-corpus-doc tables
  (VERDICT r1 #3).
- The CORPUS side is one projection (token array built once per doc —
  see char_shingles' lambda-inlining caveat), one explode of distinct
  grams, a broadcast hash join (no shuffle), and ONE groupBy(doc_id)
  with map-side partials.  No corpus-side table is ever broadcast and
  nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.text import tokens, word_ngrams


def _distinct_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gset: array<string>) — distinct word n-grams per document.
    Token array projected first so the n-gram lambda does not re-split
    per element."""
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col(id_col),
            F.array_distinct(
                word_ngrams(F.col("__toks"), n, pre_tokenized=True)
            ).alias("gset"),
        )
    )


def eval_gram_set(
    eval_df: DataFrame, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct n-grams over the whole eval/benchmark set: one column
    ``gram``.  Small by invariant (eval sets are bounded); callers
    broadcast it."""
    toks = eval_df.select(tokens(F.col(text_col)).alias("__toks"))
    return (
        toks.select(
            F.explode(word_ngrams(F.col("__toks"), n, pre_tokenized=True)).alias(
                "gram"
            )
        )
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Per corpus document: distinct-n-gram count, how many of those
    n-grams appear anywhere in the eval set, the overlap ratio, and a
    contamination flag (ratio >= threshold).

    Columns: (id_col, n_grams, n_matched, contamination_ratio,
    contaminated) — all atomic types (driver t2 constraint).

    Documents shorter than ``n`` words have zero n-grams: ratio 0.0,
    never flagged (explode_outer keeps them in the output).
    """
    grams = _distinct_grams(corpus, id_col, text_col, n)
    evals = F.broadcast(eval_gram_set(eval_df, text_col, n))
    exploded = grams.select(
        F.col(id_col), F.explode_outer("gset").alias("gram")
    )
    # Broadcast LEFT join marks matched grams without shuffling the
    # corpus side; the single groupBy(doc) then counts both totals and
    # matches in one shuffle with map-side combine.
    marked = exploded.join(
        evals.withColumn("__hit", F.lit(1)), "gram", "left"
    )
    ratio: Column = F.when(
        F.col("n_grams") == 0, F.lit(0.0)
    ).otherwise(F.col("n_matched").cast("double") / F.col("n_grams"))
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_matched"),
        )
        .select(
            F.col(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            "n_matched",
            round6(ratio).alias("contamination_ratio"),
            (ratio >= F.lit(threshold)).alias("contaminated"),
        )
    )
