"""Lexical relevance ranking (TF-IDF / BM25) over a documents table
(SURVEY §2.11 north-star extension; not in the reference — this is the
keyword-search surface a corpus-curation pipeline uses for targeted
inspection and filtering).

Scale shape: the query's term list is known at plan time and small, so
per-term frequencies are computed as ARRAY EXPRESSIONS on each row — no
explode, no (doc, term) shuffle, no UDF.  The whole plan is:

  one corpus scan (token array projected once)
    -> 1-row global aggregate (N, avgdl, per-term doc frequencies)
    -> broadcast that single row back (J8 constant-fold pattern)
    -> per-row score expression
    -> TakeOrderedAndProject top-k

At 100 TB this is a single map pass plus a scalar reduce — the minimum
possible for exact corpus-wide BM25.  (An inverted-index layout would
beat it for repeated interactive queries; that is the bucketed-layout
path in sources/layout.py, orthogonal to the scoring math here.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.text import tokens


def bm25_rank(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    Columns: (id_col, dl, tf_<term>..., bm25) — dl is the document
    length in whitespace tokens; per-term tf columns are kept so the
    ranking is auditable.  idf uses the standard smoothed form
    ln(1 + (N - df + 0.5)/(df + 0.5)), always positive.

    Ties broken by id for a deterministic cutoff (same contract as
    q_topk / TakeOrderedAndProject).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    def _tf(term: str):
        # closure, not a default arg: a 2-param lambda would make Spark
        # bind the second param to the array INDEX (higher-order filter
        # signature), not the term literal
        return F.size(F.filter("__toks", lambda t: t == F.lit(term)))

    toked = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("dl"),
        *[_tf(term).cast("long").alias(f"tf_{term}") for term in query_terms],
    )
    # One scalar row: corpus size, mean doc length, per-term doc freqs.
    stats = toked.agg(
        F.count("*").alias("__n"),
        F.avg("dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"tf_{term}") > 0).cast("long")).alias(f"__df_{term}")
            for term in query_terms
        ],
    )
    scored = toked.join(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl")
    )
    score = None
    for term in query_terms:
        tf = F.col(f"tf_{term}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df_{term}") + F.lit(0.5))
            / (F.col(f"__df_{term}") + F.lit(0.5))
        )
        part = idf * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    return (
        scored.select(
            F.col(id_col),
            "dl",
            *[f"tf_{t}" for t in query_terms],
            round6(score).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_per_doc: int = 3,
) -> DataFrame:
    """Per-document top TF-IDF terms — the distributed path (term
    vocabulary unknown at plan time, so this one DOES explode and
    shuffle; contrast with bm25_rank's fixed-term map-only plan).

    Plan: explode tokens -> groupBy(doc, term) tf -> groupBy(term) df
    (two shuffles, both with map-side partials) -> broadcast the 1-row
    corpus size -> rank terms per doc by tf*idf, keep top_per_doc.

    Columns: (id_col, term, tf, df, tfidf, rank) — all atomic.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("__n"))
    from pyspark.sql import Window as W

    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            round6(
                F.col("tf")
                * F.log(
                    (F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                )
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_per_doc)
    )
