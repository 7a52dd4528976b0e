"""Document chunking (SURVEY.md §2.11 extension — the RAG/pre-training
staple): split each document into overlapping token windows.

Spark-first shape: the token array, window starts and window slices are
all built-in array expressions (split / sequence / slice / array_join)
inside one projection + one posexplode — a map-only pass with no UDF, no
shuffle, no driver loop.  At 100 TB chunking is embarrassingly parallel
and this plan keeps it that way; the only data growth is the intended
chunk-per-window fan-out.

Window semantics (the common fixed-stride scheme): starts at 1,
1+stride, ... while start <= max(n_tokens - overlap, 1), each chunk
taking ``chunk_tokens`` tokens (the final chunk is the shorter tail).
Every token lands in >= 1 chunk; consecutive chunks share exactly
``overlap`` tokens except at the tail.  Documents with zero tokens
produce no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from covid19i2b2_spark.operators.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
) -> DataFrame:
    """One row per (document, chunk): (id_col, chunk_id, start_token,
    n_chunk_tokens, chunk_text).  chunk_id is 0-based in document order;
    start_token is the 1-based token offset of the chunk; chunk_text
    re-joins the window's tokens with single spaces (whitespace inside
    the window is normalized by construction — the tokenizer split it).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive (got {chunk_tokens})")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens) "
            f"(got {overlap_tokens} vs chunk_tokens={chunk_tokens})"
        )
    stride = chunk_tokens - overlap_tokens
    # tokens projected to a REAL column: the starts sequence and every
    # slice reference it (array-lambda re-evaluation trap, text.py)
    toked = df.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.col("__n") - overlap_tokens, F.lit(1)),
        F.lit(stride),
    )
    return (
        toked.filter(F.col("__n") > 0)
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.posexplode(starts).alias("chunk_id", "start_token"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long"),
            F.col("start_token").cast("long"),
            F.size(F.slice("__toks", F.col("start_token"), chunk_tokens))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice("__toks", F.col("start_token"), chunk_tokens), " "
            ).alias("chunk_text"),
        )
    )


def chunk_documents_sentences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_tokens: int = 128,
) -> DataFrame:
    """Sentence-aware chunking (the RAG-quality variant): split on
    sentence boundaries, then greedily pack CONSECUTIVE sentences into
    chunks of ~``target_tokens`` — a sentence never splits across
    chunks; the sentence that crosses the target closes its chunk
    (pack_sequences' boundary rule), and an over-long sentence becomes
    its own chunk.

    Plan: still map-only array expressions + one posexplode.  The
    running token total is an O(n²) slice-aggregate over the per-doc
    sentence list — n = sentences per document, bounded and small, so
    the quadratic term is per-row constant work, not a scale risk.  The
    only window is a per-document dense_rank renumbering chunk indexes
    (greedy indexes skip values when a sentence overshoots), partitioned
    by document — never global.

    Output: (id_col, chunk_id 0-based, n_sentences, n_tokens,
    chunk_text).  Documents with no sentences (blank text) are absent.
    """
    if target_tokens <= 0:
        raise ValueError(
            f"target_tokens must be positive (got {target_tokens})"
        )
    sents = F.filter(
        F.split(F.trim(F.col(text_col)), r"(?<=[.!?])\s+"),
        lambda s: F.trim(s) != "",
    )
    toked = df.select(F.col(id_col), sents.alias("__sents")).withColumn(
        "__counts",
        F.transform(
            "__sents", lambda s: F.size(F.split(F.trim(s), r"\s+"))
        ),
    )
    cums = F.transform(
        F.sequence(F.lit(1), F.size("__counts")),
        lambda i: F.aggregate(
            F.slice("__counts", 1, i), F.lit(0).cast("long"), lambda a, c: a + c
        ),
    )
    exploded = (
        toked.filter(F.size("__sents") > 0)
        .withColumn("__cums", cums)
        .select(
            F.col(id_col),
            F.posexplode(F.arrays_zip("__sents", "__counts", "__cums")).alias(
                "__pos", "z"
            ),
        )
        .select(
            F.col(id_col),
            F.col("__pos"),
            F.col("z.__sents").alias("__sent"),
            F.col("z.__counts").alias("__n"),
            F.floor((F.col("z.__cums") - 1) / target_tokens).alias("__raw_chunk"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("__raw_chunk")
    renum = exploded.withColumn(
        "chunk_id", (F.dense_rank().over(w) - 1).cast("long")
    )
    return (
        renum.groupBy(id_col, "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_sentences"),
            F.sum("__n").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__sent"))),
                    lambda s: s["__sent"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        .orderBy(id_col, "chunk_id")
    )
