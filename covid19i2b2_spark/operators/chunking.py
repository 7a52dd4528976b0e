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

from pyspark.sql import DataFrame, functions as F

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
