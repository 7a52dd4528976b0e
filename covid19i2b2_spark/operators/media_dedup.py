"""X92: perceptual near-duplicate detection for multimodal payloads
(round 15 — closes VERDICT r14 "What's missing" #1, the media analog
of X2's text near-dup family).

The multimodal columns (operators/multimodal.py, X5) carry media as
opaque ``binary`` payloads; the container has no codecs, so a
pixel-space pHash is env-fenced with the decode itself.  What IS
computable — and what this module ships — is a blockhash/dHash-style
signature over the RAW PAYLOAD BYTES (blockhash in the spirit of the
Block Mean Value hash, Yang et al. 2006; the gradient bit layout of
dHash):

    split the n payload bytes into C near-equal blocks
    (block of byte i = i*C // n), take per-block integer sums, and
    set bit b when block b+1's MEAN exceeds block b's — compared as
    cross-multiplied sums (sum[b+1]*cnt[b] > sum[b]*cnt[b+1]), so the
    whole signature is exact integer arithmetic an ANSI engine
    reproduces bit for bit (the q_media_phash DuckDB oracle).

Byte-level perturbations (format re-encodes of the same stream,
flipped EXIF bytes, truncated trailers) move a few block means
slightly and flip at most a few bits — Hamming-adjacent signatures —
while unrelated payloads land ~32 bits apart (random-bit expectation).
When real codecs ARE present, the same machinery applies to decoded
luma rows instead of raw bytes; only the byte source changes.

Pair search reuses X2'/X84's pigeonhole discipline (dedup.py
simhash_near_dup_pairs): split the 64-bit signature into
``max_hamming + 2`` chunks, key every signature by all 2-chunk
combinations, equi-join on the keys — every pair within the Hamming
budget shares >= one key (two signatures differing in <= h chunks
agree on >= 2 of h+2), and NO O(n²) cross join exists anywhere.

Two signature impls, value-identical (pinned in tests):
- ``impl='expr'``: pure JVM expressions — hex(payload) -> per-byte
  conv() -> one explode + groupBy (the DuckDB-mirrorable oracle path).
- ``impl='kernel'``: one Arrow ``pandas_udf`` pass — np.frombuffer +
  per-block integer sums, no explode, no shuffle in the signature
  stage (the 100 TB hot path; the minhash_kernel.py pattern).
"""

from __future__ import annotations

from itertools import combinations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

GRID_CELLS = 65  # 64 adjacent-block comparisons -> a 64-bit signature


def _expr_signatures(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """(id, phash) via pure expressions: explode (byte, block) rows,
    per-block sums, adjacent cross-multiplied comparisons folded into
    one long.  The shuffle-per-signature shape is the ORACLE path —
    the kernel is the scale path (same trap as suffixes.py's
    codepoints note: per-index substring over a long string seeks from
    the start, so this stays for sub-corpus parity checks)."""
    hexed = df.select(
        F.col(id_col).alias("__id"),
        F.hex(F.col(payload_col)).alias("__hx"),
        F.length(F.col(payload_col)).alias("__n"),
    ).filter(F.col("__n") >= GRID_CELLS)
    # exact integer floor division — (x - x % n) / n divides exactly,
    # so the double division can't land 1 ulp under an integer and
    # truncate wrong (i*65/n then cast would)
    vals = F.transform(
        F.sequence(F.lit(0), F.col("__n") - 1),
        lambda i: F.struct(
            (
                (i * GRID_CELLS - (i * GRID_CELLS) % F.col("__n"))
                / F.col("__n")
            )
            .cast("int")
            .alias("blk"),
            F.conv(F.substring("__hx", (i * 2 + 1).cast("int"), 2), 16, 10)
            .cast("long")
            .alias("v"),
        ),
    )
    rows = hexed.select("__id", F.explode(vals).alias("bv")).select(
        "__id", F.col("bv.blk").alias("blk"), F.col("bv.v").alias("v")
    )
    blocks = rows.groupBy("__id", "blk").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("__id").orderBy("blk")
    bits = (
        blocks.withColumn("s2", F.lead("s").over(w))
        .withColumn("c2", F.lead("c").over(w))
        .filter(F.col("s2").isNotNull())
        .withColumn(
            "bit",
            F.when(
                F.col("s2") * F.col("c") > F.col("s") * F.col("c2"),
                F.lit(1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
    )
    # SUM of distinct shifted bits == the bitmask (each blk occurs
    # once); the blk=63 term wraps to Long.MIN_VALUE, which is exactly
    # the signed two's-complement reading of the mask — same wrap the
    # numpy kernel and the DuckDB oracle perform
    return bits.groupBy("__id").agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(blk AS INT))")
            * F.col("bit")
        ).alias("phash")
    )


def _kernel_signatures(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """(id, phash) in one narrow Arrow pass — value-identical to
    ``_expr_signatures`` (pinned in tests/test_media_dedup.py)."""
    import numpy as np

    @F.pandas_udf("long")
    def _phash(payload: pd.Series) -> pd.Series:
        out = []
        for buf in payload:
            if buf is None or len(buf) < GRID_CELLS:
                out.append(None)
                continue
            v = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.int64)
            n = len(v)
            blk = (np.arange(n) * GRID_CELLS) // n
            sums = np.zeros(GRID_CELLS, dtype=np.int64)
            cnts = np.zeros(GRID_CELLS, dtype=np.int64)
            np.add.at(sums, blk, v)
            np.add.at(cnts, blk, 1)
            bits = (
                sums[1:] * cnts[:-1] > sums[:-1] * cnts[1:]
            ).astype(np.int64)
            out.append(int((bits << np.arange(64)).sum()))
        return pd.Series(out, dtype="Int64")

    return (
        df.select(
            F.col(id_col).alias("__id"),
            _phash(F.col(payload_col)).alias("phash"),
        )
        .filter(F.col("phash").isNotNull())
        .select("__id", F.col("phash").cast("long").alias("phash"))
    )


def media_blockhash(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    impl: str = "kernel",
) -> DataFrame:
    """(id_col, phash): the 64-bit blockhash/dHash signature of each
    payload (module docstring).  Payloads shorter than ``GRID_CELLS``
    bytes are DROPPED — sub-grid payloads have no stable block
    structure to compare (an empty favicon is not an image near-dup
    candidate); count them upstream if they matter."""
    if impl == "kernel":
        out = _kernel_signatures(df, id_col, payload_col)
    elif impl == "expr":
        out = _expr_signatures(df, id_col, payload_col)
    else:
        raise ValueError(f"impl must be 'kernel' or 'expr' (got {impl!r})")
    return out.withColumnRenamed("__id", id_col)


def hamming_pairs_multi_index(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int,
    *,
    n_chunks: int | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) for every pair within ``max_hamming`` over
    a PRECOMPUTED 64-bit signature column — the 2-chunk pigeonhole
    multi-index of dedup.py's simhash_near_dup_pairs, generalized to
    any signature source (X92 uses it for media phashes).  Recall
    guarantee, bucket-cap semantics, and the no-cross-join contract
    are identical to the simhash variant (see that docstring); this
    is a candidates+verify plan — every emitted pair is exact-verified
    with one bit_count, so the index can only miss pairs past
    ``max_hamming``, never emit false ones."""
    from covid19i2b2_spark.operators.dedup import (
        _LOG,
        hamming_distance,
    )

    c = n_chunks if n_chunks is not None else max_hamming + 2
    if c < max_hamming + 2:
        raise ValueError(
            f"2-chunk multi-index needs n_chunks >= max_hamming + 2 "
            f"(got n_chunks={c}, max_hamming={max_hamming})"
        )
    if c > 64:
        raise ValueError(f"n_chunks must be <= 64 (got {c})")
    base_w, extra = divmod(64, c)
    widths = [base_w + (1 if i < extra else 0) for i in range(c)]
    offsets = [sum(widths[:i]) for i in range(c)]

    def _chunk(i: int) -> Column:
        return F.shiftrightunsigned(sig_col, offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    key_structs = F.array(
        *[
            F.struct(
                F.lit(k).alias("key_idx"),
                _chunk(i).alias("v1"),
                _chunk(j).alias("v2"),
            )
            for k, (i, j) in enumerate(combinations(range(c), 2))
        ]
    )
    keyed = sigs.select(
        F.col(id_col).alias("__id"),
        F.col(sig_col).alias("__sig"),
        F.explode(key_structs).alias("k"),
    ).select("__id", "__sig", "k.key_idx", "k.v1", "k.v2")
    join_key = ["key_idx", "v1", "v2"]
    if bucket_cap is not None:
        from covid19i2b2_spark.operators.dedup import lazy_cap_filter

        keyed = lazy_cap_filter(
            keyed,
            join_key,
            bucket_cap,
            "hamming_pairs_multi_index",
            detail=(
                "; affected pairs may still match via their other "
                "combination keys"
            ),
        )
    left = keyed.select(
        F.col("__id").alias("id_a"), F.col("__sig").alias("__h_a"), *join_key
    )
    right = keyed.select(
        F.col("__id").alias("id_b"), F.col("__sig").alias("__h_b"), *join_key
    )
    return (
        left.join(right, join_key)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            hamming_distance("__h_a", "__h_b").cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def media_near_dup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    *,
    n_chunks: int | None = None,
    bucket_cap: int | None = None,
    impl: str = "kernel",
) -> DataFrame:
    """X92 end-to-end: blockhash signatures -> pigeonhole 2-chunk
    index -> exact Hamming verify.  Returns (id_a, id_b, hamming)
    media near-dup pairs.  At 100 TB pass ``bucket_cap`` (constant
    payloads — solid-color fills — concentrate signatures exactly the
    way boilerplate concentrates simhashes)."""
    # persisted: the multi-index reads the signature frame twice (left
    # and right sides of the key join); released by the ContextCleaner
    sigs = media_blockhash(df, id_col, payload_col, impl=impl).persist()
    return hamming_pairs_multi_index(
        sigs,
        id_col,
        "phash",
        max_hamming,
        n_chunks=n_chunks,
        bucket_cap=bucket_cap,
    )
