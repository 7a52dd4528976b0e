"""Deduplication operators (SURVEY.md §2.11 X1/X2; north-star extension).

Four tiers, all deterministic (fixed seeds, xxhash64 — retry-safe at
100 TB, SURVEY.md §4.2):

- exact:    hash-groupBy on a key (or content fingerprint)
- MinHash:  char-shingles -> k min-hashes -> LSH band buckets -> candidate
            pairs -> exact Jaccard verify
- SimHash:  token hashes -> 64-bit majority signature -> hamming buckets
- n-gram Jaccard: exact verify used standalone on candidate pairs

Scale shape: one explode (shingles) + one groupBy per doc for signatures;
the LSH bucket join only pairs docs sharing a band hash — never an O(n²)
cross join.  Embedding near-dup lives in similarity.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.text import char_shingles, tokens


def exact_dedup(
    df: DataFrame,
    keys: Sequence[str | Column],
    tiebreak: Sequence[str | Column],
) -> DataFrame:
    """X1: keep one canonical row per duplicate group (first by
    ``tiebreak``).  Window row_number, single shuffle on the dup key —
    unlike dropDuplicates, the survivor is deterministic."""
    w = Window.partitionBy(*keys).orderBy(*tiebreak)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures: explode char shingles, take n_hashes column-wise
    MINs of xxhash64(shingle, seed+i) in ONE groupBy pass (n_hashes min
    aggregates — no per-hash explode, no UDF).

    Returns (id_col, signature array<long>, n_shingles).
    """
    exploded = df.select(
        id_col, F.explode(char_shingles(text_col, shingle_k)).alias("__shingle")
    )
    aggs = [
        F.min(F.xxhash64("__shingle", F.lit(seed + i))).alias(f"__h{i}")
        for i in range(n_hashes)
    ] + [F.count_distinct("__shingle").alias("n_shingles")]
    per_doc = exploded.groupBy(id_col).agg(*aggs)
    return per_doc.select(
        id_col,
        F.array(*[f"__h{i}" for i in range(n_hashes)]).alias("signature"),
        "n_shingles",
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    n_bands: int = 8,
    sig_col: str = "signature",
) -> DataFrame:
    """LSH banding: split each signature into n_bands bands, hash each
    band, bucket-join on (band_idx, band_hash).  Docs agreeing on any band
    become a candidate pair (id_a < id_b, distinct).

    The join key includes the band index so buckets from different bands
    never collide; at 100 TB the bucket join is an equi-join Catalyst can
    hash-partition, and skewed mega-buckets (boilerplate) are handled by
    AQE skew splitting.
    """
    n_hashes_col = F.size(F.col(sig_col))
    rows_per_band = (n_hashes_col / n_bands).cast("int")
    banded = signatures.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("__id", "bb.band", "bb.bucket")
    left = banded.withColumnRenamed("__id", "id_a")
    right = banded.withColumnRenamed("__id", "id_b")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram/shingle Jaccard on candidate pairs (the verify step
    after LSH; also the standalone n-gram-Jaccard dedup when pairs come
    from elsewhere).  Set sizes are per-document, so the array ops stay
    bounded regardless of corpus size."""
    sets_df = df.select(
        F.col(id_col),
        F.array_distinct(char_shingles(text_col, shingle_k)).alias("__set"),
    )
    a = sets_df.select(F.col(id_col).alias("id_a"), F.col("__set").alias("__set_a"))
    b = sets_df.select(F.col(id_col).alias("id_b"), F.col("__set").alias("__set_b"))
    inter = F.size(F.array_intersect("__set_a", "__set_b"))
    union = F.size(F.array_union("__set_a", "__set_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            round6(inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """X2 end-to-end: MinHash -> LSH bands -> exact-Jaccard verify.
    Returns (id_a, id_b, jaccard) near-duplicate pairs."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k, seed)
    pairs = lsh_candidate_pairs(sigs, id_col, n_bands)
    return jaccard_verify(df, pairs, id_col, text_col, shingle_k, threshold)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """SimHash signature: per token a 64-bit hash votes +1/-1 on each bit;
    the signature sets bit i when the vote sum is positive.  One explode +
    one groupBy with ``bits`` sum aggregates — all codegen'd.

    Hamming-adjacent signatures indicate near-dups; bucket on rotated
    prefixes for search.  Returns (id_col, simhash long, n_tokens).
    """
    tok = df.select(id_col, F.explode(tokens(text_col)).alias("__tok"))
    h = F.xxhash64("__tok")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"__b{i}")
        for i in range(bits)
    ] + [F.count("*").alias("n_tokens")]
    votes = tok.groupBy(id_col).agg(*aggs)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"__b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return votes.select(id_col, sig.alias("simhash"), "n_tokens")


def hamming_distance(a: str | Column, b: str | Column) -> Column:
    """Popcount of XOR via bin() — no UDF."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    x = ac.bitwiseXOR(bc)
    return F.length(F.regexp_replace(F.bin(x), "0", ""))
