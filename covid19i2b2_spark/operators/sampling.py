"""Deterministic corpus sampling + sequence packing (SURVEY §2.11 north
star — dataset-curation operators a training-data pipeline runs between
dedup and tokenization).

Everything is hash-derived (never F.rand / df.sample's RNG): the sampled
corpus is identical across runs, task retries, and cluster sizes — the
same reproducibility contract as the obfuscation noise (SURVEY F13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_BUCKETS = 1_000_000


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash:
    pmod(xxhash64(key, seed), 1e6) < fraction*1e6.  A row's fate depends
    only on (key, seed) — re-runs, retries, and incremental appends agree
    on membership, and samples at increasing fractions are NESTED
    (fraction 0.1 ⊂ fraction 0.2), which makes scaling-law subsets
    consistent.  Map-only: no shuffle, filter pushes to the scan when the
    key is a stored column."""
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(_BUCKETS))
    return df.filter(bucket < int(fraction * _BUCKETS))


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Deterministic disjoint train/val/test split: adds a ``split``
    column assigning each row to exactly one named fraction by key hash
    (fractions must sum to <= 1.0; any remainder is labeled NULL so
    over-allocation is impossible silently).  Membership depends only on
    (key, seed): re-runs, retries, and incremental appends route the
    same key to the same split — no leakage between train and eval
    across corpus versions.  Map-only, no shuffle.

    The bucket hash is SALTED with a 'split' literal so it is independent
    of hash_sample's bucket at the same (key, seed): composing them
    (sample a fraction, then split the survivors) yields splits in the
    requested proportions instead of everything landing in the lowest
    split (sampling keeps exactly the low hash_sample buckets — an
    unsalted split would re-derive those same buckets)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1.0")
    bucket = F.pmod(
        F.xxhash64(F.lit("split"), F.col(key_col), F.lit(seed)), F.lit(_BUCKETS)
    )
    expr: Column = F.lit(None).cast("string")
    lo = 0
    # reversed build: CASE chain evaluates in insertion order below
    cuts = []
    for name, frac in sorted(fractions.items()):
        hi = lo + int(frac * _BUCKETS)
        cuts.append((name, lo, hi))
        lo = hi
    for name, lo_b, hi_b in reversed(cuts):
        expr = F.when((bucket >= lo_b) & (bucket < hi_b), F.lit(name)).otherwise(
            expr
        )
    return df.withColumn("split", expr)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10%,
    keep 'de' fully): the per-row threshold comes from a CASE over the
    stratum column; same nested-membership property per stratum."""
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(_BUCKETS))
    thresh: Column = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    target_tokens: int,
    n_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Greedy sequence packing: assign documents to training chunks of
    ~``target_tokens`` tokens.  Docs are hash-sharded (deterministic),
    each shard packs independently by running token total — the window
    is per shard, so parallelism = n_shards regardless of corpus size,
    and no shard ever sees more than corpus/n_shards rows.

    Returns (id_col, token_count_col, shard, chunk_id) where chunk_id is
    globally unique as (shard, chunk_idx).  Greedy boundary rule: a doc
    that crosses the target closes the chunk after itself, so every
    chunk except a shard's last holds >= target_tokens and overshoots by
    less than one document."""
    shard = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed + 1)), F.col(id_col)
    )
    cum = F.sum(token_count_col).over(w)
    chunk_idx = F.floor((cum - 1) / target_tokens).cast("long")
    return (
        df.withColumn("shard", shard)
        .withColumn("__cum", cum)
        .withColumn(
            "chunk_id",
            F.concat_ws("-", F.col("shard"), chunk_idx),
        )
        .drop("__cum")
    )
