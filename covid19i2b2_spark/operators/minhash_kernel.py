"""Arrow-batched MinHash signature kernel (SURVEY.md §2.11 X2 — the
mapInPandas fast path for ``minhash_signatures(with_sets=True)``).

Why a Python kernel here when every other hot path is expression-only:
the expression path computes signatures via explode(char_shingles) —
one row PER SHINGLE flows through the shuffle into two aggregations
(32 declarative mins + a collect_set, deliberately split; see
``dedup.minhash_signatures``).  At 5-char shingles that is ~|text|
rows per document through an exchange.  The kernel computes both the
32-min signature AND the distinct shingle-hash set per document in ONE
narrow Arrow pass — no explode, no shuffle, no aggregation at all; the
per-document work is a handful of numpy vector ops over a rolling
polynomial hash.  This is exactly the case the build guidelines carve
out for Pandas-kernel operators: built-in operators can express the
semantics only via a materialized explode the kernel avoids.

Hash note: the kernel's shingle hash is a vectorized 64-bit polynomial
+ splitmix64 finalizer, not Spark's xxhash64 (not reproducible in
numpy without a per-shingle Python loop).  Downstream results are
hash-agnostic: exact Jaccard over 64-bit hashed shingle sets equals
Jaccard over the shingle strings (collisions ~2^-64), and LSH banding
only needs min-stability, so the kernel and expression paths find the
same near-dup pairs (asserted in tests/test_llm_ops.py).  Both paths
are deterministic across runs/retries/partitionings — the hash depends
only on the shingle bytes and the seed-derived (a, b) family.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from covid19i2b2_spark.operators.dedup import _MERSENNE31, _hash_family

_B = np.uint64(1099511628211)  # FNV-1a prime as the polynomial base
_M31 = np.uint64(_MERSENNE31)


def _finalize(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates polynomial-adjacent values."""
    h = h.copy()
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _shingle_hash_set(text: str, k: int) -> np.ndarray:
    """Distinct 64-bit hashes of the char k-shingles of the normalized
    text (lowercase, collapsed whitespace — mirrors text.normalize_text;
    shorter-than-k text hashes as one whole-string shingle, mirroring
    char_shingles).  Vectorized: UTF-32 codepoints -> k strided
    multiply-adds -> finalizer -> unique."""
    norm = " ".join(text.lower().split())
    cps = np.frombuffer(norm.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    if cps.size < k:
        h = np.uint64(0)
        for c in cps:
            h = h * _B + c
        return _finalize(np.array([h], dtype=np.uint64))
    n = cps.size - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * _B + cps[j : j + n]
    return np.unique(_finalize(h))


def minhash_signatures_kernel(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Drop-in replacement for ``minhash_signatures(with_sets=True)``:
    (id, signature array<long>, n_shingles, shingle_set array<long>) in
    one narrow mapInPandas pass — no explode, no shuffle.

    Signature arithmetic matches the expression path exactly given the
    shingle hash: h31 = h64 mod (2^31-1), sig_i = min((a_i*h31 + b_i)
    mod (2^31-1)) with the same seed-derived (a_i, b_i) family.

    Parallelism: the kernel runs per input partition, so a small-file
    scan (fewer splits than cores) would serialize the Python work on
    one or two workers.  When the input has fewer partitions than
    defaultParallelism, the narrow (id, text) projection is
    repartitioned first — one cheap exchange of the raw columns, far
    smaller than the per-shingle explode shuffle it replaces.  Inputs
    already wider than the cluster (the 100 TB case) pass through
    untouched."""
    fam = np.array(_hash_family(n_hashes, seed), dtype=np.uint64)
    a_col = fam[:, 0:1]  # (n_hashes, 1)
    b_col = fam[:, 1:2]
    id_field = df.schema[id_col]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "signature array<long>, n_shingles int, shingle_set array<long>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs, counts, sets = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                hu = _shingle_hash_set(text or "", shingle_k)
                h31 = hu % _M31  # < 2^31: a*h31+b < 2^62, no wraparound
                sig = ((a_col * h31[None, :] + b_col) % _M31).min(axis=1)
                ids.append(doc_id)
                sigs.append(sig.astype(np.int64))
                counts.append(hu.size)
                sets.append(hu.view(np.int64))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "signature": sigs,
                    "n_shingles": counts,
                    "shingle_set": sets,
                }
            )

    narrow = df.select(id_col, text_col)
    par = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return narrow.mapInPandas(gen, schema)
