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

Hash note: the kernel supports two shingle hashes.  'splitmix'
(historical default) is a vectorized 64-bit polynomial + splitmix64
finalizer.  'poly' reproduces ``text.poly_hashes_from_codepoints``
bit-for-bit — the plain base-1009 codepoint polynomial with NO modulus
(max value ~1.2e18 < 2^63, so int64-exact in numpy, Spark ANSI, and
any SQL engine) — which is what lets the registered q_minhash_pairs
run the fast Arrow kernel AND carry a full DuckDB value oracle.
Downstream results are hash-agnostic either way: exact Jaccard over
64-bit hashed shingle sets equals Jaccard over the shingle strings
(collisions ~2^-64), and LSH banding only needs min-stability, so all
paths find the same near-dup pairs (asserted in tests/test_llm_ops.py).
All are deterministic across runs/retries/partitionings — the hash
depends only on the shingle bytes and the seed-derived (a, b) family.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from covid19i2b2_spark.operators.dedup import _MERSENNE31, _hash_family

_B = np.uint64(1099511628211)  # FNV-1a prime as the polynomial base
_M31 = np.uint64(_MERSENNE31)
_POLY_B = np.int64(1009)  # text._POLY_B — the oracle-mirrorable base


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


def _poly_shingle_set(text: str, k: int) -> np.ndarray:
    """Distinct base-1009 codepoint-polynomial hashes of the char
    k-shingles — the numpy mirror of ``text.poly_hashes_from_codepoints``
    over normalize_text'd input, value-identical to the expression path
    and to the DuckDB oracle (h_i = sum_j cp[i+j] * 1009^(k-1-j), no
    modulus; max ~0x10FFFF * 1.037e12 ~ 1.2e18 < 2^63, int64-exact).

    Normalization mirrors Spark's trim(regexp_replace(lower, '\\s+', ' '))
    EXACTLY: Java \\s is ASCII-only, so the whitespace class is written
    out rather than using Python's Unicode-wide str.split()."""
    import re

    norm = re.sub("[ \t\n\x0b\x0c\r]+", " ", (text or "").lower()).strip(" ")
    cps = np.frombuffer(norm.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    if cps.size < k:
        # whole-string fold (mirrors char_shingles' whole-string shingle;
        # <= k-1 codepoints, value < 0x10FFFF * 1009^3 — exact)
        h = np.int64(0)
        for c in cps:
            h = h * _POLY_B + c
        return np.array([h], dtype=np.int64)
    n = cps.size - k + 1
    h = np.zeros(n, dtype=np.int64)
    for j in range(k):
        h = h * _POLY_B + cps[j : j + n]
    return np.unique(h)


def minhash_signatures_kernel(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    shingle_k: int = 5,
    seed: int = 42,
    shingle_hash: str = "splitmix",
) -> DataFrame:
    """Drop-in replacement for ``minhash_signatures(with_sets=True)``:
    (id, signature array<long>, n_shingles, shingle_set array<long>) in
    one narrow mapInPandas pass — no explode, no shuffle.

    Signature arithmetic matches the expression path exactly given the
    shingle hash: h31 = h64 mod (2^31-1), sig_i = min((a_i*h31 + b_i)
    mod (2^31-1)) with the same seed-derived (a_i, b_i) family.

    ``shingle_hash='poly'`` selects the oracle-mirrorable base-1009
    codepoint polynomial (see :func:`_poly_shingle_set`) — with it the
    kernel's output is VALUE-IDENTICAL to
    ``minhash_signatures(shingle_hash='poly', with_sets=True)``, so the
    whole downstream pipeline (poly band buckets, estimate cascade,
    exact Jaccard) reproduces bit-for-bit in a DuckDB oracle while
    keeping the Arrow fast path.

    Parallelism: the kernel runs per input partition, so a small-file
    scan (fewer splits than cores) would serialize the Python work on
    one or two workers.  When the input has fewer partitions than
    defaultParallelism, the narrow (id, text) projection is
    repartitioned first — one cheap exchange of the raw columns, far
    smaller than the per-shingle explode shuffle it replaces.  Inputs
    already wider than the cluster (the 100 TB case) pass through
    untouched."""
    if shingle_hash not in ("splitmix", "poly"):
        raise ValueError("shingle_hash must be 'splitmix' or 'poly'")
    hash_fn = _poly_shingle_set if shingle_hash == "poly" else _shingle_hash_set
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
                hu = hash_fn(text or "", shingle_k)
                # poly hashes are non-negative int64 — view as uint64 for
                # the modular signature arithmetic (same values)
                h31 = hu.view(np.uint64) % _M31  # < 2^31: a*h31+b < 2^62
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
