"""Bloom membership pre-filter (SURVEY §2.11 X46 — round 7): an
approximate, no-false-negative "is this key already in the corpus?"
gate that prunes shuffle work before an exact join decides.

Why: the incremental dedup step (dedup_incremental.DedupIndex) anti-joins
every new crawl batch against a corpus-sized fingerprint index.  In the
steady state MOST batch rows are new — they match nothing, yet still pay
the full shuffle of the exact anti-join.  A Bloom bitmap built from the
index's keys answers "definitely not present" map-side: only the rows
the bitmap flags as *possible* members (true dups + ~fpp false
positives) proceed to the exact join, so the join input shrinks from
|batch| to |dups| + fpp·|batch|.  No false negatives by construction —
the exact join only ever CONFIRMS candidate hits, so end results are
byte-identical with the filter on or off (pinned in
tests/test_dedup_incremental.py).

Why an Arrow kernel and not SQL: Spark's BloomFilterAggregate exists but
is NOT registered as a SQL-callable function in this build (probed
2026-08-14: `bloom_filter_agg` -> UNRESOLVED_ROUTINE; it is reserved for
the optimizer's runtime join filters).  So the bitmap is built with the
same mapInPandas kernel pattern as operators/minhash_kernel.py: keys are
hashed JVM-side with xxhash64 (one narrow long column through the
kernel), each partition sets bits in a local numpy bitmap (k positions
per key via Kirsch-Mitzenmacher double hashing over splitmix64 — pure
vectorized uint64 ops), and the partial bitmaps are OR-reduced on 16
executor tasks that STREAM their share one record at a time — at most
16 bitmaps reach the driver, and no task holds more than ~2x one
bitmap.
Probing is a vectorized pandas UDF over the same JVM-side hash, with the
bitmap shipped once per executor via a SparkContext broadcast.

100 TB shape: the build is one scan with NO row shuffle — the only
shuffled data is one round of #partitions bitmap rows into the 16
reduce tasks, so the driver sees ≤16 bitmaps regardless of partition
count (round 8; the round-7 driver-side OR moved #partitions × bitmap
bytes through the driver), and reduce-task memory stays ~2x one bitmap
regardless of fan-in (the rows stream through the pickle serializer,
not an Arrow batch).  Bitmap sizing
is the standard trade: ~9.6 bits/key at 1% fpp, so 1e9 indexed docs ≈
1.2 GB — fine as an executor broadcast, guarded here by ``max_bytes``
so a mis-sized request fails loudly instead of OOMing driver or
executors on the broadcast.  For blooms past a
few GB, raise ``fpp`` (5% ≈ 6.2 bits/key) or use the sharded index
(operators/bloom_sharded.py — per-shard bitmaps, no driver transit,
cogroup probe; round 8).  Membership depends only on
(key bytes, seed) — deterministic across runs, retries, and
partitionings, the same reproducibility contract as every hash in this
engine (no SipHash/randomized seeds).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F

_SALT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _splitmix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (same mix as minhash_kernel._finalize) —
    decorrelates the xxhash64 input into two independent-enough streams
    for double hashing."""
    h = h.copy()
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _positions(hashes: np.ndarray, n_hashes: int, n_bits: int) -> np.ndarray:
    """(k, n) bit positions via Kirsch-Mitzenmacher: pos_i = h1 + i*h2
    (mod n_bits).  Two derived 64-bit streams give the accuracy of k
    independent hashes (Kirsch & Mitzenmacher 2006); h2 is forced odd so
    the probe sequence never degenerates to a single position."""
    h = hashes.view(np.uint64)
    h1 = _splitmix64(h)
    h2 = _splitmix64(h ^ _SALT) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64).reshape(-1, 1)
    return ((h1 + i * h2) % np.uint64(n_bits)).astype(np.int64)


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (n_bits, n_hashes) for an expected load and target false-
    positive rate: n_bits = -n·ln p / ln²2, k = (m/n)·ln 2."""
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(1, expected_items)
    n_bits = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    n_bits = (n_bits + 7) // 8 * 8  # whole bytes
    n_hashes = max(1, round(n_bits / n * math.log(2)))
    return n_bits, n_hashes


@dataclass(frozen=True)
class BloomSpec:
    """A built bloom bitmap + the parameters that define membership.
    ``seed`` and ``n_hashes`` are identity: probing with different
    values than the build silently answers garbage (same contract as
    DedupIndex's signature parameters).  ``n_items`` is an audit-only
    load counter: the sizing estimate at build time plus every
    :func:`or_into` batch's rows — it never affects probing; use
    :func:`fill_ratio` (bit occupancy) for the authoritative health
    signal."""

    bits: bytes
    n_hashes: int
    seed: int
    n_items: int

    @property
    def n_bits(self) -> int:
        return len(self.bits) * 8


_OR_FANIN = 16  # partial bitmaps OR-reduced per executor-side round


def _bitmap_from_df(
    df: DataFrame, key: Column, n_bits: int, n_hashes: int, seed: int
) -> tuple[np.ndarray, int]:
    """The bitmap build under fixed parameters: one scan, no row
    shuffle — each partition contributes one n_bits/8-byte bitmap row
    (plus its row count, so callers never re-scan just to count).  The
    partial bitmaps are OR-reduced on ``_OR_FANIN`` executor tasks
    (VERDICT r7 #3): a multi-GB bloom over thousands of partitions
    moves ~16 bitmaps through the driver instead of thousands, and the
    reduce runs at PLAIN-RDD level so each task streams its share one
    record at a time — peak task memory ~2x one bitmap, where an Arrow
    stage would buffer a whole batch of bitmap rows (review r8).
    Shared by :func:`build_bloom`
    (fresh, fpp-sized) and the persisted-bloom append path (OR new keys
    into an existing bitmap, whose parameters are already fixed)."""
    hashed = df.select(F.xxhash64(key, F.lit(seed)).alias("__h"))

    def _partition_bitmap(batches):
        bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
        n = 0
        for pdf in batches:
            h = pdf["__h"].to_numpy(dtype=np.int64)
            if h.size == 0:
                continue
            n += h.size
            pos = _positions(h, n_hashes, n_bits).ravel()
            np.bitwise_or.at(
                bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
            )
        if n:
            yield pd.DataFrame({"bm": [bitmap.tobytes()], "n": [n]})

    def _or_stream(rows):
        # plain-RDD reduce, NOT an Arrow stage: the pickle serializer
        # hands records over ONE AT A TIME, so the task peaks at
        # ~2x bitmap (accumulator + current row) no matter how many
        # partials it folds — an Arrow mapInPandas here buffered a
        # whole fan-in of bitmap rows per batch, ~16x bitmap for
        # exactly the multi-GB case the reduce exists for (review r8)
        acc = None
        n = 0
        for bm, bn in rows:
            a = np.frombuffer(bm, dtype=np.uint8)
            if acc is None:
                acc = a.copy()
            else:
                np.bitwise_or(acc, a, out=acc)
            n += bn
        if acc is not None:
            yield (acc.tobytes(), n)

    partials = hashed.mapInPandas(_partition_bitmap, "bm binary, n long")
    rdd = partials.rdd.map(lambda r: (bytes(r["bm"]), int(r["n"])))
    if rdd.getNumPartitions() > _OR_FANIN:
        # repartition (a shuffle), not coalesce: narrow coalesce would
        # fuse the reduce into the scan stage and collapse the scan to
        # _OR_FANIN tasks; the shuffle streams bitmap rows through
        # disk and keeps the scan's parallelism
        rdd = rdd.repartition(_OR_FANIN).mapPartitions(_or_stream)
    rows = rdd.collect()
    acc = np.zeros(n_bits // 8, dtype=np.uint8)
    n_rows = 0
    for bm, bn in rows:
        acc |= np.frombuffer(bm, dtype=np.uint8)
        n_rows += bn
    return acc, n_rows


def build_bloom(
    df: DataFrame,
    key: str | Column,
    expected_items: int | None = None,
    fpp: float = 0.01,
    seed: int = 42,
    max_bytes: int = 1 << 28,
) -> BloomSpec:
    """Build a BloomSpec over ``key``'s values (see
    :func:`_bitmap_from_df` for the plan shape).  ``expected_items=None``
    counts the frame first (parquet-metadata-cheap for plain scans);
    pass the known cardinality to skip that job."""
    k = F.col(key) if isinstance(key, str) else key
    if expected_items is None:
        expected_items = df.count()
    n_bits, n_hashes = bloom_params(expected_items, fpp)
    if n_bits // 8 > max_bytes:
        raise ValueError(
            f"bloom of {n_bits // 8} bytes exceeds max_bytes={max_bytes}; "
            f"raise fpp, raise max_bytes, or shard the index"
        )
    acc, _ = _bitmap_from_df(df, k, n_bits, n_hashes, seed)
    return BloomSpec(
        bits=acc.tobytes(), n_hashes=n_hashes, seed=seed, n_items=expected_items
    )


def or_into(spec: BloomSpec, df: DataFrame, key: str | Column) -> BloomSpec:
    """New BloomSpec with ``key``'s values OR'd into ``spec``'s bitmap
    under the SAME (n_bits, n_hashes, seed) — the persisted-bloom append
    step.  Idempotent (re-setting bits is a no-op), so at-least-once
    replays of the same batch are safe.  The false-positive rate
    degrades as inserts exceed the bitmap's design load — monitor
    :func:`fill_ratio` (fpp ≈ fill^n_hashes; 50 % fill is the design
    point)."""
    k = F.col(key) if isinstance(key, str) else key
    # n_new rides out of the bitmap kernel — a separate df.count() here
    # made DedupIndex.append evaluate its batch frames twice (ADVICE r7)
    delta, n_new = _bitmap_from_df(df, k, spec.n_bits, spec.n_hashes, spec.seed)
    merged = np.frombuffer(spec.bits, dtype=np.uint8) | delta
    return BloomSpec(
        bits=merged.tobytes(),
        n_hashes=spec.n_hashes,
        seed=spec.seed,
        n_items=spec.n_items + n_new,
    )


def fill_ratio(spec: BloomSpec) -> float:
    """Fraction of set bits.  fpp ≈ fill^n_hashes: 0.5 is the design
    load; past ~0.6 the filter prunes little and should be rebuilt
    sized to the current corpus."""
    arr = np.frombuffer(spec.bits, dtype=np.uint8)
    if hasattr(np, "bitwise_count"):
        set_bits = int(np.bitwise_count(arr).sum())
    else:  # numpy < 2
        set_bits = int(np.unpackbits(arr).sum())
    return set_bits / spec.n_bits


_BLOOM_CHUNK = 16 << 20  # 16 MiB parquet cells; chunking keeps multi-GB
# bitmaps under parquet page limits and lets the read reassemble in order
_BLOOM_VERSION = 1


def write_bloom_table(spark: SparkSession, spec: BloomSpec, path: str) -> None:
    """Persist a BloomSpec as a tiny parquet table of bitmap chunks
    (chunk, bits, n_hashes, seed, n_items, n_chunks, version) — written
    through Spark so it lands on whatever filesystem the index lives on,
    with the atomicity of a parquet job commit (a torn write leaves a
    missing/unreadable table, which readers treat as 'no bloom', never a
    wrong one)."""
    from covid19i2b2_spark.fsutil import one_partition_df

    chunks = [
        spec.bits[off : off + _BLOOM_CHUNK]
        for off in range(0, max(len(spec.bits), 1), _BLOOM_CHUNK)
    ]
    rows = [
        (i, bytearray(c), spec.n_hashes, spec.seed, spec.n_items,
         len(chunks), _BLOOM_VERSION)
        for i, c in enumerate(chunks)
    ]
    # one_partition_df, NOT createDataFrame().coalesce(1): the coalesce
    # fused defaultParallelism mostly-empty Python partitions into one
    # task paying a sequential Python-runner handshake per parent —
    # 7-8 s per bloom-table write on local[32] (round 16)
    one_partition_df(
        spark,
        rows,
        "chunk int, bits binary, n_hashes int, seed long, n_items long,"
        " n_chunks int, version int",
    ).write.mode("overwrite").parquet(path)


def read_bloom_table(spark: SparkSession, path: str) -> BloomSpec | None:
    """Load a persisted BloomSpec, or None when absent/unreadable/
    incomplete — callers fall back to building a fresh bloom, so a
    missing table costs a rebuild, never correctness.  Absence is
    probed through the Hadoop FS API first (works on any filesystem;
    avoids the logged AnalysisException a read of a missing path
    emits on every bloom-less filter_batch call)."""
    from covid19i2b2_spark.fsutil import hadoop_fs

    fs, jpath = hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return None
    try:
        rows = spark.read.parquet(path).orderBy("chunk").collect()
    except Exception:
        return None
    if not rows or rows[0]["version"] != _BLOOM_VERSION:
        return None
    if len(rows) != rows[0]["n_chunks"]:
        return None  # torn write
    return BloomSpec(
        bits=b"".join(bytes(r["bits"]) for r in rows),
        n_hashes=rows[0]["n_hashes"],
        seed=rows[0]["seed"],
        n_items=rows[0]["n_items"],
    )


def bloom_table_present(spark: SparkSession, path: str) -> bool:
    """Whether a bloom table DIRECTORY exists at ``path`` — distinct
    from :func:`read_bloom_table` returning a spec: present-but-
    unreadable (torn write, transient FS failure) reads as None while
    this stays True.  Maintenance paths use the distinction to tell
    "never opted in" from "opted in but torn", which require opposite
    handling (skip vs self-heal/delete — ADVICE r7)."""
    from covid19i2b2_spark.fsutil import hadoop_fs

    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def delete_bloom_table(spark: SparkSession, path: str) -> None:
    """Remove a persisted bloom table (no-op when absent).  Used when a
    bloom could otherwise go STALE — e.g. the index is about to receive
    rows the unreadable bloom can't be OR-maintained with — because a
    missing bloom only costs a rebuild, while a stale one answers false
    negatives."""
    from covid19i2b2_spark.fsutil import hadoop_fs

    fs, jpath = hadoop_fs(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def might_contain(
    spec: BloomSpec, key: str | Column, resources: list | None = None
) -> Column:
    """Boolean Column: False means DEFINITELY not inserted under
    ``spec``; True means present or a ~fpp false positive.  The key is
    hashed JVM-side (xxhash64 with the spec's seed), so only one long
    column crosses into the vectorized probe UDF; the bitmap rides a
    SparkContext broadcast — shipped once per executor, not per task.

    ``resources``: optional list the broadcast handle is appended to,
    so long-running callers (streaming micro-batch loops) can
    ``.destroy()`` it once the probing plans have materialized —
    otherwise each call leaks one bitmap-sized broadcast for the
    session's lifetime (review r7)."""
    from pyspark.sql.functions import pandas_udf

    k = F.col(key) if isinstance(key, str) else key
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(spec.bits)
    if resources is not None:
        resources.append(bc)
    n_hashes, n_bits = spec.n_hashes, spec.n_bits

    @pandas_udf("boolean")
    def _probe(s: pd.Series) -> pd.Series:
        h = s.to_numpy(dtype=np.int64)
        if h.size == 0:
            return pd.Series([], dtype=bool)
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        pos = _positions(h, n_hashes, n_bits)
        hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=0).astype(bool))

    return _probe(F.xxhash64(k, F.lit(spec.seed)))
