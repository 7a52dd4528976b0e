"""X50: key-range-sharded Bloom index — the scale path past a single
bitmap's ``max_bytes`` guard (operators/bloom.py documents the trade:
"raise fpp ... or shard the index by key range and build one bloom per
shard"; this is that follow-on, round 8).

A single BloomSpec is driver-assembled and executor-broadcast — fine to
~1 GB, wrong for 10^10+ keys (a 1%-fpp bloom over 10^10 keys is
~12 GB).  The sharded index never materializes the whole bitmap
ANYWHERE:

- **Build**: keys are hashed JVM-side (one narrow long column), routed
  to ``n_shards`` by an independent salt of the same xxhash64, and
  repartitioned BY SHARD — so each shard's rows land wholly in one
  task, which sets bits in that shard's (small) bitmap and emits it as
  16 MiB parquet chunk rows.  The chunked table writes out
  ``partitionBy(shard)`` straight from the executors: the driver never
  sees a bitmap, and there is no OR-reduce at all (a shard has exactly
  one producer task).  One shuffle of 16 B/row (hash + shard), total.
- **Probe**: a COGROUP join in Pandas — but over a NARROW frame only
  (``__h`` + ``__shard``, ~16 B/row; VERDICT r8 #1): the probe frame's
  payload columns never enter the shuffle or the JVM→Arrow→pandas
  round trip.  Each task reassembles ONE shard's bitmap from its chunk
  rows, dedups the slice's hashes pandas-side (so the flag table is
  unique per (hash, shard) with no extra exchange), and tests only
  that shard's keys; the boolean then equi-joins BACK to the full
  frame on the recomputed (``__h``, ``__shard``) — a plain JVM join
  AQE can broadcast when the distinct-key set is small.  No broadcast
  of bitmaps, no driver transit, no executor-side filesystem access
  from Python; the chunk table is read by Spark like any other
  parquet.  An EMPTY shard (no keys ever routed there) simply has no
  chunk rows, and its probes answer False — the correct "contains
  nothing" semantics.  The payload-free cogroup costs one extra read
  of the probe frame's KEY column (column-pruned at the scan); the
  flat bloom's broadcast probe shows the per-row floor this now
  matches.

Per-task memory is one shard bitmap + one shard's slice of the probe
batch: size ``n_shards`` so both fit (``probe_splits`` further
subdivides the probe side when probing a corpus-sized frame — the
bitmap chunks replicate per split, the documented trade).

Same guarantees as the flat bloom: no false negatives ever (crash
mid-build leaves a missing/torn shard partition, which
``read.parquet`` surfaces as absent chunks — callers treat the INDEX
as unusable, not as empty; use the DedupIndex torn-table discipline),
~fpp false positives, fully deterministic in (key bytes, seed).

Cites: Kirsch & Mitzenmacher double hashing via operators/bloom.py
``_positions`` (shared code).  No reference-repo counterpart
(SURVEY §2.11 extension).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from covid19i2b2_spark.operators.bloom import (
    _BLOOM_CHUNK,
    _positions,
    bloom_params,
)

_SHARD_SALT = 0x5A11  # shard routing salts the SAME xxhash64 differently
# from position hashing, so shard choice and bit positions decorrelate
_VERSION = 1


@dataclass(frozen=True)
class ShardedBloomMeta:
    """Driver-side metadata only — never the bitmaps."""

    n_shards: int
    n_bits: int  # per shard
    n_hashes: int
    seed: int
    n_items: int  # total keys inserted at build


def _shard_of(key: Column, seed: int, n_shards: int) -> Column:
    return F.pmod(
        F.xxhash64(key, F.lit(seed + _SHARD_SALT)), F.lit(n_shards)
    ).cast("int")


def build_sharded_bloom(
    df: DataFrame,
    key: str | Column,
    path: str,
    n_shards: int = 16,
    expected_items: int | None = None,
    fpp: float = 0.01,
    seed: int = 42,
    max_bytes_per_shard: int = 1 << 28,
) -> ShardedBloomMeta:
    """Build and persist the sharded index at ``path``; returns the
    metadata (also stored in every chunk row, so
    :func:`read_sharded_meta` can recover it without a side file).
    Shards are sized for ``expected_items / n_shards`` keys each at
    ``fpp`` — the uniform hash split keeps true per-shard loads within
    sampling noise of that."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    k = F.col(key) if isinstance(key, str) else key
    if expected_items is None:
        expected_items = df.count()
    per_shard = max(1, -(-expected_items // n_shards))
    n_bits, n_hashes = bloom_params(per_shard, fpp)
    if n_bits // 8 > max_bytes_per_shard:
        raise ValueError(
            f"shard bitmap of {n_bits // 8} bytes exceeds "
            f"max_bytes_per_shard={max_bytes_per_shard}; raise n_shards,"
            f" fpp, or the guard"
        )
    hashed = df.select(
        F.xxhash64(k, F.lit(seed)).alias("__h"),
        _shard_of(k, seed, n_shards).alias("__shard"),
    ).repartition(n_shards, "__shard")

    def _shard_bitmaps(batches):
        # a partition may carry several shards (hash(shard) collisions)
        # but each shard is WHOLLY here — one bitmap per shard, no
        # cross-partition OR needed
        maps: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for pdf in batches:
            for shard, grp in pdf.groupby("__shard"):
                h = grp["__h"].to_numpy(dtype=np.int64)
                bm = maps.get(shard)
                if bm is None:
                    bm = maps[shard] = np.zeros(n_bits // 8, dtype=np.uint8)
                    counts[shard] = 0
                counts[shard] += h.size
                pos = _positions(h, n_hashes, n_bits).ravel()
                np.bitwise_or.at(
                    bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
        for shard, bm in maps.items():
            raw = bm.tobytes()
            chunks = [
                raw[off : off + _BLOOM_CHUNK]
                for off in range(0, max(len(raw), 1), _BLOOM_CHUNK)
            ]
            yield pd.DataFrame(
                {
                    "shard": np.int32(shard),
                    "chunk": np.arange(len(chunks), dtype=np.int32),
                    "bits": chunks,
                    "n_chunks": np.int32(len(chunks)),
                    "shard_items": np.int64(counts[shard]),
                }
            )

    rows = hashed.mapInPandas(
        _shard_bitmaps,
        "shard int, chunk int, bits binary, n_chunks int, shard_items long",
    )
    # sentinel meta row under shard=-1 (no probe ever routes there:
    # pmod is in [0, n_shards)) — keeps the index READABLE when the
    # build input is empty, so probes answer all-False ("contains
    # nothing") instead of FileNotFoundError (review r8); the flat
    # build_bloom's empty-input behavior, preserved
    spark = df.sparkSession
    sentinel = spark.createDataFrame(
        [(-1, -1, bytearray(b""), 0, 0)],
        "shard int, chunk int, bits binary, n_chunks int, shard_items long",
    )
    (
        rows.unionByName(sentinel)
        .withColumn("n_shards", F.lit(n_shards))
        .withColumn("n_bits", F.lit(n_bits))
        .withColumn("n_hashes", F.lit(n_hashes))
        .withColumn("seed", F.lit(seed).cast("long"))
        .withColumn("n_items", F.lit(expected_items).cast("long"))
        .withColumn("version", F.lit(_VERSION))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return ShardedBloomMeta(
        n_shards=n_shards,
        n_bits=n_bits,
        n_hashes=n_hashes,
        seed=seed,
        n_items=expected_items,
    )


def append_sharded_bloom(
    df: DataFrame,
    key: str | Column,
    path: str,
) -> ShardedBloomMeta:
    """OR a batch's keys into the persisted index under its FIXED
    parameters (the or_into of the sharded world).  Fully distributed:
    the batch's per-shard delta bitmaps (same kernel as the build)
    cogroup with the existing chunk rows per shard and OR chunk-wise —
    no bitmap ever crosses the driver.

    The merged table writes to a fresh ``_v<n>`` sibling and a tiny
    pointer file flips to it LAST, so a crash mid-append leaves the
    old version intact and readable (an index must never be half-new:
    a torn mix of old and new shards would answer false negatives for
    whichever half lost the race).  Bit-idempotent: re-appending the
    same batch re-sets the same bits (the shard_items audit count DOES
    double-count replays — it is informational, like the flat bloom's
    n_items).  Superseded versions are pruned after the flip; fill
    beyond the design load degrades fpp exactly like the flat bloom —
    rebuild when shard_items outgrow the per-shard design load."""
    spark = df.sparkSession
    meta = read_sharded_meta(spark, path)
    if meta is None:
        raise FileNotFoundError(
            f"no readable sharded bloom index at {path!r} — build it"
            f" first (append under unknown parameters would miss keys)"
        )
    k = F.col(key) if isinstance(key, str) else key
    n_bits, n_hashes = meta.n_bits, meta.n_hashes
    hashed = df.select(
        F.xxhash64(k, F.lit(meta.seed)).alias("__h"),
        _shard_of(k, meta.seed, meta.n_shards).alias("__shard"),
    ).repartition(meta.n_shards, "__shard")

    def _delta_bitmaps(batches):
        maps: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for pdf in batches:
            for shard, grp in pdf.groupby("__shard"):
                h = grp["__h"].to_numpy(dtype=np.int64)
                bm = maps.get(shard)
                if bm is None:
                    bm = maps[shard] = np.zeros(n_bits // 8, dtype=np.uint8)
                    counts[shard] = 0
                counts[shard] += h.size
                pos = _positions(h, n_hashes, n_bits).ravel()
                np.bitwise_or.at(
                    bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
        for shard, bm in maps.items():
            raw = bm.tobytes()
            chunks = [
                raw[off : off + _BLOOM_CHUNK]
                for off in range(0, max(len(raw), 1), _BLOOM_CHUNK)
            ]
            yield pd.DataFrame(
                {
                    "shard": np.int32(shard),
                    "chunk": np.arange(len(chunks), dtype=np.int32),
                    "bits": chunks,
                    "n_chunks": np.int32(len(chunks)),
                    "shard_items": np.int64(counts[shard]),
                }
            )

    schema = "shard int, chunk int, bits binary, n_chunks int, shard_items long"
    delta = hashed.mapInPandas(_delta_bitmaps, schema)
    old = _chunk_frame(spark, path).select(
        "shard", "chunk", "bits", "n_chunks", "shard_items"
    )

    def _or_chunks(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left = existing chunks of one shard, right = that shard's
        # delta.  A shard present on only one side passes through as-is
        # (new shard: first keys ever routed there; untouched shard:
        # no batch keys).  Both sides chunked identically (same n_bits
        # and _BLOOM_CHUNK), so the OR is positional per chunk row.
        if right.empty:
            return left
        if left.empty:
            return right
        left = left.sort_values("chunk").reset_index(drop=True)
        right = right.sort_values("chunk").reset_index(drop=True)
        if len(left) != len(right) or len(left) != int(
            left["n_chunks"].iloc[0]
        ):
            raise IOError(
                "append_sharded_bloom: shard chunk sets misaligned "
                f"({len(left)} existing vs {len(right)} delta) — the "
                "existing shard is torn; rebuild the index (OR-ing a "
                "torn shard would answer false negatives)"
            )
        merged = []
        for i in range(len(left)):
            a = np.frombuffer(left["bits"][i], dtype=np.uint8)
            b = np.frombuffer(right["bits"][i], dtype=np.uint8)
            merged.append((a | b).tobytes())
        out = left.copy()
        out["bits"] = merged
        out["shard_items"] = left["shard_items"] + right["shard_items"]
        return out

    merged = (
        old.groupBy("shard")
        .cogroup(delta.groupBy("shard"))
        .applyInPandas(_or_chunks, schema)
    )
    # the n_items COLUMN records the build-time estimate only; the live
    # total is derived from per-shard shard_items (which _or_chunks
    # accumulates) by read_sharded_meta — no extra agg on this hot path
    new_meta_items = meta.n_items
    versioned = (
        merged.withColumn("n_shards", F.lit(meta.n_shards))
        .withColumn("n_bits", F.lit(n_bits))
        .withColumn("n_hashes", F.lit(n_hashes))
        .withColumn("seed", F.lit(meta.seed).cast("long"))
        .withColumn("n_items", F.lit(new_meta_items).cast("long"))
        .withColumn("version", F.lit(_VERSION))
    )
    cur = _current_version(spark, path)
    nxt_dir = f"{path}/_v{cur + 1}"
    versioned.write.mode("overwrite").partitionBy("shard").parquet(nxt_dir)
    _flip_version(spark, path, cur + 1)
    return read_sharded_meta(spark, path, with_items=True)


def _pointer_path(path: str) -> str:
    return f"{path}/_CURRENT"


def _current_version(spark: SparkSession, path: str) -> int:
    """0 = the original flat layout at ``path`` itself (what
    build_sharded_bloom writes); n>0 = ``{path}/_v<n>``.

    An unparseable/empty pointer (torn write, reader racing the tiny
    rename window) AND a MISSING pointer both fall back to the HIGHEST
    fully-written ``_v`` dir — one carrying parquet's ``_SUCCESS``
    marker — instead of raising/returning-0 (ADVICE r8 #1 + review r9):
    a crash mid-flip must cost availability of the NEW version at
    worst, never make an intact index unreadable.  The missing case
    matters because ``_flip_version`` deletes the old pointer before
    renaming the new one over it — a crash in that gap leaves NO
    pointer while the root shard= layout was already pruned by an
    earlier flip, so "missing means version 0" would point readers at
    an empty root.  A fresh build (version 0, root layout intact) has
    no marked ``_v`` dirs, so the fallback still returns 0 there."""
    from covid19i2b2_spark.fsutil import hadoop_fs

    def _fallback() -> int:
        best = 0
        fs2, root = hadoop_fs(spark, path)
        jvm = spark._jvm  # noqa: SLF001
        if not fs2.exists(root):
            return 0
        for st in fs2.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("_v") and name[2:].isdigit():
                marker = jvm.org.apache.hadoop.fs.Path(
                    st.getPath(), "_SUCCESS"
                )
                if fs2.exists(marker):
                    best = max(best, int(name[2:]))
        return best

    fs, p = hadoop_fs(spark, _pointer_path(path))
    if not fs.exists(p):
        return _fallback()
    stream = fs.open(p)
    try:
        data = []
        while True:
            b = stream.read()
            if b < 0:
                break
            data.append(b)
        return int(bytes(data).decode())
    except (ValueError, UnicodeDecodeError):
        return _fallback()
    finally:
        stream.close()


def _flip_version(spark: SparkSession, path: str, version: int) -> None:
    """Point the index at a fully-written version dir — the LAST step
    of an append, so a crash before it leaves the previous version
    live; then prune superseded dirs (crash mid-prune only leaves
    garbage the pointer never references).  The pointer itself writes
    to ``_CURRENT.tmp`` and renames over ``_CURRENT`` (atomic on HDFS
    and local FS; ADVICE r8 #1) — ``create(overwrite)`` would expose a
    truncated pointer to a crash or a racing reader."""
    from covid19i2b2_spark.fsutil import hadoop_fs

    fs, p = hadoop_fs(spark, _pointer_path(path))
    tmp_p = hadoop_fs(spark, _pointer_path(path) + ".tmp")[1]
    out = fs.create(tmp_p, True)
    try:
        out.write(str(version).encode())
    finally:
        out.close()
    if fs.exists(p):
        # Hadoop rename refuses an existing destination on some FS
        # implementations; the delete->rename gap is covered by
        # _current_version's highest-marked-_v fallback
        fs.delete(p, False)
    if not fs.rename(tmp_p, p):
        raise IOError(
            f"could not flip version pointer at {_pointer_path(path)}"
        )
    _, root = hadoop_fs(spark, path)
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("_v") and name[2:].isdigit():
            if int(name[2:]) != version:
                fs.delete(st.getPath(), True)
        elif name.startswith("shard=") and version > 0:
            # the original build's root-level layout (version 0) is
            # superseded once any _v<n> is live; the pointer was
            # written FIRST, so a crash mid-delete leaves garbage no
            # reader references
            fs.delete(st.getPath(), True)


def _chunk_frame(spark: SparkSession, path: str) -> DataFrame:
    v = _current_version(spark, path)
    return spark.read.parquet(path if v == 0 else f"{path}/_v{v}")


def read_sharded_meta(
    spark: SparkSession, path: str, with_items: bool = False
) -> ShardedBloomMeta | None:
    """Metadata from any one chunk row (all rows carry it); None when
    the index is absent/unreadable — same missing-costs-a-rebuild,
    never-correctness contract as read_bloom_table.

    ``n_items`` defaults to the build-time estimate stored in the
    chunk rows — ONE ``limit(1)`` job, all the hot probe path needs
    (ADVICE r8 #2).  ``with_items=True`` additionally sums the live
    per-shard ``shard_items`` (which appends maintain) — the audit
    count callers use to decide when fill outgrows the design load."""
    from covid19i2b2_spark.fsutil import hadoop_fs

    fs, jpath = hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return None
    try:
        frame = _chunk_frame(spark, path)
        row = frame.limit(1).collect()
        if not row or row[0]["version"] != _VERSION:
            return None
        total = row[0]["n_items"]
        if with_items:
            total = (
                frame.groupBy("shard")
                .agg(F.first("shard_items").alias("si"))
                .agg(F.sum("si").alias("n"))
                .collect()[0]["n"]
            )
    except Exception:
        return None
    r = row[0]
    return ShardedBloomMeta(
        n_shards=r["n_shards"],
        n_bits=r["n_bits"],
        n_hashes=r["n_hashes"],
        seed=r["seed"],
        n_items=int(total or 0),
    )


def sharded_bloom_health(spark: SparkSession, path: str) -> dict:
    """The fill_ratio analog for the sharded index (round 9): per-shard
    live item counts vs the per-shard design load the bitmaps were
    sized for.  ``load_ratio`` > ~1.5 means fpp has degraded well past
    the target and the caller should rebuild sized to the current
    population (appends maintain shard_items, so replays inflate the
    counts — the signal is conservative, like the flat bloom's
    n_items).  One small aggregate over the chunk table; a maintenance
    call, not a probe-path cost."""
    meta = read_sharded_meta(spark, path)
    if meta is None:
        raise FileNotFoundError(
            f"no readable sharded bloom index at {path!r}"
        )
    per_shard = (
        _chunk_frame(spark, path)
        .filter(F.col("shard") >= 0)
        .groupBy("shard")
        .agg(F.first("shard_items").alias("si"))
        .agg(
            F.count("*").alias("shards"),
            F.sum("si").alias("total"),
            F.max("si").alias("max"),
            F.avg("si").alias("mean"),
        )
        .collect()[0]
    )
    design_per_shard = max(1, -(-meta.n_items // meta.n_shards))
    max_items = int(per_shard["max"] or 0)
    return {
        "n_shards": meta.n_shards,
        "live_shards": int(per_shard["shards"] or 0),
        "design_items_per_shard": design_per_shard,
        "total_items": int(per_shard["total"] or 0),
        "max_shard_items": max_items,
        "mean_shard_items": round(float(per_shard["mean"] or 0.0), 1),
        "load_ratio": round(max_items / design_per_shard, 4),
    }


def sharded_bloom_flags(
    df: DataFrame,
    key: str | Column,
    path: str,
    flag_col: str = "might_contain",
    probe_splits: int = 1,
) -> DataFrame:
    """``df`` plus a boolean ``flag_col``: False = key DEFINITELY never
    inserted; True = inserted or a ~fpp false positive.  The NARROW
    cogroup probe described in the module docstring (VERDICT r8 #1) —
    per task: one shard bitmap + that shard's slice of (hash, shard)
    rows; payload columns ride a plain JVM equi-join afterwards, never
    the Arrow round trip.

    ``probe_splits`` > 1 subdivides each shard's probe rows into that
    many cogroup keys (the chunk rows replicate per split — bitmap
    bytes through the shuffle grow by the factor, probe memory shrinks
    by it); use when probing corpus-sized frames whose per-shard
    DISTINCT-hash slice wouldn't fit a task."""
    spark = df.sparkSession
    meta = read_sharded_meta(spark, path)
    if meta is None:
        raise FileNotFoundError(
            f"no readable sharded bloom index at {path!r} — build it "
            f"with build_sharded_bloom (absent/torn indexes are "
            f"unusable, NOT empty: treating them as empty would answer "
            f"false negatives)"
        )
    if probe_splits < 1:
        raise ValueError(f"probe_splits must be >= 1, got {probe_splits}")
    k = F.col(key) if isinstance(key, str) else key
    n_bits, n_hashes = meta.n_bits, meta.n_hashes
    probes = df.withColumn("__h", F.xxhash64(k, F.lit(meta.seed))).withColumn(
        "__shard", _shard_of(k, meta.seed, meta.n_shards)
    )
    # the cogroup side carries ONLY the 16 B key pair (+ the split id,
    # itself a function of __h — so per-group pandas dedup on __h is a
    # GLOBAL dedup, and the flag table joins back 1:N without its own
    # distinct() exchange)
    narrow = probes.select("__h", "__shard")
    chunks = _chunk_frame(spark, path).select(
        "shard", "chunk", "bits", "n_chunks"
    )
    if probe_splits > 1:
        narrow = narrow.withColumn(
            "__split",
            F.pmod(F.xxhash64("__h", F.lit(1)), F.lit(probe_splits)).cast(
                "int"
            ),
        )
        chunks = chunks.crossJoin(
            spark.range(probe_splits).select(
                F.col("id").cast("int").alias("__split")
            )
        )
    else:
        narrow = narrow.withColumn("__split", F.lit(0))
        chunks = chunks.withColumn("__split", F.lit(0))

    out_schema = StructType(
        [
            StructField("__h", LongType()),
            StructField("__shard", IntegerType()),
            StructField(flag_col, BooleanType()),
        ]
    )

    def _probe_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.drop_duplicates(subset=["__h"])[["__h", "__shard"]]
        if left.empty:
            return left.assign(**{flag_col: pd.Series([], dtype=bool)})
        if right.empty:
            # shard never received a key at build: contains nothing
            return left.assign(**{flag_col: False})
        right = right.drop_duplicates(subset=["chunk"]).sort_values("chunk")
        if len(right) != int(right["n_chunks"].iloc[0]):
            raise IOError(
                "sharded bloom: shard chunk set is torn (have "
                f"{len(right)}, expected {int(right['n_chunks'].iloc[0])})"
                " — rebuild the index; probing a torn shard could answer"
                " false negatives"
            )
        bits = np.frombuffer(b"".join(right["bits"]), dtype=np.uint8)
        h = left["__h"].to_numpy(dtype=np.int64)
        pos = _positions(h, n_hashes, n_bits)
        hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return left.assign(**{flag_col: hit.all(axis=0).astype(bool)})

    grouped = narrow.groupBy("__shard", "__split").cogroup(
        chunks.groupBy("shard", "__split")
    )
    flags = grouped.applyInPandas(_probe_group, out_schema)
    # join the boolean back to the payload: inner on the recomputed key
    # pair (xxhash64 is non-NULL even for NULL keys, so every row
    # matches exactly once); AQE broadcasts the flag table when the
    # distinct-key set is small — the corpus then pays no exchange
    return probes.join(flags, ["__h", "__shard"]).drop("__h", "__shard")


def sharded_bloom_filter(
    df: DataFrame,
    key: str | Column,
    path: str,
    keep: str = "maybe",
    probe_splits: int = 1,
) -> DataFrame:
    """Filter ``df`` through the index: ``keep='maybe'`` keeps rows the
    index may contain (the pre-filter in front of an exact join);
    ``keep='new'`` keeps rows DEFINITELY not in the index (safe to
    treat as fresh without any exact check — no false negatives)."""
    if keep not in ("maybe", "new"):
        raise ValueError(f"keep must be 'maybe' or 'new', got {keep!r}")
    flagged = sharded_bloom_flags(
        df, key, path, flag_col="__mc", probe_splits=probe_splits
    )
    cond = F.col("__mc") if keep == "maybe" else ~F.col("__mc")
    return flagged.filter(cond).drop("__mc")
