"""X50 sharded bloom index (operators/bloom_sharded.py): the no-false-
negative contract per shard, fpp band, empty-shard semantics, torn-
shard refusal, probe_splits equivalence, determinism, and the plan
shape (cogroup probe — no broadcast, no Python except the one
FlatMapCoGroupsInPandas)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.bloom_sharded import (
    build_sharded_bloom,
    read_sharded_meta,
    sharded_bloom_filter,
    sharded_bloom_flags,
)


def _keys(spark, lo, hi, name="k"):
    return spark.range(lo, hi).selectExpr(f"concat('key-', id) as {name}")


def test_no_false_negatives_and_fpp_band(spark, tmp_path):
    path = str(tmp_path / "sbloom")
    inserted = _keys(spark, 0, 20_000)
    meta = build_sharded_bloom(inserted, "k", path, n_shards=8, fpp=0.01)
    assert meta.n_shards == 8 and meta.n_items == 20_000
    assert read_sharded_meta(spark, path) == meta
    # every inserted key answers True — the hard guarantee
    flags = sharded_bloom_flags(inserted, "k", path)
    assert flags.filter(~F.col("might_contain")).count() == 0
    # disjoint keys answer True at ~fpp
    fresh = _keys(spark, 1_000_000, 1_020_000)
    fp = sharded_bloom_flags(fresh, "k", path).filter(
        F.col("might_contain")
    ).count()
    assert fp / 20_000 < 0.03  # 3x headroom over fpp=0.01
    # filter modes partition the frame
    maybe = sharded_bloom_filter(fresh, "k", path, keep="maybe").count()
    new = sharded_bloom_filter(fresh, "k", path, keep="new").count()
    assert maybe == fp and maybe + new == 20_000


def test_empty_shards_answer_false(spark, tmp_path):
    """64 shards over 50 keys leaves most shards with no chunk rows —
    probes routed there must answer False (contains nothing), not fail
    or answer True."""
    path = str(tmp_path / "sparse")
    build_sharded_bloom(_keys(spark, 0, 50), "k", path, n_shards=64)
    probe = _keys(spark, 10_000, 12_000)
    flagged = sharded_bloom_flags(probe, "k", path)
    assert flagged.count() == 2_000
    assert flagged.filter(F.col("might_contain")).count() < 2_000 * 0.2
    ins = sharded_bloom_flags(_keys(spark, 0, 50), "k", path)
    assert ins.filter(~F.col("might_contain")).count() == 0


def test_probe_splits_equivalent(spark, tmp_path):
    path = str(tmp_path / "splits")
    build_sharded_bloom(_keys(spark, 0, 5_000), "k", path, n_shards=4)
    probe = _keys(spark, 2_500, 7_500)
    base = {
        r["k"]: r["might_contain"]
        for r in sharded_bloom_flags(probe, "k", path).collect()
    }
    split = {
        r["k"]: r["might_contain"]
        for r in sharded_bloom_flags(
            probe, "k", path, probe_splits=5
        ).collect()
    }
    assert base == split
    with pytest.raises(ValueError):
        sharded_bloom_flags(probe, "k", path, probe_splits=0)


def test_deterministic_across_partitionings(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    df = _keys(spark, 0, 3_000)
    build_sharded_bloom(df, "k", p1, n_shards=4)
    build_sharded_bloom(df.repartition(17), "k", p2, n_shards=4)
    probe = _keys(spark, 0, 6_000)
    a = sorted(map(tuple, sharded_bloom_flags(probe, "k", p1).collect()))
    b = sorted(map(tuple, sharded_bloom_flags(probe, "k", p2).collect()))
    assert a == b


def test_absent_and_torn_index_refused(spark, tmp_path):
    import pathlib

    with pytest.raises(FileNotFoundError):
        sharded_bloom_flags(_keys(spark, 0, 5), "k", str(tmp_path / "nope"))
    # torn shard: delete one chunk's parquet file from a multi-chunk
    # shard is hard to stage at this size; instead corrupt by dropping
    # rows — rewrite one shard partition with a wrong n_chunks claim
    path = str(tmp_path / "torn")
    build_sharded_bloom(_keys(spark, 0, 2_000), "k", path, n_shards=2)
    sdf = spark.read.parquet(path)
    broken = sdf.withColumn(
        "n_chunks", F.lit(2)  # claim 2 chunks; only 1 exists
    )
    out = str(tmp_path / "torn2")
    broken.write.partitionBy("shard").parquet(out)
    with pytest.raises(Exception, match="torn"):
        sharded_bloom_flags(_keys(spark, 0, 100), "k", out).collect()


def test_build_guards(spark, tmp_path):
    df = _keys(spark, 0, 100)
    with pytest.raises(ValueError):
        build_sharded_bloom(df, "k", str(tmp_path / "x"), n_shards=0)
    with pytest.raises(ValueError, match="max_bytes_per_shard"):
        build_sharded_bloom(
            df,
            "k",
            str(tmp_path / "y"),
            n_shards=1,
            expected_items=10**9,
            max_bytes_per_shard=1 << 20,
        )


def test_probe_plan_is_cogroup_no_broadcast(spark, tmp_path):
    """VERDICT r8 #1: the cogroup must be NARROW — its probe-side input
    carries only (__h, __shard, __split), never payload columns (those
    join the boolean back JVM-side) — and bitmap chunk rows must never
    ride a BroadcastExchange (a broadcast of the small flag/payload
    side of the join-back is fine; that is the AQE fast path)."""
    import contextlib
    import io

    path = str(tmp_path / "plan")
    build_sharded_bloom(_keys(spark, 0, 1_000), "k", path, n_shards=4)
    probe = spark.range(0, 1_000).selectExpr(
        "concat('key-', id) as k", "repeat('x', 50) as payload"
    )
    flagged = sharded_bloom_flags(probe, "k", path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        flagged.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapCoGroupsInPandas" in plan
    # payload columns stay out of the Arrow cogroup: the node's left
    # (probe) input lists only the narrow key pair + split id
    cg_left = [
        line
        for line in plan.splitlines()
        if line.startswith("Left output")
    ]
    assert cg_left and all("payload" not in line for line in cg_left), plan
    assert "payload" in plan  # ...but the payload survives to the output
    # bitmaps never ride a broadcast: no BroadcastExchange block may
    # carry the chunk table's bits column
    for block in plan.split("\n\n"):
        if "BroadcastExchange" in block.splitlines()[0]:
            assert "bits#" not in block, block


def test_empty_build_probes_all_false(spark, tmp_path):
    """Review r8: building over an EMPTY frame must still leave a
    readable index (sentinel meta row) whose probes answer all-False —
    the flat build_bloom's empty-input semantics, not a
    FileNotFoundError on first probe of an initially-empty corpus."""
    path = str(tmp_path / "empty")
    meta = build_sharded_bloom(
        _keys(spark, 0, 0), "k", path, n_shards=4
    )
    assert meta.n_items == 0
    assert read_sharded_meta(spark, path) is not None
    flagged = sharded_bloom_flags(_keys(spark, 0, 100), "k", path)
    assert flagged.count() == 100
    assert flagged.filter(F.col("might_contain")).count() == 0


def test_append_maintains_index(spark, tmp_path):
    """append_sharded_bloom: appended keys become members with zero
    false negatives (old AND new), version flip is atomic-by-pointer
    (superseded layouts pruned), re-appending the same batch changes
    no bits, and an append to a missing index refuses."""
    from covid19i2b2_spark.operators.bloom_sharded import (
        append_sharded_bloom,
        _chunk_frame,
    )

    path = str(tmp_path / "appendix")
    first = _keys(spark, 0, 5_000)
    build_sharded_bloom(first, "k", path, n_shards=8, expected_items=15_000)
    second = _keys(spark, 5_000, 10_000)
    meta2 = append_sharded_bloom(second, "k", path)
    assert meta2.n_items == 10_000  # live shard_items total
    both = _keys(spark, 0, 10_000)
    assert (
        sharded_bloom_flags(both, "k", path)
        .filter(~F.col("might_contain"))
        .count()
        == 0
    )
    # fpp still bounded (index sized for 15k, holds 10k)
    fresh = _keys(spark, 2_000_000, 2_010_000)
    fp = sharded_bloom_flags(fresh, "k", path).filter(
        F.col("might_contain")
    ).count()
    assert fp / 10_000 < 0.05

    # bit-idempotent replay: same batch again -> identical bitmaps
    bits_before = {
        (r["shard"], r["chunk"]): bytes(r["bits"])
        for r in _chunk_frame(spark, path).collect()
    }
    append_sharded_bloom(second, "k", path)
    bits_after = {
        (r["shard"], r["chunk"]): bytes(r["bits"])
        for r in _chunk_frame(spark, path).collect()
    }
    assert bits_before == bits_after

    # superseded layouts pruned: only the live _v2 remains
    import os

    entries = sorted(os.listdir(path))
    assert "_v2" in entries and "_v1" not in entries
    assert not any(e.startswith("shard=") for e in entries)

    with pytest.raises(FileNotFoundError):
        append_sharded_bloom(second, "k", str(tmp_path / "missing"))


def test_torn_version_pointer_falls_back(spark, tmp_path):
    """ADVICE r8 #1: a torn/empty ``_CURRENT`` pointer (crash mid-flip,
    reader racing the rename) must fall back to the highest fully
    written ``_v`` dir — the index stays readable and answers with
    zero false negatives, instead of FileNotFoundError until a manual
    rebuild."""
    from covid19i2b2_spark.operators.bloom_sharded import (
        _current_version,
        append_sharded_bloom,
    )

    path = str(tmp_path / "tornptr")
    build_sharded_bloom(_keys(spark, 0, 2_000), "k", path, n_shards=4,
                        expected_items=4_000)
    append_sharded_bloom(_keys(spark, 2_000, 4_000), "k", path)
    assert _current_version(spark, path) == 1
    for garbage in (b"", b"not-a-number"):
        with open(f"{path}/_CURRENT", "wb") as f:
            f.write(garbage)
        # drop the Hadoop local-FS checksum sidecar: the out-of-band
        # edit above invalidates it (memory: crc sidecars fail reads)
        import os

        crc = f"{path}/._CURRENT.crc"
        if os.path.exists(crc):
            os.remove(crc)
        assert _current_version(spark, path) == 1
        meta = read_sharded_meta(spark, path)
        assert meta is not None
        flags = sharded_bloom_flags(_keys(spark, 0, 4_000), "k", path)
        assert flags.filter(~F.col("might_contain")).count() == 0
    # MISSING pointer (review r9): _flip_version deletes the old
    # pointer before renaming the new one over it — a crash in that
    # gap leaves NO pointer while the root layout was already pruned;
    # readers must still find the highest marked _v dir, not "0"
    import os as _os

    _os.remove(f"{path}/_CURRENT")
    crc2 = f"{path}/._CURRENT.crc"
    if _os.path.exists(crc2):
        _os.remove(crc2)
    assert _current_version(spark, path) == 1
    assert read_sharded_meta(spark, path) is not None
    flags = sharded_bloom_flags(_keys(spark, 0, 4_000), "k", path)
    assert flags.filter(~F.col("might_contain")).count() == 0


def test_append_then_probe_matches_one_shot_build(spark, tmp_path):
    """Membership after build(A) + append(B) equals build(A ∪ B) under
    the same parameters — bit-for-bit, since bits depend only on
    (key bytes, seed, n_bits)."""
    from covid19i2b2_spark.operators.bloom_sharded import (
        append_sharded_bloom,
        _chunk_frame,
    )

    a, b = _keys(spark, 0, 3_000), _keys(spark, 3_000, 6_000)
    p_inc = str(tmp_path / "inc")
    build_sharded_bloom(a, "k", p_inc, n_shards=4, expected_items=6_000)
    append_sharded_bloom(b, "k", p_inc)
    p_one = str(tmp_path / "one")
    build_sharded_bloom(
        a.unionByName(b), "k", p_one, n_shards=4, expected_items=6_000
    )
    inc_bits = {
        (r["shard"], r["chunk"]): bytes(r["bits"])
        for r in _chunk_frame(spark, p_inc).collect()
        if r["shard"] >= 0
    }
    one_bits = {
        (r["shard"], r["chunk"]): bytes(r["bits"])
        for r in _chunk_frame(spark, p_one).collect()
        if r["shard"] >= 0
    }
    assert inc_bits == one_bits


def test_sharded_bloom_health_signal(spark, tmp_path):
    """sharded_bloom_health: load_ratio tracks live shard_items against
    the per-shard design load — ~0.5 at half fill, >1 once appends
    outgrow the build sizing (the rebuild cue)."""
    from covid19i2b2_spark.operators.bloom_sharded import (
        append_sharded_bloom,
        sharded_bloom_health,
    )

    path = str(tmp_path / "health")
    build_sharded_bloom(
        _keys(spark, 0, 4_000), "k", path, n_shards=4, expected_items=8_000
    )
    h = sharded_bloom_health(spark, path)
    assert h["n_shards"] == 4 and h["total_items"] == 4_000
    assert h["design_items_per_shard"] == 2_000
    assert 0.3 < h["load_ratio"] < 0.8  # ~half the design load
    append_sharded_bloom(_keys(spark, 4_000, 16_000), "k", path)
    h2 = sharded_bloom_health(spark, path)
    assert h2["total_items"] == 16_000
    assert h2["load_ratio"] > 1.5  # outgrew the sizing: rebuild cue
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        sharded_bloom_health(spark, str(tmp_path / "missing"))
