"""X92 media perceptual near-dup (operators/media_dedup.py): expr and
Arrow-kernel signatures bit-identical; byte-level perturbations stay
Hamming-adjacent and are recovered by the pigeonhole index; unrelated
payloads are not paired; sub-grid payloads drop; python reference
replay of the block arithmetic."""

from __future__ import annotations

import pytest

from covid19i2b2_spark.operators.media_dedup import (
    GRID_CELLS,
    hamming_pairs_multi_index,
    media_blockhash,
    media_near_dup_pairs,
)


def _py_phash(buf: bytes) -> int:
    """Pure-python replay of the blockhash arithmetic (module
    docstring): block of byte i = i*C // n, cross-multiplied adjacent
    block-sum comparisons, signed 64-bit wrap at bit 63."""
    n = len(buf)
    sums = [0] * GRID_CELLS
    cnts = [0] * GRID_CELLS
    for i, v in enumerate(buf):
        b = i * GRID_CELLS // n
        sums[b] += v
        cnts[b] += 1
    sig = 0
    for b in range(64):
        if sums[b + 1] * cnts[b] > sums[b] * cnts[b + 1]:
            sig += 1 << b
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def _seeded_payload(seed: int, n: int = 400) -> bytes:
    """Deterministic pseudo-random bytes (LCG — no RNG module, stable
    across runs and platforms)."""
    x, out = seed * 2654435761 % (2**32) or 1, bytearray()
    for _ in range(n):
        x = (1103515245 * x + 12345) % (2**31)
        out.append(x % 251)
    return bytes(out)


def _perturb(buf: bytes, positions: list[int], delta: int = 7) -> bytes:
    out = bytearray(buf)
    for p in positions:
        out[p] = (out[p] + delta) % 256
    return bytes(out)


def _media_df(spark, payloads: dict[int, bytes]):
    return spark.createDataFrame(
        list(payloads.items()), "media_id long, payload binary"
    )


def test_expr_and_kernel_signatures_identical(spark):
    payloads = {i: _seeded_payload(i) for i in range(1, 13)}
    payloads[99] = bytes(range(65, 200))  # structured ramp
    df = _media_df(spark, payloads)
    expr = {
        r["media_id"]: r["phash"]
        for r in media_blockhash(df, impl="expr").collect()
    }
    kern = {
        r["media_id"]: r["phash"]
        for r in media_blockhash(df, impl="kernel").collect()
    }
    assert expr == kern
    # and both equal the pure-python replay
    for mid, buf in payloads.items():
        assert expr[mid] == _py_phash(buf), mid


def test_sub_grid_payloads_drop(spark):
    df = _media_df(
        spark, {1: b"x" * (GRID_CELLS - 1), 2: b"y" * GRID_CELLS}
    )
    for impl in ("expr", "kernel"):
        got = {r["media_id"] for r in media_blockhash(df, impl=impl).collect()}
        assert got == {2}, impl


def test_perturbed_payloads_found_unrelated_not(spark):
    """Planted-transform recall (VERDICT r14 next #4): byte-level
    perturbations of a payload (scattered flipped bytes — re-encode /
    metadata noise at fixed length) stay within the Hamming budget and
    are recovered as pairs; unrelated payloads are not paired; and a
    TRUNCATED payload lands far — block boundaries are i*C//n, so a
    changed n realigns every block (the documented raw-byte contract:
    length-changing edits need the decoded-pixel path, like crops do
    for real pHash)."""
    base_a = _seeded_payload(1)
    base_b = _seeded_payload(2)
    payloads = {
        1: base_a,
        # a few scattered flipped bytes (re-encode / metadata noise)
        11: _perturb(base_a, [3, 97, 211, 390]),
        # heavier perturbation, still length-preserving
        12: _perturb(base_a, list(range(0, 400, 50)), delta=25),
        # truncated trailer: realigns blocks -> NOT a near-dup here
        13: base_a[:-9],
        2: base_b,
        21: _perturb(base_b, [50, 260]),
        # unrelated payloads
        3: _seeded_payload(33),
        4: _seeded_payload(44),
    }
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_near_dup_pairs(
            _media_df(spark, payloads), max_hamming=8
        ).collect()
    }
    assert (1, 11) in pairs
    assert (1, 12) in pairs
    assert (2, 21) in pairs
    assert (1, 13) not in pairs  # truncation realigns the grid
    # unrelated ids never pair with anything
    flat = {i for p in pairs for i in p}
    assert 3 not in flat and 4 not in flat
    # and the verify stage reports real distances
    assert all(0 <= h <= 8 for h in pairs.values())


def test_hamming_index_matches_brute_force(spark):
    """The pigeonhole index finds EXACTLY the brute-force pair set at
    the budget (recall guarantee + verify-stage precision)."""
    payloads = {i: _seeded_payload(i * 7) for i in range(1, 10)}
    payloads[101] = _perturb(payloads[1], [10, 20])
    payloads[102] = _perturb(payloads[5], [300])
    df = _media_df(spark, payloads)
    sigs = {r["media_id"]: r["phash"] for r in media_blockhash(df).collect()}
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 6:
                want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup_pairs(df, max_hamming=6).collect()
    }
    assert got == want


def test_bucket_cap_skips_loudly(spark, caplog):
    """Constant payloads concentrate signatures into one bucket; the
    cap excludes the bucket and logs, never silently joins."""
    import logging

    payloads = {i: bytes([7]) * 200 for i in range(1, 30)}
    df = _media_df(spark, payloads)
    sigs = media_blockhash(df)
    from covid19i2b2_spark.operators.dedup import drain_cap_logs

    with caplog.at_level(logging.WARNING):
        got = hamming_pairs_multi_index(
            sigs, "media_id", "phash", 2, bucket_cap=5
        ).collect()
        # the cap warning is observation-driven: it fires on a daemon
        # thread once the action above completes, so wait for it
        drain_cap_logs()
    assert got == []  # every bucket oversized -> all skipped
    assert any("bucket_cap" in r.message for r in caplog.records)


def test_multi_index_validation():
    with pytest.raises(ValueError, match="n_chunks"):
        hamming_pairs_multi_index(None, "id", "s", 4, n_chunks=5)
