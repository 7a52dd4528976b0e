"""Property tests for the obfuscation pass (SURVEY.md §5.2 item 3) —
hypothesis drives configs; invariants must hold for every one."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from covid19i2b2_spark.operators.obfuscation import (
    MASKED,
    ObfuscationConfig,
    obfuscate_counts,
    seeded_noise,
)


@settings(max_examples=12, deadline=None)
@given(
    blur=st.integers(min_value=0, max_value=5),
    mask=st.integers(min_value=0, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_obfuscation_invariants(spark, blur, mask, seed):
    counts = spark.createDataFrame(
        [(i, (i * 37) % 50) for i in range(60)], "k long, n long"
    )
    cfg = ObfuscationConfig(blur=blur, small_count_mask=mask, seed=seed)
    out = obfuscate_counts(counts, ["n"], ["k"], cfg).collect()
    raw = {i: (i * 37) % 50 for i in range(60)}
    for r in out:
        orig = raw[r.k]
        if orig < mask:
            assert r.n == MASKED  # masked iff below threshold
        else:
            assert abs(r.n - orig) <= blur or r.n == 0  # |noise| <= blur
            assert r.n >= 0  # blur never drives counts negative


@settings(max_examples=8, deadline=None)
@given(
    blur=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_noise_is_deterministic_per_key(spark, blur, seed):
    """Same (keys, seed) -> same noise on every evaluation — the retry-
    safety property F.rand() lacks (SURVEY.md F13)."""
    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    noisy = df.select("k", seeded_noise(["k"], blur, seed).alias("noise"))
    a = {r.k: r.noise for r in noisy.collect()}
    b = {r.k: r.noise for r in noisy.collect()}
    assert a == b
    assert all(-blur <= v <= blur for v in a.values())
    # and not constant (blur>0 should actually perturb across keys)
    if blur > 0:
        assert len(set(a.values())) > 1


def test_delete_mode_drops_masked_rows(spark):
    counts = spark.createDataFrame([(1, 3), (2, 30), (3, 9)], "k long, n long")
    cfg = ObfuscationConfig(blur=0, small_count_mask=10, small_count_delete=True)
    out = obfuscate_counts(counts, ["n"], ["k"], cfg).collect()
    assert {r.k for r in out} == {2}
