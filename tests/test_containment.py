"""X62 containment join (operators/containment.py): planted
snippet-in-document detection, losslessness vs a brute-force
all-pairs reference (the prefix filter must be exact, not
approximate), threshold boundaries, asymmetry, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.containment import containment_pairs
from covid19i2b2_spark.operators.text import word_ngrams


def _brute(spark, df, threshold, n=2):
    """All-pairs exact containment — the reference the blocked plan
    must reproduce bit-for-bit."""
    g = df.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(word_ngrams(F.col("text"), n)).alias("g"),
    ).filter(F.size("g") > 0)
    a = g.select(F.col("id").alias("ca"), F.col("g").alias("ga"))
    b = g.select(F.col("id").alias("cb"), F.col("g").alias("gb"))
    c = F.size(F.array_intersect("ga", "gb")).cast("double") / F.size("ga")
    return sorted(
        (r["ca"], r["cb"], r["c"])
        for r in a.crossJoin(b)
        .filter(F.col("ca") != F.col("cb"))
        .filter(c >= threshold)
        .select("ca", "cb", F.floor(c * 1e6 + 0.5).alias("c"))
        .collect()
    )


def _got(df, threshold, n=2):
    return sorted(
        (r["containee_id"], r["container_id"],
         round(r["containment"] * 1e6))
        for r in containment_pairs(
            df, "doc_id", "text", threshold, n=n
        ).collect()
    )


def test_planted_snippet_found_asymmetrically(spark):
    """A snippet cut from a long doc must surface as
    (snippet contained-in doc) with containment 1.0 — and NOT the
    reverse direction at a high threshold (asymmetry is the point)."""
    long_text = " ".join(f"w{i}" for i in range(40))
    snippet = " ".join(f"w{i}" for i in range(10, 20))
    other = " ".join(f"z{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, long_text), (2, snippet), (3, other)],
        "doc_id long, text string",
    )
    got = containment_pairs(df, "doc_id", "text", 0.9).collect()
    pairs = {(r["containee_id"], r["container_id"]): r["containment"]
             for r in got}
    assert pairs == {(2, 1): 1.0}


def test_blocked_equals_brute_force(spark):
    """Losslessness: the prefix-filtered plan must equal all-pairs
    exact containment on a real slice — at a high and a low threshold
    (low thresholds shrink the prefix guarantee's slack, the regime
    where an off-by-one in the prefix size would show)."""
    from covid19i2b2_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 80)
    for t in (0.9, 0.5):
        assert _got(docs, t) == _brute(spark, docs, t), t


def test_threshold_boundary_and_validation(spark):
    """c exactly AT the threshold is kept (>=); the comparison runs on
    the unrounded ratio.  Bad parameters are loud."""
    # A has 4 bigrams; B holds exactly 2 of them -> c(A,B) = 0.5
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y")],
        "doc_id long, text string",
    )
    got = {(r["containee_id"], r["container_id"]): r["containment"]
           for r in containment_pairs(df, "doc_id", "text", 0.5).collect()}
    assert got[(1, 2)] == 0.5 and got[(2, 1)] == 0.5
    assert _got(df, 0.51) == []
    with pytest.raises(ValueError, match="threshold"):
        containment_pairs(df, "doc_id", "text", 0.0)
    with pytest.raises(ValueError, match="n must"):
        containment_pairs(df, "doc_id", "text", 0.5, n=0)


def test_prefix_bound_exact_at_float_hostile_thresholds(spark):
    """Regression (ADVICE r11 high): 1-0.8 = 0.19999999999999996 in
    double, so a bare floor((1-t)*glen) undercounts the pigeonhole
    bound by one whenever t*glen is an exact integer — t=0.8 with a
    5-bigram doc got a prefix of ONE gram instead of two.  Plant the
    worst case: A has exactly 5 bigrams, B holds 4 of them (c = 0.8,
    exactly at threshold), and the single missing gram is A's GLOBALLY
    RAREST — the one gram the too-short prefix would key on."""
    # A's bigrams: (a b), (b c), (c d), (d e), (e f).  B holds all but
    # (a b), which appears in no other doc — df 1, strictly rarest.
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "b c d e f")],
        "doc_id long, text string",
    )
    got = _got(df, 0.8)
    assert (1, 2, 800000) in got            # the pair the bug dropped
    assert got == _brute(spark, df, 0.8)
    # the t=0.9 / multiple-of-10 variant of the same rounding family:
    # A has 10 bigrams, B misses exactly the rarest one (c = 0.9)
    a10 = " ".join(f"w{i}" for i in range(11))          # w0..w10
    b10 = " ".join(f"w{i}" for i in range(1, 11))       # drops (w0 w1)
    df10 = spark.createDataFrame(
        [(1, a10), (2, b10)], "doc_id long, text string"
    )
    got10 = _got(df10, 0.9)
    assert (1, 2, 900000) in got10
    assert got10 == _brute(spark, df10, 0.9)


def test_short_docs_carry_no_evidence_and_determinism(spark):
    """Docs with < n tokens have no n-grams and appear on neither
    side; output is identical across partitionings."""
    rows = [(1, "only"), (2, "a b c d"), (3, "a b c d e"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _got(df, 0.8)
    ids = {x for p in got for x in p[:2]}
    assert 1 not in ids and 4 not in ids
    assert (2, 3, 1000000) in got          # "a b c d" inside "a b c d e"
    a = _got(df.repartition(7), 0.8)
    b = _got(df.repartition(2), 0.8)
    assert a == b == got
    # cache_handles path: same result, handle released by the caller
    handles: list = []
    cached = sorted(
        (r["containee_id"], r["container_id"],
         round(r["containment"] * 1e6))
        for r in containment_pairs(
            df, "doc_id", "text", 0.8, cache_handles=handles
        ).collect()
    )
    assert cached == got and len(handles) == 1
    handles[0].unpersist()


from hypothesis import given, settings, strategies as st  # noqa: E402

_WORDS = ["aa", "bb", "cc", "dd", "ee"]


@settings(max_examples=4, deadline=None)  # each example pays 2 full
# Spark plans (~4.5 s); 4 keeps the shared-vocab worst case exercised
# inside the driver's pytest window (VERDICT r15 #1)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8)
        .map(" ".join),
        min_size=2, max_size=7,
    ),
    threshold=st.sampled_from([0.34, 0.5, 0.75, 1.0]),
)
def test_blocked_equals_brute_force_property(spark, texts, threshold):
    """Hypothesis: on ARBITRARY tiny shared-vocab corpora (the
    worst case for prefix selectivity — every gram is common) the
    blocked plan still equals brute force at every threshold,
    including t=1.0 (prefix of exactly one gram)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert _got(df, threshold) == _brute(spark, df, threshold)
