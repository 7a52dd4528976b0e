"""X48 fuzzy string matching (operators/fuzzy.py): the blocking scheme
must be COMPLETE — every pair the brute-force cross join finds, the
q-gram prefix blocks + short pool must also find.  Equivalence is
checked against Spark's own crossJoin + levenshtein (the same engine
computes both sides, so only the BLOCKING is under test; cross-engine
value parity lives in tests/test_oracle_parity.py::q_fuzzy_pairs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.fuzzy import fuzzy_join, fuzzy_pairs


def _brute(df, max_dist):
    a = df.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
    b = df.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
    return {
        (r.id_a, r.id_b, r.d)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.levenshtein("sa", "sb").alias("d"))
        .filter(F.col("d") <= max_dist)
        .collect()
    }


# adversarial mix: typo families, shorts below every cutoff, empty,
# unicode, strings containing the padding char itself, length extremes
_WORDS = [
    "kitten", "sitten", "sittin", "sitting", "mitten",
    "apple", "appl", "aple", "apples", "dapple",
    "ab", "cd", "a", "b", "", "x", "xy", "yx",
    "naïve", "naive", "naïf",
    "\x01weird", "weird", "w\x01eird",
    "longishidenticalprefix-alpha", "longishidenticalprefix-alphb",
    "completely-different-string-zzz",
]


@pytest.mark.parametrize("max_dist,k", [(1, 2), (2, 2), (2, 3), (3, 2)])
def test_fuzzy_pairs_equals_brute_force(spark, max_dist, k):
    df = spark.createDataFrame(
        list(enumerate(_WORDS)), "id long, s string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "s", max_dist=max_dist, k=k).collect()
    }
    assert got == _brute(df, max_dist)


def test_fuzzy_pairs_short_pool_required(spark):
    """'ab' vs 'cd' share ZERO q-grams yet sit at distance 2 — only the
    short-string pool can find them; this pins that it does."""
    df = spark.createDataFrame(
        [(1, "ab"), (2, "cd"), (3, "abcdefgh")], "id long, s string"
    )
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_pairs(df, "id", "s", max_dist=2, k=3).collect()
    }
    assert (1, 2) in got


def test_fuzzy_pairs_null_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, None)], "id long, s string"
    )
    got = fuzzy_pairs(df, "id", "s", max_dist=1).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "s", max_dist=0)
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "s", max_dist=1, k=1)
    with pytest.raises(ValueError, match="short_cap"):
        short = spark.createDataFrame(
            [(i, "a") for i in range(5)], "id long, s string"
        )
        fuzzy_pairs(short, "id", "s", max_dist=1, short_cap=3)


def test_fuzzy_pairs_gram_cap_trades_completeness_loudly(spark, caplog):
    """gram_cap skips hot blocks (boilerplate grams) — pairs may be
    lost, but only WITH a warning, and survivors remain correct."""
    import logging

    rows = [(i, f"prefix-{i:03d}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, s string")
    with caplog.at_level(logging.WARNING):
        got = fuzzy_pairs(df, "id", "s", max_dist=1, gram_cap=5).collect()
    assert any("gram_cap" in r.message for r in caplog.records)
    full = _brute(df, 1)
    assert {(r.id_a, r.id_b, r.dist) for r in got} <= full


def test_fuzzy_join_two_tables(spark):
    left = spark.createDataFrame(
        [(1, "anthropic"), (2, "google"), (3, "xy")],
        "lid long, lname string",
    )
    right = spark.createDataFrame(
        [(10, "antropic"), (11, "googel"), (12, "meta"), (13, "yx")],
        "rid long, rname string",
    )
    got = {
        (r.lid, r.rid, r.dist)
        for r in fuzzy_join(
            left, right, "lname", "rname", max_dist=2
        ).collect()
    }
    # levenshtein: anthropic/antropic=1, google/googel=2, xy/yx=2
    assert got == {(1, 10, 1), (2, 11, 2), (3, 13, 2)}
    # distance above the threshold is excluded even when blocks collide
    strict = fuzzy_join(left, right, "lname", "rname", max_dist=1)
    assert {(r.lid, r.rid) for r in strict.collect()} == {(1, 10)}


def test_fuzzy_pairs_deterministic(spark):
    df = spark.createDataFrame(
        list(enumerate(_WORDS)), "id long, s string"
    )
    a = sorted(map(tuple, fuzzy_pairs(df, "id", "s", 2).collect()))
    b = sorted(
        map(tuple, fuzzy_pairs(df.repartition(13), "id", "s", 2).collect())
    )
    assert a == b
