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


# (2,2) dropped round 16: interior point of the (1,2)/(2,3)/(3,2)
# grid, no distinct regime (driver pytest window)
@pytest.mark.parametrize("max_dist,k", [(1, 2), (2, 3), (3, 2)])
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


@pytest.mark.parametrize("max_dist,k", [(1, 2), (2, 3)])
def test_fuzzy_pairs_rare_order_equals_brute_force(spark, max_dist, k):
    """gram_order='rare' (round 9): the idf-ascending prefix is a
    different global gram order — completeness must hold identically
    (any consistent total order satisfies the prefix-filter proof)."""
    from covid19i2b2_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(
        list(enumerate(_WORDS)), "id long, s string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(
            df, "id", "s", max_dist=max_dist, k=k, gram_order="rare"
        ).collect()
    }
    assert got == _brute(df, max_dist)
    with pytest.raises(ValueError, match="gram_order"):
        fuzzy_pairs(df, "id", "s", gram_order="nope")


def test_rare_order_bounds_template_blocks(spark):
    """The reason 'rare' exists: template-heavy names
    ('Customer#000000NNN') share their lowest-HASH grams, so the hash
    order degenerates to one whole-corpus block (~C(n,2) candidates);
    the frequency order picks each name's discriminative digit grams.
    Pins (a) identical pair sets, (b) a materially smaller max block."""
    from covid19i2b2_spark.operators.fuzzy import (
        _padded_qgrams,
        _prefix_grams,
        _rare_prefix_grams,
    )

    n = 400
    df = spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in range(n)], "id long, s string"
    )
    hash_pairs = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "s", max_dist=1, k=2).collect()
    }
    rare_pairs = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(
            df, "id", "s", max_dist=1, k=2, gram_order="rare"
        ).collect()
    }
    assert rare_pairs == hash_pairs == _brute(df, 1)

    def _max_block(grams):
        return (
            grams.groupBy("__g").count().agg(F.max("count")).collect()[0][0]
        )

    base = df.select(F.col("id").alias("__id"), F.col("s").alias("__s"))
    hash_grams = base.select(
        "__id", F.explode(_prefix_grams(F.col("__s"), 2, 1)).alias("__g")
    )
    exploded = base.select(
        "__id", "__s", F.explode(_padded_qgrams(F.col("__s"), 2)).alias("__g")
    )
    freq = exploded.groupBy("__g").agg(F.count("*").alias("__df"))
    rare_grams = _rare_prefix_grams(exploded, freq, ["__id"], 2, 1)
    mb_hash = _max_block(hash_grams)
    mb_rare = _max_block(rare_grams.select("__g"))
    # hash order: every name's 3 lowest-hash grams come from the shared
    # 'Customer#0' template -> one block holds (nearly) all n names;
    # rare order: blocks bounded by digit-gram frequencies
    assert mb_hash >= n * 0.9, (mb_hash, mb_rare)
    assert mb_rare <= mb_hash / 2, (mb_hash, mb_rare)


def test_fuzzy_join_rare_order_two_tables(spark):
    """Two-table form with gram_order='rare': frequencies counted over
    the UNION keep the truncation order consistent across sides —
    pairs must equal the brute-force cross join, including duplicate
    full rows collapsing (the pre-window dropDuplicates)."""
    left = spark.createDataFrame(
        [(1, "kitten"), (2, "apple"), (3, "ab"), (3, "ab"), (4, "naïve")],
        "lid long, ls string",
    )
    right = spark.createDataFrame(
        [(10, "sitten"), (11, "appl"), (12, "cd"), (13, "naive")],
        "rid long, rs string",
    )
    got = {
        (r.lid, r.rid, r.dist)
        for r in fuzzy_join(
            left, right, "ls", "rs", max_dist=2, gram_order="rare"
        ).collect()
    }
    brute = {
        (r.lid, r.rid, r.d)
        for r in left.crossJoin(right)
        .select("lid", "rid", F.levenshtein("ls", "rs").alias("d"))
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert got == brute
