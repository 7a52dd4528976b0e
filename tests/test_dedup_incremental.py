"""Incremental (cross-snapshot) dedup: a new batch filtered against the
persisted index drops exact and near dups without re-reading the corpus,
and index appends make later batches see earlier survivors."""

from __future__ import annotations

import pytest

from covid19i2b2_spark.operators.dedup_incremental import DedupIndex

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "and the crowd watches the game with great enthusiasm tonight"
)
OTHER = (
    "completely different content about spark query engines and their "
    "shuffle partitioning behavior under adaptive execution plans"
)
FRESH = (
    "yet another unrelated document discussing marine biology and the "
    "migration patterns of humpback whales across the pacific ocean"
)


@pytest.fixture()
def index(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(1, BASE), (2, OTHER)], "doc_id long, text string"
    )
    idx = DedupIndex(str(tmp_path / "dedup_index"))
    idx.build(corpus, "doc_id", "text")
    return idx


def test_batch_filtered_against_index(spark, index):
    batch = spark.createDataFrame(
        [
            (10, BASE),  # exact copy of indexed doc 1
            (11, BASE.replace("lazy dog", "sleepy dog")),  # near-dup of 1
            (12, FRESH),  # genuinely new
            (13, FRESH),  # exact within-batch dup of 12
        ],
        "doc_id long, text string",
    )
    survivors, dropped = index.filter_batch(spark, batch, "doc_id", "text")
    kept = {r["doc_id"] for r in survivors.collect()}
    why = {r["doc_id"]: r["reason"] for r in dropped.collect()}
    assert kept == {12}
    assert why[10] == "exact_dup"
    assert why[11] == "near_dup"
    assert why[13] == "exact_dup"
    assert set(why) == {10, 11, 13}


def test_append_makes_later_batches_see_survivors(spark, index):
    b2 = spark.createDataFrame([(20, FRESH)], "doc_id long, text string")
    s2, _ = index.filter_batch(spark, b2, "doc_id", "text")
    assert {r["doc_id"] for r in s2.collect()} == {20}
    index.append(s2, "doc_id", "text")

    b3 = spark.createDataFrame(
        [
            (30, FRESH),  # exact dup of batch-2 survivor
            (31, FRESH.replace("humpback", "gray")),  # near-dup of it
            (32, "entirely novel text about alpine glacier formation and retreat"),
        ],
        "doc_id long, text string",
    )
    s3, d3 = index.filter_batch(spark, b3, "doc_id", "text")
    assert {r["doc_id"] for r in s3.collect()} == {32}
    why = {r["doc_id"]: r["reason"] for r in d3.collect()}
    assert why == {30: "exact_dup", 31: "near_dup"}


def test_within_batch_near_dup_keeps_lowest_id(spark, index):
    batch = spark.createDataFrame(
        [
            (40, FRESH),
            (41, FRESH.replace("pacific", "atlantic")),  # near-dup of 40
        ],
        "doc_id long, text string",
    )
    survivors, dropped = index.filter_batch(spark, batch, "doc_id", "text")
    assert {r["doc_id"] for r in survivors.collect()} == {40}
    assert {r["doc_id"]: r["reason"] for r in dropped.collect()} == {
        41: "near_dup"
    }


def test_stats_and_compact_restore_one_shot_counts(spark, tmp_path):
    """Round 9 (FuzzyIndex symmetry): a replayed append duplicates
    index rows (the documented benign crash window) — stats() must
    surface it and compact() must restore one-shot row counts with
    identical filter_batch results."""
    from covid19i2b2_spark.operators.dedup_incremental import DedupIndex

    def _doc(tag, i):
        return f"{tag} doc {i} " + " ".join(
            f"{tag}w{i}x{j}" for j in range(10)
        )

    corpus = spark.createDataFrame(
        [(i, _doc("base", i)) for i in range(40)],
        "doc_id long, text string",
    )
    idx = DedupIndex(str(tmp_path / "cidx"))
    idx.build(corpus, "doc_id", "text")
    delta = spark.createDataFrame(
        [(100 + i, _doc("new", i)) for i in range(20)],
        "doc_id long, text string",
    )
    idx.append(delta, "doc_id", "text")
    for _ in range(2):  # the at-least-once replay
        idx.append(delta, "doc_id", "text")
    batch = spark.createDataFrame(
        [(500, _doc("base", 3)), (501, _doc("new", 7)),
         (502, _doc("fresh", 0))],
        "doc_id long, text string",
    )
    s0, d0 = idx.filter_batch(spark, batch, "doc_id", "text")
    before = {r["doc_id"] for r in s0.collect()}
    assert before == {502}
    st = idx.stats(spark)
    assert st["fingerprint_rows"] > st["fingerprint_distinct"]
    assert st["duplication_ratio"] > 1.0
    idx.compact(spark)
    st2 = idx.stats(spark)
    assert st2["fingerprint_rows"] == st2["fingerprint_distinct"]
    assert st2["band_rows"] == st2["band_distinct"]
    assert st2["duplication_ratio"] == 1.0
    # one-shot reference
    ref = DedupIndex(str(tmp_path / "ref"))
    ref.build(corpus.unionByName(delta), "doc_id", "text")
    rst = ref.stats(spark)
    assert st2["fingerprint_rows"] == rst["fingerprint_rows"]
    assert st2["band_rows"] == rst["band_rows"]
    s1, _ = idx.filter_batch(spark, batch, "doc_id", "text")
    assert {r["doc_id"] for r in s1.collect()} == before
    idx.release()
