"""X51 incremental fuzzy-match index (operators/fuzzy_incremental.py):
match completeness against brute force over the index contents, the
resolve_batch entity-resolution semantics (best-match assignment,
within-batch collapse, survivor appends), short-string coverage across
the index boundary, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.fuzzy_incremental import FuzzyIndex


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


_CANON = [
    (1, "anthropic"), (2, "google"), (3, "microsoft"),
    (4, "openai"), (5, "xy"), (6, "meta"),
]


def test_match_batch_equals_brute_force(spark, tmp_path):
    idx = FuzzyIndex(str(tmp_path / "idx"), max_dist=2, k=2)
    canon = _df(spark, _CANON)
    idx.build(canon, "id", "name")
    batch = _df(
        spark,
        [
            (101, "antropic"),    # dist 1 of anthropic
            (102, "googel"),      # dist 2 of google
            (103, "metaa"),       # dist 1 of meta
            (104, "yx"),          # dist 2 of xy — zero shared grams
            (105, "salesforce"),  # no match
            (106, None),          # NULL never matches
        ],
    )
    got = {
        (r.batch_id, r.index_id, r.dist)
        for r in idx.match_batch(spark, batch, "id", "name").collect()
    }
    brute = {
        (r["bid"], r["iid"], r["d"])
        for r in batch.withColumnRenamed("id", "bid")
        .withColumnRenamed("name", "bn")
        .crossJoin(
            canon.withColumnRenamed("id", "iid")
            .withColumnRenamed("name", "cn")
        )
        .select("bid", "iid", F.levenshtein("bn", "cn").alias("d"))
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert got == brute
    assert (104, 5, 2) in got  # the short-pool pair


def test_resolve_batch_semantics_and_append(spark, tmp_path):
    idx = FuzzyIndex(str(tmp_path / "ridx"), max_dist=1, k=2)
    idx.build(_df(spark, _CANON), "id", "name")
    batch = _df(
        spark,
        [
            (201, "anthropic"),   # exact: dist 0 -> canonical 1
            (202, "anthropik"),   # dist 1 -> canonical 1
            (203, "quantumco"),   # new entity, spelling A
            (204, "quantumco."),  # new entity, spelling B (dist 1 of A)
            (205, "zebrafish"),   # new entity, alone
        ],
    )
    handles: list = []
    new, assign = idx.resolve_batch(
        spark, batch, "id", "name", cache_handles=handles
    )
    a = {r.batch_id: (r.canonical_id, r.dist) for r in assign.collect()}
    assert a[201] == (1, 0)
    assert a[202] == (1, 1)
    # within-batch collapse: min-id survivor 203 canonicalizes 204
    assert a[203] == (203, 0)
    assert a[204][0] == 203
    assert a[205] == (205, 0)
    assert {r.id for r in new.collect()} == {203, 205}
    assert len(a) == 5

    # the appended entities are now matchable by the NEXT batch
    batch2 = _df(spark, [(301, "quantumco"), (302, "zebrafis")])
    new2, assign2 = idx.resolve_batch(spark, batch2, "id", "name")
    a2 = {r.batch_id: (r.canonical_id, r.dist) for r in assign2.collect()}
    assert a2[301] == (203, 0)
    assert a2[302] == (205, 1)
    assert new2.count() == 0
    for h in handles:
        h.unpersist()


def test_append_new_false_leaves_index_unchanged(spark, tmp_path):
    idx = FuzzyIndex(str(tmp_path / "ro"), max_dist=1)
    idx.build(_df(spark, _CANON), "id", "name")
    batch = _df(spark, [(401, "brandnewco")])
    new, _ = idx.resolve_batch(
        spark, batch, "id", "name", append_new=False
    )
    assert new.count() == 1
    again, _ = idx.resolve_batch(
        spark, batch, "id", "name", append_new=False
    )
    assert again.count() == 1  # still unmatched: nothing was appended


def test_params_are_identity_and_validated(spark, tmp_path):
    with pytest.raises(ValueError):
        FuzzyIndex(str(tmp_path / "v"), max_dist=0)
    with pytest.raises(ValueError):
        FuzzyIndex(str(tmp_path / "v"), k=1)


def test_match_deterministic_across_partitionings(spark, tmp_path):
    idx = FuzzyIndex(str(tmp_path / "det"), max_dist=2)
    idx.build(_df(spark, _CANON).repartition(7), "id", "name")
    batch = _df(spark, [(i, f"googl{i % 3}") for i in range(20)])
    a = sorted(
        map(tuple, idx.match_batch(spark, batch, "id", "name").collect())
    )
    b = sorted(
        map(
            tuple,
            idx.match_batch(
                spark, batch.repartition(5), "id", "name"
            ).collect(),
        )
    )
    assert a == b


def test_short_pool_cap_guards_both_sides(spark, tmp_path):
    """VERDICT r8 #2 (what's wrong): a degenerate corpus — strings
    below the gram-guarantee cutoff on either side — must raise
    loudly at short_cap instead of running a silent quadratic cross
    join.  The index pool grows across appends, so the guard must
    catch it even when each individual append was small."""
    # max_dist=2, k=2 -> cutoff k*(d-1)+2 = 4: 1-3 char strings pool
    idx = FuzzyIndex(str(tmp_path / "cap"), max_dist=2, k=2, short_cap=10)
    shorts = _df(spark, [(i, f"a{i % 10}") for i in range(8)])
    idx.build(shorts, "id", "name")
    ok_batch = _df(spark, [(100, "bcd"), (101, "wxyz")])
    idx.match_batch(spark, ok_batch, "id", "name").collect()  # under cap
    # batch side over cap
    big_batch = _df(spark, [(200 + i, f"b{i % 10}") for i in range(11)])
    with pytest.raises(ValueError, match="short_cap"):
        idx.match_batch(spark, big_batch, "id", "name")
    # index side over cap after appends accumulate
    idx.append(_df(spark, [(300 + i, f"c{i}") for i in range(5)]),
               "id", "name")
    assert idx.stats(spark)["shorts_rows"] == 13
    with pytest.raises(ValueError, match="index-side"):
        idx.match_batch(spark, ok_batch, "id", "name")
    with pytest.raises(ValueError):
        FuzzyIndex(str(tmp_path / "bad"), short_cap=0)


def test_compact_restores_one_shot_counts(spark, tmp_path):
    """VERDICT r8 #3: replayed appends duplicate gram/short rows —
    stats() must surface the duplication and compact() must restore
    one-shot-build row counts with unchanged match results."""
    idx = FuzzyIndex(str(tmp_path / "cmp"), max_dist=1, k=2)
    canon = _df(spark, _CANON)
    idx.build(canon, "id", "name")
    delta = _df(spark, [(10, "amazonia"), (11, "nvidia"), (12, "ab")])
    idx.append(delta, "id", "name")
    # the at-least-once failure mode: the same append replayed 3x
    for _ in range(3):
        idx.append(delta, "id", "name")
    batch = _df(
        spark,
        [(100, "anthropik"), (101, "nvidia!"), (102, "amazonia"),
         (103, "ac"), (104, "zzz-unrelated")],
    )
    before = sorted(
        map(tuple, idx.match_batch(spark, batch, "id", "name").collect())
    )
    st = idx.stats(spark)
    assert st["grams_rows"] > st["grams_distinct"]  # replays visible
    assert st["duplication_ratio"] > 1.0
    idx.compact(spark)
    st2 = idx.stats(spark)
    assert st2["grams_rows"] == st2["grams_distinct"]
    assert st2["shorts_rows"] == st2["shorts_distinct"]
    assert st2["duplication_ratio"] == 1.0
    # one-shot reference: build(canon + delta) fresh
    ref = FuzzyIndex(str(tmp_path / "ref"), max_dist=1, k=2)
    ref.build(canon.unionByName(delta), "id", "name")
    rst = ref.stats(spark)
    assert st2["grams_rows"] == rst["grams_rows"]
    assert st2["shorts_rows"] == rst["shorts_rows"]
    after = sorted(
        map(tuple, idx.match_batch(spark, batch, "id", "name").collect())
    )
    assert after == before
